"""Fused device path for batched rangeproof verification.

Upstream seam: bulletproofs/src/range_proof/mod.rs verify_multiple +
inner_product_proof.rs verification_scalars.  Upstream expands the s-vector
and the g/h generator-column scalars on the CPU per proof; round 2 did the
same in native C++ (~100 µs/proof of the ~324 µs/proof host floor) and
re-uploaded the static generator points every call.  This module moves both
onto the chip:

  * The static generator columns [B_blinding, B] + G(n,m) + H(n,m) are
    uploaded ONCE per (bp_gens, pc_gens, n, m) as canonical u32 words and
    cached device-resident (VERDICT r2 #3; upstream keeps gens in memory,
    generators.rs).
  * The per-proof g/h scalars — 2·n·m per proof, the bulk of scalar
    assembly — are synthesized ON DEVICE from ~20 challenge scalars per
    proof with the mod-ℓ limb kernels (kernels/scalarmod.py), including the
    random-linear-combination accumulation across proofs (VERDICT r2 #4).
  * The dynamic-point scalars (A/S/T1/T2/L/R/V heads) are synthesized on
    device too, so the host uploads only challenges + decompressed points.

The host keeps: transcript replay (native strobe), batch inversions,
per-proof weight hashes, and a handful of native scalar muls — measured
~50 µs/proof vs ~324 µs for the round-2 path.

Everything compiles to ONE jit: decode words → synthesize scalars →
signed-digit recode → Pippenger window totals (kernels/pallas_msm.py).
The window width comes from best_wbits; at wbits=13 (optimal across most
of the batch-verify size range) the recode is free because the digit index
IS the radix-2^13 limb index.
"""

from __future__ import annotations

import functools
import os
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import L, NLIMBS
from . import scalarmod as sm
from .pallas_msm import decode_words_lm, window_totals
from .point import PointBatch

# 2^(i mod n) for the concat_z_and_2 column never exceeds 2^63 < ℓ, so the
# limb table is exact without reduction.
_ONE = np.zeros(NLIMBS, np.int32)
_ONE[0] = 1


def _pow2_limbs(n: int, nm: int) -> np.ndarray:
    from .limbs import int_to_limbs
    return np.stack([int_to_limbs(1 << (i % n)) for i in range(nm)]).astype(
        np.int32
    )


def _bit_select(i_bits: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """where(bit, factor, 1) over (nm,) bits and (nb, 20) factors ->
    (nb, nm, 20)."""
    one = jnp.asarray(_ONE)
    return jnp.where(
        i_bits[None, :, None] != 0, factor[:, None, :], one[None, None, :]
    )


def _pow_expand(base_2k: list[jnp.ndarray], nm: int) -> jnp.ndarray:
    """Π_j base_2k[j]^{bit_j(i)} for i = 0..nm-1: log-depth expansion of a
    power/s-vector (the ScalarVec doubling expansion, ipp.py
    scalars_from_challenges, as lg(nm) batched mod-ℓ muls)."""
    i = jnp.arange(nm, dtype=jnp.int32)
    acc = None
    for j, b in enumerate(base_2k):
        f = _bit_select((i >> j) & 1, b)
        acc = f if acc is None else sm.mul(acc, f)
    return acc


# Param channel layout (canonical u32 words, host-packed; see
# pack_verification_params).  All values are pre-negated/pre-multiplied on
# the host so the device chain stays nonnegative.
#   0 wz      wt·z            5 y_inv       9 wt_cx    (wt·c·x)
#   1 wz_neg  ℓ-wt·z          6 z          10 wt_cxx   (wt·c·x²)
#   2 wa_neg  ℓ-wt·a          7 allinv     11 wczz     (wt·c·z²)
#   3 wzz     wt·z²           8 wt         12.. u_sq[lg], u_inv_sq[lg]
#   4 wb_neg  ℓ-wt·b
N_FIXED = 12


# COMPACT param layout (native fused_params_assembly; 9 + lg columns):
#   [0] wt  [1] z  [2] y_inv  [3] allinv  [4] a  [5] b  [6] x
#   [7] cx (c·x)  [8] czz (c·z²)  [9..9+lg) u_sq
# The derived products (wz, wzz, wa_neg, ..., u_inv_sq) synthesize ON
# DEVICE — uploading them cost ~1.4 MB/batch through the ~26 MB/s tunnel.
N_COMPACT = 9


def _synthesize_lm(params_words: jnp.ndarray, n: int, m: int, lg: int):
    """Limb-MAJOR scalar synthesis: COMPACT params (nb, 9+lg, 8) u32 ->
    the same (gh_col (2nm, 20), dyn (nb, k, 20)) as _synthesize, computed
    on (20, nm, nb) arrays — lanes carry the proof batch, sublanes the
    generator index, so every vreg lane is useful.  The limbs-last twin
    below wastes 6.4x on the 20-wide minor axis (the synthesis stage was
    ~65 of the 153 ms fused-verify compute at nb=4096; probe 2026-08-19).
    _synthesize stays as the layout-independent parity reference."""
    nm = n * m
    nb = params_words.shape[0]
    w = jnp.transpose(params_words, (1, 2, 0))        # (C, 8, nb)
    ch = [sm.decode_words_first(w[i]) for i in range(N_COMPACT)]
    wt, z, y_inv, allinv, a_s, b_s, x, cx, czz = ch   # each (20, nb)
    u_sq = [sm.decode_words_first(w[N_COMPACT + j]) for j in range(lg)]

    # ---- derive the full channel set (a handful of (20, nb) muls)
    wz = sm.mul_lm(wt, z)
    wz_neg = sm.neg_lm(wz)
    wzz = sm.mul_lm(wz, z)
    wa_neg = sm.neg_lm(sm.mul_lm(wt, a_s))
    wb_neg = sm.neg_lm(sm.mul_lm(wt, b_s))
    wt_x = sm.mul_lm(wt, x)
    wt_cx = sm.mul_lm(wt, cx)
    wt_cxx = sm.mul_lm(wt_cx, x)
    wczz = sm.mul_lm(wt, czz)
    # u_inv_sq[j] = u_j^{-2} = allinv² · Π_{k≠j} u_sq[k]  (prefix/suffix
    # products — no device inversion needed)
    allinv2 = sm.mul_lm(allinv, allinv)
    pre = [None] * lg
    suf = [None] * lg
    acc = allinv2
    for j in range(lg):
        pre[j] = acc
        acc = sm.mul_lm(acc, u_sq[j])
    acc = None
    for j in range(lg - 1, -1, -1):
        suf[j] = acc
        acc = u_sq[j] if acc is None else sm.mul_lm(acc, u_sq[j])
    u_inv_sq = [pre[j] if suf[j] is None else sm.mul_lm(pre[j], suf[j])
                for j in range(lg)]

    one = jnp.asarray(_ONE)[:, None, None]            # (20, 1, 1)

    def pow_expand(base, count):
        """Π_j base[j]^{bit_j(i)} for i in [0, count) as a DOUBLING TREE:
        level j multiplies only the 2^j new entries (Σ 2^j ≈ one
        full-width mul total) — the where/mask form multiplied the full
        width at every level (lg full muls; the synthesis stage's mod-ℓ
        reduce is bandwidth-bound, so work ∝ elements multiplied)."""
        acc = jnp.broadcast_to(one, (NLIMBS, 1, nb))
        size = 1
        for j, b in enumerate(base):
            if size >= count:
                break
            hi = sm.mul_lm(acc, b[:, None, :])        # (20, size, nb)
            acc = jnp.concatenate([acc, hi], axis=1)
            size *= 2
        return acc[:, :count]                         # (20, count, nb)

    # s_i = allinv · Π_j u_sq[lg-1-j]^{bit_j(i)}
    s = sm.mul_lm(pow_expand([u_sq[lg - 1 - j] for j in range(lg)], nm),
                  allinv[:, None, :])
    s_inv = s[:, ::-1, :]

    y2 = [y_inv]
    for _ in range(max(0, lg - 1)):
        y2.append(sm.mul_lm(y2[-1], y2[-1]))
    yp = pow_expand(y2, nm)

    if m > 1:
        lgm = m.bit_length() - 1
        z2k = [z]
        for _ in range(max(0, lgm - 1)):
            z2k.append(sm.mul_lm(z2k[-1], z2k[-1]))
        zpow = pow_expand(z2k, m)                     # (20, m, nb)
    else:
        zpow = jnp.broadcast_to(one, (NLIMBS, 1, nb))

    # g_i = -wt·z - wt·a·s_i
    g = wz_neg[:, None, :] + sm.mul_lm(wa_neg[:, None, :], s)

    # h_i = wt·z + y^{-i}·(wt·z²·z^(i div n)·2^(i mod n) - wt·b·s_inv_i)
    a_col = jnp.repeat(sm.mul_lm(wzz[:, None, :], zpow), n, axis=1)
    p2 = jnp.asarray(_pow2_limbs(n, nm)).T[:, :, None]  # (20, nm, 1)
    t1 = sm.mul_lm(a_col, jnp.broadcast_to(p2, a_col.shape))
    t2 = sm.mul_lm(wb_neg[:, None, :], s_inv)
    h = wz[:, None, :] + sm.mul_lm(yp, sm.add_lm(t1, t2))

    g_col = sm.accumulate_lm(g, axis=2)               # (20, nm)
    h_col = sm.accumulate_lm(h, axis=2)

    # dyn head scalars, same order as _synthesize: A,S,T1,T2,L..,R..,V..
    wt_b = wt[:, None, :]
    head = ([wt_b, wt_x[:, None, :], wt_cx[:, None, :], wt_cxx[:, None, :]]
            + [sm.mul_lm(wt_b, u[:, None, :]) for u in u_sq]
            + [sm.mul_lm(wt_b, u[:, None, :]) for u in u_inv_sq]
            + [sm.mul_lm(wczz[:, None, :], zpow)])
    dyn = jnp.concatenate(head, axis=1)               # (20, k, nb)

    gh_col = jnp.concatenate([g_col, h_col], axis=1).T          # (2nm, 20)
    return gh_col, jnp.transpose(dyn, (2, 1, 0))                # (nb, k, 20)


def _synthesize(params: jnp.ndarray, n: int, m: int, lg: int):
    """params (nb, C, 20) int32 limbs -> (static column scalars (2nm, 20),
    dyn head scalars (nb, k, 20)) — all loose limbs, value-correct mod ℓ."""
    nm = n * m
    ch = [params[:, i] for i in range(N_FIXED)]
    (wz, wz_neg, wa_neg, wzz, wb_neg, y_inv, z, allinv, wt, wt_cx, wt_cxx,
     wczz) = ch
    u_sq = [params[:, N_FIXED + j] for j in range(lg)]
    u_inv_sq = [params[:, N_FIXED + lg + j] for j in range(lg)]
    wt_x = params[:, N_FIXED + 2 * lg]  # wt·x rides after the u channels

    # s vector: s_i = allinv · Π_j u_sq[lg-1-j]^{bit_j(i)}  (nb, nm, 20)
    s = sm.mul(_pow_expand([u_sq[lg - 1 - j] for j in range(lg)], nm),
               allinv[:, None, :])
    s_inv = s[:, ::-1]  # 1/s_i = s_{nm-1-i}

    # y^{-i} powers: lg(nm) squarings then the same expansion
    y2 = [y_inv]
    for _ in range(max(0, lg - 1)):
        y2.append(sm.mul(y2[-1], y2[-1]))
    yp = _pow_expand(y2, nm)

    # z^j per party (j = i div n), expanded over parties then repeated
    if m > 1:
        lgm = m.bit_length() - 1
        z2k = [z]
        for _ in range(max(0, lgm - 1)):
            z2k.append(sm.mul(z2k[-1], z2k[-1]))
        zpow = _pow_expand(z2k, m)                      # (nb, m, 20)
    else:
        zpow = jnp.broadcast_to(jnp.asarray(_ONE),
                                params.shape[:1] + (1, NLIMBS))

    # g_i = -wt·z - wt·a·s_i
    g = wz_neg[:, None, :] + sm.mul(wa_neg[:, None, :], s)

    # h_i = wt·z + y^{-i}·(wt·z²·z^(i div n)·2^(i mod n) - wt·b·s_inv_i)
    a_col = jnp.repeat(sm.mul(wzz[:, None, :], zpow), n, axis=1)
    t1 = sm.mul(a_col, jnp.asarray(_pow2_limbs(n, nm))[None])
    t2 = sm.mul(wb_neg[:, None, :], s_inv)
    h = wz[:, None, :] + sm.mul(yp, sm.add(t1, t2))

    g_col = sm.accumulate(g, axis=0)                    # (nm, 20)
    h_col = sm.accumulate(h, axis=0)

    # dyn head scalars, MSM order A,S,T1,T2,L...,R...,V... (dyn_compressed)
    wt_usq = [sm.mul(wt[:, None, :], u[:, None, :]) for u in u_sq]
    wt_uinv = [sm.mul(wt[:, None, :], u[:, None, :]) for u in u_inv_sq]
    v_s = sm.mul(wczz[:, None, :], zpow)                # (nb, m, 20)
    dyn = jnp.concatenate(
        [wt[:, None, :], wt_x[:, None, :], wt_cx[:, None, :],
         wt_cxx[:, None, :]] + wt_usq + wt_uinv + [v_s], axis=1,
    )                                                   # (nb, 4+2lg+m, 20)
    return jnp.concatenate([g_col, h_col], axis=0), dyn


def _padded_size(total: int) -> int:
    from .pallas_msm import padded_msm_size
    return padded_msm_size(total)


def _totals_core(static_words, dyn_words, params_words, bbB_words,
                 n: int, m: int, lg: int, wbits: int,
                 interpret: bool, dev_decompress: bool) -> jnp.ndarray:
    """Trace-pure body of batch_msm_totals — also runs per-shard under
    shard_map in parallel/fused_batch_verify.py (MSMs are sums, so shards'
    window totals Edwards-add into the combined mega-check)."""
    from .msm import num_windows

    nm = n * m
    nb = params_words.shape[0]
    k = 4 + 2 * lg + m
    assert dyn_words.shape[-1] == nb * k

    gh_col, dyn_sc = _synthesize_lm(params_words, n, m, lg)
    bbB = sm.decode_words_last(bbB_words)
    scalars = jnp.concatenate(
        [bbB, gh_col, dyn_sc.reshape(nb * k, NLIMBS)], axis=0
    )
    if wbits == 13:
        digits = sm.signed_digits13(scalars)     # digit index == limb index
    else:
        from .pallas_msm import recode_digits_device
        words = sm.digits_to_words(sm.partial_reduce_digits(scalars))
        digits = recode_digits_device(words.T, wbits, num_windows(wbits))

    if dev_decompress:
        from .pallas_decompress import decompress_points
        coords, ok_vec = decompress_points(dyn_words, interpret)
        ok = jnp.min(ok_vec)
        pts = PointBatch(*(
            jnp.concatenate([decode_words_lm(static_words[i]), coords[i]],
                            axis=1)
            for i in range(4)
        ))
    else:
        ok = jnp.int32(1)
        pts = PointBatch(*(
            jnp.concatenate(
                [decode_words_lm(static_words[i]),
                 decode_words_lm(dyn_words[i])], axis=1)
            for i in range(4)
        ))

    # pad to the seq-pipeline tile (identity points, zero digits)
    from .pallas_msm import identity_lm
    total = 2 + 2 * nm + nb * k
    size = _padded_size(total)
    if size != total:
        pad = size - total
        ident = identity_lm((pad,))
        pts = PointBatch(
            jnp.concatenate([pts.x, ident.x], axis=1),
            jnp.concatenate([pts.y, ident.y], axis=1),
            jnp.concatenate([pts.z, ident.z], axis=1),
            jnp.concatenate([pts.t, ident.t], axis=1),
        )
        digits = jnp.pad(digits, [(0, pad), (0, 0)])

    t = window_totals(pts, digits, wbits, interpret)
    packed = jnp.stack([t.x, t.y, t.z, t.t])
    # fold the validity flag into the single fetched array (the axon tunnel
    # charges ~24 ms per fetched array)
    okp = jnp.broadcast_to(ok, (4, NLIMBS, 1)).astype(jnp.int32)
    return jnp.concatenate([packed, okp], axis=2)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def batch_msm_totals(static_words: jnp.ndarray,   # (4, 8, 2+2nm) u32 resident
                     dyn_words: jnp.ndarray,      # see dev_decompress
                     params_words: jnp.ndarray,   # (nb, C, 8) u32
                     bbB_words: jnp.ndarray,      # (2, 8) u32
                     n: int, m: int, lg: int, wbits: int,
                     interpret: bool = False,
                     dev_decompress: bool = False) -> jnp.ndarray:
    """The whole batched mega-check MSM on device: returns packed window
    totals (4, NLIMBS, nw+1) for the host Horner combine, with the last
    column broadcasting the point-validity flag.  Point order:
    [B_blinding, B] + G + H + per-proof dyn; scalar rows match.

    dyn_words: (4, 8, D) u32 extended coords when dev_decompress=False;
    (8, D) u32 raw 32-byte encodings when True (decoded on device by
    kernels/pallas_decompress.py — upload drops 128 -> 32 B/point and the
    host sheds its native decompress entirely)."""
    return _totals_core(static_words, dyn_words, params_words, bbB_words,
                        n, m, lg, wbits, interpret, dev_decompress)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def batch_msm_check(static_words: jnp.ndarray,
                    dyn_words: jnp.ndarray,
                    params_words: jnp.ndarray,
                    bbB_words: jnp.ndarray,
                    n: int, m: int, lg: int, wbits: int,
                    interpret: bool = False,
                    dev_decompress: bool = False) -> jnp.ndarray:
    """batch_msm_totals + the window combine + Ristretto identity test all
    in ONE dispatch: returns a single int32 (1 = batch accepts).  The rolled
    device Horner fold (pallas_msm._combine_check_core) replaces the host
    combine, so the fetched payload is one scalar instead of the
    (4, NLIMBS, nw+1) totals — upstream folds windows in-loop in
    pippenger.rs [U] (VERDICT r3 #3)."""
    from .pallas_msm import _combine_check_core

    packed = _totals_core(static_words, dyn_words, params_words, bbB_words,
                          n, m, lg, wbits, interpret, dev_decompress)
    ok = packed[0, 0, -1]
    ident = _combine_check_core(packed[:, :, :-1], wbits)
    return (ok & ident).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(4, 5))
def txbatch_msm_check(static_words: jnp.ndarray,    # (4, 8, S) u32 resident
                      dyn_enc_words: jnp.ndarray,   # (8, D) u32 encodings
                      static_sc_words: jnp.ndarray,  # (S, 8) u32 scalars
                      dyn_sc_words: jnp.ndarray,     # (D, 8) u32 scalars
                      wbits: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused full-tx-batch mega-check (parallel/tx_batch.py device path):
    scalars arrive as packed 32-byte words straight out of the native
    ScalarVec accumulators (no Python per-element conversion), dynamic
    points as raw 32-byte encodings decoded by the Pallas decompress
    kernel, static generators from the device-resident cache.  One
    dispatch, one int32 back (1 = batch accepts).  Upstream counterpart:
    verifier.rs + PointOp::verify_batch's single vartime MSM [SURVEY
    §3.4]."""
    from .msm import num_windows
    from .pallas_decompress import decompress_points
    from .pallas_msm import (_combine_check_core, identity_lm,
                             recode_digits_device)

    scalars = jnp.concatenate([
        sm.decode_words_last(static_sc_words.astype(jnp.uint32)),
        sm.decode_words_last(dyn_sc_words.astype(jnp.uint32)),
    ], axis=0)                                      # (S+D, NLIMBS)
    if wbits == 13:
        digits = sm.signed_digits13(scalars)
    else:
        words = sm.digits_to_words(sm.partial_reduce_digits(scalars))
        digits = recode_digits_device(words.T, wbits, num_windows(wbits))

    coords, ok_vec = decompress_points(dyn_enc_words, interpret)
    ok = jnp.min(ok_vec)
    pts = PointBatch(*(
        jnp.concatenate([decode_words_lm(static_words[i]), coords[i]],
                        axis=1)
        for i in range(4)
    ))
    total = static_words.shape[2] + dyn_enc_words.shape[1]
    size = _padded_size(total)
    if size != total:
        pad = size - total
        ident = identity_lm((pad,))
        pts = PointBatch(
            jnp.concatenate([pts.x, ident.x], axis=1),
            jnp.concatenate([pts.y, ident.y], axis=1),
            jnp.concatenate([pts.z, ident.z], axis=1),
            jnp.concatenate([pts.t, ident.t], axis=1),
        )
        digits = jnp.pad(digits, [(0, pad), (0, 0)])
    t = window_totals(pts, digits, wbits, interpret)
    packed = jnp.stack([t.x, t.y, t.z, t.t])
    ident_ok = _combine_check_core(packed, wbits)
    return (ok & ident_ok).astype(jnp.int32)


def fused_split_check(static_buf: bytes, dyn_s, dyn_enc_blob: bytes,
                      bp_gens, pc_gens) -> bool:
    """One fused device dispatch for a split mega-check: static scalars
    arrive as packed ScalarVec bytes verbatim over the [B_blinding, B] +
    G(maxpad) + H(maxpad) resident columns, dynamic points as raw 32-byte
    encodings (device decode), dynamic scalars via one native pack.  The
    dynamic count pads to a 1024-multiple bucket (256 floor) so compiles
    cache.  Callers: parallel/tx_batch.py (whole-batch RLC) and the R1CS
    verifier's single-proof device route (proofs/r1cs/verifier.py)."""
    from ..constants import L as _L
    from ..native import ScalarVec

    S = len(static_buf) // 32
    maxpad = (S - 2) // 2
    sw = static_gens_words(bp_gens, pc_gens, maxpad, 1)
    static_sc = np.frombuffer(static_buf, np.uint32).reshape(S, 8)
    D = len(dyn_s)
    assert len(dyn_enc_blob) == 32 * D
    sv = (dyn_s if isinstance(dyn_s, ScalarVec)
          else ScalarVec.from_ints([int(s) % _L for s in dyn_s]))
    dpad = 256 if D <= 256 else -(-D // 1024) * 1024
    dyn_sc = np.zeros((dpad, 8), np.uint32)
    dyn_sc[:D] = np.frombuffer(sv.buf, np.uint32).reshape(D, 8)
    # zero-padded encodings decode to the identity with zero scalars
    enc = np.zeros((8, dpad), np.uint32)
    enc[:, :D] = np.frombuffer(dyn_enc_blob, np.uint32).reshape(D, 8).T
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = txbatch_msm_check(
        sw, jnp.asarray(enc), jnp.asarray(static_sc), jnp.asarray(dyn_sc),
        13, interpret)
    return bool(int(out))


def _use_dev_combine(interpret: bool) -> bool:
    """Device combine default: on for real-device runs, host combine in
    interpret mode (the host path stays the ground truth the tests pin)."""
    env = os.environ.get("ZKVM_DEV_COMBINE")
    if env is not None:
        return env not in ("0", "false")
    return not interpret


# ------------------------------------------------------- static gens cache
_static_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def static_gens_words(bp_gens, pc_gens, n: int, m: int) -> jnp.ndarray:
    """Device-resident (4, 8, 2+2nm) u32 words for
    [B_blinding, B] + G(n,m) + H(n,m), uploaded once per generator set
    (VERDICT r2 #3: the round-2 path re-uploaded ~2nm·128 B per call)."""
    per_gens = _static_cache.setdefault(bp_gens, {})
    key = (n, m, pc_gens.B.compress(), pc_gens.B_blinding.compress())
    cached = per_gens.get(key)
    if cached is None:
        from .pallas_msm import point_words
        pts = ([pc_gens.B_blinding, pc_gens.B]
               + bp_gens.G(n, m) + bp_gens.H(n, m))
        words = np.stack([point_words(p.ep) for p in pts])  # (S, 4, 8)
        cached = jax.device_put(
            np.ascontiguousarray(words.transpose(1, 2, 0))
        )
        per_gens[key] = cached
    return cached


# --------------------------------------------------------- host param pack
def pack_verification_params(jobs: list[dict]) -> np.ndarray:
    """Per-proof challenge params, FULL layout -> (nb, 13+2lg, 8) u32.
    Feeds the limbs-last _synthesize parity reference only; production
    packs the compact form below."""
    lg = len(jobs[0]["u_sq"])
    blob = bytearray()
    for j in jobs:
        vals = (
            [j["wz"], j["wz_neg"], j["wa_neg"], j["wzz"], j["wb_neg"],
             j["y_inv"], j["z"], j["allinv"], j["wt"], j["wt_cx"],
             j["wt_cxx"], j["wczz"]]
            + list(j["u_sq"]) + list(j["u_inv_sq"]) + [j["wt_x"]]
        )
        for v in vals:
            blob += int(v).to_bytes(32, "little")
    nb = len(jobs)
    c = N_FIXED + 2 * lg + 1
    return np.frombuffer(bytes(blob), np.uint32).reshape(nb, c, 8)


def pack_verification_params_compact(jobs: list[dict]) -> np.ndarray:
    """COMPACT per-proof params -> (nb, 9+lg, 8) u32 (the _synthesize_lm
    layout; derived products synthesize on device — the full layout cost
    ~1.4 MB/batch more through the tunnel at nb=4096)."""
    lg = len(jobs[0]["u_sq"])
    blob = bytearray()
    for j in jobs:
        vals = ([j["wt"], j["z"], j["y_inv"], j["allinv"], j["a"], j["b"],
                 j["x"], j["cx"], j["czz"]] + list(j["u_sq"]))
        for v in vals:
            blob += int(v).to_bytes(32, "little")
    return np.frombuffer(bytes(blob), np.uint32).reshape(
        len(jobs), N_COMPACT + lg, 8)


def prepare_batch_inputs(proofs, bp_gens, pc_gens, transcripts,
                         value_commitments, n: int,
                         entropy: bytes = b"\x01" * 32,
                         dev_decompress: bool = True):
    """Host half of the fused batch verify: transcript replays, batched
    inversions, per-proof challenge params and weights.  Returns
    (params (nb,C,8) u32, bbB_per_proof (nb,2,8) u32 — PER-PROOF weighted
    B_blinding/B scalars so sharded callers can sum per shard, dyn_words,
    m, lg).  Raises exactly like RangeProof._job_parts on malformed input."""
    import hashlib

    from ..oracle import scalar
    from ..proofs.rangeproof import delta as delta_fn

    nb = len(proofs)
    assert nb == len(transcripts) == len(value_commitments) and nb > 0
    m = len(value_commitments[0])
    assert all(len(vc) == m for vc in value_commitments), "uniform m only"
    nm = n * m
    lg = nm.bit_length() - 1

    # early dyn upload (VERDICT r4 task 8): the raw encodings depend only
    # on the proof bytes, so start their ~32 B/point device transfer NOW —
    # device_put is async and the ~26 MB/s tunnel upload overlaps the whole
    # host replay + params assembly below (~90 ms at nb=4096, about the
    # upload's own cost).  Host-decompress mode keeps its original late
    # position so the ValueError/FormatError ordering contract holds.
    dyn_early = None
    if dev_decompress and not os.environ.get("ZKVM_NO_EARLY_UPLOAD"):
        dyn_early = _dyn_words(proofs, value_commitments, True)
        if jax.default_backend() in ("tpu", "axon"):
            dyn_early = jax.device_put(jnp.asarray(dyn_early))

    # ---- transcript replays (native fused strobe) + proof validation.
    # raw mode returns the canonical challenge blob with zero int
    # round-trips; the native call releases the GIL, so the per-proof loop
    # threads ~linearly on spare cores (the replay was ~2/3 of host prep).
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    def _replay(args):
        proof, transcript, vcs = args
        return proof._replay_challenges(
            bp_gens, pc_gens, transcript, vcs, n, raw=True)

    # proof wire bytes, built ONCE (weights hash them; the batch replay
    # slices its header/LR views out of them)
    wires = [p.to_bytes() for p in proofs]

    replays = None
    if not _os.environ.get("ZKVM_TPU_PY_REPLAY"):
        # whole-batch native replay: one crossing, proofs parallel across
        # the worker pool (the per-proof wrapper + ctypes glue was ~90 ms
        # of the 155 ms host prep at nb=4096).  Light validation mirrors
        # _replay_challenges' checks; the wire layout fixes byte lengths.
        from ..constants import LABEL_IPP, LABEL_RANGEPROOF
        from ..native import rangeproof_replay_batch
        from ..proofs.errors import FormatError
        lg_ok = n * m == 1 << lg
        wire_len = 224 + 64 * lg + 64
        if (n in (8, 16, 32, 64) and m and m & (m - 1) == 0 and lg_ok
                and bp_gens.gens_capacity >= n
                and bp_gens.party_capacity >= m
                and all(len(w) == wire_len for w in wires)):
            v_blob = b"".join(
                vc for vcs_i in value_commitments for vc in vcs_i)
            if len(v_blob) != nb * m * 32:
                raise FormatError("bad value commitment length")
            raws = rangeproof_replay_batch(
                [t.strobe for t in transcripts], LABEL_RANGEPROOF,
                LABEL_IPP, n, m, v_blob, b"".join(wires), wire_len, lg)
            if raws is not None:
                replays = [{"raw": r} for r in raws]
        elif not lg_ok or n not in (8, 16, 32, 64) or not m or m & (m - 1):
            raise FormatError("invalid bitsize or aggregation size")
    if replays is None:
        triples = list(zip(proofs, transcripts, value_commitments))
        # default 1: a threaded default was tried and DOUBLED host prep on
        # the bench box (155 -> 348 ms at nb=4096, ledger 2026-08-19
        # 15:31) — the replay threads contend with the pipelined prep
        # worker and the jax dispatch threads.  ZKVM_HOST_THREADS opts in.
        workers = int(_os.environ.get("ZKVM_HOST_THREADS", "1"))
        if nb >= 64 and workers > 1:
            with ThreadPoolExecutor(workers) as ex:
                replays = list(ex.map(_replay, triples))
        else:
            replays = [_replay(t) for t in triples]

    # ---- per-proof random weights (the batching randomness)
    wt_digests = [
        hashlib.sha3_512(entropy + i.to_bytes(8, "little") + w).digest()
        for i, w in enumerate(wires)
    ]

    # ---- channel params: ONE native call for the whole batch (scalarvec
    # fused_params_assembly — batch inversion + ~25 mod-ℓ muls/proof); the
    # Python chain below is the bit-exact fallback/ground truth
    # (ZKVM_TPU_PY_PARAMS=1 forces it; tests assert agreement)
    if not _os.environ.get("ZKVM_TPU_PY_PARAMS"):
        from ..native import fused_params_assembly
        chal = b"".join(
            r["raw"] if "raw" in r else
            b"".join((int(v) % L).to_bytes(32, "little")
                     for v in (r["y"], r["z"], r["x"], r["w"], r["c"],
                               *r["u"]))
            for r in replays)
        prf = b"".join(
            b"".join((int(v) % L).to_bytes(32, "little")
                     for v in (p.t_x, p.t_x_blinding, p.e_blinding,
                               p.ipp_proof.a, p.ipp_proof.b))
            for p in proofs)
        native_out = fused_params_assembly(
            chal, prf, b"".join(wt_digests), nb, lg, n, m)
        if native_out is not None:
            params, bbB_per_proof = native_out
            return (params, bbB_per_proof,
                    dyn_early if dyn_early is not None else
                    _dyn_words(proofs, value_commitments, dev_decompress),
                    m, lg)

    # ---- ground-truth Python path below needs int challenges: unpack any
    # raw replay blobs (layout y,z,x,w,c,u... — see rangeproof_replay)
    def _as_ints(r: dict) -> dict:
        if "raw" not in r:
            return r
        raw = r["raw"]
        vals = [int.from_bytes(raw[32 * i: 32 * i + 32], "little")
                for i in range(5 + lg)]
        return {"y": vals[0], "z": vals[1], "x": vals[2], "w": vals[3],
                "c": vals[4], "u": vals[5:]}

    replays = [_as_ints(r) for r in replays]

    # ---- batched inversions: y, every u, and (y-1) for the delta
    # geometric series — one Montgomery-trick pass for the whole batch
    all_u = [u for r in replays for u in r["u"]]
    ys = [r["y"] for r in replays]
    ym1 = [(r["y"] - 1) % L or 1 for r in replays]  # y==1 guarded below
    inv = scalar.batch_invert(ys + all_u + ym1)
    y_invs = inv[:nb]
    u_invs = [inv[nb + i * lg: nb + (i + 1) * lg] for i in range(nb)]
    ym1_invs = inv[nb + nb * lg:]

    jobs = []
    bbB_rows = []
    for i, (proof, r) in enumerate(zip(proofs, replays)):
        y, z, x, w, c, u = r["y"], r["z"], r["x"], r["w"], r["c"], r["u"]
        a, b = proof.ipp_proof.a % L, proof.ipp_proof.b % L
        wt = scalar.from_bytes_mod_order_wide(wt_digests[i])
        zz = z * z % L
        u_inv = u_invs[i]
        allinv = 1
        for ui in u_inv:
            allinv = allinv * ui % L
        # delta via the geometric series (one shared inversion would need
        # (y-1); at challenge y the y==1 branch is unreachable in practice
        # but kept for ground-truth parity)
        if y == 1:
            dv = delta_fn(n, m, y, z)
        else:
            y_nm = y
            for _ in range(lg):
                y_nm = y_nm * y_nm % L
            sum_y = (y_nm - 1) * ym1_invs[i] % L
            sum_2 = (1 << n) - 1
            acc = (z - zz) % L * sum_y % L
            zexp = zz * z % L
            for _ in range(m):
                acc = (acc - zexp * sum_2) % L
                zexp = zexp * z % L
            dv = acc
        b_s = (w * ((proof.t_x - a * b) % L) + c * ((dv - proof.t_x) % L)) % L
        bb_s = (-proof.e_blinding - c * proof.t_x_blinding) % L
        bbB_rows.append(
            int(wt * bb_s % L).to_bytes(32, "little")
            + int(wt * b_s % L).to_bytes(32, "little")
        )
        jobs.append({
            "wt": wt, "z": z, "y_inv": y_invs[i], "allinv": allinv,
            "a": a, "b": b, "x": x, "cx": c * x % L, "czz": c * zz % L,
            "u_sq": [ui * ui % L for ui in u],
        })

    params = pack_verification_params_compact(jobs)
    bbB_per_proof = np.frombuffer(b"".join(bbB_rows), np.uint32).reshape(
        nb, 2, 8)

    return (params, bbB_per_proof,
            dyn_early if dyn_early is not None else
            _dyn_words(proofs, value_commitments, dev_decompress), m, lg)


def _dyn_words(proofs, value_commitments, dev_decompress: bool) -> np.ndarray:
    """Per-proof dynamic points as device upload words: raw 32-byte
    encodings (8, D) when the Pallas decompress kernel decodes on device,
    canonical coordinate words (4, 8, D) via the threaded native host
    decompress otherwise."""
    from ..oracle.ristretto import decompress_many

    all_compressed = []
    for proof, vcs in zip(proofs, value_commitments):
        all_compressed.extend(proof.dyn_compressed(vcs))
    if dev_decompress:
        # raw encodings, decoded+validated by the Pallas decompress kernel
        return np.ascontiguousarray(
            np.frombuffer(b"".join(all_compressed), np.uint32)
            .reshape(len(all_compressed), 8).T
        )
    # ground-truth path: one threaded native decompress on the host
    dyn_pts = decompress_many(all_compressed)
    from .pallas_msm import point_words
    dyn_words = np.empty((len(dyn_pts), 4, 8), np.uint32)
    for i, p in enumerate(dyn_pts):
        w_c = getattr(p, "_words", None)
        dyn_words[i] = w_c if w_c is not None else point_words(p.ep)
    return np.ascontiguousarray(dyn_words.transpose(1, 2, 0))


def sum_bbB(bbB_pp: np.ndarray) -> np.ndarray:
    """Sum per-proof weighted B_blinding/B scalar rows (nb, 2, 8) u32 into
    the (2, 8) column scalars (host native ScalarVec)."""
    from ..native import ScalarVec
    nb = bbB_pp.shape[0]
    blob = np.ascontiguousarray(bbB_pp).tobytes()
    bb = ScalarVec(b"".join(blob[i * 64: i * 64 + 32]
                            for i in range(nb)), nb).sum()
    b = ScalarVec(b"".join(blob[i * 64 + 32: i * 64 + 64]
                           for i in range(nb)), nb).sum()
    return np.frombuffer(
        int(bb).to_bytes(32, "little") + int(b).to_bytes(32, "little"),
        np.uint32,
    ).reshape(2, 8).copy()


def batch_verify_device(proofs, bp_gens, pc_gens, transcripts,
                        value_commitments, n: int,
                        entropy: bytes = b"\x01" * 32,
                        interpret: bool | None = None,
                        dev_decompress: bool | None = None,
                        timings: dict | None = None) -> bool:
    """Full batched verification through the fused device path.  Host work:
    native transcript replay, one batched inversion, per-proof weight hash,
    ~15 native scalar muls/proof.  Returns the identity-check result (False
    also covers invalid point encodings when decompressing on device);
    raises FormatError/ProofError exactly like RangeProof._job_parts on
    malformed input, and ValueError on bad encodings in host-decompress
    mode.

    dev_decompress (default: on for TPU backends) ships raw 32-byte
    encodings and decodes them in the Pallas decompress kernel; off routes
    through the native host decompress (the ground-truth path).

    Requires uniform aggregation size m across the batch (callers fall back
    to proofs.rangeproof.batch_verification_job otherwise)."""
    import time as _time
    t_start = _time.perf_counter()

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if dev_decompress is None:
        dev_decompress = not interpret

    params, bbB_pp, dyn_words, m, lg = prepare_batch_inputs(
        proofs, bp_gens, pc_gens, transcripts, value_commitments, n,
        entropy, dev_decompress,
    )
    nb = len(proofs)
    nm = n * m
    bbB = sum_bbB(bbB_pp)

    static_words = static_gens_words(bp_gens, pc_gens, n, m)

    from .pallas_msm import best_wbits
    total = 2 + 2 * nm + nb * (4 + 2 * lg + m)
    wbits = best_wbits(_padded_size(total))
    dev_combine = _use_dev_combine(interpret)
    t_host = _time.perf_counter()
    if dev_combine:
        flag = np.asarray(batch_msm_check(
            static_words, jnp.asarray(dyn_words), jnp.asarray(params),
            jnp.asarray(bbB), n, m, lg, wbits, interpret, dev_decompress,
        ))
    else:
        packed = np.asarray(batch_msm_totals(
            static_words, jnp.asarray(dyn_words), jnp.asarray(params),
            jnp.asarray(bbB), n, m, lg, wbits, interpret, dev_decompress,
        ))
    t_dev = _time.perf_counter()
    if timings is not None:
        timings["host_s"] = t_host - t_start
        timings["device_s"] = t_dev - t_host  # upload+exec+fetch (the axon
        # tunnel defers execution to the fetch RPC, so this IS device time)
        timings["msm_size"] = total
        timings["wbits"] = wbits
        timings["dev_decompress"] = dev_decompress
        timings["dev_combine"] = dev_combine
    if dev_combine:
        return bool(int(flag))
    if int(packed[0, 0, -1]) == 0:  # invalid point encoding in the batch
        return False
    from ..oracle.ristretto import RistrettoPoint
    from .pallas_msm import combine_window_totals
    return RistrettoPoint(
        combine_window_totals(packed[:, :, :-1], wbits)
    ).is_identity()


def batch_verify_device_pipelined(batches, bp_gens, pc_gens, n: int,
                                  entropies=None,
                                  interpret: bool | None = None,
                                  dev_decompress: bool | None = None,
                                  timings: dict | None = None) -> list[bool]:
    """Steady-state serving path: verify a stream of proof batches with the
    host assembly of batch k+1 overlapped against the device execution of
    batch k.  The axon tunnel defers execution to the fetch RPC, which
    blocks in C and releases the GIL, and the assembly is native
    (fused_params_assembly + strobe replay, both GIL-releasing ctypes), so
    one worker thread hides min(host, device) per batch — the fetch itself
    stays on the calling thread (a worker-thread fetch contends with the
    tunnel: docs/ROUND3-NOTES.md).

    batches: list of (proofs, transcripts, value_commitments) tuples.
    entropies: optional per-batch weight entropy (defaults to a counter).
    Returns one bool per batch, identical to batch_verify_device on each.
    """
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from ..oracle.ristretto import RistrettoPoint
    from .pallas_msm import best_wbits, combine_window_totals

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if dev_decompress is None:
        dev_decompress = not interpret
    if entropies is None:
        entropies = [bytes([k % 255 + 1]) * 32 for k in range(len(batches))]

    # ZKVM_PIPE_UPLOAD=1: device_put the next batch's arrays from the prep
    # worker so the ~4 MB upload overlaps the previous batch's execution
    # (the upload is ~100 ms of the device timeline through the tunnel).
    early_upload = os.environ.get("ZKVM_PIPE_UPLOAD", "1") not in (
        "0", "false")

    def prep(k: int):
        proofs, transcripts, vcs = batches[k]
        params, bbB_pp, dyn, m, lg = prepare_batch_inputs(
            proofs, bp_gens, pc_gens, transcripts, vcs, n,
            entropies[k], dev_decompress,
        )
        bbB = sum_bbB(bbB_pp)
        if early_upload:
            params = jax.device_put(jnp.asarray(params))
            dyn = jax.device_put(jnp.asarray(dyn))
            bbB = jax.device_put(jnp.asarray(bbB))
        return params, bbB, dyn, m, lg, len(proofs)

    results: list[bool] = []
    t0 = _time.perf_counter()
    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(prep, 0)
        dev_combine = _use_dev_combine(interpret)
        for k in range(len(batches)):
            params, bbB, dyn, m, lg, nb = fut.result()
            total = 2 + 2 * n * m + nb * (4 + 2 * lg + m)
            wbits = best_wbits(_padded_size(total))
            static_words = static_gens_words(bp_gens, pc_gens, n, m)
            fn = batch_msm_check if dev_combine else batch_msm_totals
            out_dev = fn(
                static_words, jnp.asarray(dyn), jnp.asarray(params),
                jnp.asarray(bbB), n, m, lg, wbits, interpret,
                dev_decompress,
            )
            if k + 1 < len(batches):
                fut = ex.submit(prep, k + 1)
            packed = np.asarray(out_dev)   # fetch = execute on the tunnel
            if dev_combine:
                results.append(bool(int(packed)))
            elif int(packed[0, 0, -1]) == 0:
                results.append(False)
            else:
                results.append(RistrettoPoint(
                    combine_window_totals(packed[:, :, :-1], wbits)
                ).is_identity())
    if timings is not None:
        timings["total_s"] = _time.perf_counter() - t0
        timings["batches"] = len(batches)
    return results
