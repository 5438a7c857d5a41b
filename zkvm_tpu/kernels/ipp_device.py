"""Inner-product-argument CREATE with all vector state resident on device.

Upstream counterpart: bulletproofs/src/inner_product_proof.rs
InnerProductProof::create — per round two (n_k+1)-point MSMs for L/R, then
fold a/b (scalars) and G/H (points).  The point folds are the expensive
part on a CPU (each is a double-scalar mul, ~300 group ops per point); the
round-2 native host path spent ~2.7 s of a 5 s 2^14-multiplier R1CS prove
inside them.

TPU-native redesign — NO point folds at all:

  * G/H stay in ORIGINAL index space on device for the whole argument.
    A folded point G^(k)[j] is a linear combination of original points, so
    each round's L/R become MSMs over the ORIGINAL generators with
    synthesized coefficients:  coef_i = gcoef_i · a-value_i · mask_i,
    where gcoef_i = Π_r u_r^{±1} accumulates the fold challenges exactly
    like the verifier's s-vector.  Work drops from Θ(n·256) group ops of
    fold chains to Θ(n·lg n) bucket adds of MSMs.
  * a/b and the g/h coefficient vectors live as mod-ℓ limb arrays
    (kernels/scalarmod.py) in replicated original-index form, folded with
    where-masks — so ONE jitted round step serves every round (the fold
    boundary `bit` is a traced scalar, not a shape).
  * Per round the host does only: fetch one packed (2,4,20,nw) array,
    Horner-combine + compress L/R (native), transcript append, draw u,
    one inversion, upload 64 bytes.

Bit-exactness: the emitted L/R bytes and final a/b match
InnerProductProof.create on the same transcript state exactly
(tests/test_ipp_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import L, NLIMBS
from . import scalarmod as sm
from .pallas_msm import (
    best_wbits, combine_window_totals, decode_words_lm, identity_lm,
    point_words, window_totals,
)
from .point import PointBatch


def _msm_padded_size(total: int) -> int:
    from .pallas_msm import padded_msm_size
    return padded_msm_size(total)


@functools.partial(jax.jit, static_argnums=(0, 1, 10))
def _ipp_round(n: int, wbits: int,
               gh_words: jnp.ndarray,    # (4, 8, 2n+1): G ++ H ++ Q, resident
               arep: jnp.ndarray,        # (n, 20) replicated a^(k)
               brep: jnp.ndarray,
               gcoef: jnp.ndarray,       # (n, 20) accumulated G coefficients
               hcoef: jnp.ndarray,
               fold_u: jnp.ndarray,      # (2, 8) u32: [u, u_inv] words
               fold_bit: jnp.ndarray,    # int32 scalar: previous round's n_k/2
               bit: jnp.ndarray,         # int32 scalar: THIS round's n_k/2
               interpret: bool = False):
    """One argument round: (optionally) fold with the previous challenge,
    then emit this round's L/R window totals.  Returns
    (arep', brep', gcoef', hcoef', packed (2, 4, NLIMBS, nw) totals)."""
    iota = jnp.arange(n, dtype=jnp.int32)
    one = jnp.zeros((NLIMBS,), jnp.int32).at[0].set(1)

    # ---- fold with the previous round's challenge (no-op when fold_bit==0)
    u_l = sm.decode_words_last(fold_u)          # (2, 20)
    u, u_inv = u_l[0], u_l[1]
    idx0 = iota - (iota & fold_bit)             # index with fold bit cleared
    idx1 = iota | fold_bit
    a0, a1 = jnp.take(arep, idx0, axis=0), jnp.take(arep, idx1, axis=0)
    b0, b1 = jnp.take(brep, idx0, axis=0), jnp.take(brep, idx1, axis=0)
    hi = ((iota & fold_bit) != 0)[:, None]
    do = (fold_bit != 0)
    arep = jnp.where(do, sm.add(sm.mul(a0, u), sm.mul(a1, u_inv)), arep)
    brep = jnp.where(do, sm.add(sm.mul(b0, u_inv), sm.mul(b1, u)), brep)
    gf = jnp.where(hi, u, u_inv)                # G_R picks u, G_L picks 1/u
    hf = jnp.where(hi, u_inv, u)
    gcoef = jnp.where(do, sm.mul(gcoef, gf), gcoef)
    hcoef = jnp.where(do, sm.mul(hcoef, hf), hcoef)

    # ---- this round's L/R coefficients in original index space
    i0 = iota - (iota & bit)
    i1 = iota | bit
    A0, A1 = jnp.take(arep, i0, axis=0), jnp.take(arep, i1, axis=0)
    B0, B1 = jnp.take(brep, i0, axis=0), jnp.take(brep, i1, axis=0)
    sel_hi = ((iota & bit) != 0)[:, None]       # original index in the R half
    zero = jnp.zeros_like(arep)

    #   L = <a_L, G_R> + <b_R, H_L> + c_L Q
    coefL_G = jnp.where(sel_hi, sm.mul(gcoef, A0), zero)
    coefL_H = jnp.where(sel_hi, zero, sm.mul(hcoef, B1))
    #   R = <a_R, G_L> + <b_L, H_R> + c_R Q
    coefR_G = jnp.where(sel_hi, zero, sm.mul(gcoef, A1))
    coefR_H = jnp.where(sel_hi, sm.mul(hcoef, B0), zero)

    # c_L = <a_L, b_R>, c_R = <a_R, b_L> over the current (masked) halves
    lo_mask = (iota < bit)[:, None]
    c_L = sm.accumulate(jnp.where(lo_mask, sm.mul(arep, B1), zero), axis=0)
    c_R = sm.accumulate(jnp.where(lo_mask, sm.mul(A1, brep), zero), axis=0)

    # ---- two MSMs over the resident generators, one fetch
    size = _msm_padded_size(2 * n + 1)
    pts = PointBatch(*(decode_words_lm(gh_words[c]) for c in range(4)))
    ident = identity_lm((size - (2 * n + 1),))
    pts = PointBatch(
        jnp.concatenate([pts.x, ident.x], axis=1),
        jnp.concatenate([pts.y, ident.y], axis=1),
        jnp.concatenate([pts.z, ident.z], axis=1),
        jnp.concatenate([pts.t, ident.t], axis=1),
    )

    def msm_totals(cg, ch, cq):
        scalars = jnp.concatenate([cg, ch, cq[None]], axis=0)
        if wbits == 13:
            digits = sm.signed_digits13(scalars)
        else:
            from .msm import num_windows
            from .pallas_msm import recode_digits_device
            words = sm.digits_to_words(sm.partial_reduce_digits(scalars))
            digits = recode_digits_device(words.T, wbits,
                                          num_windows(wbits))
        digits = jnp.pad(digits, [(0, size - digits.shape[0]), (0, 0)])
        t = window_totals(pts, digits, wbits, interpret)
        return jnp.stack([t.x, t.y, t.z, t.t])

    packed = jnp.stack([
        msm_totals(coefL_G, coefL_H, c_L),
        msm_totals(coefR_G, coefR_H, c_R),
    ])
    return arep, brep, gcoef, hcoef, packed


def _scalar_words(x: int) -> np.ndarray:
    return np.frombuffer(int(x % L).to_bytes(32, "little"), np.uint32)


def device_ipp_create(transcript, Q, G_factors, H_factors, G, H, a, b,
                      interpret: bool | None = None):
    """Drop-in device twin of InnerProductProof.create: same arguments,
    same transcript mutations, bit-identical proof bytes."""
    from ..oracle.ristretto import RistrettoPoint, compress_batch
    from ..proofs.ipp import InnerProductProof
    from .limbs import ints_to_limbs, limbs_to_int

    n = len(G)
    assert n & (n - 1) == 0 and n > 1
    lg_n = n.bit_length() - 1
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    transcript.innerproduct_domain_sep(n)

    # resident generator block: G ++ H ++ Q as canonical words
    gh = np.empty((2 * n + 1, 4, 8), np.uint32)
    for i, p in enumerate(list(G) + list(H)):
        w = getattr(p, "_words", None)
        gh[i] = w if w is not None else point_words(p.ep)
    gh[2 * n] = point_words(Q.ep)
    gh_words = jnp.asarray(np.ascontiguousarray(gh.transpose(1, 2, 0)))

    arep = jnp.asarray(ints_to_limbs([x % L for x in a]))
    brep = jnp.asarray(ints_to_limbs([x % L for x in b]))
    gcoef = jnp.asarray(ints_to_limbs([int(x) % L for x in G_factors]))
    hcoef = jnp.asarray(ints_to_limbs([int(x) % L for x in H_factors]))

    wbits = best_wbits(_msm_padded_size(2 * n + 1))

    L_vec, R_vec = [], []
    fold_u = np.zeros((2, 8), np.uint32)
    fold_bit = 0
    bit = n // 2
    while bit >= 1:
        arep, brep, gcoef, hcoef, packed = _ipp_round(
            n, wbits, gh_words, arep, brep, gcoef, hcoef,
            jnp.asarray(fold_u), jnp.int32(fold_bit), jnp.int32(bit),
            interpret,
        )
        totals = np.asarray(packed)              # ONE fetch per round
        Lp = combine_window_totals(totals[0], wbits)
        Rp = combine_window_totals(totals[1], wbits)
        Lb, Rb = compress_batch([Lp, Rp])
        L_vec.append(Lb)
        R_vec.append(Rb)
        transcript.append_point(b"L", Lb)
        transcript.append_point(b"R", Rb)
        u = transcript.challenge_scalar(b"u")
        from ..oracle import scalar
        u_inv = scalar.invert(u)
        fold_u = np.stack([_scalar_words(u), _scalar_words(u_inv)])
        fold_bit, bit = bit, bit // 2

    # final fold (bit = 0 round only folds, no L/R needed): do it on host
    a_fin = [limbs_to_int(r) % L for r in np.asarray(arep[:2])]
    b_fin = [limbs_to_int(r) % L for r in np.asarray(brep[:2])]
    u = int.from_bytes(fold_u[0].tobytes(), "little")
    u_inv = int.from_bytes(fold_u[1].tobytes(), "little")
    a0 = (a_fin[0] * u + u_inv * a_fin[1]) % L
    b0 = (b_fin[0] * u_inv + u * b_fin[1]) % L
    return InnerProductProof(L_vec, R_vec, a0, b0)
