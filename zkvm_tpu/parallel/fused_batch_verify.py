"""Multi-chip fused batch verification: proofs shard over the mesh, every
device runs the round-3 fused pipeline (on-chip scalar synthesis + device
ristretto decode, kernels/batch_verify_device.py) on its sub-batch, and the
per-shard window totals Edwards-add into the combined mega-check — an MSM
is a sum, so sharding the proof axis commutes with the random-linear-
combination batching (SURVEY §2.9 P3 × P5; BASELINE config 4).

The static generator block is replicated (it is the same [Bb,B]+G+H on
every chip — upstream keeps one copy per process, generators.rs); only the
per-proof params/dyn encodings shard.  The cross-shard combine is lg(ndev)
traced Edwards adds on (4, NLIMBS, nw) totals — a few KB over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import NLIMBS
from ..kernels.batch_verify_device import (
    _padded_size, _totals_core, prepare_batch_inputs, static_gens_words,
    sum_bbB,
)


def sharded_totals_fn(mesh: Mesh, n: int, m: int, lg: int, wbits: int,
                      dev_decompress: bool, interpret: bool,
                      dev_combine: bool = False):
    """Build the jitted sharded fused-verify step.  Inputs shard the proof
    axis over ALL mesh axes; output (4, NLIMBS, nw+1) totals replicated —
    or, with dev_combine, a single replicated int32 flag (the window
    combine + identity test run on device after the cross-shard fold, so
    nothing but one scalar crosses back to the host; VERDICT r3 #3)."""
    import numpy as _np

    from ..constants import EDWARDS_D2
    from ..kernels import pallas_msm as pm
    from ..kernels.limbs import int_to_limbs

    axes = tuple(mesh.axis_names)
    d2col = jnp.asarray(int_to_limbs(EDWARDS_D2)[:, None].astype(_np.int32))

    # dyn encodings are (8, D) in dev_decompress mode, (4, 8, D) otherwise;
    # the proof-point axis D is always last
    dyn_spec = P(*(((None,) * (1 if dev_decompress else 2)) + (axes,)))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), dyn_spec, P(axes), P(axes)),
        out_specs=P(),
        check_vma=False,
    )
    def _sharded(static_words, dyn_words, params, bbB_pp):
        # per-shard fused totals over this shard's proofs; every shard's
        # bbB contribution enters through its own [Bb, B] scalar rows
        bbB = _shard_bbB(bbB_pp)
        local = _totals_core(static_words, dyn_words, params, bbB,
                             n, m, lg, wbits, interpret, dev_decompress)
        g = jax.lax.all_gather(local, axes)     # (ndev, 4, NLIMBS, nw+1)
        ok = jnp.min(g[:, 0, 0, -1])
        t = g[:, :, :, :-1]                     # totals sans flag column
        t = jnp.moveaxis(t, 2, 1)               # (ndev, NLIMBS, 4, nw)
        # non-pow2 device counts: pad the gathered totals with identity
        # points (x=0, y=1, z=1, t=0) up to the next power of two so the
        # halving tree combine below stays shape-static
        pad = (1 << max(t.shape[0] - 1, 1).bit_length()) - t.shape[0]
        if pad:
            one = jnp.asarray(int_to_limbs(1).astype(_np.int32))
            zero_pl = jnp.zeros((pad, NLIMBS, 1, t.shape[3]), t.dtype)
            one_pl = jnp.broadcast_to(
                one[None, :, None, None],
                (pad, NLIMBS, 1, t.shape[3])).astype(t.dtype)
            ident = jnp.concatenate(
                [zero_pl, one_pl, one_pl, zero_pl], axis=2)
            t = jnp.concatenate([t, ident], axis=0)
        d2 = d2col[:, None, :]
        while t.shape[0] > 1:
            h = t.shape[0] // 2
            a, b = t[:h], t[h:]

            def coords(v):
                return tuple(jnp.moveaxis(v[:, :, i, :], 0, 1)
                             for i in range(4))

            s = pm._add_formula(coords(a), coords(b), d2)
            t = jnp.moveaxis(jnp.stack(s, axis=2), 1, 0)
        out = jnp.moveaxis(t[0], 0, 1)          # (4, NLIMBS, nw)
        if dev_combine:
            from ..kernels.pallas_msm import _combine_check_core
            ident = _combine_check_core(out, wbits)
            return (ok.astype(jnp.int32) & ident).reshape(1)
        okp = jnp.broadcast_to(ok, (4, NLIMBS, 1)).astype(jnp.int32)
        return jnp.concatenate([out, okp], axis=2)

    def _shard_bbB(bbB_pp):
        # sum this shard's per-proof weighted [Bb, B] scalars mod ℓ on
        # device (a tiny scalarmod reduction)
        from ..kernels import scalarmod as sm
        limbs = sm.decode_words_last(bbB_pp)          # (nb_l, 2, 20)
        acc = sm.accumulate(limbs, axis=0)            # (2, 20)
        d = sm.partial_reduce_digits(acc)
        return sm.digits_to_words(d).astype(jnp.uint32)

    return jax.jit(_sharded)


def sharded_batch_verify(mesh: Mesh, proofs, bp_gens, pc_gens, transcripts,
                         value_commitments, n: int,
                         entropy: bytes = b"\x01" * 32,
                         dev_decompress: bool | None = None,
                         interpret: bool | None = None) -> bool:
    """Batched rangeproof verification sharded across the mesh.  Host
    assembly is identical to the single-chip fused path.  Batches that do
    not divide the device count are padded by re-verifying a prefix of the
    batch (each pad slot draws its own RLC weight, so duplicates neither
    mask a bad proof nor admit a forged one)."""
    from ..kernels.pallas_msm import best_wbits, combine_window_totals
    from ..oracle.ristretto import RistrettoPoint

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if dev_decompress is None:
        dev_decompress = not interpret

    ndev = mesh.devices.size
    nb = len(proofs)
    if nb % ndev:
        npad = ndev - nb % ndev
        proofs = list(proofs) + [proofs[i % nb] for i in range(npad)]
        transcripts = list(transcripts) + [
            transcripts[i % nb].clone() for i in range(npad)]
        value_commitments = list(value_commitments) + [
            value_commitments[i % nb] for i in range(npad)]
        nb += npad

    params, bbB_pp, dyn_words, m, lg = prepare_batch_inputs(
        proofs, bp_gens, pc_gens, transcripts, value_commitments, n,
        entropy, dev_decompress,
    )
    static_words = static_gens_words(bp_gens, pc_gens, n, m)
    # per-shard MSM size governs the window choice
    shard_total = 2 + 2 * n * m + (nb // ndev) * (4 + 2 * lg + m)
    wbits = best_wbits(_padded_size(shard_total))

    from ..kernels.batch_verify_device import _use_dev_combine
    dev_combine = _use_dev_combine(interpret)
    fn = sharded_totals_fn(mesh, n, m, lg, wbits, dev_decompress, interpret,
                           dev_combine)
    packed = np.asarray(fn(
        static_words, jnp.asarray(dyn_words), jnp.asarray(params),
        jnp.asarray(bbB_pp),
    ))
    if dev_combine:
        return bool(int(packed[0]))
    if int(packed[0, 0, -1]) == 0:
        return False
    return RistrettoPoint(
        combine_window_totals(packed[:, :, :-1], wbits)
    ).is_identity()
