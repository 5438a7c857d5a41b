#!/usr/bin/env python
"""Round-4 probe: per-stage device time of the fused batch-verify pipeline
at nb=4096 (kernels/batch_verify_device.py).  The bench ledger shows device
364 ms at nb=4096 while the bare MSM at the same padded size is ~120 ms —
this isolates where the other ~240 ms goes:

  s1  decompress_points      (Pallas ristretto decode, nb*k raw encodings)
  s2  _synthesize            (on-chip g/h + dyn scalar synthesis)
  s3  signed_digits13        (digit recode of all scalars)
  s4  window_totals          (the Pippenger MSM)
  s5  _combine_check_core    (rolled Horner + identity test)
  s6  full batch_msm_check   (reference: everything in one dispatch)

Run on the real chip: python bench/fused_stage_probe.py [nb]
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from zkvm_tpu.constants import L, NLIMBS
from zkvm_tpu.kernels import batch_verify_device as bvd
from zkvm_tpu.kernels import scalarmod as sm
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.rangeproof import RangeProof
from zkvm_tpu.proofs.transcript import ProofTranscript

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = 64


def timed(name, fn, *args, iters=3):
    t0 = time.time()
    red = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y, jax.tree.map(jnp.sum, fn(*a))))
    np.asarray(red(*args))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(red(*args))
        best = min(best, time.time() - t0)
    print(f"{name:28s} {best*1e3:9.1f} ms  (compile {comp:.0f}s)", flush=True)
    return best


def main():
    print(f"platform={jax.devices()[0].platform} nb={NB}", flush=True)
    pc, bp = PedersenGens(), BulletproofGens(N)
    proofs, vcs = [], []
    r = random.Random(9)
    for i in range(NB):
        p, V = RangeProof.prove_single(
            bp, pc, ProofTranscript(b"probe"), r.randrange(1 << N),
            r.randrange(L), N)
        proofs.append(p)
        vcs.append([V])
    transcripts = [ProofTranscript(b"probe") for _ in range(NB)]
    params, bbB_pp, dyn_words, m, lg = bvd.prepare_batch_inputs(
        proofs, bp, pc, transcripts, vcs, N, b"\x01" * 32, True)
    bbB = bvd.sum_bbB(bbB_pp)
    static_words = bvd.static_gens_words(bp, pc, N, m)
    from zkvm_tpu.kernels.pallas_msm import (
        _combine_check_core, best_wbits, identity_lm, recode_digits_device,
        window_totals)
    from zkvm_tpu.kernels.pallas_decompress import decompress_points

    nm = N * m
    k = 4 + 2 * lg + m
    total = 2 + 2 * nm + NB * k
    wbits = best_wbits(bvd._padded_size(total))
    print(f"msm size {total} padded {bvd._padded_size(total)} w={wbits}",
          flush=True)

    dyn_j = jnp.asarray(dyn_words)
    params_j = jnp.asarray(params)
    bbB_j = jnp.asarray(bbB)

    # s1 decompress
    timed("s1 decompress", lambda w: decompress_points(w, False)[0], dyn_j)

    # s2 synthesis
    if not os.environ.get("FSP_SKIP_LAST"):
        def synth(p):
            return bvd._synthesize(sm.decode_words_last(p), N, m, lg)
        timed("s2 synthesize (limbs-last)", synth, params_j)

    def synth_lm(p):
        return bvd._synthesize_lm(p, N, m, lg)
    timed("s2b synthesize (limb-major)", synth_lm, params_j)

    # s3 digits over all scalars
    def digits_of(p, bw):
        par = sm.decode_words_last(p)
        gh, dyn_sc = bvd._synthesize(par, N, m, lg)
        bbBl = sm.decode_words_last(bw)
        scalars = jnp.concatenate(
            [bbBl, gh, dyn_sc.reshape(-1, NLIMBS)], axis=0)
        if wbits == 13:
            return sm.signed_digits13(scalars)
        from zkvm_tpu.kernels.msm import num_windows
        words = sm.digits_to_words(sm.partial_reduce_digits(scalars))
        return recode_digits_device(words.T, wbits, num_windows(wbits))
    timed("s3 synth+digits", digits_of, params_j, bbB_j)

    # s4 MSM alone on pre-decoded points + precomputed digits
    coords, _ok = jax.jit(
        lambda w: decompress_points(w, False))(dyn_j)
    from zkvm_tpu.kernels.pallas_msm import decode_words_lm
    pts = jax.jit(lambda sw, c: tuple(
        jnp.concatenate([decode_words_lm(sw[i]), c[i]], axis=1)
        for i in range(4)))(static_words, coords)
    from zkvm_tpu.kernels.point import PointBatch
    pts = PointBatch(*pts)
    digits = jax.jit(digits_of)(params_j, bbB_j)
    size = bvd._padded_size(total)
    if size != total:
        pad = size - total
        ident = identity_lm((pad,))
        pts = PointBatch(
            jnp.concatenate([pts.x, ident.x], axis=1),
            jnp.concatenate([pts.y, ident.y], axis=1),
            jnp.concatenate([pts.z, ident.z], axis=1),
            jnp.concatenate([pts.t, ident.t], axis=1))
        digits = jnp.pad(np.asarray(digits), [(0, pad), (0, 0)])
        digits = jnp.asarray(digits)

    def msm_only(p_x, p_y, p_z, p_t, d):
        t = window_totals(PointBatch(p_x, p_y, p_z, p_t), d, wbits, False)
        return jnp.stack([t.x, t.y, t.z, t.t])
    timed("s4 msm (window_totals)", msm_only,
          pts.x, pts.y, pts.z, pts.t, digits)

    packed = jax.jit(msm_only)(pts.x, pts.y, pts.z, pts.t, digits)
    timed("s5 combine+check", lambda pk: _combine_check_core(pk, wbits),
          packed)

    # s6 reference: the full fused dispatch
    def full():
        return bvd.batch_msm_check(
            static_words, dyn_j, params_j, bbB_j, N, m, lg, wbits,
            False, True)
    t0 = time.time()
    np.asarray(full())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(full())
        best = min(best, time.time() - t0)
    print(f"{'s6 full batch_msm_check':28s} {best*1e3:9.1f} ms  "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
