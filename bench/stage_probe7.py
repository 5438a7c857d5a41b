#!/usr/bin/env python
"""Round-5 stage probe: A/B the v5 MSM frontend on the real chip
(VERDICT r4 task 2).  Round-4 probe4 measured, at 2^16 w=13 x 20 windows:
XLA sort 31.5 ms, XLA permutation gather 28.8 ms, Pallas scan 6.9 ms of the
71.5 ms total.  This probe measures the replacements:

  s1   XLA packed sort (nw, n)            [round-4 baseline]
  s2   Pallas bitonic sort_rows_device    [new]
  s3   XLA minor-axis stacked limb gather [round-4 baseline]
  s4   Pallas gather_rows_words (+ the lane-run transpose)  [new]
  s5   scan (limbs, old kernel)
  s6   scan-words (in-kernel decode+cneg) [new]
  s7   full window_totals, SORT/GATHER in {xla,pallas}^2 (4 combos)

Run:  MS_LOG_N=16 python bench/stage_probe7.py
Env combos for s7 re-trace via fresh jit cache per combo (module reload
not needed: _use_pallas_stage reads the env at trace time and the combos
use distinct wrapper closures).
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from zkvm_tpu.constants import L, NLIMBS
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle.ristretto import RistrettoPoint

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
WBITS = int(os.environ.get("MS_WBITS", "13"))
ITERS = int(os.environ.get("MS_ITERS", "3"))


def timed(name, fn, *args, iters=ITERS):
    t0 = time.time()
    reduced = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y, jax.tree.map(jnp.sum, fn(*a))))
    np.asarray(reduced(*args))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(reduced(*args))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    n = 1 << LOG_N
    wbits = WBITS
    r = random.Random(42)
    base = [RistrettoPoint.from_uniform_bytes(
        r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(256)]
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = pm.PointBatch(
        jnp.tile(pb.x, (1, reps)), jnp.tile(pb.y, (1, reps)),
        jnp.tile(pb.z, (1, reps)), jnp.tile(pb.t, (1, reps)),
    )
    scalars = [r.randrange(L) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, wbits))
    nw = digits.shape[1]
    M, K = pm.SEQ_LANES, n // pm.SEQ_LANES
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} w={wbits} "
          f"nw={nw} M={M} K={K}", flush=True)

    shift = max(n - 1, 1).bit_length()
    dT = digits.T
    packed = ((jnp.abs(dT) << (shift + 1))
              | ((dT < 0).astype(jnp.int32) << shift)
              | jnp.arange(n, dtype=jnp.int32))

    timed("s1 XLA packed sort", lambda p: jax.lax.sort(p, dimension=1),
          packed)
    timed("s2 Pallas bitonic sort",
          lambda p: pm.sort_rows_device(p, False), packed)

    sp = jax.jit(lambda p: pm.sort_rows_device(p, False))(packed)
    perm = sp & ((1 << shift) - 1)

    stacked = jnp.concatenate([pts.x, pts.y, pts.z, pts.t])  # (80, n)

    def lr(a):
        return a.reshape(nw, M, K).transpose(0, 2, 1)

    perm_l = jax.jit(lr)(perm)

    timed("s3 XLA stacked limb gather",
          lambda s, p: jnp.take(s, p, axis=1), stacked, perm_l)

    src_words = jax.jit(lambda c: jnp.concatenate([
        jax.lax.bitcast_convert_type(
            pm.encode_words_lm(pm.normalize_lm(ci)), jnp.int32)
        for ci in c]))((pts.x, pts.y, pts.z, pts.t))

    def g_words(src, p):
        g = pm.gather_rows_words(src, p, False)
        return jnp.transpose(g.reshape(nw, 32, M, K), (1, 0, 3, 2))

    timed("s4 Pallas words gather + transpose", g_words, src_words, perm)

    # scans: old limb kernel vs words kernel
    gathered = jax.jit(
        lambda s, p: jnp.take(s, p, axis=1))(stacked, perm_l)
    gpts = pm.PointBatch(gathered[:NLIMBS], gathered[NLIMBS:2 * NLIMBS],
                         gathered[2 * NLIMBS:3 * NLIMBS],
                         gathered[3 * NLIMBS:])
    sp_full = jax.jit(lambda p: pm.sort_rows_device(p, False))(packed)
    sorted_key = sp_full >> (shift + 1)
    changed = sorted_key[:, 1:] != sorted_key[:, :-1]
    ones = jnp.ones((nw, 1), jnp.bool_)
    start_l = jax.jit(lr)(
        jnp.concatenate([ones, changed], axis=1)).astype(jnp.int32)

    timed("s5 scan (limbs)",
          lambda g, f: pm._seq_segmented_scan(
              pm.PointBatch(g[:NLIMBS], g[NLIMBS:2 * NLIMBS],
                            g[2 * NLIMBS:3 * NLIMBS], g[3 * NLIMBS:]),
              f[None], False),
          gathered, start_l)

    gw = jax.jit(g_words)(src_words, perm)
    sign_l = jax.jit(lr)(((sp_full >> shift) & 1) != 0)
    flags = jax.jit(lambda s, g: s | (g.astype(jnp.int32) << 1))(
        start_l, sign_l)
    timed("s6 scan-words (decode+cneg in kernel)",
          lambda w, f: pm._seq_segmented_scan_words(w, f[None], False),
          gw, flags)

    # full window_totals combos
    for sort_mode in ("xla", "pallas"):
        for gather_mode in ("xla", "pallas"):
            os.environ["ZKVM_MSM_SORT"] = sort_mode
            os.environ["ZKVM_MSM_GATHER"] = gather_mode

            def wt(p_x, p_y, p_z, p_t, d):
                return pm._bucket_totals_seq(
                    pm.PointBatch(p_x, p_y, p_z, p_t), d, wbits, False)

            timed(f"s7 window_totals sort={sort_mode} gather={gather_mode}",
                  wt, pts.x, pts.y, pts.z, pts.t, digits)


if __name__ == "__main__":
    main()
