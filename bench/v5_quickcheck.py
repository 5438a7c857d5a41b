#!/usr/bin/env python
"""Round-5 quick on-chip check of the v5 Pallas stages after the
sublane-alignment fix (rb/cb must be 1 or a multiple of 8): parity vs
numpy + timing for sort_rows_device and gather_rows_words at real sizes.
Pallas-only compiles — cheap next to the 500 s full-graph XLA compiles.

Run: MS_LOG_N=16 python bench/v5_quickcheck.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from zkvm_tpu.kernels import pallas_msm as pm

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
ITERS = int(os.environ.get("MS_ITERS", "3"))


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    # full fetch is the real fence on the axon tunnel
    np.asarray(jax.tree.leaves(out)[0])
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(ITERS):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f"{name:40s} {best*1e3:9.1f} ms (compile {compile_s:.0f}s)",
          flush=True)
    return out


def main():
    n, nw = 1 << LOG_N, 20
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} nw={nw}",
          flush=True)
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**31 - 1, size=(nw, n), dtype=np.int32)
    xj = jnp.asarray(x)

    sort_j = jax.jit(lambda a: pm.sort_rows_device(a, False))
    out = timed("sort_rows_device (bitonic)", sort_j, xj)
    want = np.sort(x, axis=1)
    got = np.asarray(out)
    assert got.shape == want.shape and (got == want).all(), "sort parity"
    print("sort parity OK", flush=True)

    S = 32
    src = rng.integers(0, 2**31 - 1, size=(S, n), dtype=np.int32)
    perm = np.stack([rng.permutation(n).astype(np.int32)
                     for _ in range(nw)])
    srcj, permj = jnp.asarray(src), jnp.asarray(perm)
    gat_j = jax.jit(lambda s, p: pm.gather_rows_words(s, p, False))
    out = timed("gather_rows_words", gat_j, srcj, permj)
    got = np.asarray(out)
    want = src[:, perm].transpose(1, 0, 2)  # (nw, S, n)
    assert (got == want).all(), "gather parity"
    print("gather parity OK", flush=True)

    # XLA comparators on the same shapes for the A/B
    shift = max(n - 1, 1).bit_length()
    packed = jnp.asarray(
        (x.astype(np.int64) % (1 << (30 - shift)) << shift
         | np.arange(n, dtype=np.int64)).astype(np.int32))
    timed("XLA sort (same shape)",
          jax.jit(lambda a: jax.lax.sort(a, dimension=1)), xj)
    stacked = jnp.asarray(
        rng.integers(0, 2**31 - 1, size=(80, n), dtype=np.int32))
    M = pm.SEQ_LANES
    K = n // M
    perm_l = jnp.asarray(perm.reshape(nw, M, K).transpose(0, 2, 1))
    timed("XLA stacked limb gather (80 rows)",
          jax.jit(lambda s, p: jnp.take(s, p, axis=1)), stacked, perm_l)


if __name__ == "__main__":
    main()
