#!/usr/bin/env python
"""Split bench/msm_stages.py's stage A (sort + gather + cneg, 57.3 ms of the
120 ms 2^16 MSM on chip, 2026-08-18) into its parts, plus two candidate
layouts for the permute-gather:

  a1  sort_key_val only
  a2  sign take_along_axis only
  a3  4x limb-major coordinate gathers (current: (NLIMBS, n) take axis=1)
  a4  cneg only
  a5  stacked gather: one (4*NLIMBS, n) take instead of four
  a6  words gather: points held as (n, 32) u32 rows (128 contiguous
      B/point), rows gathered, then decoded to limbs post-gather
      (decode_words_lm is lane-local VPU work; gather traffic drops 2.5x)

Whichever wins becomes the window_totals front end.
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MS_PLATFORM"):  # the axon plugin ignores JAX_PLATFORMS
    jax.config.update("jax_platforms", os.environ["MS_PLATFORM"])

import jax.numpy as jnp

from zkvm_tpu.constants import L, NLIMBS
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle.ristretto import RistrettoPoint

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
WBITS = int(os.environ.get("MS_WBITS", "13"))


def timed(fn, *args, iters=3):
    reduced = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y, jax.tree.map(jnp.sum, fn(*a))))
    np.asarray(reduced(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(reduced(*args))
        best = min(best, time.time() - t0)
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
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} w={wbits} "
          f"nw={nw}", flush=True)

    def sort_only(digits):
        dT = digits.T
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
        return jax.lax.sort_key_val(jnp.abs(dT), idx, dimension=1)

    t = timed(sort_only, digits)
    print(f"a1 sort_key_val           {t*1e3:8.1f} ms", flush=True)

    sorted_key, perm = jax.jit(sort_only)(digits)

    t = timed(lambda d, p: jnp.take_along_axis(d.T < 0, p, axis=1),
              digits, perm)
    print(f"a2 sign gather            {t*1e3:8.1f} ms", flush=True)

    def gather4(points, perm):
        return pm.PointBatch(
            jnp.take(points.x, perm, axis=1),
            jnp.take(points.y, perm, axis=1),
            jnp.take(points.z, perm, axis=1),
            jnp.take(points.t, perm, axis=1),
        )

    t = timed(gather4, pts, perm)
    print(f"a3 4x limb-major gather   {t*1e3:8.1f} ms", flush=True)

    spts = jax.jit(gather4)(pts, perm)
    sign = jnp.asarray(np.asarray(
        jax.jit(lambda d, p: jnp.take_along_axis(d.T < 0, p, axis=1))(
            digits, perm)))

    t = timed(lambda s, sg: pm.cneg_lm(s, sg), spts, sign)
    print(f"a4 cneg                   {t*1e3:8.1f} ms", flush=True)

    stacked = jnp.concatenate([pts.x, pts.y, pts.z, pts.t], axis=0)

    t = timed(lambda s, p: jnp.take(s, p, axis=1), stacked, perm)
    print(f"a5 stacked (80,n) gather  {t*1e3:8.1f} ms", flush=True)

    # words layout: (n, 32) u32 rows; gather rows then decode post-gather
    rw = np.empty((n, 32), np.uint32)
    words256 = np.stack([pm.point_words(p) for p in base])  # (256, 4, 8)
    rw[:] = np.tile(words256.reshape(256, 32), (reps, 1))
    rows = jnp.asarray(rw)

    def words_gather(rows, perm):
        g = jnp.take(rows, perm.reshape(-1), axis=0)       # (nw*n, 32)
        g = g.reshape(nw, n, 32).transpose(2, 0, 1)        # (32, nw, n)
        return pm.PointBatch(*(
            pm.decode_words_lm(g[8 * i: 8 * i + 8].reshape(8, -1)).reshape(
                NLIMBS, nw, n)
            for i in range(4)
        ))

    t = timed(words_gather, rows, perm)
    print(f"a6 words gather+decode    {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
