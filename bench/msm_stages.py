#!/usr/bin/env python
"""Stage-by-stage timing of the Pallas MSM window_totals pipeline on the
real chip, with each stage jitted separately and outputs reduced on-device
(the axon tunnel has a ~24 ms per-dispatch floor and ~40 MB/s fetch; see
bench/pallas_micro.timed).  Used to locate where the 2^16 MSM's ~500 ms
actually goes (the point-add kernels themselves sustain >200 Madd/s in
chains, so the bucket pipeline structure is the suspect)."""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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
    nbuckets = 1 << (wbits - 1)
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} w={wbits} "
          f"nw={nw}", flush=True)

    # stage A: sort + permute-gather + cneg + flags
    def stage_a(points, digits):
        dT = digits.T
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
        sorted_key, perm = jax.lax.sort_key_val(jnp.abs(dT), idx, dimension=1)
        sorted_sign = jnp.take_along_axis(dT < 0, perm, axis=1)
        spts = pm.PointBatch(
            jnp.take(points.x, perm, axis=1),
            jnp.take(points.y, perm, axis=1),
            jnp.take(points.z, perm, axis=1),
            jnp.take(points.t, perm, axis=1),
        )
        spts = pm.cneg_lm(spts, sorted_sign)
        return spts, sorted_key

    t = timed(stage_a, pts, digits)
    print(f"A sort+gather+cneg        {t*1e3:8.1f} ms", flush=True)

    spts, sorted_key = jax.jit(stage_a)(pts, digits)
    ones = jnp.ones((1, nw, 1), jnp.int32)
    changed = (sorted_key[:, 1:] != sorted_key[:, :-1])[None].astype(jnp.int32)
    start = jnp.concatenate([ones, changed], axis=2)

    # stage B: the segmented associative scan
    def stage_b(spts, start):
        def combine(a, b):
            (ap, af), (bp, bf) = a, b
            return pm.seg_combine_lm(ap, bp, bf, False), af | bf
        scanned, _ = jax.lax.associative_scan(combine, (spts, start), axis=2)
        return scanned

    t = timed(stage_b, spts, start)
    print(f"B segmented scan          {t*1e3:8.1f} ms", flush=True)

    scanned = jax.jit(stage_b)(spts, start)

    # stage C: scatter into buckets + weighted suffix fold
    def stage_c(scanned, sorted_key):
        is_end = jnp.concatenate(
            [changed[0], jnp.ones((nw, 1), jnp.int32)], axis=1)
        stride = nbuckets + 2
        target = jnp.where(is_end != 0, sorted_key, nbuckets + 1)
        window_ids = jax.lax.broadcasted_iota(jnp.int32, (nw, n), 0)
        flat_target = (window_ids * stride + target).reshape(-1)
        buckets = pm.identity_lm((nw * stride,))
        buckets = pm.PointBatch(
            buckets.x.at[:, flat_target].set(scanned.x.reshape(NLIMBS, -1)),
            buckets.y.at[:, flat_target].set(scanned.y.reshape(NLIMBS, -1)),
            buckets.z.at[:, flat_target].set(scanned.z.reshape(NLIMBS, -1)),
            buckets.t.at[:, flat_target].set(scanned.t.reshape(NLIMBS, -1)),
        )
        buckets = pm.PointBatch(
            buckets.x.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
            buckets.y.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
            buckets.z.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
            buckets.t.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
        )
        rev = pm.PointBatch(
            buckets.x[:, :, ::-1], buckets.y[:, :, ::-1],
            buckets.z[:, :, ::-1], buckets.t[:, :, ::-1],
        )
        suffix = jax.lax.associative_scan(
            lambda a, b: pm.point_add_lm(a, b, False), rev, axis=2)
        m = nbuckets
        while m > 1:
            m //= 2
            lo = pm.PointBatch(suffix.x[:, :, :m], suffix.y[:, :, :m],
                               suffix.z[:, :, :m], suffix.t[:, :, :m])
            hi = pm.PointBatch(
                suffix.x[:, :, m: 2 * m], suffix.y[:, :, m: 2 * m],
                suffix.z[:, :, m: 2 * m], suffix.t[:, :, m: 2 * m])
            suffix = pm.point_add_lm(lo, hi, False)
        return pm.PointBatch(suffix.x[:, :, 0], suffix.y[:, :, 0],
                             suffix.z[:, :, 0], suffix.t[:, :, 0])

    t = timed(stage_c, scanned, sorted_key)
    print(f"C scatter+fold            {t*1e3:8.1f} ms", flush=True)

    # whole pipeline for reference
    t = timed(lambda p, d: pm.window_totals(p, d, wbits, False), pts, digits)
    print(f"TOTAL window_totals       {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
