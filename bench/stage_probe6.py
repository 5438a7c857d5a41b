#!/usr/bin/env python
"""Incremental-graph bisection of the v3 seq pipeline at 2^16 w=13: each
stage jits the pipeline PREFIX (sum-reduced output) so the regression vs
the 118 ms v1 shows up between two prefixes.  One process, shared data."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MS_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MS_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import random

import jax.numpy as jnp

from zkvm_tpu.constants import L, NLIMBS
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.kernels.point import PointBatch
from zkvm_tpu.oracle.ristretto import RistrettoPoint

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
WBITS = int(os.environ.get("MS_WBITS", "13"))


def timed(name, fn, *args, iters=3):
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
    print(f"{name:30s} {best*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)


def main():
    n = 1 << LOG_N
    wbits = WBITS
    nbuckets = 1 << (wbits - 1)
    r = random.Random(42)
    base = [RistrettoPoint.from_uniform_bytes(
        r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(256)]
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = PointBatch(
        jnp.tile(pb.x, (1, reps)), jnp.tile(pb.y, (1, reps)),
        jnp.tile(pb.z, (1, reps)), jnp.tile(pb.t, (1, reps)),
    )
    scalars = [r.randrange(L) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, wbits))
    nw = digits.shape[1]
    M = pm.SEQ_LANES
    K = n // M
    stride = nbuckets + 2
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} w={wbits} "
          f"nw={nw} M={M} K={K} SCAN_TILE={pm.SCAN_TILE}", flush=True)

    stacked_in = jnp.concatenate([pts.x, pts.y, pts.z, pts.t])

    def prefix(depth):
        def fn(stacked, dT):
            nwg = dT.shape[0]
            shift = max(n - 1, 1).bit_length()
            packed = (jnp.abs(dT) << shift) | jnp.arange(n, dtype=jnp.int32)
            sp = jax.lax.sort(packed, dimension=1)
            sorted_key = sp >> shift
            perm = sp & ((1 << shift) - 1)
            sorted_sign = jnp.take_along_axis(dT < 0, perm, axis=1)
            changed = sorted_key[:, 1:] != sorted_key[:, :-1]
            ones = jnp.ones((nwg, 1), jnp.bool_)
            start = jnp.concatenate([ones, changed], axis=1)
            is_end = jnp.concatenate([changed, ones], axis=1)

            def lr(a):
                return a.reshape(nwg, M, K).transpose(0, 2, 1)

            perm_l = lr(perm)
            g = jnp.take(stacked, perm_l, axis=1)
            spts = PointBatch(g[:NLIMBS], g[NLIMBS:2 * NLIMBS],
                              g[2 * NLIMBS:3 * NLIMBS], g[3 * NLIMBS:])
            spts = pm.cneg_lm(spts, lr(sorted_sign))
            start_l = lr(start).astype(jnp.int32)
            if depth == 1:
                return spts
            scanned = pm._seq_segmented_scan(spts, start_l[None], False)
            if depth == 2:
                return scanned
            tails = PointBatch(
                scanned.x[:, :, K - 1, :], scanned.y[:, :, K - 1, :],
                scanned.z[:, :, K - 1, :], scanned.t[:, :, K - 1, :])
            tail_flag = jnp.max(start_l, axis=1)
            incoming = pm._lane_scan(tails, tail_flag, False)
            has = jnp.max(start_l, axis=1) > 0
            first = jnp.where(has, jnp.argmax(start_l, axis=1), K)
            e = first - 1
            e_cl = jnp.clip(e, 0, K - 1)
            end_at_e = jnp.take_along_axis(
                lr(is_end).astype(jnp.int32), e_cl[:, None, :], axis=1
            )[:, 0, :]
            need = (e >= 0) & (end_at_e != 0)

            def gather_e(c):
                return jnp.take_along_axis(
                    c, e_cl[None, :, None, :], axis=2)[:, :, 0, :]

            val_e = PointBatch(gather_e(scanned.x), gather_e(scanned.y),
                               gather_e(scanned.z), gather_e(scanned.t))
            fixed = pm.point_add_lm(incoming, val_e, False)
            if depth == 3:
                return fixed
            target = jnp.where(is_end, sorted_key, nbuckets + 1)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (nwg, n), 0)
            flat_target = (w_iota * stride + target).reshape(-1)
            p_iota = jnp.broadcast_to(
                jnp.arange(1, n + 1, dtype=jnp.int32), (nwg, n)).reshape(-1)
            pos1 = jnp.zeros((nwg * stride,), jnp.int32).at[
                flat_target].set(p_iota).reshape(nwg, stride)[
                :, 1: nbuckets + 1]
            hit = pos1 > 0
            posmap = jnp.maximum(pos1 - 1, 0)
            kk, mb = posmap % K, posmap // K
            flat_lane = kk * M + mb
            rows = jnp.concatenate(
                [scanned.x, scanned.y, scanned.z, scanned.t]
            ).reshape(4 * NLIMBS, -1).T
            rows = jax.lax.optimization_barrier(rows)
            wbase = (jnp.arange(nwg, dtype=jnp.int32) * (K * M))[:, None]
            gg = jnp.take(rows, (flat_lane + wbase).reshape(-1), axis=0)
            gg = gg.reshape(nwg, nbuckets, 4 * NLIMBS).transpose(2, 0, 1)
            if depth == 4:
                return gg
            e_b = jnp.take_along_axis(e_cl, mb, axis=1)
            need_b = jnp.take_along_axis(need, mb, axis=1)
            sel_fix = (need_b & (kk == e_b))[None]
            idx3 = jnp.broadcast_to(mb[None], (NLIMBS, nwg, nbuckets))
            ident = pm._identity_planes((nwg, nbuckets))
            sel_hit = hit[None]

            def pick(gc, fc, ic):
                t = jnp.where(
                    sel_fix, jnp.take_along_axis(fc, idx3, axis=2), gc)
                return jnp.where(sel_hit, t, ic)

            buckets = PointBatch(
                pick(gg[:NLIMBS], fixed.x, ident[0]),
                pick(gg[NLIMBS:2 * NLIMBS], fixed.y, ident[1]),
                pick(gg[2 * NLIMBS:3 * NLIMBS], fixed.z, ident[2]),
                pick(gg[3 * NLIMBS:], fixed.t, ident[3]),
            )
            if depth == 5:
                return buckets
            return pm._weighted_fold_seq(buckets, False)
        return fn

    for depth, name in ((1, "1 sort+gather+cneg"),
                        (2, "2 +seq scan"),
                        (3, "3 +lane_scan+fixed"),
                        (4, "4 +compaction gather"),
                        (5, "5 +pick wheres"),
                        (6, "6 +fold (full)")):
        timed(name, prefix(depth), stacked_in, digits.T)


if __name__ == "__main__":
    main()
