#!/usr/bin/env python
"""Round-4 probe #2: scatter replacements and scan-tile scaling at 2^16.

  p1  int32-only scatter (posmap+hit, 4 B/slot) — placement cost floor
  p2  searchsorted(cumsum(is_end)) — scatter-free compaction alternative
  p3  seq scan, SCAN_TILE=512 (wider tiles: latency-bound adds -> 4x lanes)
  p4  seq scan, SCAN_TILE=1024, SEQ_BLOCK=4
  p5  dense weighted fold alone (current Pallas fold)
  p6  full-array transpose of scanned (limb-major -> row-major)
  p7  row gather of nbuckets tails from transposed scanned
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

import jax.numpy as jnp

from zkvm_tpu.constants import L, NLIMBS
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
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
    print(f"{name:38s} {best*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return best


def main():
    n = 1 << LOG_N
    wbits = WBITS
    nbuckets = 1 << (wbits - 1)
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
    packed = (jnp.abs(dT) << shift) | jnp.arange(n, dtype=jnp.int32)
    sp = jax.jit(lambda p: jax.lax.sort(p, dimension=1))(packed)
    perm = sp & ((1 << shift) - 1)
    sorted_key = sp >> shift
    changed = sorted_key[:, 1:] != sorted_key[:, :-1]
    ones = jnp.ones((nw, 1), jnp.bool_)
    is_end = jnp.concatenate([changed, ones], axis=1)
    stride = nbuckets + 2

    def p1_int_scatter(sorted_key, is_end):
        target = jnp.where(is_end, sorted_key, nbuckets + 1)
        flat_target = (jax.lax.broadcasted_iota(
            jnp.int32, (nw, n), 0) * stride + target).reshape(-1)
        srcpos = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32), (nw, n)).reshape(-1)
        posmap = jnp.zeros((nw * stride,), jnp.int32).at[flat_target].set(
            srcpos)
        return posmap

    timed("p1 int32 scatter (posmap)", p1_int_scatter, sorted_key, is_end)

    def p2_searchsorted(is_end):
        ends = jnp.cumsum(is_end.astype(jnp.int32), axis=1)  # (nw, n)
        want = jnp.arange(1, nbuckets + 1, dtype=jnp.int32)

        def per_row(row):
            return jnp.searchsorted(row, want, side="left")

        return jax.vmap(per_row)(ends)  # (nw, nbuckets) tail positions

    timed("p2 cumsum+searchsorted", p2_searchsorted, is_end)

    # scan tiles: rebuild the kernel with different tile params by
    # monkeypatching module constants (they are read at trace time)
    scanned_in = pm.PointBatch(
        jnp.tile(pts.x[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.y[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.z[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.t[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
    )

    def lr(a):
        return a.reshape(nw, M, K).transpose(0, 2, 1)

    start_l = lr(jnp.concatenate([ones, changed], axis=1)).astype(jnp.int32)

    for tile, sb in ((256, 8), (512, 8), (512, 4)):
        old_t, old_b = pm.SCAN_TILE, pm.SEQ_BLOCK
        pm.SCAN_TILE, pm.SEQ_BLOCK = tile, sb
        try:
            timed(f"p3 seq scan TILE={tile} SB={sb}",
                  lambda s, f: pm._seq_segmented_scan(s, f[None], False),
                  scanned_in, start_l)
        except Exception as e:  # noqa: BLE001
            print(f"p3 TILE={tile} SB={sb} FAILED: {str(e)[:120]}",
                  flush=True)
        finally:
            pm.SCAN_TILE, pm.SEQ_BLOCK = old_t, old_b

    # p5: dense fold alone
    buckets = pm.PointBatch(
        jnp.tile(pts.x[:, :nbuckets, None], (1, 1, 1)).reshape(
            NLIMBS, 1, nbuckets).repeat(nw, axis=1),
        jnp.tile(pts.y[:, :nbuckets, None], (1, 1, 1)).reshape(
            NLIMBS, 1, nbuckets).repeat(nw, axis=1),
        jnp.tile(pts.z[:, :nbuckets, None], (1, 1, 1)).reshape(
            NLIMBS, 1, nbuckets).repeat(nw, axis=1),
        jnp.tile(pts.t[:, :nbuckets, None], (1, 1, 1)).reshape(
            NLIMBS, 1, nbuckets).repeat(nw, axis=1),
    )
    timed("p5 dense weighted fold",
          lambda b: pm._weighted_fold_seq(b, False), buckets)

    # p6: transpose scanned to row-major
    def p6_transpose(s):
        flat = jnp.concatenate(
            [s.x, s.y, s.z, s.t]).reshape(4 * NLIMBS, -1)  # (80, nw*K*M)
        return flat.T.copy()

    timed("p6 transpose scanned -> rows", p6_transpose, scanned_in)

    rows = jax.jit(p6_transpose)(scanned_in)

    def p7_row_gather(rows, posmap):
        idx = posmap.reshape(-1) % (n)  # (nw*nbuckets,) bounded
        base = jnp.arange(nw, dtype=jnp.int32)[:, None] * n
        flat = (posmap.reshape(nw, -1)[:, :nbuckets] % n + base).reshape(-1)
        g = jnp.take(rows, flat, axis=0)  # (nw*nbuckets, 80)
        return g

    posmap = jax.jit(p1_int_scatter)(sorted_key, is_end).reshape(nw, stride)
    timed("p7 row gather tails", p7_row_gather, rows,
          posmap[:, 1:nbuckets + 1])


if __name__ == "__main__":
    main()
