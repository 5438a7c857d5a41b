#!/usr/bin/env python
"""Round-4 stage probe: isolate the sort / gather / scatter costs of the
seq-chunk MSM pipeline at 2^16 w=13 on the real chip and A/B the candidate
replacements (VERDICT r3 #2):

  s1  packed single-operand sort (current front end)
  s2  minor-axis stacked gather (current): (80, n) take axis=1
  s3  row-major limb gather: (n, 80) take axis=0, then transpose back
  s4  row-major u32-word gather: (n, 32) take axis=0 + transpose + device
      limb decode (2.5x less gather traffic)
  s5  point scatter .at[flat].set into bucket slots (current stage C head)
  s6  int-index scatter (4 B/element) + tail point gather (the compaction
      replacement for s5: scatter only int32 positions, gather only the
      <= nbuckets segment tails)
  s7  seq segmented scan alone (the Pallas kernel)
  s8  full current window_totals (reference)
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
    print(f"{name:34s} {best*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
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

    def packed_sort(digits):
        dT = digits.T
        packed = (jnp.abs(dT) << shift) | jnp.arange(n, dtype=jnp.int32)
        sp = jax.lax.sort(packed, dimension=1)
        return sp

    timed("s1 packed sort", packed_sort, digits)

    sp = jax.jit(packed_sort)(digits)
    perm = sp & ((1 << shift) - 1)
    sorted_key = sp >> shift

    stacked = jnp.concatenate([pts.x, pts.y, pts.z, pts.t])  # (80, n)

    def g_minor(stacked, perm):
        return jnp.take(stacked, perm, axis=1)  # (80, nw, n)

    timed("s2 minor-axis gather (current)", g_minor, stacked, perm)

    rows = jax.jit(lambda x: x.T.copy())(stacked)  # (n, 80) relayout, hoisted

    def g_rows(rows, perm):
        g = jnp.take(rows, perm.reshape(-1), axis=0)  # (nw*n, 80)
        return g.reshape(nw, n, 80).transpose(2, 0, 1)

    timed("s3 row gather + transpose", g_rows, rows, perm)

    # u32 words layout: (n, 32) rows
    words = np.empty((n, 32), np.uint32)
    for i, ep in enumerate([base[i % 256] for i in range(n)]):
        words[i] = pm.point_words(ep).reshape(-1)
    wrows = jnp.asarray(words)

    def g_words(wrows, perm):
        g = jnp.take(wrows, perm.reshape(-1), axis=0)  # (nw*n, 32)
        gw = g.reshape(nw, n, 32).transpose(2, 0, 1)   # (32, nw, n)
        coords = [pm.decode_words_lm(gw[8 * c: 8 * c + 8].reshape(8, -1))
                  for c in range(4)]
        return jnp.stack(coords)

    timed("s4 word-row gather + decode", g_words, wrows, perm)

    # stage C head: current point scatter
    scanned = pm.PointBatch(
        jnp.tile(pts.x[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.y[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.z[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
        jnp.tile(pts.t[:, None], (1, nw, 1)).reshape(NLIMBS, nw, K, M),
    )
    changed = sorted_key[:, 1:] != sorted_key[:, :-1]
    ones = jnp.ones((nw, 1), jnp.bool_)
    is_end = jnp.concatenate([changed, ones], axis=1)

    def lr(a):
        return a.reshape(nw, M, K).transpose(0, 2, 1)

    stride = nbuckets + 2

    def s_points(scanned, sorted_key):
        target = jnp.where(is_end, sorted_key, nbuckets + 1)
        window_ids = jax.lax.broadcasted_iota(jnp.int32, (nw, K, M), 0)
        flat_target = (window_ids * stride + lr(target)).reshape(-1)
        buckets = pm.identity_lm((nw * stride,))
        return pm.PointBatch(
            buckets.x.at[:, flat_target].set(scanned.x.reshape(NLIMBS, -1)),
            buckets.y.at[:, flat_target].set(scanned.y.reshape(NLIMBS, -1)),
            buckets.z.at[:, flat_target].set(scanned.z.reshape(NLIMBS, -1)),
            buckets.t.at[:, flat_target].set(scanned.t.reshape(NLIMBS, -1)),
        )

    timed("s5 point scatter (current)", s_points, scanned, sorted_key)

    def s_intidx(scanned, sorted_key):
        # scatter int32 sorted-POSITIONS into bucket slots, then gather the
        # <= nbuckets tails (lane-run position p = k*M + m maps back to
        # sorted position m*K + k)
        target = jnp.where(is_end, sorted_key, nbuckets + 1)
        flat_target = (jax.lax.broadcasted_iota(
            jnp.int32, (nw, n), 0) * stride + target).reshape(-1)
        srcpos = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32), (nw, n)).reshape(-1)
        posmap = jnp.zeros((nw * stride,), jnp.int32).at[flat_target].set(
            srcpos)  # position of each bucket's tail, 0 if empty
        hit = jnp.zeros((nw * stride,), jnp.bool_).at[flat_target].set(
            jnp.ones((nw * n,), jnp.bool_))
        posmap = posmap.reshape(nw, stride)[:, 1: nbuckets + 1]
        hit = hit.reshape(nw, stride)[:, 1: nbuckets + 1]
        # sorted position -> lane-run flat offset within the window
        kk, mm = posmap % K, posmap // K
        flat_lane = kk * M + mm
        flat_all = (jax.lax.broadcasted_iota(
            jnp.int32, (nw, nbuckets), 0) * (K * M) + flat_lane).reshape(-1)
        g = pm.PointBatch(
            jnp.take(scanned.x.reshape(NLIMBS, -1), flat_all, axis=1),
            jnp.take(scanned.y.reshape(NLIMBS, -1), flat_all, axis=1),
            jnp.take(scanned.z.reshape(NLIMBS, -1), flat_all, axis=1),
            jnp.take(scanned.t.reshape(NLIMBS, -1), flat_all, axis=1),
        )
        ident = pm.identity_lm((nw * nbuckets,))
        sel = hit.reshape(-1)[None]
        return pm.PointBatch(
            jnp.where(sel, g.x, ident.x).reshape(NLIMBS, nw, nbuckets),
            jnp.where(sel, g.y, ident.y).reshape(NLIMBS, nw, nbuckets),
            jnp.where(sel, g.z, ident.z).reshape(NLIMBS, nw, nbuckets),
            jnp.where(sel, g.t, ident.t).reshape(NLIMBS, nw, nbuckets),
        )

    timed("s6 int scatter + tail gather", s_intidx, scanned, sorted_key)

    # s7: the seq segmented scan alone
    start_l = lr(jnp.concatenate([ones, changed], axis=1)).astype(jnp.int32)

    def s_scan(scanned, start_l):
        return pm._seq_segmented_scan(scanned, start_l[None], False)

    timed("s7 seq segmented scan", s_scan, scanned, start_l)

    # s8: full reference
    timed("s8 window_totals (reference)",
          lambda p, d: pm.window_totals(p, d, wbits, False), pts, digits)


if __name__ == "__main__":
    main()
