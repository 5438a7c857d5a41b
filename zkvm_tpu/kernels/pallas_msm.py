"""Pippenger MSM with every point addition in fused Pallas VMEM kernels.

Upstream counterpart: curve25519-dalek backend/serial/scalar_mul/pippenger.rs
(bucket method).  The round-1 implementation (kernels/msm.py) built the same
pipeline out of jnp limb ops in batch-major (n, 20) layout; each field mul
round-tripped HBM and wasted 108 of 128 lanes, capping the chip at
~29 Mmul/s.  This module keeps the pipeline shape — sort by digit, segmented
scan, bucket scatter, suffix-sum fold — but

  * stores points limb-major (NLIMBS, ...) so the batch rides the 128-lane
    axis of every VPU op, and
  * runs each scan/fold combine as ONE fused Pallas kernel (9 field muls +
    carries without leaving VMEM), measured 4.4x the jnp path on a v5e
    (docs/ROUND2-NOTES.md §1).

Sorting, gathers, and bucket scatters remain XLA ops: they are pure data
movement at HBM bandwidth and a small fraction of the EC-add cost.

Work model (adds) for n points, w-bit windows, nw = ceil(256/w) windows:
accumulation scan ~2n*nw (Blelloch), fold 3*2^(w-1)*nw (suffix scan + tree
reduce); `best_wbits` minimizes the sum for a given n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EDWARDS_D2, LIMB_BITS, LIMB_MASK, NLIMBS, WRAP
from .limbs import int_to_limbs
from .msm import num_windows
from .point import PointBatch

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE_TILE = 512  # lanes per grid step


# ------------------------------------------------------------- limb-major ops
def carry_lm(x: jnp.ndarray) -> jnp.ndarray:
    """One signed carry pass, limbs on axis 0 (cf. field.carry_once)."""
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    return jnp.concatenate([lo[:1] + WRAP * hi[-1:], lo[1:] + hi[:-1]], axis=0)


def neg_lm(x: jnp.ndarray) -> jnp.ndarray:
    return carry_lm(-x)


# the fused VMEM field mul lives in pallas_field (single copy of record;
# VERDICT r2 weak-#5) — rank-agnostic, limbs on axis 0
from .pallas_field import _vmem_mul  # noqa: E402


def _carry_tile(x):
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    return jnp.concatenate(
        [lo[:1] + WRAP * hi[-1:], lo[1:] + hi[:-1]], axis=0
    )


def _add_formula(p, q, d2):
    """Unified extended Edwards addition (add-2008-hwcd-3, a=-1) on VMEM
    tiles; p, q are 4-tuples of (NLIMBS, T)."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    m = _vmem_mul
    A = m(_carry_tile(Y1 - X1), _carry_tile(Y2 - X2))
    B = m(_carry_tile(Y1 + X1), _carry_tile(Y2 + X2))
    C = m(m(T1, d2), T2)
    D = m(Z1, _carry_tile(Z2 + Z2))
    E = _carry_tile(B - A)
    F = _carry_tile(D - C)
    G = _carry_tile(D + C)
    H = _carry_tile(B + A)
    return m(E, F), m(G, H), m(F, G), m(E, H)


def _seg_combine_kernel(lx, ly, lz, lt, rx, ry, rz, rt, f_ref, d2_ref,
                        ox, oy, oz, ot):
    """Segmented-scan combine: out = f ? r : l + r (masked select keeps the
    monoid associative across segment starts)."""
    p = (lx[:, :], ly[:, :], lz[:, :], lt[:, :])
    q = (rx[:, :], ry[:, :], rz[:, :], rt[:, :])
    sx, sy, sz, st = _add_formula(p, q, d2_ref[:, :])
    keep = f_ref[:, :] != 0  # (1, T), broadcasts over limbs
    ox[:, :] = jnp.where(keep, q[0], sx)
    oy[:, :] = jnp.where(keep, q[1], sy)
    oz[:, :] = jnp.where(keep, q[2], sz)
    ot[:, :] = jnp.where(keep, q[3], st)


def _add_kernel(lx, ly, lz, lt, rx, ry, rz, rt, d2_ref, ox, oy, oz, ot):
    p = (lx[:, :], ly[:, :], lz[:, :], lt[:, :])
    q = (rx[:, :], ry[:, :], rz[:, :], rt[:, :])
    sx, sy, sz, st = _add_formula(p, q, d2_ref[:, :])
    ox[:, :] = sx
    oy[:, :] = sy
    oz[:, :] = sz
    ot[:, :] = st


_D2_TILE = np.ascontiguousarray(
    np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, LANE_TILE))
).astype(np.int32)


def _pad_lanes(flat: jnp.ndarray, b_pad: int) -> jnp.ndarray:
    b = flat.shape[1]
    if b == b_pad:
        return flat
    return jnp.pad(flat, [(0, 0), (0, b_pad - b)])


def _flatten(coord: jnp.ndarray) -> jnp.ndarray:
    """(NLIMBS, *batch) -> (NLIMBS, B) without moving data."""
    return coord.reshape(NLIMBS, -1)


def _pallas_point_op(kernel, n_in_pts: int, with_flags: bool, interpret: bool,
                     *arrays):
    """Run a point kernel over flattened lane axes with LANE_TILE padding.

    arrays: n_in_pts point 4-tuples (each (NLIMBS, *batch)) followed, when
    with_flags, by one flag array ((1, *batch), int32).  Returns a 4-tuple
    with the original batch shape.
    """
    batch_shape = arrays[0].shape[1:]
    coords = [_flatten(a) for pt in range(n_in_pts)
              for a in arrays[pt * 4: pt * 4 + 4]]
    b = coords[0].shape[1]
    if b == 0:  # associative_scan probes empty slices at some levels
        return tuple(arrays[:4])
    b_pad = -(-b // LANE_TILE) * LANE_TILE
    coords = [_pad_lanes(c, b_pad) for c in coords]
    spec = pl.BlockSpec((NLIMBS, LANE_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    bcast = pl.BlockSpec((NLIMBS, LANE_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [spec] * (4 * n_in_pts)
    ins = list(coords)
    if with_flags:
        flags = _pad_lanes(arrays[4 * n_in_pts].reshape(1, -1), b_pad)
        in_specs.append(pl.BlockSpec((1, LANE_TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        ins.append(flags)
    in_specs.append(bcast)
    ins.append(jnp.asarray(_D2_TILE))
    shapes = tuple(
        jax.ShapeDtypeStruct((NLIMBS, b_pad), jnp.int32) for _ in range(4)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=shapes,
        grid=(b_pad // LANE_TILE,),
        in_specs=in_specs,
        out_specs=tuple([spec] * 4),
        interpret=interpret,
    )(*ins)
    return tuple(o[:, :b].reshape((NLIMBS,) + batch_shape) for o in out)


def point_add_lm(p: PointBatch, q: PointBatch, interpret: bool = False
                 ) -> PointBatch:
    """Batched limb-major point add: coords (NLIMBS, *batch)."""
    out = _pallas_point_op(_add_kernel, 2, False, interpret, *p, *q)
    return PointBatch(*out)


def seg_combine_lm(p: PointBatch, q: PointBatch, q_start: jnp.ndarray,
                   interpret: bool = False) -> PointBatch:
    """out = q_start ? q : p + q.  q_start: (1, *batch) int32."""
    out = _pallas_point_op(_seg_combine_kernel, 2, True, interpret,
                           *p, *q, q_start)
    return PointBatch(*out)


# ------------------------------------------------------------- MSM pipeline
def identity_lm(batch_shape: tuple[int, ...]) -> PointBatch:
    zero = jnp.zeros((NLIMBS,) + batch_shape, jnp.int32)
    one_limb = np.zeros((NLIMBS,), np.int32)
    one_limb[0] = 1
    one = jnp.broadcast_to(
        jnp.asarray(one_limb).reshape((NLIMBS,) + (1,) * len(batch_shape)),
        (NLIMBS,) + batch_shape,
    )
    return PointBatch(zero, one, one, zero)


def cneg_lm(p: PointBatch, mask: jnp.ndarray) -> PointBatch:
    """Conditional negation; mask is batch-shaped (broadcast over limbs)."""
    m = mask[None]
    return PointBatch(
        jnp.where(m, neg_lm(p.x), p.x), p.y, p.z,
        jnp.where(m, neg_lm(p.t), p.t),
    )


def best_wbits(n: int) -> int:
    """Window width minimizing the seq-pipeline cost model
    nw * (n + 3.5 * 2^(w-1)): one add per sorted position in the K-chunk
    scan plus a bucket term covering the fold's two adds per bucket AND the
    HBM-resident bucket-array materialization.  The 3.5 weight is fitted to
    on-chip measurements (v5e, 2026-08-17): 2^18 w13=574ms ~ w14=551ms
    (crossover pins the ratio), w16=1501ms; 2^16 w13=121ms; 2^14 w12=54ms.
    The old 2n-adds model chose w=16 at 2^18 - 2.7x slower than w=14.

    Buckets beyond ~8192/window leave the cheap regime (the HBM bucket
    array stops fitting the fold's working set): 2^18 w16 measured 1501 ms
    vs the linear model's ~600 ms, and 2^20 w16 measured 6,792 ms
    (2026-08-18 ledger) where w14 measures ~2 s.  Fitted spill penalty:
    ~50 base-units per bucket beyond 8192 reproduces the 2^18 w14/w16
    ratio and keeps w<=14 at 2^20.

    MSMs at/above ZKVM_MSM_SPLIT_N run as sub-MSMs of half that size
    (window_totals chunk dispatch), so the optimum is the sub-MSM's."""
    sub_n = _chunk_sub_n(n)
    if sub_n is not None:
        n = sub_n
    best, best_cost = 8, None
    for w in range(8, 21):
        nw = num_windows(w)
        nbuckets = 1 << (w - 1)
        cost = nw * (2 * n + 7 * min(nbuckets, 8192)
                     + 50 * max(0, nbuckets - 8192))
        if best_cost is None or cost < best_cost:
            best, best_cost = w, cost
    return best


def _chunk_sub_n(n: int) -> int | None:
    """Sub-MSM size when window_totals splits n into independent chunks
    (must mirror window_totals' dispatch condition exactly), else None."""
    split_n = int(_os.environ.get("ZKVM_MSM_SPLIT_N", str(1 << 17)))
    sub_n = split_n // 2
    if n >= split_n and n % sub_n == 0 and sub_n % (
            SEQ_LANES * SEQ_BLOCK) == 0:
        return sub_n
    return None


def _bucket_totals(points: PointBatch, digits: jnp.ndarray, wbits: int,
                   interpret: bool) -> PointBatch:
    """All windows' weighted bucket sums: points (NLIMBS, n) limb-major,
    digits (n, nw) signed; returns per-window totals (NLIMBS, nw)."""
    nw = digits.shape[1]
    nbuckets = 1 << (wbits - 1)
    n = digits.shape[0]

    dT = digits.T                                      # (nw, n)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
    sorted_key, perm = jax.lax.sort_key_val(jnp.abs(dT), idx, dimension=1)
    sorted_sign = jnp.take_along_axis(dT < 0, perm, axis=1)

    pts = PointBatch(
        jnp.take(points.x, perm, axis=1),              # (NLIMBS, nw, n)
        jnp.take(points.y, perm, axis=1),
        jnp.take(points.z, perm, axis=1),
        jnp.take(points.t, perm, axis=1),
    )
    pts = cneg_lm(pts, sorted_sign)

    ones = jnp.ones((1, nw, 1), jnp.int32)
    changed = (sorted_key[:, 1:] != sorted_key[:, :-1])[None].astype(jnp.int32)
    start = jnp.concatenate([ones, changed], axis=2)   # (1, nw, n)

    def combine(a, b):
        (ap, af), (bp, bf) = a, b
        return seg_combine_lm(ap, bp, bf, interpret), af | bf

    scanned, _ = jax.lax.associative_scan(combine, (pts, start), axis=2)

    is_end = jnp.concatenate(
        [changed[0], jnp.ones((nw, 1), jnp.int32)], axis=1
    )  # (nw, n)
    stride = nbuckets + 2
    target = jnp.where(is_end != 0, sorted_key, nbuckets + 1)
    window_ids = jax.lax.broadcasted_iota(jnp.int32, (nw, n), 0)
    flat_target = (window_ids * stride + target).reshape(-1)

    buckets = identity_lm((nw * stride,))
    buckets = PointBatch(
        buckets.x.at[:, flat_target].set(scanned.x.reshape(NLIMBS, -1)),
        buckets.y.at[:, flat_target].set(scanned.y.reshape(NLIMBS, -1)),
        buckets.z.at[:, flat_target].set(scanned.z.reshape(NLIMBS, -1)),
        buckets.t.at[:, flat_target].set(scanned.t.reshape(NLIMBS, -1)),
    )
    buckets = PointBatch(
        buckets.x.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
        buckets.y.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
        buckets.z.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
        buckets.t.reshape(NLIMBS, nw, stride)[:, :, 1: nbuckets + 1],
    )  # (NLIMBS, nw, nbuckets): buckets 1..nbuckets

    # weighted fold sum_b b*B_b: suffix sums (reverse inclusive scan), then
    # tree-reduce the suffix array (upstream's running-sum fold, pippenger.rs)
    rev = PointBatch(
        buckets.x[:, :, ::-1], buckets.y[:, :, ::-1],
        buckets.z[:, :, ::-1], buckets.t[:, :, ::-1],
    )
    suffix = jax.lax.associative_scan(
        lambda a, b: point_add_lm(a, b, interpret), rev, axis=2
    )
    m = nbuckets
    while m > 1:
        m //= 2
        lo = PointBatch(suffix.x[:, :, :m], suffix.y[:, :, :m],
                        suffix.z[:, :, :m], suffix.t[:, :, :m])
        hi = PointBatch(suffix.x[:, :, m: 2 * m], suffix.y[:, :, m: 2 * m],
                        suffix.z[:, :, m: 2 * m], suffix.t[:, :, m: 2 * m])
        suffix = point_add_lm(lo, hi, interpret)
    return PointBatch(
        suffix.x[:, :, 0], suffix.y[:, :, 0], suffix.z[:, :, 0],
        suffix.t[:, :, 0],
    )  # (NLIMBS, nw)


# ------------------------------------------------- sequential-chunk pipeline
# The associative_scan pipeline above pays ~3.5 ms of strided-slice relayout
# per scan level (measured, bench/msm_stages.py: 326 of 433 ms at 2^16 in the
# scan, while chained adds sustain >200 Madd/s).  This pipeline does the same
# segmented bucket accumulation with ~n point-adds in ONE Pallas kernel that
# walks each lane's contiguous run sequentially (TPU grids execute in order,
# so a VMEM scratch carries the running segment across grid steps), plus a
# tiny cross-lane roll-scan and a <=1-add-per-lane fixup.

# Tile parameters, env-overridable for on-chip sweeps (bench/seq_sweep.py);
# the defaults are the best measured v5e configuration.  Constraints:
# SCAN_TILE | SEQ_LANES; SEQ_LANES*SEQ_BLOCK | n (pad_batch_lm guarantees);
# VMEM per scan block ~ NLIMBS*SEQ_BLOCK*SCAN_TILE*4B * ~12 live tiles.
import os as _os

SEQ_LANES = int(_os.environ.get("ZKVM_SEQ_LANES", "512"))   # M lanes/window
_COMPACT = _os.environ.get("ZKVM_COMPACT", "sort2")  # bucket-tail strategy
SEQ_BLOCK = int(_os.environ.get("ZKVM_SEQ_BLOCK", "8"))     # K-pos per step
# 512 lanes/step: the scan's sequential adds are latency-bound, so wider
# tiles are ~free throughput (2^16 scan 15.3 -> 6.9 ms, probe 2026-08-19)
SCAN_TILE = int(_os.environ.get("ZKVM_SCAN_TILE", "512"))   # lanes per step
FOLD_LANES = 128  # bucket-fold lanes per window
FOLD_BLOCK = 8    # buckets consumed per fold grid step
FOLD_TILE = 512   # fold lanes per grid step (flattened nw*FOLD_LANES)


def _identity_planes(shape):
    """Identity-point coordinate tiles of (NLIMBS,) + shape."""
    one = (jax.lax.broadcasted_iota(jnp.int32, (NLIMBS,) + shape, 0) == 0)
    zero = jnp.zeros((NLIMBS,) + shape, jnp.int32)
    return zero, one.astype(jnp.int32), one.astype(jnp.int32), zero


def _seq_scan_kernel(px, py, pz, pt, f_ref, d2_ref,
                     ox, oy, oz, ot, cx, cy, cz, ct):
    """Segmented inclusive scan along each lane's run: KB sequential
    combines per grid step; c* scratch carries the running segment across
    K-chunks (grid's last axis iterates K-chunks in order)."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        ix, iy, iz, it = _identity_planes(cx.shape[1:])
        cx[...], cy[...], cz[...], ct[...] = ix, iy, iz, it

    carry = (cx[...], cy[...], cz[...], ct[...])
    d2 = d2_ref[...]
    for k in range(SEQ_BLOCK):
        p = (px[:, 0, k, :], py[:, 0, k, :], pz[:, 0, k, :], pt[:, 0, k, :])
        s = _add_formula(carry, p, d2)
        keep = f_ref[:, 0, k, :] != 0  # (1, TM) broadcasts over limbs
        run = tuple(jnp.where(keep, pc, sc) for pc, sc in zip(p, s))
        ox[:, 0, k, :], oy[:, 0, k, :], oz[:, 0, k, :], ot[:, 0, k, :] = run
        carry = run
    cx[...], cy[...], cz[...], ct[...] = carry


def _seq_segmented_scan(pts: PointBatch, flags: jnp.ndarray,
                        interpret: bool) -> PointBatch:
    """pts: (NLIMBS, nw, K, M) lane-run layout; flags: (1, nw, K, M).
    Returns the per-position running segment values (same shape)."""
    _, nw, K, M = pts.x.shape
    assert K % SEQ_BLOCK == 0 and M % SCAN_TILE == 0, (K, M)
    spec = pl.BlockSpec((NLIMBS, 1, SEQ_BLOCK, SCAN_TILE),
                        lambda w, m, k: (0, w, k, m),
                        memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, 1, SEQ_BLOCK, SCAN_TILE),
                         lambda w, m, k: (0, w, k, m),
                         memory_space=pltpu.VMEM)
    d2spec = pl.BlockSpec((NLIMBS, SCAN_TILE), lambda w, m, k: (0, 0),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct(pts.x.shape, jnp.int32)
    out = pl.pallas_call(
        _seq_scan_kernel,
        out_shape=(shp,) * 4,
        grid=(nw, M // SCAN_TILE, K // SEQ_BLOCK),
        in_specs=[spec] * 4 + [fspec, d2spec],
        out_specs=(spec,) * 4,
        scratch_shapes=[pltpu.VMEM((NLIMBS, SCAN_TILE), jnp.int32)] * 4,
        interpret=interpret,
    )(pts.x, pts.y, pts.z, pts.t, flags,
      jnp.asarray(_D2_TILE[:, :SCAN_TILE]))
    return PointBatch(*out)


def _lane_scan_kernel(tx, ty, tz, tt, f_ref, d2_ref, ox, oy, oz, ot):
    """Segmented Hillis-Steele scan ACROSS lanes of the per-lane tails,
    WCHUNK windows per block (a full-nw block blows the 16 MB VMEM scope
    at nw>=29, and a 1-window block violates the divisible-by-8 rule on
    the second-to-last dim; rows are independent so edge-block padding
    rows compute garbage that is never written back).  Emits the EXCLUSIVE
    incoming prefix for each lane (the running segment value flowing into
    the lane's head run)."""
    val = (tx[...], ty[...], tz[...], tt[...])   # (NLIMBS, WCHUNK, M)
    f = f_ref[...]                               # (1, WCHUNK, M)
    d2 = d2_ref[...][:, None, :]
    M = val[0].shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
    ident = _identity_planes(val[0].shape[1:])
    s = 1
    while s < M:
        rolled = tuple(pltpu.roll(v, s, 2) for v in val)
        fr = pltpu.roll(f, s, 2)
        edge = lane < s
        rolled = tuple(jnp.where(edge, i, r) for i, r in zip(ident, rolled))
        fr = jnp.where(edge, 1, fr)
        summed = _add_formula(rolled, val, d2)
        keep = f != 0
        val = tuple(jnp.where(keep, v, sm) for v, sm in zip(val, summed))
        f = f | fr
        s *= 2
    # exclusive shift: incoming[m] = inclusive[m-1]; lane 0 gets identity
    rolled = tuple(pltpu.roll(v, 1, 2) for v in val)
    edge = lane < 1
    out = tuple(jnp.where(edge, i, r) for i, r in zip(ident, rolled))
    ox[...], oy[...], oz[...], ot[...] = out


def _lane_scan(tails: PointBatch, tail_flags: jnp.ndarray,
               interpret: bool) -> PointBatch:
    """tails: (NLIMBS, nw, M); tail_flags: (nw, M) = any segment start in
    the lane.  Returns incoming prefixes (NLIMBS, nw, M)."""
    _, nw, M = tails.x.shape
    wchunk = 8
    spec = pl.BlockSpec((NLIMBS, wchunk, M), lambda w: (0, w, 0),
                        memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, wchunk, M), lambda w: (0, w, 0),
                         memory_space=pltpu.VMEM)
    d2spec = pl.BlockSpec((NLIMBS, M), lambda w: (0, 0),
                          memory_space=pltpu.VMEM)
    d2 = np.ascontiguousarray(
        np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, M))
    ).astype(np.int32)
    shp = jax.ShapeDtypeStruct(tails.x.shape, jnp.int32)
    out = pl.pallas_call(
        _lane_scan_kernel,
        out_shape=(shp,) * 4,
        grid=(-(-nw // wchunk),),
        in_specs=[spec] * 4 + [fspec, d2spec],
        out_specs=(spec,) * 4,
        interpret=interpret,
    )(tails.x, tails.y, tails.z, tails.t, tail_flags[None], jnp.asarray(d2))
    return PointBatch(*out)


def _fold_kernel_factory(rb: int):
    """Weighted bucket fold, stage 1: each lane owns R consecutive buckets
    (highest-first grid order); scratch T = running bucket sum, W = running
    sum of suffix sums, so W = sum (local_rank+1)*B over the lane's run."""
    def kernel(bx, by, bz, bt, d2_ref, tox, toy, toz, tot,
               wox, woy, woz, wot, sx, sy, sz, st, vx, vy, vz, vt):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            ix, iy, iz, it = _identity_planes(sx.shape[1:])
            sx[...], sy[...], sz[...], st[...] = ix, iy, iz, it
            vx[...], vy[...], vz[...], vt[...] = ix, iy, iz, it

        T = (sx[...], sy[...], sz[...], st[...])
        W = (vx[...], vy[...], vz[...], vt[...])
        d2 = d2_ref[...]
        for r in range(rb - 1, -1, -1):
            b = (bx[:, r, :], by[:, r, :], bz[:, r, :], bt[:, r, :])
            T = _add_formula(T, b, d2)
            W = _add_formula(W, T, d2)
        sx[...], sy[...], sz[...], st[...] = T
        vx[...], vy[...], vz[...], vt[...] = W
        tox[...], toy[...], toz[...], tot[...] = T
        wox[...], woy[...], woz[...], wot[...] = W
    return kernel


def _fold_combine_kernel(tx, ty, tz, tt, wx, wy, wz, wt, d2_ref,
                         ox, oy, oz, ot, r_per_lane: int):
    """Stage 2, all windows in one block: totals = sum_l W_l +
    R * sum_{l>=1} SufT_l, where SufT is the lane-suffix sum of T
    (sum_l l*T_l identity).  All reductions are in-block roll scans over
    the lane axis (per-window independent)."""
    T = (tx[...], ty[...], tz[...], tt[...])     # (NLIMBS, nw, L)
    W = (wx[...], wy[...], wz[...], wt[...])
    d2 = d2_ref[...][:, None, :]
    L = T[0].shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
    ident = _identity_planes(T[0].shape[1:])

    # suffix sums of T: SufT[l] = sum_{l'>=l} T[l']
    suf = T
    s = 1
    while s < L:
        rolled = tuple(pltpu.roll(v, L - s, 2) for v in suf)  # v[l+s]
        edge = lane >= L - s
        rolled = tuple(jnp.where(edge, i, r) for i, r in zip(ident, rolled))
        suf = _add_formula(suf, rolled, d2)
        s *= 2
    # drop lane 0 before summing: sum_{l>=1} SufT_l == sum_l l*T_l
    suf = tuple(jnp.where(lane == 0, i, v) for i, v in zip(ident, suf))

    def tree_sum(v):
        s = 1
        while s < L:
            rolled = tuple(pltpu.roll(c, s, 2) for c in v)
            v = _add_formula(v, rolled, d2)
            s *= 2
        return v

    lsum = tree_sum(suf)           # every lane = sum_l l*T_l
    wsum = tree_sum(W)
    for _ in range(r_per_lane.bit_length() - 1):   # * R (power of two)
        lsum = _add_formula(lsum, lsum, d2)
    out = _add_formula(wsum, lsum, d2)
    ox[...], oy[...], oz[...], ot[...] = out


def _weighted_fold_seq(buckets: PointBatch, interpret: bool) -> PointBatch:
    """buckets: (NLIMBS, nw, nbuckets) with slot s = bucket s+1.
    Returns per-window weighted totals (NLIMBS, nw)."""
    _, nw, nbuckets = buckets.x.shape
    L = min(FOLD_LANES, nbuckets)
    R = nbuckets // L
    assert L * R == nbuckets and R % FOLD_BLOCK in (0, R), (L, R)
    rb = FOLD_BLOCK if R % FOLD_BLOCK == 0 else R

    # slot s = l*R + r -> [r, l], lanes flattened over (nw, L)
    def lr(c):
        return c.reshape(NLIMBS, nw, L, R).transpose(0, 3, 1, 2).reshape(
            NLIMBS, R, nw * L)

    b = PointBatch(lr(buckets.x), lr(buckets.y), lr(buckets.z),
                   lr(buckets.t))
    nl = nw * L
    # largest lane tile <= FOLD_TILE that divides nl (nl is nw*L with L a
    # multiple of 128, so tl=L always satisfies the fallback; nw is NOT a
    # power of two in general — e.g. nw=17 at wbits=16)
    tl = min(FOLD_TILE, nl)
    while nl % tl:
        tl -= L
    assert tl >= L and nl % tl == 0, (nw, L, tl)
    spec = pl.BlockSpec((NLIMBS, rb, tl), lambda m, r: (0, R // rb - 1 - r, m),
                        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((NLIMBS, tl), lambda m, r: (0, m),
                         memory_space=pltpu.VMEM)
    d2spec = pl.BlockSpec((NLIMBS, tl), lambda m, r: (0, 0),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((NLIMBS, nl), jnp.int32)
    d2 = np.ascontiguousarray(
        np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, tl))
    ).astype(np.int32)
    outs = pl.pallas_call(
        _fold_kernel_factory(rb),
        out_shape=(shp,) * 8,
        grid=(nl // tl, R // rb),
        in_specs=[spec] * 4 + [d2spec],
        out_specs=(ospec,) * 8,
        scratch_shapes=[pltpu.VMEM((NLIMBS, tl), jnp.int32)] * 8,
        interpret=interpret,
    )(b.x, b.y, b.z, b.t, jnp.asarray(d2))
    T = PointBatch(*outs[:4])
    W = PointBatch(*outs[4:])

    def wl(c):
        return c.reshape(NLIMBS, nw, L)

    # all windows in one block: TPU lowering requires the second-to-last
    # block dim to equal the array dim, and (nw, L) is tiny
    spec2 = pl.BlockSpec(memory_space=pltpu.VMEM)
    d2b = np.ascontiguousarray(
        np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, L))
    ).astype(np.int32)
    shp2 = jax.ShapeDtypeStruct((NLIMBS, nw, L), jnp.int32)
    outs2 = pl.pallas_call(
        functools.partial(_fold_combine_kernel, r_per_lane=R),
        out_shape=(shp2,) * 4,
        in_specs=[spec2] * 9,
        out_specs=(spec2,) * 4,
        interpret=interpret,
    )(wl(T.x), wl(T.y), wl(T.z), wl(T.t),
      wl(W.x), wl(W.y), wl(W.z), wl(W.t), jnp.asarray(d2b))
    return PointBatch(outs2[0][:, :, 0], outs2[1][:, :, 0],
                      outs2[2][:, :, 0], outs2[3][:, :, 0])


# ------------------------------------------------------ v5 device frontend
# Round-4 on-chip stage probe (2^16, w=13, 20 windows, v5e): the XLA sort
# measured 31.5 ms and the XLA permutation gather 28.8 ms of the 71.5 ms
# total, while the Pallas scan itself is 6.9 ms.  Both are replaced here
# with VMEM-resident Pallas kernels (upstream pippenger.rs does the same
# grouping with a serial one-pass bucket walk; on a TPU the sort IS the
# grouping, so it has to be fast):
#
#   * sort_rows_device — an unrolled bitonic network over the lane axis,
#     one VMEM block per 8 windows.  XLA's TPU sort round-trips HBM per
#     compare-exchange pass; at n <= 2^17 the rows fit in VMEM whole.
#   * gather_rows_words — the per-window permutation gather, gathering
#     128-byte canonical u32 words (2.5x less traffic than 320-byte limb
#     rows) with tpu.dynamic_gather from a VMEM-resident source.
#   * _seq_segmented_scan_words — the same sequential segmented scan, but
#     decoding words -> limbs and applying the digit sign IN KERNEL, so
#     the 420 MB decoded+negated intermediate never exists in HBM.
#
# Env: ZKVM_MSM_SORT / ZKVM_MSM_GATHER = pallas|xla pick per-stage
# implementations for on-chip A/B; both default to pallas on real TPU
# backends and xla in interpret mode (the unrolled network is slow to
# interpret).  Parity: tests/test_pallas_msm.py runs both combinations.

def _bitonic_kernel(n: int):
    """Ascending bitonic sort of one window row held as a (1, n//128, 128)
    int32 block (n a power of two >= 128, values nonnegative), flat index
    i = 128*row + lane.

    Two hardware-shaped choices (both measured on-chip 2026-08-20):
    * the row is RESHAPED to (n//128, 128) so every vreg tile is fully
      populated — a flat (1, n) row lays out as T(1,128) with 7/8 of each
      tile's sublanes wasted, 8x-ing every temp;
    * each compare-exchange stage loads from and stores to o_ref, so
      Mosaic's stack allocator sees one stage of temps live at a time (the
      fully-unrolled network allocated 46 MB of scoped VMEM at 2^16).

    Exchange semantics are XOR (partner of i is i ^ stride), so a stride
    < 128 pairs lanes within a row (two lane-axis rolls + select) and a
    stride >= 128 pairs rows (two sublane-axis rolls + select) — every
    shift static."""
    rows = n // 128

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]
        shape = x_ref.shape
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        size = 2
        while size <= n:
            stride = size // 2
            while stride >= 1:
                v = o_ref[...]
                if stride >= 128:
                    rs = stride // 128
                    up = pltpu.roll(v, rows - rs, 1)  # up[r] = v[r+rs]
                    dn = pltpu.roll(v, rs, 1)         # dn[r] = v[r-rs]
                    lower = (row & rs) == 0
                else:
                    up = pltpu.roll(v, 128 - stride, 2)
                    dn = pltpu.roll(v, stride, 2)
                    lower = (lane & stride) == 0
                if size >= 128:
                    asc = (row & (size // 128)) == 0
                else:
                    asc = (lane & size) == 0
                partner = jnp.where(lower, up, dn)
                take_min = lower == asc
                o_ref[...] = jnp.where(take_min, jnp.minimum(v, partner),
                                       jnp.maximum(v, partner))
                stride //= 2
            size *= 2
    return kernel


def sort_rows_device(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Ascending per-row sort of (R, n) int32 with NONNEGATIVE entries.
    Columns pad to the next power of two with int32-max sentinels (they
    sort to the tail and are sliced off); rows pad to the sublane block."""
    R, n = x.shape
    npad = 1 << max(max(n - 1, 1).bit_length(), 7)   # >= one 128-lane tile
    if npad > (1 << 18):
        # a (npad//128, 128) row block is 4 MB at 2^20; with one stage of
        # network temps + double-buffered I/O that exceeds the ~16 MB VMEM
        # scope, so the whole-row-in-VMEM design stops here
        return jax.lax.sort(x, dimension=1)
    rows = npad // 128
    xp = jnp.pad(x, ((0, 0), (0, npad - n)),
                 constant_values=np.int32(2**31 - 1)).reshape(R, rows, 128)
    spec = pl.BlockSpec((1, rows, 128), lambda r: (r, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _bitonic_kernel(npad),
        grid=(R,),
        out_shape=jax.ShapeDtypeStruct((R, rows, 128), jnp.int32),
        in_specs=[spec],
        out_specs=spec,
        interpret=interpret,
    )(xp)
    return out.reshape(R, npad)[:, :n]


def _use_pallas_stage(env_name: str, interpret: bool) -> bool:
    """Per-stage impl pick.  Default is XLA for both stages: on-chip A/B
    2026-08-20 measured the Pallas bitonic sort at 186 ms vs XLA's 27 ms
    at (20, 2^16) (cross-vreg rolls + per-stage VMEM round-trips), and
    Mosaic cannot lower the wide dynamic gather at all ("Multiple source
    vregs along gather dimension"), so pallas here is opt-in for probes."""
    del interpret
    return _os.environ.get(env_name, "") == "pallas"


def _sort_rows(x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    if _use_pallas_stage("ZKVM_MSM_SORT", interpret):
        return sort_rows_device(x, interpret)
    return jax.lax.sort(x, dimension=1)


def normalize_lm(x: jnp.ndarray) -> jnp.ndarray:
    """Full canonical mod-p reduction, limbs on axis 0 (field.normalize is
    limbs-last)."""
    from .field import normalize
    return jnp.moveaxis(normalize(jnp.moveaxis(x, 0, -1)), -1, 0)


def encode_words_lm(limbs: jnp.ndarray) -> jnp.ndarray:
    """(NLIMBS, ...) CANONICAL int32 limbs -> (8, ...) uint32 little-endian
    words (exact inverse of decode_words_lm)."""
    lu = limbs.astype(jnp.uint32)
    words = []
    for k in range(8):
        lo_bit, hi_bit = 32 * k, 32 * k + 32
        w = None
        for j in range(NLIMBS):
            b = LIMB_BITS * j
            if b + LIMB_BITS <= lo_bit or b >= hi_bit:
                continue
            sh = b - lo_bit
            t = (lu[j] << sh) if sh >= 0 else (lu[j] >> (-sh))
            w = t if w is None else (w | t)
        words.append(w)
    return jnp.stack(words)


def gather_rows_words(src: jnp.ndarray, perm: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Per-window permutation gather from a VMEM-resident source:
    src (S, n) int32 word-planes, perm (nwg, n) int32 ->
    out (nwg, S, n) with out[w, s, j] = src[s, perm[w, j]].
    take_along_axis lowers to tpu.dynamic_gather (lane-axis batched
    gather); the source chunk stays resident across the window axis."""
    S, n = src.shape
    nwg = perm.shape[0]
    # Mosaic's block-alignment rule: a 2D block height must be a multiple
    # of 8 or the full dim, and any trailing (1, n) block needs a matching
    # size-1 ARRAY dim (measured on-chip 2026-08-20) — hence the [:, None]
    # views.  Keep the source chunk <= 2 MB of VMEM.
    cb = 8 if n <= (1 << 16) else 1
    assert S % cb == 0, (S, cb)
    perm3 = perm[:, None, :]                              # (nwg, 1, n)
    pspec = pl.BlockSpec((1, 1, n), lambda c, w: (w, 0, 0),
                         memory_space=pltpu.VMEM)
    if cb == 8:
        sspec = pl.BlockSpec((cb, n), lambda c, w: (c, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, cb, n), lambda c, w: (w, c, 0),
                             memory_space=pltpu.VMEM)

        def kernel(s_ref, p_ref, o_ref):
            idx = jnp.broadcast_to(p_ref[0], (cb, n))
            o_ref[0] = jnp.take_along_axis(s_ref[...], idx, axis=1)

        return pl.pallas_call(
            kernel,
            grid=(S // cb, nwg),
            out_shape=jax.ShapeDtypeStruct((nwg, S, n), jnp.int32),
            in_specs=[sspec, pspec],
            out_specs=ospec,
            interpret=interpret,
        )(src, perm3)

    # single-row blocks: 3D/4D views give every block trailing dims that
    # exactly match the array's trailing dims
    src3 = src[:, None, :]                                # (S, 1, n)
    sspec = pl.BlockSpec((1, 1, n), lambda c, w: (c, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, 1, n), lambda c, w: (w, c, 0, 0),
                         memory_space=pltpu.VMEM)

    def kernel1(s_ref, p_ref, o_ref):
        o_ref[0, 0] = jnp.take_along_axis(s_ref[0], p_ref[0], axis=1)

    out = pl.pallas_call(
        kernel1,
        grid=(S, nwg),
        out_shape=jax.ShapeDtypeStruct((nwg, S, 1, n), jnp.int32),
        in_specs=[sspec, pspec],
        out_specs=ospec,
        interpret=interpret,
    )(src3, perm3)
    return out[:, :, 0, :]


def _decode_coord_tile(words: jnp.ndarray) -> jnp.ndarray:
    """(8, T) int32 word tile -> (NLIMBS, T) int32 limbs (in-kernel twin of
    decode_words_lm; logical shifts via a uint32 view)."""
    w = pltpu.bitcast(words, jnp.uint32)
    w = jnp.concatenate([w, jnp.zeros_like(w[:1])])
    limbs = []
    for j in range(NLIMBS):
        bit = LIMB_BITS * j
        k, s = bit >> 5, bit & 31
        lo = w[k] >> s
        if s > 32 - LIMB_BITS:
            lo = lo | (w[k + 1] << (32 - s))
        limbs.append((lo & jnp.uint32(LIMB_MASK)).astype(jnp.int32))
    return jnp.stack(limbs)


def _seq_scan_words_kernel(pw, f_ref, d2_ref,
                           ox, oy, oz, ot, cx, cy, cz, ct):
    """_seq_scan_kernel twin taking raw (32, ...) word blocks: decodes
    words -> limbs and applies the digit sign (flag bit 1) in VMEM, so the
    decoded/negated point array never materializes in HBM."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        ix, iy, iz, it = _identity_planes(cx.shape[1:])
        cx[...], cy[...], cz[...], ct[...] = ix, iy, iz, it

    carry = (cx[...], cy[...], cz[...], ct[...])
    d2 = d2_ref[...]
    for k in range(SEQ_BLOCK):
        w = pw[:, 0, k, :]                        # (32, T)
        x = _decode_coord_tile(w[0:8])
        y = _decode_coord_tile(w[8:16])
        z = _decode_coord_tile(w[16:24])
        t = _decode_coord_tile(w[24:32])
        f = f_ref[:, 0, k, :]                     # (1, T)
        sgn = (f & 2) != 0
        x = jnp.where(sgn, _carry_tile(-x), x)
        t = jnp.where(sgn, _carry_tile(-t), t)
        p = (x, y, z, t)
        s = _add_formula(carry, p, d2)
        keep = (f & 1) != 0
        run = tuple(jnp.where(keep, pc, sc) for pc, sc in zip(p, s))
        ox[:, 0, k, :], oy[:, 0, k, :], oz[:, 0, k, :], ot[:, 0, k, :] = run
        carry = run
    cx[...], cy[...], cz[...], ct[...] = carry


def _seq_segmented_scan_words(words: jnp.ndarray, flags: jnp.ndarray,
                              interpret: bool) -> PointBatch:
    """words: (32, nw, K, M) int32 gathered point words in lane-run layout;
    flags: (1, nw, K, M) with bit 0 = segment start, bit 1 = negate.
    Returns running segment values (NLIMBS, nw, K, M) like
    _seq_segmented_scan."""
    _, nw, K, M = words.shape
    assert K % SEQ_BLOCK == 0 and M % SCAN_TILE == 0, (K, M)
    wspec = pl.BlockSpec((32, 1, SEQ_BLOCK, SCAN_TILE),
                         lambda w, m, k: (0, w, k, m),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, 1, SEQ_BLOCK, SCAN_TILE),
                         lambda w, m, k: (0, w, k, m),
                         memory_space=pltpu.VMEM)
    d2spec = pl.BlockSpec((NLIMBS, SCAN_TILE), lambda w, m, k: (0, 0),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((NLIMBS, nw, K, M), jnp.int32)
    out = pl.pallas_call(
        _seq_scan_words_kernel,
        out_shape=(shp,) * 4,
        grid=(nw, M // SCAN_TILE, K // SEQ_BLOCK),
        in_specs=[wspec, fspec, d2spec],
        out_specs=(pl.BlockSpec((NLIMBS, 1, SEQ_BLOCK, SCAN_TILE),
                                lambda w, m, k: (0, w, k, m),
                                memory_space=pltpu.VMEM),) * 4,
        scratch_shapes=[pltpu.VMEM((NLIMBS, SCAN_TILE), jnp.int32)] * 4,
        interpret=interpret,
    )(words, flags, jnp.asarray(_D2_TILE[:, :SCAN_TILE]))
    return PointBatch(*out)


# ---------------------------------------------------- affine gather variant
# The XLA permutation gather is op-bound per gathered ELEMENT (round-4 s4:
# words rows 31.9 ms vs limb rows 28.8 ms at 2^16 — byte width is not the
# cost), so the lever is fewer elements per point: batch-normalize the MSM
# points to AFFINE once (Montgomery-trick prefix/suffix products + ONE
# Fermat inversion — upstream counterpart FieldElement::batch_invert,
# curve25519-dalek field.rs) and gather 16 canonical u32 words per point
# (x, y) instead of 80 limb words.  The scan kernel rebuilds T2 = x*y in
# VMEM (that product doubles as the segment-start reset value, so the
# mixed add-2008-hwcd-3 formula with Z2=1 keeps the same 9-mul count as
# the extended add).  Env: ZKVM_MSM_AFFINE=1/0 overrides the default
# (on for n >= 2^14 where the gather dominates; the normalization's ~6n
# extra field muls outweigh the gather savings at small n).

def mul_lm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Field mul with limbs on axis 0 (XLA-level twin of field.mul; the
    VMEM twin is pallas_field._vmem_mul).  Same bound contract as
    field.mul: <= 14-bit inputs, <= 14-bit output."""
    nd = a.ndim - 1
    total = None
    for j in range(NLIMBS):
        p = a * b[j: j + 1]
        padded = jnp.pad(p, [(j, NLIMBS - 1 - j)] + [(0, 0)] * nd)
        total = padded if total is None else total + padded
    high = total[NLIMBS:]
    hi = high >> LIMB_BITS
    lo = high & LIMB_MASK
    r = (total[:NLIMBS]
         + jnp.pad(WRAP * lo, [(0, 1)] + [(0, 0)] * nd)
         + jnp.pad(WRAP * hi, [(1, 0)] + [(0, 0)] * nd))
    return carry_lm(carry_lm(carry_lm(r)))


def batch_zinv_lm(z: jnp.ndarray) -> jnp.ndarray:
    """Batched field inversion of (NLIMBS, n) via the Montgomery trick:
    tree prefix/suffix products (~4n muls), ONE 254-squaring Fermat chain
    on the grand product, then zinv_i = prefix_{i-1} * suffix_{i+1} *
    total^-1 (~2n muls).  Requires every z nonzero (true for all valid
    extended Edwards coordinates)."""
    from . import field as F

    z = carry_lm(z)
    pre = jax.lax.associative_scan(mul_lm, z, axis=1)
    suf = jax.lax.associative_scan(mul_lm, z, axis=1, reverse=True)
    total = pre[:, -1:]
    tinv = jnp.moveaxis(F.invert(jnp.moveaxis(total, 0, -1)), -1, 0)
    one = (jax.lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0)
           == 0).astype(jnp.int32)
    pre_ex = jnp.concatenate([one, pre[:, :-1]], axis=1)
    suf_ex = jnp.concatenate([suf[:, 1:], one], axis=1)
    return mul_lm(mul_lm(pre_ex, suf_ex), jnp.broadcast_to(tinv, z.shape))


def to_affine_words(points: PointBatch) -> jnp.ndarray:
    """(NLIMBS, n) extended coords -> (16, n) canonical little-endian u32
    words of the affine (x, y) = (X/Z, Y/Z)."""
    zinv = batch_zinv_lm(points.z)
    x = mul_lm(carry_lm(points.x), zinv)
    y = mul_lm(carry_lm(points.y), zinv)
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(
            encode_words_lm(normalize_lm(c)), jnp.int32)
        for c in (x, y)
    ])


def _seq_scan_awords_kernel(pw, f_ref, d2_ref,
                            ox, oy, oz, ot, cx, cy, cz, ct):
    """_seq_scan_words_kernel twin for AFFINE (16, ...) word blocks: mixed
    add (Z2=1, D = 2*Z1 free) with T2 = x*y rebuilt in VMEM — the same
    product is the reset value's T coordinate, so segment starts cost
    nothing extra."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        ix, iy, iz, it = _identity_planes(cx.shape[1:])
        cx[...], cy[...], cz[...], ct[...] = ix, iy, iz, it

    carry = (cx[...], cy[...], cz[...], ct[...])
    d2 = d2_ref[...]
    m = _vmem_mul
    for k in range(SEQ_BLOCK):
        w = pw[:, 0, k, :]                        # (16, T)
        x = _decode_coord_tile(w[0:8])
        y = _decode_coord_tile(w[8:16])
        f = f_ref[:, 0, k, :]                     # (1, T)
        xy = m(x, y)
        sgn = (f & 2) != 0
        x = jnp.where(sgn, _carry_tile(-x), x)
        xy = jnp.where(sgn, _carry_tile(-xy), xy)
        X1, Y1, Z1, T1 = carry
        A = m(_carry_tile(Y1 - X1), _carry_tile(y - x))
        B = m(_carry_tile(Y1 + X1), _carry_tile(y + x))
        C = m(m(T1, d2), xy)
        D = _carry_tile(Z1 + Z1)
        E = _carry_tile(B - A)
        F = _carry_tile(D - C)
        G = _carry_tile(D + C)
        H = _carry_tile(B + A)
        s = (m(E, F), m(G, H), m(F, G), m(E, H))
        one = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
               == 0).astype(jnp.int32)
        p = (x, y, one, xy)
        keep = (f & 1) != 0
        run = tuple(jnp.where(keep, pc, sc) for pc, sc in zip(p, s))
        ox[:, 0, k, :], oy[:, 0, k, :], oz[:, 0, k, :], ot[:, 0, k, :] = run
        carry = run
    cx[...], cy[...], cz[...], ct[...] = carry


def _seq_segmented_scan_awords(words: jnp.ndarray, flags: jnp.ndarray,
                               interpret: bool) -> PointBatch:
    """words: (16, nw, K, M) affine (x, y) word blocks in lane-run layout;
    flags as in _seq_segmented_scan_words.  Returns running segment values
    (NLIMBS, nw, K, M) in extended coordinates."""
    _, nw, K, M = words.shape
    assert K % SEQ_BLOCK == 0 and M % SCAN_TILE == 0, (K, M)
    wspec = pl.BlockSpec((16, 1, SEQ_BLOCK, SCAN_TILE),
                         lambda w, m, k: (0, w, k, m),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec((1, 1, SEQ_BLOCK, SCAN_TILE),
                         lambda w, m, k: (0, w, k, m),
                         memory_space=pltpu.VMEM)
    d2spec = pl.BlockSpec((NLIMBS, SCAN_TILE), lambda w, m, k: (0, 0),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((NLIMBS, nw, K, M), jnp.int32)
    out = pl.pallas_call(
        _seq_scan_awords_kernel,
        out_shape=(shp,) * 4,
        grid=(nw, M // SCAN_TILE, K // SEQ_BLOCK),
        in_specs=[wspec, fspec, d2spec],
        out_specs=(pl.BlockSpec((NLIMBS, 1, SEQ_BLOCK, SCAN_TILE),
                                lambda w, m, k: (0, w, k, m),
                                memory_space=pltpu.VMEM),) * 4,
        scratch_shapes=[pltpu.VMEM((NLIMBS, SCAN_TILE), jnp.int32)] * 4,
        interpret=interpret,
    )(words, flags, jnp.asarray(_D2_TILE[:, :SCAN_TILE]))
    return PointBatch(*out)


def _use_affine_gather(n: int, interpret: bool) -> bool:
    """Opt-in (ZKVM_MSM_AFFINE=1): on-chip A/B 2026-08-20 measured the
    affine variant at 71.0 ms vs 65.8 ms extended at 2^16 w=13 — the XLA
    gather is bound by gather POSITIONS, not row bytes (32-word rows had
    already measured the same as 80-word rows in round 4), so the 5x
    narrower rows buy nothing and the batch normalization adds ~5 ms."""
    del n, interpret
    return _os.environ.get("ZKVM_MSM_AFFINE", "") == "1"


def _bucket_totals_seq(points: PointBatch, digits: jnp.ndarray, wbits: int,
                       interpret: bool) -> PointBatch:
    """Sequential-chunk bucket pipeline; requires n % (SEQ_LANES *
    SEQ_BLOCK) == 0 (pad_batch_lm's power-of-two padding satisfies this
    from n >= 4096).

    Windows are mutually independent, and the pipeline materializes
    several (NLIMBS, nwg, K, M) HBM temps (gathered points, scan values,
    plus one XLA relayout copy that pads the tiny window axis 6.4x) — at
    2^20 points x 19 windows that is >15 GB and the compile OOMs HBM
    (measured 2026-08-18).  So the window axis is processed in groups of
    nwg = ZKVM_SEQ_GROUP_ELEMS / n windows via lax.map (one compiled body,
    HBM bounded by a single group); sizes whose full window set fits keep
    the single-shot graph (and its persistent-cache entry)."""
    nw = digits.shape[1]
    nbuckets = 1 << (wbits - 1)
    n = digits.shape[0]
    M = SEQ_LANES
    K = n // M

    dT = digits.T                                      # (nw, n)

    # past 2^18 lanes a single source/output row is >= 4 MB and the
    # VMEM-resident gather no longer fits its scope — XLA path instead
    use_wgather = (_use_pallas_stage("ZKVM_MSM_GATHER", interpret)
                   and n <= (1 << 18))
    use_affine = (not use_wgather) and _use_affine_gather(n, interpret)
    if use_affine:
        # 16 canonical u32 words per point: one batched affine
        # normalization up front, 5x fewer gathered elements per window
        src_affine = to_affine_words(points)              # (16, n) int32
    elif use_wgather:
        # canonical u32 word planes, VMEM-resident source for the Pallas
        # gather: 128 B/point vs 320 B limb rows, decoded back to limbs
        # inside the scan kernel
        src_words = jnp.concatenate([
            jax.lax.bitcast_convert_type(
                encode_words_lm(normalize_lm(c)), jnp.int32)
            for c in (points.x, points.y, points.z, points.t)
        ])                                             # (32, n) int32
    else:
        # one (80, n) array so the per-window permutation is ONE XLA gather
        # instead of four (A/B'd on-chip 2026-08-18: 286 vs 322 ms device
        # at the nb=4096 batch-verify shape; ~even at nb=1024)
        stacked = jnp.concatenate([points.x, points.y, points.z, points.t])
    # ZKVM_MSM_ROWGATHER=1: gather CONTIGUOUS (80,) rows of a row-major
    # copy by flat index instead of strided columns (bench/stage_probe8
    # A/B — the column gather is bound ~22 ns per gathered position)
    use_rowgather = (not use_wgather and not use_affine
                     and _os.environ.get("ZKVM_MSM_ROWGATHER") == "1")
    if use_rowgather:
        rows80 = jax.lax.optimization_barrier(stacked.T)   # (n, 80)

    def group_totals(dT_g: jnp.ndarray) -> PointBatch:
        nwg = dT_g.shape[0]
        shift = max(n - 1, 1).bit_length()  # index bits
        if wbits + shift + 1 <= 31:
            # pack (|digit|, sign, index) into one int32 so the sort is a
            # single-operand sort AND the sign needs no post-sort gather.
            # INVARIANT: |digit| <= 2^(wbits-1) (signed_digits_radix_2w /
            # recode_digits_device guarantee this), so the key occupies at
            # most wbits bits above shift+1; an out-of-range digit here
            # would silently corrupt the index bits of perm — any new digit
            # recoder feeding this path must preserve the bound.
            packed = ((jnp.abs(dT_g) << (shift + 1))
                      | ((dT_g < 0).astype(jnp.int32) << shift)
                      | jnp.arange(n, dtype=jnp.int32))
            sp = _sort_rows(packed, interpret)
            sorted_key = sp >> (shift + 1)
            sorted_sign = ((sp >> shift) & 1) != 0
            perm = sp & ((1 << shift) - 1)
        else:
            idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nwg, n))
            sorted_key, perm = jax.lax.sort_key_val(
                jnp.abs(dT_g), idx, dimension=1)
            sorted_sign = jnp.take_along_axis(dT_g < 0, perm, axis=1)
        changed = sorted_key[:, 1:] != sorted_key[:, :-1]
        ones = jnp.ones((nwg, 1), jnp.bool_)
        start = jnp.concatenate([ones, changed], axis=1)   # (nwg, n)
        is_end = jnp.concatenate([changed, ones], axis=1)

        def lr(a):
            """Sorted order -> lane-run layout: p = m*K + k -> [k, m]."""
            return a.reshape(nwg, M, K).transpose(0, 2, 1)

        start_l = lr(start).astype(jnp.int32)
        if use_affine:
            g = jnp.take(src_affine, lr(perm), axis=1)  # (16, nwg, K, M)
            flags = start_l | (lr(sorted_sign).astype(jnp.int32) << 1)
            scanned = _seq_segmented_scan_awords(g, flags[None], interpret)
        elif use_wgather:
            g = gather_rows_words(src_words, perm, interpret)  # (nwg,32,n)
            gw = jnp.transpose(g.reshape(nwg, 32, M, K), (1, 0, 3, 2))
            flags = start_l | (lr(sorted_sign).astype(jnp.int32) << 1)
            scanned = _seq_segmented_scan_words(gw, flags[None], interpret)
        elif use_rowgather:
            flat = lr(perm).reshape(-1)
            g = jnp.take(rows80, flat, axis=0)     # (nwg*K*M, 80) rows
            g = jnp.transpose(
                g.reshape(nwg, K, M, 4 * NLIMBS), (3, 0, 1, 2))
            pts = PointBatch(g[:NLIMBS], g[NLIMBS:2 * NLIMBS],
                             g[2 * NLIMBS:3 * NLIMBS], g[3 * NLIMBS:])
            pts = cneg_lm(pts, lr(sorted_sign))
            scanned = _seq_segmented_scan(pts, start_l[None], interpret)
        else:
            perm_l = lr(perm)
            g = jnp.take(stacked, perm_l, axis=1)  # (4*NLIMBS, nwg, K, M)
            pts = PointBatch(g[:NLIMBS], g[NLIMBS:2 * NLIMBS],
                             g[2 * NLIMBS:3 * NLIMBS], g[3 * NLIMBS:])
            pts = cneg_lm(pts, lr(sorted_sign))
            scanned = _seq_segmented_scan(pts, start_l[None], interpret)

        # cross-lane incoming prefixes from the per-lane tails
        tails = PointBatch(
            scanned.x[:, :, K - 1, :], scanned.y[:, :, K - 1, :],
            scanned.z[:, :, K - 1, :], scanned.t[:, :, K - 1, :])
        tail_flag = jnp.max(start_l, axis=1)           # (nwg, M)
        incoming = _lane_scan(tails, tail_flag, interpret)

        # fixup values: at most one segment end per lane precedes the
        # lane's first start flag; only that position's tail needs the
        # cross-lane incoming prefix added.  The fix is applied to the
        # GATHERED bucket tails below, never to the 420 MB scanned array
        # (the old full-array where-rewrite + point scatter was ~53 ms of
        # the 91 ms device time at 2^16; probe 2026-08-19).
        has = jnp.max(start_l, axis=1) > 0
        first = jnp.where(has, jnp.argmax(start_l, axis=1), K)  # (nwg, M)
        e = first - 1
        e_cl = jnp.clip(e, 0, K - 1)
        iend_l = lr(is_end).astype(jnp.int32)
        end_at_e = jnp.take_along_axis(
            iend_l, e_cl[:, None, :], axis=1)[:, 0, :]
        need = (e >= 0) & (end_at_e != 0)                       # (nwg, M)

        def gather_e(c):
            return jnp.take_along_axis(
                c, e_cl[None, :, None, :], axis=2)[:, :, 0, :]

        val_e = PointBatch(gather_e(scanned.x), gather_e(scanned.y),
                           gather_e(scanned.z), gather_e(scanned.t))
        fixed = point_add_lm(incoming, val_e, interpret)        # (NL, nwg, M)

        # write the fixed values back at the e positions: this elementwise
        # where FUSES into the rows relayout below (which reads scanned
        # anyway) — post-gather fixing via take_along_axis on the lane
        # axis measured +106 ms at 2^16 (probe6, 2026-08-19)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (nwg, K, M), 1)
        put = (k_iota == e_cl[:, None, :]) & need[:, None, :]
        scanned = PointBatch(
            jnp.where(put[None], fixed.x[:, :, None, :], scanned.x),
            jnp.where(put[None], fixed.y[:, :, None, :], scanned.y),
            jnp.where(put[None], fixed.z[:, :, None, :], scanned.z),
            jnp.where(put[None], fixed.t[:, :, None, :], scanned.t),
        )

        # ---- bucket-tail compaction.  Two interchangeable strategies
        # (ZKVM_COMPACT env; A/B'd on-chip):
        #   "sort2" (default when the bits fit): a SECOND packed sort
        #     brings every segment tail to the front in key order —
        #     (is_end ? 0 : 1) << 30 | key << shift | sorted_pos — then a
        #     tiny searchsorted over the <= nbuckets+1 compacted tails
        #     aligns them to bucket slots.  Sorts measure ~8 ms real at
        #     2^16 vs ~29 ms for the position scatter.
        #   "scatter": one int32 position scatter (position+1; 0 = empty).
        # (A full-width searchsorted over the n-sized sorted keys was also
        # tried: WORSE, 81.7 vs 71.5 ms at 2^16.)
        shift2 = max(n - 1, 1).bit_length()
        use_sort2 = (_COMPACT != "scatter"
                     and 1 + wbits + shift2 <= 31)
        if use_sort2:
            p_iota2 = jax.lax.broadcasted_iota(jnp.int32, (nwg, n), 1)
            packed2 = (jnp.where(is_end, 0, 1 << 30)
                       | (sorted_key << shift2) | p_iota2)
            nt = nbuckets + 1                       # + the key-0 segment
            sp2 = _sort_rows(packed2, interpret)[:, :nt]
            tail_key = (sp2 >> shift2) & ((1 << wbits) - 1)
            # non-end entries that leak into the slice get an impossible
            # key ABOVE every bucket (keeps rows ascending for the search)
            tail_key = jnp.where(sp2 < (1 << 30), tail_key, 1 << wbits)
            tail_pos = sp2 & ((1 << shift2) - 1)
            b_q = jnp.arange(1, nbuckets + 1, dtype=jnp.int32)
            loc = jax.vmap(
                lambda k: jnp.searchsorted(k, b_q)
            )(tail_key).astype(jnp.int32)
            loc = jnp.minimum(loc, nt - 1)
            key_at = jnp.take_along_axis(tail_key, loc, axis=1)
            hit = key_at == b_q[None]
            posmap = jnp.take_along_axis(tail_pos, loc, axis=1)
            posmap = jnp.where(hit, posmap, 0)
        else:
            stride = nbuckets + 2
            target = jnp.where(is_end, sorted_key, nbuckets + 1)
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (nwg, n), 0)
            flat_target = (w_iota * stride + target).reshape(-1)
            p_iota = jnp.broadcast_to(
                jnp.arange(1, n + 1, dtype=jnp.int32), (nwg, n)).reshape(-1)
            pos1 = jnp.zeros((nwg * stride,), jnp.int32).at[
                flat_target].set(p_iota).reshape(
                    nwg, stride)[:, 1: nbuckets + 1]
            hit = pos1 > 0
            posmap = jnp.maximum(pos1 - 1, 0)

        kk, mb = posmap % K, posmap // K   # sorted p = m*K + k -> lane-run
        flat_lane = kk * M + mb            # offset within the window
        rows = jnp.concatenate(
            [scanned.x, scanned.y, scanned.z, scanned.t]
        ).reshape(4 * NLIMBS, -1).T        # (nwg*K*M, 80)
        # materialize the row-major relayout BEFORE the gather: without the
        # barrier XLA fuses the transpose into the gather and the row
        # gather degrades back into a strided column gather (measured 187
        # vs 118 ms at 2^16, 2026-08-19)
        rows = jax.lax.optimization_barrier(rows)
        wbase = (jnp.arange(nwg, dtype=jnp.int32) * (K * M))[:, None]
        g = jnp.take(rows, (flat_lane + wbase).reshape(-1), axis=0)
        g = g.reshape(nwg, nbuckets, 4 * NLIMBS).transpose(2, 0, 1)

        ident = _identity_planes((nwg, nbuckets))
        sel_hit = hit[None]
        buckets = PointBatch(
            jnp.where(sel_hit, g[:NLIMBS], ident[0]),
            jnp.where(sel_hit, g[NLIMBS:2 * NLIMBS], ident[1]),
            jnp.where(sel_hit, g[2 * NLIMBS:3 * NLIMBS], ident[2]),
            jnp.where(sel_hit, g[3 * NLIMBS:], ident[3]),
        )
        return _weighted_fold_seq(buckets, interpret)

    # nwg*n caps the live HBM temps; 6M elements keeps the measured-good
    # 2^18 x 19-window shape single-shot while 2^20 runs 4 groups of 6
    max_elems = int(_os.environ.get("ZKVM_SEQ_GROUP_ELEMS", str(6 << 20)))
    nwg = max(1, min(nw, max_elems // max(n, 1)))
    if nwg >= nw:
        return group_totals(dT)
    ngroups = -(-nw // nwg)
    pad = ngroups * nwg - nw
    # zero-digit padding windows scatter only into the dropped slot 0 of
    # the bucket array, so their totals are the identity and slicing them
    # off below is exact
    dT_p = jnp.pad(dT, ((0, pad), (0, 0)))
    outs = jax.lax.map(group_totals, dT_p.reshape(ngroups, nwg, n))

    def unstack(c):  # (ngroups, NLIMBS, nwg) -> (NLIMBS, nw)
        return jnp.moveaxis(c, 0, 1).reshape(NLIMBS, ngroups * nwg)[:, :nw]

    return PointBatch(unstack(outs.x), unstack(outs.y),
                      unstack(outs.z), unstack(outs.t))


@functools.partial(jax.jit, static_argnums=(2, 3))
def window_totals(points: PointBatch, digits: jnp.ndarray, wbits: int,
                  interpret: bool = False) -> PointBatch:
    """Device side of the MSM: per-window weighted bucket sums as
    (NLIMBS, nw) limb-major coords.  The final window combine
    (acc = 2^w acc + total_w) is nw points of trivial host work — doing it
    on-device would unroll ~nw*wbits point ops into the XLA graph and blow
    the compile time (docs/ROUND2-NOTES.md §4), so callers combine on the
    host: sum_w 2^(w*wbits) * total_w, one tiny native MSM.

    Dispatch: the sequential-chunk pipeline for batch sizes it tiles
    (n % 4096 == 0 — pad_batch_lm's power-of-two padding guarantees this
    above 2^12); the associative-scan pipeline for small batches.

    Above ZKVM_MSM_SPLIT_N points the MSM runs as independent sub-MSMs of
    that size whose window totals Edwards-add (an MSM is a sum).  The
    measured per-point rate PEAKS at 2^16 (v5e, 2026-08-18: 0.53 Mpts/s at
    2^16 vs 0.48 at 2^18 and 0.26 at 2^20 — the per-window XLA sort is
    superlinear and the big shapes relayout-copy), so one lax.map over
    2^16-point sub-MSMs plus a lg(nch) fold is faster than any single-shot
    big shape AND keeps HBM flat."""
    n = digits.shape[0]
    sub_n = _chunk_sub_n(n)
    if sub_n is not None:
        nch = n // sub_n
        cpts = jnp.stack(
            [c.reshape(NLIMBS, nch, sub_n).transpose(1, 0, 2)
             for c in points], axis=1)                 # (nch, 4, NL, sub_n)
        cdig = digits.reshape(nch, sub_n, -1)
        outs = jax.lax.map(
            lambda args: _bucket_totals_seq(
                PointBatch(args[0][0], args[0][1], args[0][2], args[0][3]),
                args[1], wbits, interpret),
            (cpts, cdig))
        # fold the chunk axis: lg(nch) batched Edwards adds on (NL, c, nw)
        t = PointBatch(*(jnp.moveaxis(c, 0, 1) for c in outs))
        c = nch
        while c > 1:
            h = c // 2
            a = PointBatch(t.x[:, :h], t.y[:, :h], t.z[:, :h], t.t[:, :h])
            b = PointBatch(t.x[:, h:2 * h], t.y[:, h:2 * h],
                           t.z[:, h:2 * h], t.t[:, h:2 * h])
            s = point_add_lm(a, b, interpret)
            if c % 2:
                t = PointBatch(*(
                    jnp.concatenate([sc, tc[:, 2 * h:]], axis=1)
                    for sc, tc in zip(s, t)))
                c = h + 1
            else:
                t, c = s, h
        return PointBatch(t.x[:, 0], t.y[:, 0], t.z[:, 0], t.t[:, 0])
    if n % (SEQ_LANES * SEQ_BLOCK) == 0 and n > 0:
        return _bucket_totals_seq(points, digits, wbits, interpret)
    return _bucket_totals(points, digits, wbits, interpret)


@functools.partial(jax.jit, static_argnums=(2, 3))
def window_totals_packed(points: PointBatch, digits: jnp.ndarray,
                         wbits: int, interpret: bool = False) -> jnp.ndarray:
    """window_totals with all four coordinates stacked into ONE
    (4, NLIMBS, nw) output: the axon tunnel charges a ~24 ms dispatch/fetch
    floor PER ARRAY, so fetching x/y/z/t separately costs ~70 ms more per
    MSM than the compute itself at 2^14 (measured; see bench.py)."""
    t = window_totals(points, digits, wbits, interpret)
    return jnp.stack([t.x, t.y, t.z, t.t])


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def msm_pallas(points: PointBatch, digits: jnp.ndarray, wbits: int,
               interpret: bool = False, unroll_combine: bool | None = None
               ) -> PointBatch:
    """Full on-device MSM (device window combine included).

    points: limb-major (NLIMBS, n) coords; digits: (n, nw) signed radix-2^w
    (nw may be fewer than ceil(256/wbits) when scalars are short).
    Returns a single point, batch-minor (20,) coords (kernels/point.py
    convention) so callers unpack identically to kernels/msm.py.

    NOTE: production callers use window_totals + a host combine instead —
    the unrolled combine below costs minutes of XLA compile at full
    256-bit width and exists for self-contained tests at small nw.

    unroll_combine: unroll the final window-combine doubling chain.  On the
    TPU the unrolled chain is one dispatch with no host round trips; on CPU
    XLA compiles big unrolled graphs pathologically slowly, so the default
    rolls it into lax loops off-TPU.
    """
    from . import point as jp

    if unroll_combine is None:
        unroll_combine = jax.default_backend() in ("tpu", "axon")
    nw = digits.shape[1]
    totals = _bucket_totals(points, digits, wbits, interpret)
    # window combine on batch-minor single points (tiny; stays in one jit)
    tot_bm = PointBatch(totals.x.T, totals.y.T, totals.z.T, totals.t.T)
    acc = jp.gather(tot_bm, nw - 1)
    if unroll_combine:
        for w in range(nw - 2, -1, -1):
            for _ in range(wbits):
                acc = jp.double(acc)
            acc = jp.add(acc, jp.gather(tot_bm, w))
        return acc

    def per_window(i, acc):
        widx = nw - 2 - i
        acc = jax.lax.fori_loop(0, wbits, lambda _, a: jp.double(a), acc)
        return jp.add(acc, jp.gather(tot_bm, widx))

    return jax.lax.fori_loop(0, nw - 1, per_window, acc)


def _dbl_formula(p):
    """dbl-2008-hwcd (a=-1) on VMEM tiles; p is a 4-tuple of (NLIMBS, T)."""
    from .pallas_field import _vmem_sqr
    X, Y, Z, T = p
    m = _vmem_mul
    sq = _vmem_sqr
    A = sq(X)
    B = sq(Y)
    Zz = sq(Z)
    C = _carry_tile(Zz + Zz)
    xy = _carry_tile(X + Y)
    E = _carry_tile(_carry_tile(sq(xy) - A) - B)
    G = _carry_tile(B - A)
    F = _carry_tile(G - C)
    H = _carry_tile(-A - B)
    return m(E, F), m(G, H), m(F, G), m(E, H)


def _horner_kernel(nw, wbits, tx, ty, tz, tt, d2_ref, ox, oy, oz, ot):
    """Whole window-combine Horner fold in ONE kernel: acc = T_{nw-1};
    repeat (wbits doubles; acc += T_w).  The rolled XLA fori_loop version
    pays per-op overhead on ~7k tiny (20,)-shaped ops (~20 ms on the
    fused-verify dispatch, probe 2026-08-19); in-kernel the same chain is
    straight VPU work.  Windows unroll statically (nw is small), the
    doubling chain rolls in a fori_loop.  Window totals arrive
    PRE-REPLICATED to (nw, NLIMBS, lanes) — Mosaic cannot lower the
    in-kernel lane broadcast of a 1-wide column nor _vmem_mul's concat
    chains on 1-lane vectors."""
    d2 = d2_ref[:, :]

    def col(ref, w):
        return ref[w, :, :]

    acc = (col(tx, nw - 1), col(ty, nw - 1), col(tz, nw - 1),
           col(tt, nw - 1))
    for w in range(nw - 2, -1, -1):
        acc = jax.lax.fori_loop(
            0, wbits, lambda _, a: _dbl_formula(a), acc)
        acc = _add_formula(
            acc, (col(tx, w), col(ty, w), col(tz, w), col(tt, w)), d2)
    ox[:, :] = acc[0]
    oy[:, :] = acc[1]
    oz[:, :] = acc[2]
    ot[:, :] = acc[3]


def horner_fold_device(packed: jnp.ndarray, wbits: int,
                       interpret: bool = False):
    """packed (4, NLIMBS, nw) window totals -> (x, y, z, t) single-point
    coords (NLIMBS, 1) via the fused Pallas Horner kernel."""
    nw = packed.shape[2]
    lanes = 128
    # (nw, NLIMBS, lanes) lane-replicated per coord (~200 KB VMEM at nw=20)
    coords = [
        jnp.broadcast_to(
            jnp.transpose(packed[i], (1, 0))[:, :, None],
            (nw, NLIMBS, lanes))
        for i in range(4)
    ]
    tspec = pl.BlockSpec((nw, NLIMBS, lanes), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((NLIMBS, lanes), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_horner_kernel, nw, wbits),
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMBS, lanes), jnp.int32)
                        for _ in range(4)),
        grid=(1,),
        in_specs=[tspec] * 4 + [spec],
        out_specs=tuple([spec] * 4),
        interpret=interpret,
    )(*coords, jnp.asarray(_D2_TILE[:, :lanes]))
    return tuple(o[:, :1] for o in out)


def _combine_check_core(packed: jnp.ndarray, wbits: int,
                        use_kernel: bool | None = None) -> jnp.ndarray:
    """Trace-pure device window combine + Ristretto identity test.

    packed: (4, NLIMBS, nw) limb-major window totals.  Returns int32 1 iff
    sum_w 2^(w*wbits) * total_w is the Ristretto identity, i.e. the
    canonical x or y coordinate is zero mod p (identity coset of the
    cofactor-8 quotient).  On a real device the fold runs as ONE Pallas
    kernel (_horner_kernel); elsewhere a ROLLED lax.fori_loop —
    (nw-1)*wbits doubles + nw-1 adds on a single point — keeps compiles
    small (VERDICT r3 #3; upstream folds in-loop in pippenger.rs [U]).
    Fusing this into the verify dispatch drops the fetched payload from
    (4, NLIMBS, nw) ints to one scalar — one less ~24 ms tunnel fetch."""
    from . import field as F
    from . import point as jp

    nw = packed.shape[2]
    if use_kernel is None:
        use_kernel = jax.default_backend() in ("tpu", "axon")
    if use_kernel and nw > 1:
        carried = jnp.stack(
            [F.carry_once(packed[i].T).T for i in range(4)])
        x, y, _z, _t = horner_fold_device(carried, wbits)
        return (F.is_zero(x[:, 0]) | F.is_zero(y[:, 0])).astype(jnp.int32)

    # batch-minor (nw, NLIMBS) coords; totals leave the seq pipeline with
    # carried limbs, but one cheap carry pass keeps the add/double input
    # bounds independent of the producing pipeline's internal discipline
    tot = PointBatch(*(F.carry_once(packed[i].T) for i in range(4)))
    acc = jp.gather(tot, nw - 1)

    def per_window(i, acc):
        acc = jax.lax.fori_loop(0, wbits, lambda _, a: jp.double(a), acc)
        return jp.add(acc, jp.gather(tot, nw - 2 - i))

    if nw > 1:
        acc = jax.lax.fori_loop(0, nw - 1, per_window, acc)
    return (F.is_zero(acc.x) | F.is_zero(acc.y)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def combine_and_check_device(packed: jnp.ndarray, wbits: int) -> jnp.ndarray:
    """jit wrapper of _combine_check_core for standalone use/tests."""
    return _combine_check_core(packed, wbits)


def combine_window_totals(totals, wbits: int):
    """Host window combine: totals (NLIMBS, nw) -> oracle extended point.
    acc = sum_w 2^(w*wbits) * total_w, Horner's rule with an exact doubling
    chain (~256 doubles + nw adds; no mod-l, so torsion-bearing Edwards
    representatives match the oracle bit-for-bit).  Upstream pippenger.rs
    folds this on-device; here nw points of sequential work would unroll
    ~nw*wbits point ops into the XLA graph and blow the compile time
    (docs/ROUND2-NOTES.md §4) — the native chain is ~100us."""
    from ..oracle import edwards as oe
    from .limbs import limbs_to_field_ints

    if isinstance(totals, PointBatch):
        # one fetch for the whole batch (see window_totals_packed)
        packed = np.stack([
            np.asarray(totals.x), np.asarray(totals.y),
            np.asarray(totals.z), np.asarray(totals.t),
        ])
    else:
        packed = np.asarray(totals)  # (4, NLIMBS, nw) from *_packed
    nw = packed.shape[2]
    xs = limbs_to_field_ints(packed[0].T)
    ys = limbs_to_field_ints(packed[1].T)
    zs = limbs_to_field_ints(packed[2].T)
    ts = limbs_to_field_ints(packed[3].T)
    pts = [(xs[w], ys[w], zs[w], ts[w]) for w in range(nw)]
    from ..native import ed_combine_windows
    native = ed_combine_windows(pts, wbits)
    if native is not None:
        return native
    acc = pts[-1]
    for w in range(nw - 2, -1, -1):
        for _ in range(wbits):
            acc = oe.double(acc)
        acc = oe.add(acc, pts[w])
    return acc


def pack_points_lm(points) -> PointBatch:
    """List of oracle extended points -> limb-major (NLIMBS, n) PointBatch."""
    from .limbs import ints_to_limbs
    xs = ints_to_limbs([p[0] for p in points]).T
    ys = ints_to_limbs([p[1] for p in points]).T
    zs = ints_to_limbs([p[2] for p in points]).T
    ts = ints_to_limbs([p[3] for p in points]).T
    return PointBatch(*(jnp.asarray(np.ascontiguousarray(a))
                        for a in (xs, ys, zs, ts)))


def pad_batch_lm(pts: PointBatch, digits: jnp.ndarray, min_size: int = 16
                 ) -> tuple[PointBatch, jnp.ndarray]:
    """Pad n to a power of two (>= min_size) with identities/zero digits so
    jit compiles are shared across nearby sizes (cf. msm.pad_batch)."""
    n = digits.shape[0]
    size = 1
    while size < max(min_size, 16):
        size *= 2
    while size < n:
        size *= 2
    if size == n:
        return pts, digits
    pad = size - n
    ident = identity_lm((pad,))
    pts = PointBatch(
        jnp.concatenate([pts.x, ident.x], axis=1),
        jnp.concatenate([pts.y, ident.y], axis=1),
        jnp.concatenate([pts.z, ident.z], axis=1),
        jnp.concatenate([pts.t, ident.t], axis=1),
    )
    digits = jnp.concatenate(
        [digits, jnp.zeros((pad, digits.shape[1]), jnp.int32)]
    )
    return pts, digits


def msm(points_oracle, scalars: list[int], wbits: int | None = None,
        interpret: bool | None = None, nbits: int = 256):
    """Host wrapper: oracle points + int scalars -> oracle point result.

    Production path: device window_totals + host combine_window_totals
    (the full on-device msm_pallas unrolls the window combine and costs
    minutes of XLA compile at 256-bit width)."""
    from ..oracle import edwards

    n = len(scalars)
    assert n == len(points_oracle)
    if n == 0:
        return edwards.IDENTITY
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if wbits is None:
        wbits = best_wbits(max(n, 16))
    from .msm import signed_digits_radix_2w
    pts = pack_points_lm(points_oracle)
    digits = jnp.asarray(signed_digits_radix_2w(scalars, wbits, nbits))
    pts, digits = pad_batch_lm(pts, digits)
    totals = window_totals_packed(pts, digits, wbits, interpret)
    return combine_window_totals(totals, wbits)


# --------------------------------------------------- compact-upload frontend
# The axon tunnel moves ~40 MB/s host->device: limb-packed int32 points are
# 320 B/point and host-decomposed digits another ~104 B, so at batch-verify
# sizes the UPLOAD outweighs the MSM.  Ship 128 B canonical u32 words per
# point + 32 B per scalar and do the limb decode / signed digit recode on
# device (bit plumbing is free next to the point adds).

def decode_words_lm(words: jnp.ndarray) -> jnp.ndarray:
    """(8, n) uint32 little-endian field words -> (NLIMBS, n) int32 13-bit
    limbs (device analogue of kernels.limbs.int_to_limbs)."""
    w = jnp.concatenate([words, jnp.zeros_like(words[:1])])  # (9, n)
    limbs = []
    for j in range(NLIMBS):
        bit = LIMB_BITS * j
        k, s = bit >> 5, bit & 31
        lo = w[k] >> s
        if s > 32 - LIMB_BITS:
            lo = lo | (w[k + 1] << (32 - s))
        limbs.append((lo & jnp.uint32(LIMB_MASK)).astype(jnp.int32))
    return jnp.stack(limbs)


def recode_digits_device(words: jnp.ndarray, wbits: int, nw: int
                         ) -> jnp.ndarray:
    """(8, n) uint32 scalar words -> (n, nw) int32 signed radix-2^w digits
    (device analogue of kernels.msm.signed_digits_radix_2w; scalars must be
    < l so the top window cannot carry out, as the host version asserts)."""
    w = jnp.concatenate([words, jnp.zeros_like(words[:1])])
    half = 1 << (wbits - 1)
    carry = jnp.zeros(words.shape[1:], jnp.int32)
    cols = []
    for j in range(nw):
        bit = wbits * j
        k, s = bit >> 5, bit & 31
        lo = w[k] >> s
        if s:
            lo = lo | (w[k + 1] << (32 - s))
        raw = (lo & jnp.uint32((1 << wbits) - 1)).astype(jnp.int32) + carry
        over = raw >= half
        cols.append(jnp.where(over, raw - (1 << wbits), raw))
        carry = over.astype(jnp.int32)
    return jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def window_totals_from_words(point_words: jnp.ndarray,
                             scalar_words: jnp.ndarray,
                             wbits: int, interpret: bool = False
                             ) -> jnp.ndarray:
    """point_words (4, 8, n) u32 + scalar_words (8, n) u32 -> packed
    (4, NLIMBS, nw) per-window totals.  One upload-light dispatch."""
    pts = PointBatch(*(decode_words_lm(point_words[i]) for i in range(4)))
    digits = recode_digits_device(scalar_words, wbits, num_windows(wbits))
    t = window_totals(pts, digits, wbits, interpret)
    return jnp.stack([t.x, t.y, t.z, t.t])


@functools.partial(jax.jit, static_argnums=(2, 3))
def grouped_window_totals_from_words(point_words: jnp.ndarray,
                                     scalar_words: jnp.ndarray,
                                     wbits: int, interpret: bool = False
                                     ) -> jnp.ndarray:
    """g independent MSMs in ONE dispatch: point_words (4, 8, g, np) u32 +
    scalar_words (8, g, np) u32 -> (g, 4, NLIMBS, nw) per-group window
    totals, fetched as a single array.  Groups unroll in the trace (no
    device loop — axon syncs the host per loop iteration); the use case is
    the aggregated prover's 2m bit-commitment MSMs (proofs/mpc.py), where
    per-group host MSMs would each pay the ~24 ms tunnel floor."""
    g = point_words.shape[2]
    outs = []
    for i in range(g):
        pts = PointBatch(*(decode_words_lm(point_words[c, :, i])
                           for c in range(4)))
        digits = recode_digits_device(scalar_words[:, i], wbits,
                                      num_windows(wbits))
        t = window_totals(pts, digits, wbits, interpret)
        outs.append(jnp.stack([t.x, t.y, t.z, t.t]))
    return jnp.stack(outs)


_IDENTITY_WORDS = np.zeros((4, 8), np.uint32)
_IDENTITY_WORDS[1, 0] = 1   # Y = 1
_IDENTITY_WORDS[2, 0] = 1   # Z = 1


def point_words(ep) -> np.ndarray:
    """(4, 8) uint32 canonical words of one extended point."""
    blob = b"".join(int(c).to_bytes(32, "little") for c in ep)
    return np.frombuffer(blob, np.uint32).reshape(4, 8)


def padded_msm_size(n: int, min_size: int = 16) -> int:
    """THE padding rule for the MSM pipelines (single source — the digit
    and point arrays must agree with window_totals' seq-tile dispatch):
    above the seq pipeline's tile (SEQ_LANES*SEQ_BLOCK) pad to the next
    MULTIPLE of it, not the next power of two (a 17k-point batch-verify
    MSM would otherwise waste 47% of the chip); below it, powers of two
    so jit compiles are shared across nearby sizes."""
    seq_tile = SEQ_LANES * SEQ_BLOCK
    if n > seq_tile:
        return -(-n // seq_tile) * seq_tile
    size = 1
    while size < max(min_size, 16, n):
        size *= 2
    return size


def pack_words(points_ep, scalars, min_size: int = 16
               ) -> tuple[np.ndarray, np.ndarray]:
    """Host packing: points + scalars -> ((4, 8, n), (8, n)) u32 arrays,
    padded (padded_msm_size) with identity points / zero scalars."""
    n = len(scalars)
    size = padded_msm_size(n, min_size)
    pw = np.empty((size, 4, 8), np.uint32)
    for i, ep in enumerate(points_ep):
        pw[i] = ep if isinstance(ep, np.ndarray) else point_words(ep)
    pw[n:] = _IDENTITY_WORDS
    if hasattr(scalars, "buf"):  # packed ScalarVec: zero-copy reinterpret
        blob = scalars.buf
    else:
        blob = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    sw = np.zeros((size, 8), np.uint32)
    if n:
        sw[:n] = np.frombuffer(blob, np.uint32).reshape(n, 8)
    return (np.ascontiguousarray(pw.transpose(1, 2, 0)),
            np.ascontiguousarray(sw.T))
