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


def _vmem_mul(a, b):
    """Field mul on (NLIMBS, T) blocks resident in VMEM (pad/concat only —
    Pallas TPU has no scatter lowering).  Same schedule as
    pallas_field._vmem_mul; duplicated here so the MSM kernels are
    self-contained for the copy of record."""
    total = None
    for j in range(NLIMBS):
        prod = a * b[j: j + 1, :]
        padded = jnp.pad(prod, [(j, NLIMBS - 1 - j), (0, 0)])
        total = padded if total is None else total + padded
    high = total[NLIMBS:, :]
    hi = high >> LIMB_BITS
    lo = high & LIMB_MASK
    r = (
        total[:NLIMBS, :]
        + jnp.pad(WRAP * lo, [(0, 1), (0, 0)])
        + jnp.pad(WRAP * hi, [(1, 0), (0, 0)])
    )
    for _ in range(3):
        hi = r >> LIMB_BITS
        lo = r & LIMB_MASK
        r = jnp.concatenate(
            [lo[:1, :] + WRAP * hi[-1:, :], lo[1:, :] + hi[:-1, :]], axis=0
        )
    return r


def _carry_tile(x):
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    return jnp.concatenate(
        [lo[:1, :] + WRAP * hi[-1:, :], lo[1:, :] + hi[:-1, :]], axis=0
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
    """Window width minimizing 2n adds/point-window + 3*2^(w-1) fold adds."""
    best, best_cost = 8, None
    for w in range(8, 21):
        nw = num_windows(w)
        cost = 2 * n * nw + 3 * (1 << (w - 1)) * nw
        if best_cost is None or cost < best_cost:
            best, best_cost = w, cost
    return best


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


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def msm_pallas(points: PointBatch, digits: jnp.ndarray, wbits: int,
               interpret: bool = False, unroll_combine: bool | None = None
               ) -> PointBatch:
    """Full MSM on the Pallas pipeline.

    points: limb-major (NLIMBS, n) coords; digits: (n, nw) signed radix-2^w
    (nw may be fewer than ceil(256/wbits) when scalars are short).
    Returns a single point, batch-minor (20,) coords (kernels/point.py
    convention) so callers unpack identically to kernels/msm.py.

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


def pack_points_lm(points) -> PointBatch:
    """List of oracle extended points -> limb-major (NLIMBS, n) PointBatch."""
    from .limbs import ints_to_limbs
    xs = ints_to_limbs([p[0] for p in points]).T
    ys = ints_to_limbs([p[1] for p in points]).T
    zs = ints_to_limbs([p[2] for p in points]).T
    ts = ints_to_limbs([p[3] for p in points]).T
    return PointBatch(*(jnp.asarray(np.ascontiguousarray(a))
                        for a in (xs, ys, zs, ts)))


def pad_batch_lm(pts: PointBatch, digits: jnp.ndarray
                 ) -> tuple[PointBatch, jnp.ndarray]:
    """Pad n to a power of two (>= 16) with identities/zero digits so jit
    compiles are shared across nearby sizes (cf. msm.pad_batch)."""
    n = digits.shape[0]
    size = 16
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
    """Host wrapper: oracle points + int scalars -> oracle point result."""
    from ..oracle import edwards
    from . import point as jp

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
    out = msm_pallas(pts, digits, wbits, interpret)
    return jp.unpack_points(
        PointBatch(out.x[None], out.y[None], out.z[None], out.t[None])
    )[0]
