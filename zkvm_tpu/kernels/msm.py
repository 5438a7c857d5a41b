"""Pippenger multiscalar multiplication on device.

Upstream counterpart: curve25519-dalek backend/serial/scalar_mul/pippenger.rs.
TPU re-design (SURVEY.md §7.3): the serial scatter-add over buckets becomes

  1. signed radix-2^w digit decomposition (host, numpy);
  2. per window: conditional point negation; sort point indices by |digit|
     (lax.sort_key_val); gather; segmented inclusive scan with the Edwards
     addition monoid (lax.associative_scan) so each digit-segment's sum lands
     at its segment end; masked scatter of segment sums into the bucket array;
  3. bucket fold: suffix-sum scan over buckets + log-depth tree reduction
     computes sum_b b*bucket_b;
  4. window combine: acc = 2^w * acc + window_total (w doublings each).

Everything is fixed-shape and branchless, so XLA pipelines it onto the VPU.
The window width w trades bucket-fold work (2*2^(w-1) adds/window) against
per-point work (256/w windows): w=16 suits large n on TPU, smaller w suits
small n or CPU test runs.  The multi-chip version shards points across
devices and psums bucket totals (zkvm_tpu/parallel/sharded_msm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import point as jp
from .point import PointBatch

DEFAULT_WBITS = 16


def num_windows(wbits: int) -> int:
    return -(-256 // wbits)


def signed_digits_radix_2w(scalars: list[int], wbits: int = DEFAULT_WBITS,
                           nbits: int = 256) -> np.ndarray:
    """Canonical scalars -> (n, windows) int32 signed radix-2^w digits, LSB
    first: d_i in [-2^(w-1), 2^(w-1)], borrow-carried.  The top digit stays
    in range because scalars < ℓ < 2^253.  nbits < 256 shrinks the window
    count for short scalars (scalars must be < 2^(nbits-1)).

    Vectorized through a byte buffer + unpackbits (the per-int Python loop
    was a measurable host cost at n = 2^18)."""
    n = len(scalars)
    nw = -(-nbits // wbits)
    half = 1 << (wbits - 1)
    buf = np.frombuffer(
        b"".join(int(s).to_bytes(35, "little") for s in scalars), dtype=np.uint8
    ).reshape(n, 35)
    bits = np.unpackbits(buf, axis=1, bitorder="little")[:, : nw * wbits]
    weights = (1 << np.arange(wbits, dtype=np.int64))
    chunks = bits.reshape(n, nw, wbits).astype(np.int64) @ weights
    carry = np.zeros(n, dtype=np.int64)
    out = np.empty((n, nw), dtype=np.int64)
    for i in range(nw):
        d = chunks[:, i] + carry
        carry = (d >= half).astype(np.int64)
        out[:, i] = d - (carry << wbits)
    assert (carry == 0).all(), "scalar out of range for signed recoding"
    return out.astype(np.int32)


def _segment_scan_combine(left, right):
    """Segmented-sum monoid over (point, start_flag) — associative."""
    (lp, lf), (rp, rf) = left, right
    summed = jp.add(lp, rp)
    p = jp.select(rf, rp, summed)
    return (p, lf | rf)


def _bucket_accumulate(points: PointBatch, absd: jnp.ndarray, nbuckets: int) -> PointBatch:
    """Sum points sharing the same |digit| into buckets[0..nbuckets].

    points: (n, 20) coords (already sign-adjusted); absd: (n,) int32 in
    [0, nbuckets].  Returns bucket sums (nbuckets+1, 20): index b holds the
    sum of points with |digit| == b (bucket 0 is unused garbage).
    """
    n = absd.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort_key_val(absd, idx)
    pts = jp.gather(points, perm)

    start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_key[1:] != sorted_key[:-1]]
    )
    scanned, _ = jax.lax.associative_scan(
        _segment_scan_combine, (pts, start), axis=0
    )
    is_end = jnp.concatenate(
        [sorted_key[1:] != sorted_key[:-1], jnp.ones((1,), jnp.bool_)]
    )
    # scatter segment sums to buckets; non-ends go to a trash slot
    target = jnp.where(is_end, sorted_key, nbuckets + 1)
    buckets = jp.identity((nbuckets + 2,))
    buckets = PointBatch(
        buckets.x.at[target].set(scanned.x),
        buckets.y.at[target].set(scanned.y),
        buckets.z.at[target].set(scanned.z),
        buckets.t.at[target].set(scanned.t),
    )
    return jp.gather(buckets, slice(0, nbuckets + 1))


def _weighted_bucket_fold(buckets: PointBatch, nbuckets: int) -> PointBatch:
    """sum_b b * buckets[b] via suffix sums (upstream's running-sum fold)."""
    body = jp.gather(buckets, slice(1, nbuckets + 1))
    rev = jp.gather(body, slice(None, None, -1))
    suffix = jax.lax.associative_scan(
        lambda a, b: jp.add(a, b), rev, axis=0
    )
    out = jp.tree_reduce(suffix)  # (1, 20) coords
    return PointBatch(out.x[0], out.y[0], out.z[0], out.t[0])


def window_total(points: PointBatch, digits_w: jnp.ndarray, wbits: int) -> PointBatch:
    """One window's bucket accumulation + fold (also the per-chip unit of the
    sharded MSM, which psums these across devices)."""
    nbuckets = 1 << (wbits - 1)
    sign = digits_w < 0
    absd = jnp.abs(digits_w)
    pts = jp.cneg(points, sign)
    buckets = _bucket_accumulate(pts, absd, nbuckets)
    return _weighted_bucket_fold(buckets, nbuckets)


@functools.partial(jax.jit, static_argnums=(2,))
def msm_device_looped(points: PointBatch, digits: jnp.ndarray,
                      wbits: int = DEFAULT_WBITS) -> PointBatch:
    """Loop-based variant (fori over windows).  Compiles small but on the
    axon TPU tunnel every loop iteration pays a host round trip, so the
    vectorized msm_device below is the production path."""
    nw = digits.shape[1]

    def per_window(w, acc):
        widx = nw - 1 - w
        total = window_total(points, digits[:, widx], wbits)
        # unrolled doubling chain: device-loop iterations cost a host round
        # trip on the axon tunnel, and these are tiny single-point ops
        for _ in range(wbits):
            acc = jp.double(acc)
        return jp.add(acc, total)

    return jax.lax.fori_loop(0, nw, per_window, jp.identity(()))


def _all_window_totals(points: PointBatch, digits: jnp.ndarray,
                       wbits: int) -> PointBatch:
    """Every window's bucket accumulation + fold, vectorized over the window
    axis in ONE fixed-shape computation (no loops): returns (nw, 20) coords.
    nw comes from the digits array, which may carry fewer than
    ceil(256/wbits) windows for short scalars (tests use this to drive the
    TPU-production variant through CPU parity runs cheaply)."""
    nw = digits.shape[1]
    nbuckets = 1 << (wbits - 1)
    n = digits.shape[0]

    dT = digits.T                                   # (nw, n)
    sign = dT < 0
    absd = jnp.abs(dT)

    # per-window signed points: (nw, n, 20)
    bx = jnp.broadcast_to(points.x, (nw,) + points.x.shape)
    by = jnp.broadcast_to(points.y, (nw,) + points.y.shape)
    bz = jnp.broadcast_to(points.z, (nw,) + points.z.shape)
    bt = jnp.broadcast_to(points.t, (nw,) + points.t.shape)
    pts = PointBatch(bx, by, bz, bt)
    pts = jp.cneg(pts, sign)

    # batched sort by |digit| (one variadic sort op)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (nw, n))
    sorted_key, perm = jax.lax.sort_key_val(absd, idx, dimension=1)
    permx = perm[..., None]
    pts = PointBatch(
        jnp.take_along_axis(pts.x, permx, axis=1),
        jnp.take_along_axis(pts.y, permx, axis=1),
        jnp.take_along_axis(pts.z, permx, axis=1),
        jnp.take_along_axis(pts.t, permx, axis=1),
    )

    # segmented scan along axis 1 (all windows at once)
    ones = jnp.ones((nw, 1), jnp.bool_)
    start = jnp.concatenate([ones, sorted_key[:, 1:] != sorted_key[:, :-1]], axis=1)
    scanned, _ = jax.lax.associative_scan(
        _segment_scan_combine, (pts, start), axis=1
    )
    is_end = jnp.concatenate(
        [sorted_key[:, 1:] != sorted_key[:, :-1], ones], axis=1
    )
    # flat scatter into per-window bucket arrays
    stride = nbuckets + 2
    target = jnp.where(is_end, sorted_key, nbuckets + 1)
    window_ids = jax.lax.broadcasted_iota(jnp.int32, (nw, n), 0)
    flat_target = (window_ids * stride + target).reshape(-1)
    buckets = jp.identity((nw * stride,))
    buckets = PointBatch(
        buckets.x.at[flat_target].set(scanned.x.reshape(-1, 20)),
        buckets.y.at[flat_target].set(scanned.y.reshape(-1, 20)),
        buckets.z.at[flat_target].set(scanned.z.reshape(-1, 20)),
        buckets.t.at[flat_target].set(scanned.t.reshape(-1, 20)),
    )
    buckets = PointBatch(
        buckets.x.reshape(nw, stride, 20)[:, 1: nbuckets + 1],
        buckets.y.reshape(nw, stride, 20)[:, 1: nbuckets + 1],
        buckets.z.reshape(nw, stride, 20)[:, 1: nbuckets + 1],
        buckets.t.reshape(nw, stride, 20)[:, 1: nbuckets + 1],
    )  # (nw, nbuckets, 20), buckets 1..nbuckets

    # weighted fold: suffix sums along the bucket axis, then tree-reduce
    rev = PointBatch(
        buckets.x[:, ::-1], buckets.y[:, ::-1],
        buckets.z[:, ::-1], buckets.t[:, ::-1],
    )
    suffix = jax.lax.associative_scan(
        lambda a, b: jp.add(a, b), rev, axis=1
    )
    m = nbuckets
    while m > 1:
        m //= 2
        suffix = jp.add(
            PointBatch(suffix.x[:, :m], suffix.y[:, :m],
                       suffix.z[:, :m], suffix.t[:, :m]),
            PointBatch(suffix.x[:, m: 2 * m], suffix.y[:, m: 2 * m],
                       suffix.z[:, m: 2 * m], suffix.t[:, m: 2 * m]),
        )
    return PointBatch(
        suffix.x[:, 0], suffix.y[:, 0], suffix.z[:, 0], suffix.t[:, 0]
    )  # (nw, 20)


@functools.partial(jax.jit, static_argnums=(2,))
def msm_device_vectorized(points: PointBatch, digits: jnp.ndarray,
                          wbits: int = DEFAULT_WBITS) -> PointBatch:
    """Loop-free MSM: all windows' bucket work vectorized in one shot; the
    window combine (acc = 2^w*acc + total_w, high to low) is unrolled — one
    device dispatch, no host round trips mid-kernel."""
    nw = digits.shape[1]
    totals = _all_window_totals(points, digits, wbits)

    acc = jp.gather(totals, nw - 1)
    for w in range(nw - 2, -1, -1):
        for _ in range(wbits):
            acc = jp.double(acc)
        acc = jp.add(acc, jp.gather(totals, w))
    return acc


def msm_device(points: PointBatch, digits: jnp.ndarray,
               wbits: int = DEFAULT_WBITS) -> PointBatch:
    """Full MSM: points (n,20) x digits (n, windows) -> one point.

    Backend-adaptive: on TPU the loop-free vectorized kernel (device loops
    cost a host round trip per iteration through the axon tunnel); on CPU
    the fori-loop kernel (unrolled graphs compile pathologically slowly in
    the XLA CPU backend, loops are fine)."""
    if jax.default_backend() in ("tpu", "axon"):
        return msm_device_vectorized(points, digits, wbits)
    return msm_device_looped(points, digits, wbits)


def pad_batch(pts: PointBatch, digits: jnp.ndarray) -> tuple[PointBatch, jnp.ndarray]:
    """Pad n to the next power of two (>=16) with identity points and zero
    digits, so jit compiles are shared across nearby MSM sizes."""
    n = digits.shape[0]
    size = 16
    while size < n:
        size *= 2
    if size == n:
        return pts, digits
    pad = size - n
    ident = jp.identity((pad,))
    pts = PointBatch(
        jnp.concatenate([pts.x, ident.x]), jnp.concatenate([pts.y, ident.y]),
        jnp.concatenate([pts.z, ident.z]), jnp.concatenate([pts.t, ident.t]),
    )
    digits = jnp.concatenate(
        [digits, jnp.zeros((pad, digits.shape[1]), jnp.int32)]
    )
    return pts, digits


def msm(points_oracle, scalars: list[int], wbits: int = DEFAULT_WBITS):
    """Host wrapper: oracle points + int scalars -> oracle point result."""
    from ..oracle import edwards
    n = len(scalars)
    assert n == len(points_oracle)
    if n == 0:
        return edwards.IDENTITY
    pts = jp.pack_points(points_oracle)
    digits = jnp.asarray(signed_digits_radix_2w(scalars, wbits))
    pts, digits = pad_batch(pts, digits)
    out = msm_device(pts, digits, wbits)
    return jp.unpack_points(
        PointBatch(out.x[None], out.y[None], out.z[None], out.t[None])
    )[0]
