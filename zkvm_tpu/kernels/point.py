"""Batched Edwards point operations on limb arrays.

Upstream counterpart: curve25519-dalek backend/vector/avx2/edwards.rs — parallel
formulas over SIMD field elements — generalized to arbitrary batch axes.

A batch of points is a 4-tuple (X, Y, Z, T) of int32[..., 20] limb arrays in
extended twisted-Edwards coordinates (a = -1).  Formulas are the same unified
add-2008-hwcd-3 / dbl-2008-hwcd used by the oracle (oracle/edwards.py), so the
two implementations are term-for-term comparable in parity tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..constants import EDWARDS_D2, P
from . import field as F
from .limbs import ints_to_limbs, limbs_to_field_ints


class PointBatch(NamedTuple):
    """int32[..., 20] each; leading axes are the batch."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray


_D2 = F.constant(EDWARDS_D2)  # host numpy: safe to embed in traces


def _d2():
    return _D2


def identity(batch_shape: tuple[int, ...] = ()) -> PointBatch:
    zero = jnp.zeros(batch_shape + (20,), jnp.int32)
    one = jnp.broadcast_to(F.constant(1), batch_shape + (20,))
    return PointBatch(zero, one, one, zero)


def add(p: PointBatch, q: PointBatch) -> PointBatch:
    """Unified extended addition: 9M, complete on the Ristretto subgroup."""
    A = F.mul(F.sub(p.y, p.x), F.sub(q.y, q.x))
    B = F.mul(F.add(p.y, p.x), F.add(q.y, q.x))
    C = F.mul(F.mul(p.t, _d2()), q.t)
    D = F.mul(p.z, F.add(q.z, q.z))
    E = F.sub(B, A)
    Fv = F.sub(D, C)
    G = F.add(D, C)
    H = F.add(B, A)
    return PointBatch(F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H))


def double(p: PointBatch) -> PointBatch:
    """dbl-2008-hwcd (a=-1): 4M + 4S."""
    A = F.sqr(p.x)
    B = F.sqr(p.y)
    C = F.add(F.sqr(p.z), F.sqr(p.z))
    D = F.neg(A)
    xy = F.add(p.x, p.y)
    E = F.sub(F.sub(F.sqr(xy), A), B)
    G = F.add(D, B)
    Fv = F.sub(G, C)
    H = F.sub(D, B)
    return PointBatch(F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H))


def neg(p: PointBatch) -> PointBatch:
    return PointBatch(F.neg(p.x), p.y, p.z, F.neg(p.t))


def cneg(p: PointBatch, mask) -> PointBatch:
    """Conditionally negate where mask (batch-shaped) is true."""
    return PointBatch(F.cneg(p.x, mask), p.y, p.z, F.cneg(p.t, mask))


def select(mask, p: PointBatch, q: PointBatch) -> PointBatch:
    """mask ? p : q elementwise over the batch."""
    return PointBatch(
        F.select(mask, p.x, q.x), F.select(mask, p.y, q.y),
        F.select(mask, p.z, q.z), F.select(mask, p.t, q.t),
    )


def gather(p: PointBatch, idx) -> PointBatch:
    """Index the batch axis: returns points[idx]."""
    return PointBatch(p.x[idx], p.y[idx], p.z[idx], p.t[idx])


def tree_reduce(p: PointBatch) -> PointBatch:
    """Sum all points along the leading axis via log-depth pairwise folding.
    The batch length must be a power of two (pad with identities)."""
    n = p.x.shape[0]
    assert n & (n - 1) == 0
    while n > 1:
        n //= 2
        p = add(gather(p, slice(0, n)), gather(p, slice(n, 2 * n)))
    return p


def _stack_table(tbl: list[PointBatch]) -> PointBatch:
    return PointBatch(
        jnp.stack([t.x for t in tbl], axis=-2),
        jnp.stack([t.y for t in tbl], axis=-2),
        jnp.stack([t.z for t in tbl], axis=-2),
        jnp.stack([t.t for t in tbl], axis=-2),
    )  # (batch, 16, 20)


def _make_table(p: PointBatch) -> PointBatch:
    """Per-point multiples table [0..15]*P, stacked on axis -2."""
    tbl = [identity(p.x.shape[:-1]), p]
    for k in range(2, 16):
        tbl.append(add(tbl[k - 1], p))
    return _stack_table(tbl)


def _lookup(stacked: PointBatch, d) -> PointBatch:
    """Branchless select of table[d] per batch element (masked one-hot sum,
    the TPU analogue of upstream's subtle::ConditionallySelectable scans)."""
    onehot = (jnp.arange(16, dtype=jnp.int32) == d[..., None]).astype(jnp.int32)
    return PointBatch(
        jnp.sum(stacked.x * onehot[..., None], axis=-2),
        jnp.sum(stacked.y * onehot[..., None], axis=-2),
        jnp.sum(stacked.z * onehot[..., None], axis=-2),
        jnp.sum(stacked.t * onehot[..., None], axis=-2),
    )


def scalar_mul_fixed_window(p: PointBatch, digits: jnp.ndarray) -> PointBatch:
    """Batched variable-base scalar mul, 4-bit fixed windows, branchless
    table lookups (upstream constant-time radix-16 ladder, edwards.rs).

    p: batch of points; digits: int32[batch, 64] radix-16 digits, LSB first.
    Rolled as a lax.scan over windows (small compiled graph).
    """
    import jax

    stacked = _make_table(p)
    acc = _lookup(stacked, digits[..., 63])

    def body(acc, d):
        for _ in range(4):
            acc = double(acc)
        acc = add(acc, _lookup(stacked, d))
        return acc, None

    # scan over windows 62..0: move window axis to front
    ds = jnp.moveaxis(digits[..., 62::-1], -1, 0)
    acc, _ = jax.lax.scan(body, acc, ds)
    return acc


def double_scalar_mul(s1, p: PointBatch, s2, q: PointBatch) -> PointBatch:
    """Batched s1*P + s2*Q (the IPP fold kernel).  s1, s2: (batch, 64) radix-16
    digit arrays.  Shares the doubling ladder between the two points."""
    import jax

    sp, sq = _make_table(p), _make_table(q)
    acc = add(_lookup(sp, s1[..., 63]), _lookup(sq, s2[..., 63]))

    def body(acc, ds):
        d1, d2 = ds
        for _ in range(4):
            acc = double(acc)
        acc = add(acc, _lookup(sp, d1))
        acc = add(acc, _lookup(sq, d2))
        return acc, None

    ds = (
        jnp.moveaxis(s1[..., 62::-1], -1, 0),
        jnp.moveaxis(s2[..., 62::-1], -1, 0),
    )
    acc, _ = jax.lax.scan(body, acc, ds)
    return acc


# ---------------------------------------------------------------- host pack
def pack_points(points) -> PointBatch:
    """List of oracle edwards points (int 4-tuples) -> PointBatch (n, 20)."""
    xs = ints_to_limbs([p[0] for p in points])
    ys = ints_to_limbs([p[1] for p in points])
    zs = ints_to_limbs([p[2] for p in points])
    ts = ints_to_limbs([p[3] for p in points])
    return PointBatch(*(jnp.asarray(a) for a in (xs, ys, zs, ts)))


def unpack_points(p: PointBatch) -> list[tuple[int, int, int, int]]:
    xs = limbs_to_field_ints(np.asarray(p.x))
    ys = limbs_to_field_ints(np.asarray(p.y))
    zs = limbs_to_field_ints(np.asarray(p.z))
    ts = limbs_to_field_ints(np.asarray(p.t))
    return list(zip(xs, ys, zs, ts))


def scalars_to_radix16(scalars: list[int]) -> np.ndarray:
    """Canonical scalars -> (n, 64) int32 radix-16 digits (unsigned, LSB first)."""
    n = len(scalars)
    out = np.empty((n, 64), dtype=np.int32)
    for j, s in enumerate(scalars):
        s = int(s)
        for i in range(64):
            out[j, i] = (s >> (4 * i)) & 15
    return out
