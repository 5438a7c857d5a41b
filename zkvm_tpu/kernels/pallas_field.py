"""Pallas TPU kernels for batched field arithmetic — the speed-of-light path.

Measured context (BASELINE.md): the jnp limb kernels reach ~29 Mmul/s on a
v5e chip in the best (limb-major) layout because every intermediate round-
trips HBM; a full field mul is ~1000 VPU int-ops, so the chip's ceiling is
O(1 Gmul/s).  These kernels keep the whole mul (products, fold, carries) in
VMEM with the batch on the lane axis.

Layout: limb-major (NLIMBS, B) int32 blocks, B a multiple of 128.
Status: groundwork — parity-tested vs the jnp/oracle kernels (on TPU); the
point/MSM layer migrates onto these in the next round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import LIMB_BITS, LIMB_MASK, NLIMBS, WRAP

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANE_TILE = 512  # lanes per grid step (4 vregs wide)


def _vmem_mul(a, b):
    """Field mul on (NLIMBS, ...) blocks resident in VMEM, pad/concat only
    (Pallas TPU has no scatter lowering, so no .at[].add).  Rank-agnostic:
    limbs on axis 0, any batch shape behind — the single copy of record,
    shared by the MSM point kernels (pallas_msm) and the ristretto decode
    kernel (pallas_decompress)."""
    tail = [(0, 0)] * (a.ndim - 1)
    total = None
    for j in range(NLIMBS):
        prod = a * b[j: j + 1]
        padded = jnp.pad(prod, [(j, NLIMBS - 1 - j)] + tail)
        total = padded if total is None else total + padded
    high = total[NLIMBS:]
    hi = high >> LIMB_BITS
    lo = high & LIMB_MASK
    r = (
        total[:NLIMBS]
        + jnp.pad(WRAP * lo, [(0, 1)] + tail)
        + jnp.pad(WRAP * hi, [(1, 0)] + tail)
    )
    for _ in range(3):
        hi = r >> LIMB_BITS
        lo = r & LIMB_MASK
        r = jnp.concatenate(
            [lo[:1] + WRAP * hi[-1:], lo[1:] + hi[:-1]], axis=0
        )
    return r


def _vmem_sqr(a):
    """Field SQUARE on (NLIMBS, ...) VMEM blocks: the symmetric products
    appear once and double (190 + 20 partial products vs the generic mul's
    400), cutting ~45% of the VPU work in squaring-dominated chains — the
    ristretto decode's ~254-step Fermat ladder is all squarings
    (pallas_decompress._pow_p58; upstream curve25519-dalek field.rs
    square / pow2k have the same specialization).

    Overflow audit (int32 accumulators): loose inputs |a_j| <= ~2^13.1;
    off-diagonal column sums have <= 10 terms -> |sum| <= 10 * 2^26.2 <
    2^29.6, doubled < 2^30.6; diagonal adds one 2^26.2 term -> < 2^30.7 <
    2^31.  (The generic mul's bound is 20 * 2^26.2 < 2^30.6 — same
    regime.)"""
    tail = [(0, 0)] * (a.ndim - 1)
    width = 2 * NLIMBS - 1
    off = None
    for j in range(NLIMBS - 1):
        prod = a[j + 1:] * a[j: j + 1]            # a_k * a_j, k > j
        padded = jnp.pad(prod, [(2 * j + 1, NLIMBS - 1 - j)] + tail)
        off = padded if off is None else off + padded
    asq = a * a
    # diagonal terms a_j^2 at even positions 2j: interleave with zeros
    diag = jnp.stack([asq, jnp.zeros_like(asq)], axis=1).reshape(
        (width + 1,) + a.shape[1:])[:width]
    total = off + off + diag
    high = total[NLIMBS:]
    hi = high >> LIMB_BITS
    lo = high & LIMB_MASK
    r = (
        total[:NLIMBS]
        + jnp.pad(WRAP * lo, [(0, 1)] + tail)
        + jnp.pad(WRAP * hi, [(1, 0)] + tail)
    )
    for _ in range(3):
        hi = r >> LIMB_BITS
        lo = r & LIMB_MASK
        r = jnp.concatenate(
            [lo[:1] + WRAP * hi[-1:], lo[1:] + hi[:-1]], axis=0
        )
    return r


def _mul_kernel(a_ref, b_ref, o_ref):
    """(NLIMBS, T) x (NLIMBS, T) -> (NLIMBS, T), all resident in VMEM."""
    o_ref[:, :] = _vmem_mul(a_ref[:, :], b_ref[:, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def mul(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched field mul, limb-major (NLIMBS, B) with B % LANE_TILE == 0."""
    assert a.shape[0] == NLIMBS and a.shape == b.shape
    B = a.shape[1]
    assert B % LANE_TILE == 0, f"batch {B} must be a multiple of {LANE_TILE}"
    grid = (B // LANE_TILE,)
    spec = pl.BlockSpec(
        (NLIMBS, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, B), jnp.int32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)


def _add_kernel(a_ref, b_ref, o_ref):
    x = a_ref[:, :] + b_ref[:, :]
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    head = lo[:1, :] + WRAP * hi[-1:, :]
    tail = lo[1:, :] + hi[:-1, :]
    o_ref[:, :] = jnp.concatenate([head, tail], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def add(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    B = a.shape[1]
    assert B % LANE_TILE == 0
    spec = pl.BlockSpec(
        (NLIMBS, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, B), jnp.int32),
        grid=(B // LANE_TILE,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)


def _point_add_kernel(x1, y1, z1, t1, x2, y2, z2, t2, d2_ref, ox, oy, oz, ot):
    """Unified extended Edwards addition, fully fused in VMEM:
    9 muls + adds with no HBM round trips between them."""

    m = _vmem_mul

    def carry(x):
        hi = x >> LIMB_BITS
        lo = x & LIMB_MASK
        return jnp.concatenate(
            [lo[:1, :] + WRAP * hi[-1:, :], lo[1:, :] + hi[:-1, :]], axis=0
        )

    X1, Y1, Z1, T1 = x1[:, :], y1[:, :], z1[:, :], t1[:, :]
    X2, Y2, Z2, T2 = x2[:, :], y2[:, :], z2[:, :], t2[:, :]
    d2 = d2_ref[:, :]

    A = m(carry(Y1 - X1), carry(Y2 - X2))
    Bv = m(carry(Y1 + X1), carry(Y2 + X2))
    C = m(m(T1, d2), T2)
    D = m(Z1, carry(Z2 + Z2))
    E = carry(Bv - A)
    F = carry(D - C)
    G = carry(D + C)
    H = carry(Bv + A)
    ox[:, :] = m(E, F)
    oy[:, :] = m(G, H)
    oz[:, :] = m(F, G)
    ot[:, :] = m(E, H)


@functools.partial(jax.jit, static_argnames=("interpret",))
def point_add(p1, p2, interpret: bool = False):
    """Batched unified point addition; p1/p2 are 4-tuples of (NLIMBS, B)."""
    from ..constants import EDWARDS_D2
    from .limbs import int_to_limbs
    import numpy as np

    B = p1[0].shape[1]
    assert B % LANE_TILE == 0
    d2 = jnp.asarray(
        np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, LANE_TILE))
    ).astype(jnp.int32)
    spec = pl.BlockSpec(
        (NLIMBS, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    d2_spec = pl.BlockSpec(
        (NLIMBS, LANE_TILE), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    shapes = [jax.ShapeDtypeStruct((NLIMBS, B), jnp.int32)] * 4
    return pl.pallas_call(
        _point_add_kernel,
        out_shape=tuple(shapes),
        grid=(B // LANE_TILE,),
        in_specs=[spec] * 8 + [d2_spec],
        out_specs=tuple([spec] * 4),
        interpret=interpret,
    )(*p1, *p2, d2)
