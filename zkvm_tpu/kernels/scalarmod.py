"""Batched arithmetic mod ℓ (the group order) on device.

Upstream counterpart: curve25519-dalek src/scalar.rs + serial u64/scalar.rs
(Scalar52 Montgomery machinery).  Montgomery multiplication is serial per
limb, so the TPU kernel instead uses a Barrett-style matrix fold
(SURVEY.md §7.3): after schoolbook limb products, the high-limb digits fold
back through a precomputed table R[i] = 2^(13*(20+i)) mod ℓ — a small int32
matmul — repeated until the value fits 260 bits (six rounds guarantee
convergence from the full 520-bit product; each fold shrinks every high
term by >= 2^7).

Representation matches the field kernels: int32[..., 20] limbs, radix 2^13,
signed/lazy; values are congruent mod ℓ but NOT canonical (the host reduces
on unpack).  Powers the prover's l/r vector algebra and the verifier
s-vector expansion when those migrate on-device (round 2); parity-tested
against the host oracle now.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import L, LIMB_BITS, LIMB_MASK, NLIMBS
from .limbs import int_to_limbs

_MAX_COLS = 2 * NLIMBS + 10  # product width + carry growth headroom

# fold table: R[i] = 2^(13*(20+i)) mod ℓ as canonical limbs (rows cover every
# possible high column up to the 41-column product + carry).
_R = np.stack([
    int_to_limbs(pow(2, LIMB_BITS * (NLIMBS + i), L))
    for i in range(_MAX_COLS - NLIMBS + 1)
]).astype(np.int32)


def _carry_pass(x):
    """One parallel carry pass (signed-safe, no wrap): limb axis grows by 1."""
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    nd = x.ndim - 1
    return (
        jnp.pad(lo, [(0, 0)] * nd + [(0, 1)])
        + jnp.pad(hi, [(0, 0)] * nd + [(1, 0)])
    )


def _fold_high(cols):
    """Fold limbs >= NLIMBS through R: (..., K) -> (..., 20)."""
    k = cols.shape[-1]
    if k <= NLIMBS:
        nd = cols.ndim - 1
        return jnp.pad(cols, [(0, 0)] * nd + [(0, NLIMBS - k)])
    high = cols[..., NLIMBS:]
    table = jnp.asarray(_R[: k - NLIMBS])
    folded = jnp.matmul(
        high, table, preferred_element_type=jnp.int32
    )
    return cols[..., :NLIMBS] + folded


def _reduce(cols):
    """Arbitrary-width signed columns -> (..., 20) loose limbs, mod-ℓ exact.

    Each round: two carry passes re-digitize (so fold-matmul magnitudes stay
    inside int32: |digit| <= 2^13+17, entries <= 2^13, <= 21 terms < 2^31),
    then one fold.  Nine rounds guarantee convergence into [0, 2^260) from
    the full 520-bit product, including negative (subtraction) inputs —
    once converged the folds are no-ops and the final limbs are carry-tight
    (mul-safe)."""
    for _ in range(9):
        cols = _carry_pass(_carry_pass(cols))
        cols = _fold_high(cols)
    return cols


def mul(a, b):
    """(..., 20) x (..., 20) -> (..., 20), congruent mod ℓ."""
    a, b = jnp.broadcast_arrays(a, b)
    total = None
    nd = a.ndim - 1
    for j in range(NLIMBS):
        p = a * b[..., j: j + 1]
        padded = jnp.pad(p, [(0, 0)] * nd + [(j, NLIMBS - 1 - j)])
        total = padded if total is None else total + padded
    return _reduce(total)


def add(a, b):
    return _reduce(a + b)


def sub(a, b):
    return _reduce(a - b)


def neg(a):
    return _reduce(-a)


def inner_product(a, b, axis=-2):
    """sum_i a_i * b_i over `axis` (vectors of scalars, limbs on the last
    axis): schoolbook products summed before one shared reduction."""
    a, b = jnp.broadcast_arrays(a, b)
    nd = a.ndim - 1
    total = None
    for j in range(NLIMBS):
        p = a * b[..., j: j + 1]
        padded = jnp.pad(p, [(0, 0)] * nd + [(j, NLIMBS - 1 - j)])
        total = padded if total is None else total + padded
    # carry before the cross-element sum so column magnitudes stay in int32
    total = _carry_pass(_carry_pass(total))
    summed = jnp.sum(total, axis=axis)  # sum of digit forms: cols < n*2^13
    return _reduce(summed)
