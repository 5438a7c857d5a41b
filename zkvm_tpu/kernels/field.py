"""Batched GF(2^255-19) arithmetic in JAX: int32[..., 20] limbs, radix 2^13.

The TPU-native re-derivation of curve25519-dalek's field backends
(backend/serial/u64/field.rs and the AVX2 vector backend, SURVEY.md §2.1 P1):
instead of 4-way SIMD field elements, every op here is batched over arbitrary
leading axes and vectorizes across VPU lanes.

Representation invariants ("loose" form):
- limbs are signed int32 with |limb| <= ~2^13.3 between ops;
- mul/square require |limb| <= ~10000 on inputs (column sums of 20 signed
  products of such limbs stay below 2^31: 20 * 10000^2 < 2^31);
- after mul (3 carry passes) limbs lie in [-2, ~8800]; after add/sub + 1 carry
  pass they stay within the mul-safe bound.  tests/test_kernels_field.py
  drives adversarial chains and checks the bound empirically.

Reduction uses the wrap factor 2^260 ≡ 608 (= 19*2^5) mod p.  Carries use
arithmetic shifts, so negative limbs flow through transparently.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, NLIMBS, P, SQRT_M1, WRAP
from .limbs import int_to_limbs

I32 = jnp.int32


def constant(x: int) -> np.ndarray:
    """A (NLIMBS,) constant field element (broadcastable against batches).
    Returned as host numpy so it can be cached and closed over safely in
    jit traces (a jnp array created inside a trace is a tracer and leaks)."""
    return np.asarray(int_to_limbs(x % P), dtype=np.int32)


ZERO = int_to_limbs(0)
ONE = int_to_limbs(1)


def debug_assert_limb_bounds(x: jnp.ndarray, bits: int = 31,
                             what: str = "limbs") -> jnp.ndarray:
    """Runtime limb-bound assertion, enabled by Config.debug_checks /
    ZKVM_TPU_DEBUG_CHECKS (the role of upstream's debug_assert! limb
    invariants - SURVEY.md par.5.2).  Free when disabled; under jit the
    check runs as a host callback."""
    from ..utils.config import get_config
    if not get_config().debug_checks:
        return x
    import jax

    def _check(v, bits=bits, what=what):
        import numpy as _np
        m = int(_np.abs(_np.asarray(v)).max()) if v.size else 0
        if m >= (1 << bits):
            raise AssertionError(
                f"{what}: limb magnitude {m} >= 2^{bits}"
            )
    jax.debug.callback(_check, x)
    return x


def carry_once(x: jnp.ndarray) -> jnp.ndarray:
    """One parallel carry-propagation pass with the 2^260 -> 608 wrap.
    Signed-safe: arithmetic shift keeps x == (x>>13)*2^13 + (x&mask).
    Built from slices/concats only — no dynamic-update-slice (XLA compiles
    DUS chains pathologically slowly; measured 50x compile-time difference).
    """
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    head = lo[..., :1] + WRAP * hi[..., -1:]
    tail = lo[..., 1:] + hi[..., :-1]
    return jnp.concatenate([head, tail], axis=-1)


def add(a, b):
    return carry_once(a + b)


def sub(a, b):
    return carry_once(a - b)


def neg(a):
    return carry_once(-a)


def add_weak(a, b):
    """No-carry add: only when the consumer is another add/carry, not a mul."""
    return a + b


def _product_columns(a, b):
    """Schoolbook column products: (..., 39) with |col| < 20 * 2^26.2.
    Shifted-pad formulation (no dynamic-update-slice)."""
    a, b = jnp.broadcast_arrays(a, b)
    total = None
    for j in range(NLIMBS):
        p = a * b[..., j: j + 1]  # (..., 20)
        padded = jnp.pad(
            p, [(0, 0)] * (p.ndim - 1) + [(j, NLIMBS - 1 - j)]
        )
        total = padded if total is None else total + padded
    return total


def _reduce_columns(c):
    """Fold columns 20..38 with the split 608-wrap, then 3 carry passes."""
    high = c[..., NLIMBS:]
    hi = high >> LIMB_BITS
    lo = high & LIMB_MASK
    nd = c.ndim - 1
    r = (
        c[..., :NLIMBS]
        + jnp.pad(WRAP * lo, [(0, 0)] * nd + [(0, 1)])   # cols 0..18
        + jnp.pad(WRAP * hi, [(0, 0)] * nd + [(1, 0)])   # cols 1..19
    )
    r = carry_once(r)
    r = carry_once(r)
    return carry_once(r)


def mul(a, b):
    return debug_assert_limb_bounds(
        _reduce_columns(_product_columns(a, b)), bits=14, what="mul output"
    )


def sqr(a):
    return mul(a, a)


def mul_small(a, k: int):
    """Multiply by a small public constant |k| < 2^17."""
    return carry_once(carry_once(a * jnp.int32(k)))


def pow2k(a, k: int):
    """a^(2^k) by repeated squaring (rolled into a fori_loop past k=4 so the
    245-squaring inversion chains compile to small graphs)."""
    if k <= 4:
        for _ in range(k):
            a = sqr(a)
        return a
    import jax
    return jax.lax.fori_loop(0, k, lambda _, x: sqr(x), a)


def invert(a):
    """Fermat inversion via the classic 254-squaring addition chain
    (curve25519-dalek FieldElement::invert / pow22501 structure)."""
    z2 = sqr(a)                  # 2
    z8 = pow2k(z2, 2)            # 8
    z9 = mul(a, z8)              # 9
    z11 = mul(z2, z9)            # 11
    z22 = sqr(z11)               # 22
    z_5_0 = mul(z9, z22)         # 2^5 - 2^0
    z_10_0 = mul(pow2k(z_5_0, 5), z_5_0)       # 2^10 - 1
    z_20_0 = mul(pow2k(z_10_0, 10), z_10_0)    # 2^20 - 1
    z_40_0 = mul(pow2k(z_20_0, 20), z_20_0)    # 2^40 - 1
    z_50_0 = mul(pow2k(z_40_0, 10), z_10_0)    # 2^50 - 1
    z_100_0 = mul(pow2k(z_50_0, 50), z_50_0)   # 2^100 - 1
    z_200_0 = mul(pow2k(z_100_0, 100), z_100_0)  # 2^200 - 1
    z_250_0 = mul(pow2k(z_200_0, 50), z_50_0)  # 2^250 - 1
    return mul(pow2k(z_250_0, 5), z11)         # 2^255 - 21 = p - 2


def pow_p58(a):
    """a^((p-5)/8) = a^(2^252 - 3) (shares the 2^250-1 chain)."""
    z2 = sqr(a)
    z8 = pow2k(z2, 2)
    z9 = mul(a, z8)
    z11 = mul(z2, z9)
    z22 = sqr(z11)
    z_5_0 = mul(z9, z22)
    z_10_0 = mul(pow2k(z_5_0, 5), z_5_0)
    z_20_0 = mul(pow2k(z_10_0, 10), z_10_0)
    z_40_0 = mul(pow2k(z_20_0, 20), z_20_0)
    z_50_0 = mul(pow2k(z_40_0, 10), z_10_0)
    z_100_0 = mul(pow2k(z_50_0, 50), z_50_0)
    z_200_0 = mul(pow2k(z_100_0, 100), z_100_0)
    z_250_0 = mul(pow2k(z_200_0, 50), z_50_0)
    return mul(pow2k(z_250_0, 2), a)           # 2^252 - 3


def carry_full_nowrap(x):
    """Exact sequential carry propagation (20-step scan, batch-parallel),
    no 2^260 wrap: overflow is retained in limb 19.  Unlike the parallel
    carry passes this fully resolves ripple chains (e.g. ...8191,8191 + 1),
    which canonicalization requires."""
    import jax

    xT = jnp.moveaxis(x, -1, 0)

    def step(carry, limb):
        t = limb + carry
        return t >> LIMB_BITS, t & LIMB_MASK

    carry_out, limbs = jax.lax.scan(step, jnp.zeros(x.shape[:-1], I32), xT)
    out = jnp.moveaxis(limbs, 0, -1)
    top = out[..., -1:] + (carry_out[..., None] << LIMB_BITS)
    return jnp.concatenate([out[..., :-1], top], axis=-1)


# canonical limb decomposition of 2p = 2^256 - 38: [8154, 8191*18, 511].
# Added to a loose value (limbs >= -3) it makes the value nonnegative
# (2p ~ 2^256 dominates the worst negative loose value ~ -2^249).
_TWO_P_CANON = np.asarray(int_to_limbs(2 * P), dtype=np.int32)


def normalize(a):
    """Full canonical reduction: limbs in [0, 2^13) representing v in [0, p).

    Branchless (donna-style): tighten carries; add 2p to force nonnegativity;
    fold bits >=255 via v ≡ 19*(v >> 255) + (v mod 2^255); one conditional
    subtraction of p using the add-19/check-bit-255 trick.
    """
    a = carry_once(carry_once(a))          # limbs in ~[-3, 8801]
    a = a + _TWO_P_CANON                   # value nonneg, limbs < 2^14.1
    a = carry_full_nowrap(a)               # canonical limbs, top holds bits >=247
    # fold bits >= 255: hi = v >> 255 (< 2^10), v = 19*hi + (v mod 2^255)
    hi = a[..., -1:] >> 8
    head = a[..., :1] + 19 * hi
    a = jnp.concatenate([head, a[..., 1:-1], a[..., -1:] & 0xFF], axis=-1)
    a = carry_full_nowrap(a)               # v < 2^255 + 2^14.4, canonical limbs
    # conditional subtract: t = v + 19; bit 255 of t set <=> v >= p;
    # and then v - p = t - 2^255.
    t = jnp.concatenate([a[..., :1] + 19, a[..., 1:]], axis=-1)
    t = carry_full_nowrap(t)
    ge = (t[..., NLIMBS - 1] >> 8) & 1
    t_cleared = jnp.concatenate([t[..., :-1], t[..., -1:] & 0xFF], axis=-1)
    return jnp.where((ge == 1)[..., None], t_cleared, a)


def is_zero(a):
    """Branchless zero test (mod p): normalize then compare limbs to 0."""
    n = normalize(a)
    return jnp.all(n == 0, axis=-1)


def eq(a, b):
    return is_zero(sub(a, b))


def is_negative(a):
    """RFC 9496 negativity: low bit of the canonical representative."""
    return (normalize(a)[..., 0] & 1).astype(jnp.bool_)


def select(mask, a, b):
    """mask ? a : b, with mask of shape batch (no trailing limb axis)."""
    return jnp.where(mask[..., None], a, b)


def cneg(a, mask):
    """Conditionally negate where mask (batch-shaped) is true."""
    return select(mask, neg(a), a)


def sqrt_ratio(u, v):
    """Batched sqrt(u/v) (upstream FieldElement::sqrt_ratio_i).

    Returns (was_square: bool[batch], r) with r nonnegative; r is
    sqrt(u/v) when square, sqrt(SQRT_M1 * u/v) otherwise.
    """
    v3 = mul(sqr(v), v)
    v7 = mul(sqr(v3), v)
    r = mul(mul(u, v3), pow_p58(mul(u, v7)))
    check = mul(v, sqr(r))

    u_neg = neg(u)
    correct_sign = eq(check, u)
    flipped_sign = eq(check, u_neg)
    flipped_sign_i = eq(check, mul(u_neg, constant(SQRT_M1)))

    r_prime = mul(r, constant(SQRT_M1))
    r = select(flipped_sign | flipped_sign_i, r_prime, r)
    # choose the nonnegative root
    r = cneg(r, is_negative(r))
    return correct_sign | flipped_sign, r


def batch_invert_chain(a):
    """Inversion of a whole batch via the Fermat chain (amortizes fine on
    device since everything is vectorized); zero maps to zero."""
    return invert(a)
