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
on unpack).  Production caller: kernels/batch_verify_device.py synthesizes
the verifier's g/h generator columns on device from per-proof transcript
challenges (upstream seam: inner_product_proof.rs verification_scalars +
range_proof/mod.rs verify_multiple), then converts to signed radix-2^13 MSM
digits via `signed_digits13` below.
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


def accumulate(x, axis=0):
    """Sum a batch of carry-tight (..., 20) values over `axis` and reduce.
    Safe for up to ~2^17 terms: carry-tight limbs are < 2^13+17 (signed
    magnitude), so column sums stay well inside int32."""
    return _reduce(jnp.sum(x, axis=axis))


# ----------------------------------------------------- limb-MAJOR variants
# Arrays are (20 | K, ...batch) with the LIMB axis FIRST: the batch rides
# the (sublane, lane) tile so every vreg lane is useful.  The limbs-last
# ops above put the 20-limb axis on the 128-lane minor dim — a 6.4x pad on
# every elementwise op, which made the on-chip scalar synthesis stage of
# the fused batch verify ~65 ms of the 153 ms compute at nb=4096.  The
# high-limb fold becomes R^T @ high — an MXU matmul over the batch.


def _carry_pass_lm(x):
    """One parallel carry pass, limb axis FIRST: (K, ...) -> (K+1, ...)."""
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    nd = x.ndim - 1
    return (
        jnp.pad(lo, [(0, 1)] + [(0, 0)] * nd)
        + jnp.pad(hi, [(1, 0)] + [(0, 0)] * nd)
    )


def _fold_high_lm(cols):
    """Fold limbs >= NLIMBS through R: (K, ...) -> (20, ...)."""
    k = cols.shape[0]
    if k <= NLIMBS:
        nd = cols.ndim - 1
        return jnp.pad(cols, [(0, NLIMBS - k)] + [(0, 0)] * nd)
    high = cols[NLIMBS:]
    table = jnp.asarray(_R[: k - NLIMBS])         # (k-20, 20)
    folded = jnp.tensordot(table.T, high, axes=1).astype(jnp.int32)
    return cols[:NLIMBS] + folded


def _reduce_lm(cols):
    """_reduce with the limb axis first (same 9-round bound argument)."""
    for _ in range(9):
        cols = _carry_pass_lm(_carry_pass_lm(cols))
        cols = _fold_high_lm(cols)
    return cols


def mul_lm(a, b):
    """(20, ...) x (20, ...) -> (20, ...), congruent mod ℓ."""
    a, b = jnp.broadcast_arrays(a, b)
    nd = a.ndim - 1
    total = None
    for j in range(NLIMBS):
        p = a * b[j: j + 1]
        padded = jnp.pad(p, [(j, NLIMBS - 1 - j)] + [(0, 0)] * nd)
        total = padded if total is None else total + padded
    return _reduce_lm(total)


def add_lm(a, b):
    return _reduce_lm(a + b)


def neg_lm(a):
    return _reduce_lm(-a)


def accumulate_lm(x, axis):
    """Sum carry-tight (20, ...) values over a batch axis and reduce."""
    return _reduce_lm(jnp.sum(x, axis=axis))


def decode_words_first(words):
    """(8, ...) uint32 canonical LE words -> (20, ...) int32 limbs (the
    limb-major twin of decode_words_last; same as pallas_msm's
    decode_words_lm but shape-generic)."""
    from ..constants import LIMB_BITS as LB, LIMB_MASK as LM
    w = jnp.concatenate([words, jnp.zeros_like(words[:1])], axis=0)
    limbs = []
    for j in range(NLIMBS):
        bit = LB * j
        k, s = bit >> 5, bit & 31
        lo = w[k] >> s
        if s > 32 - LB:
            lo = lo | (w[k + 1] << (32 - s))
        limbs.append((lo & jnp.uint32(LM)).astype(jnp.int32))
    return jnp.stack(limbs, axis=0)


def decode_words_last(words):
    """(..., 8) uint32 canonical little-endian words -> (..., 20) int32
    limbs (the limbs-LAST twin of pallas_msm.decode_words_lm, for the
    scalar-synthesis layout where the batch leads)."""
    from ..constants import LIMB_BITS as LB, LIMB_MASK as LM
    w = jnp.concatenate([words, jnp.zeros_like(words[..., :1])], axis=-1)
    limbs = []
    for j in range(NLIMBS):
        bit = LB * j
        k, s = bit >> 5, bit & 31
        lo = w[..., k] >> s
        if s > 32 - LB:
            lo = lo | (w[..., k + 1] << (32 - s))
        limbs.append((lo & jnp.uint32(LM)).astype(jnp.int32))
    return jnp.stack(limbs, axis=-1)


# ----------------------------------------------------------- digit recoding
_L_LIMBS = int_to_limbs(L).astype(np.int32)    # canonical limbs of ℓ
_DELTA_LIMBS = int_to_limbs(L - (1 << 252)).astype(np.int32)  # ℓ - 2^252


def _ripple_canonical(x, keep_carry: bool = False):
    """Exact sequential carry propagation: (..., 20) int32 limbs -> canonical
    digits in [0, 2^13).  20 unrolled steps; carries/borrows ripple exactly
    (floor shifts).  keep_carry appends the final carry as limb 20 — loose
    mul/accumulate outputs can exceed 2^260 by a sliver (limbs are
    carry-tight at ~2^13+17, so values reach ~1.002·2^260), and dropping
    that carry would change the value mod ℓ."""
    outs = []
    c = jnp.zeros(x.shape[:-1], jnp.int32)
    for i in range(NLIMBS):
        t = x[..., i] + c
        outs.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    if keep_carry:
        outs.append(c)
    return jnp.stack(outs, axis=-1)


def partial_reduce_digits(x):
    """Loose nonnegative (..., 20) limbs (value < 2^261, congruent mod ℓ)
    -> CANONICAL radix-2^13 digits of an equivalent value in
    (0, 2^253 + 2^126): with q = x >> 252 (read from the carry-retaining
    ripple), x -> (x mod 2^252) + ℓ - q·(ℓ - 2^252).  The result is below
    2^254, so any signed radix-2^w recode's top window cannot overflow
    (top raw digit < 2^(w-2) for every w with ceil(256/w) windows)."""
    d = _ripple_canonical(x, keep_carry=True)      # (..., 21)
    # q = x >> 252: bits 252..259 live in digit 19 (>>5), 260+ in digit 20
    q = (d[..., NLIMBS - 1] >> 5) | (d[..., NLIMBS] << 8)
    r = jnp.concatenate(
        [d[..., : NLIMBS - 1], d[..., NLIMBS - 1: NLIMBS] & 31], axis=-1
    )                                              # x mod 2^252
    adj = (r + jnp.asarray(_L_LIMBS)
           - q[..., None] * jnp.asarray(_DELTA_LIMBS))
    return _ripple_canonical(adj)


def signed_digits13(x):
    """Loose nonnegative (..., 20) limbs -> SIGNED radix-2^13 MSM digits
    (..., 20), value-preserving mod ℓ: when the MSM window width is 13 the
    digit index IS the limb index, so recoding is a 20-step carry ripple."""
    d = partial_reduce_digits(x)
    half = 1 << (LIMB_BITS - 1)
    outs = []
    c = jnp.zeros(d.shape[:-1], jnp.int32)
    for i in range(NLIMBS):
        t = d[..., i] + c
        over = t >= half
        outs.append(jnp.where(over, t - (1 << LIMB_BITS), t))
        c = over.astype(jnp.int32)
    return jnp.stack(outs, axis=-1)


def digits_to_words(d):
    """Canonical (..., 20) radix-2^13 digits (value < 2^256) -> (..., 8)
    uint32 little-endian words — the exact bit repacking feeding
    pallas_msm.recode_digits_device for arbitrary window widths."""
    du = d.astype(jnp.uint32)
    words = []
    for k in range(8):
        base = 32 * k
        w = None
        for i in range(NLIMBS):
            off = LIMB_BITS * i - base
            if off <= -LIMB_BITS or off >= 32:
                continue
            piece = (du[..., i] << off) if off >= 0 else (du[..., i] >> -off)
            w = piece if w is None else (w | piece)
        words.append(w)
    return jnp.stack(words, axis=-1)


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
