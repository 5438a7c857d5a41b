"""Ristretto255 DECODE on device: one fused Pallas kernel per lane tile.

Upstream counterpart: curve25519-dalek ristretto.rs CompressedRistretto::
decompress (RFC 9496 §4.3.1), which runs one ~254-squaring inverse-sqrt
chain per point on the CPU.  In the batched verifier the dynamic points
(A/S/T1/T2/L/R/V — 17 per proof at m=1) dominated the round-2 host floor
(~75 µs/proof native) AND the device upload (128 B/point of extended
coordinates vs 32 B compressed over a ~40 MB/s link).  Here the host ships
the raw 32-byte encodings; the chip decodes thousands of points in parallel
with the whole field chain resident in VMEM (the XLA alternative would
round-trip HBM ~270 times per batch).

Validity (canonical s, nonnegative s, square root exists, nonnegative t,
y != 0) is returned as a per-point flag plane; callers fold it into their
result fetch.  Identity (s = 0) is VALID here — transcript-point identity
rejection happens in the native transcript replay exactly as upstream's
validate_and_append_point.

Layout: encodings (8, n) u32 words -> coords (NLIMBS, n) ×4 limb-major,
loose limbs straight into the MSM pipeline (kernels/pallas_msm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import EDWARDS_D, LIMB_BITS, LIMB_MASK, NLIMBS, P, SQRT_M1
from .limbs import int_to_limbs
from .pallas_field import _vmem_sqr
from .pallas_msm import _carry_tile, _vmem_mul

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

DEC_TILE = 512  # lanes per grid step


def _const(x: int) -> np.ndarray:
    """(NLIMBS, DEC_TILE) pre-tiled constant.  Mosaic cannot broadcast a
    (1, 1) vreg slice at a nonzero lane offset to a full tile (the r3
    on-chip campaign hit exactly that in _vmem_mul's b[j:j+1] when the
    constant was a (NLIMBS, 1) column), so constants arrive lane-complete
    — the _D2_TILE idiom proven on chip in pallas_msm."""
    col = int_to_limbs(x % (1 << 260)).astype(np.int32)[:, None]
    return np.ascontiguousarray(np.broadcast_to(col, (NLIMBS, DEC_TILE)))


# one consts block passed into the kernel (Pallas forbids captured
# constants): DEC_TILE-wide blocks [d | sqrt_m1 | one | 2p]
_CONSTS = np.concatenate(
    [_const(EDWARDS_D), _const(SQRT_M1), _const(1), _const(2 * P)], axis=1
)


def _sqr(a):
    return _vmem_sqr(a)


def _pow2k(a, k: int):
    for _ in range(k):
        a = _sqr(a)
    return a


def _pow_p58(a):
    """a^((p-5)/8) = a^(2^252 - 3), fully unrolled (the axon runtime syncs
    the host on every device-loop iteration, so the chain must be loop-free
    — kernels/field.py pow2k keeps a rolled variant for CPU)."""
    m = _vmem_mul
    z2 = _sqr(a)
    z9 = m(a, _pow2k(z2, 2))
    z11 = m(z2, z9)
    z_5_0 = m(z9, _sqr(z11))
    z_10_0 = m(_pow2k(z_5_0, 5), z_5_0)
    z_20_0 = m(_pow2k(z_10_0, 10), z_10_0)
    z_40_0 = m(_pow2k(z_20_0, 20), z_20_0)
    z_50_0 = m(_pow2k(z_40_0, 10), z_10_0)
    z_100_0 = m(_pow2k(z_50_0, 50), z_50_0)
    z_200_0 = m(_pow2k(z_100_0, 100), z_100_0)
    z_250_0 = m(_pow2k(z_200_0, 50), z_50_0)
    return m(_pow2k(z_250_0, 2), a)


def _ripple(x):
    """Exact sequential carry propagation, no wrap: limb-major unrolled
    20 steps (the in-kernel twin of field.carry_full_nowrap; overflow
    retained in limb 19).  All rows stay 2-D (1, T) — Mosaic's vreg
    layouts are happiest with rank-2 everywhere."""
    outs = []
    c = jnp.zeros_like(x[:1])
    for i in range(NLIMBS):
        t = x[i: i + 1] + c
        outs.append(t & LIMB_MASK)
        c = t >> LIMB_BITS
    outs[-1] = outs[-1] + (c << LIMB_BITS)
    return jnp.concatenate(outs, axis=0)


def _normalize(a, two_p):
    """Canonical mod-p digits (field.normalize, limb-major, loop-free)."""
    a = _carry_tile(_carry_tile(a))
    a = a + two_p
    a = _ripple(a)
    hi = a[NLIMBS - 1:] >> 8
    a = jnp.concatenate([a[:1] + 19 * hi, a[1:-1], a[-1:] & 0xFF], axis=0)
    a = _ripple(a)
    t = jnp.concatenate([a[:1] + 19, a[1:]], axis=0)
    t = _ripple(t)
    ge = (t[NLIMBS - 1:] >> 8) & 1                       # (1, T)
    t_cleared = jnp.concatenate([t[:-1], t[-1:] & 0xFF], axis=0)
    return jnp.where(ge == 1, t_cleared, a)


def _is_zero(a, two_p):
    """(1, T) mask."""
    return jnp.all(_normalize(a, two_p) == 0, axis=0, keepdims=True)


def _eq(a, b, two_p):
    return _is_zero(_carry_tile(a - b), two_p)


def _is_negative(a, two_p):
    """(1, T) mask."""
    return (_normalize(a, two_p)[:1] & 1) != 0


def _decode_words(words):
    """(8, T) uint32 -> (NLIMBS, T) int32 canonical digits of the raw
    value (in-kernel twin of pallas_msm.decode_words_lm)."""
    w = jnp.concatenate([words, jnp.zeros_like(words[:1])])  # (9, T)
    limbs = []
    for j in range(NLIMBS):
        bit = LIMB_BITS * j
        k, s = bit >> 5, bit & 31
        lo = w[k: k + 1] >> s
        if s > 32 - LIMB_BITS:
            lo = lo | (w[k + 1: k + 2] << (32 - s))
        limbs.append((lo & jnp.uint32(LIMB_MASK)).astype(jnp.int32))
    return jnp.concatenate(limbs, axis=0)


def _decompress_formula(words, consts):
    """words (8, T) u32, consts (NLIMBS, 4*DEC_TILE) = lane-complete blocks
    [d | sqrt_m1 | one | 2p] -> (x, y, z, t, ok) with loose limb coords;
    invalid lanes yield the identity point and ok = 0."""
    m = _vmem_mul
    c = _carry_tile
    d = consts[:, 0 * DEC_TILE: 1 * DEC_TILE]
    sqrt_m1 = consts[:, 1 * DEC_TILE: 2 * DEC_TILE]
    one = consts[:, 2 * DEC_TILE: 3 * DEC_TILE]
    two_p = consts[:, 3 * DEC_TILE: 4 * DEC_TILE]
    s = _decode_words(words)

    # s must be the canonical nonnegative representative: the raw 256-bit
    # value equals its mod-p normalization, with even low bit
    s_canonical = jnp.all(_normalize(s, two_p) == s, axis=0, keepdims=True)
    s_nonneg = (s[:1] & 1) == 0

    ss = _sqr(s)
    u1 = c(one - ss)
    u2 = c(one + ss)
    u2_sqr = _sqr(u2)
    v = c(-m(d, _sqr(u1)) - u2_sqr)

    # invsqrt(v * u2^2) = sqrt_ratio(1, a): r = a^3 * (a^7)^((p-5)/8)
    a = m(v, u2_sqr)
    a3 = m(_sqr(a), a)
    a7 = m(_sqr(a3), a)
    r = m(a3, _pow_p58(a7))
    check = m(a, _sqr(r))
    correct = _eq(check, one, two_p)
    flipped = _eq(check, c(-one), two_p)
    flipped_i = _eq(check, c(-sqrt_m1), two_p)
    r = jnp.where(flipped | flipped_i, m(r, sqrt_m1), r)
    r = jnp.where(_is_negative(r, two_p), c(-r), r)
    was_square = correct | flipped

    den_x = m(r, u2)
    den_y = m(m(r, den_x), v)
    x = m(c(s + s), den_x)
    x = jnp.where(_is_negative(x, two_p), c(-x), x)
    y = m(u1, den_y)
    t = m(x, y)

    ok = (was_square & ~_is_negative(t, two_p) & ~_is_zero(y, two_p)
          & s_canonical & s_nonneg)                      # (1, T)

    ident_x = jnp.zeros_like(x)
    return (
        jnp.where(ok, x, ident_x),
        jnp.where(ok, y, one),
        one,
        jnp.where(ok, t, ident_x),
        ok.astype(jnp.int32),
    )


def _decompress_kernel(w_ref, consts_ref, ox, oy, oz, ot, ok_ref):
    x, y, z, t, ok = _decompress_formula(w_ref[:, :], consts_ref[:, :])
    ox[:, :] = x
    oy[:, :] = y
    oz[:, :] = z
    ot[:, :] = t
    ok_ref[:, :] = ok


@functools.partial(jax.jit, static_argnums=(1,))
def decompress_points(words: jnp.ndarray, interpret: bool = False):
    """(8, n) u32 compressed encodings -> ((NLIMBS, n) ×4 loose extended
    coords, (n,) int32 validity).  n is padded to DEC_TILE internally;
    pad lanes decode the identity (s = 0) and are dropped."""
    n = words.shape[1]
    n_pad = max(DEC_TILE, -(-n // DEC_TILE) * DEC_TILE)
    if n_pad != n:
        words = jnp.pad(words, [(0, 0), (0, n_pad - n)])
    wspec = pl.BlockSpec((8, DEC_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((NLIMBS, 4 * DEC_TILE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((NLIMBS, DEC_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    okspec = pl.BlockSpec((1, DEC_TILE), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((NLIMBS, n_pad), jnp.int32)
    okshp = jax.ShapeDtypeStruct((1, n_pad), jnp.int32)
    x, y, z, t, ok = pl.pallas_call(
        _decompress_kernel,
        out_shape=(shp, shp, shp, shp, okshp),
        grid=(n_pad // DEC_TILE,),
        in_specs=[wspec, cspec],
        out_specs=(spec, spec, spec, spec, okspec),
        interpret=interpret,
    )(words, jnp.asarray(_CONSTS))
    return (x[:, :n], y[:, :n], z[:, :n], t[:, :n]), ok[0, :n]
