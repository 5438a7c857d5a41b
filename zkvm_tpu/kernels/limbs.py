"""Limb packing: Python ints / byte strings <-> int32 limb arrays.

The device representation of GF(2^255-19) and mod-ℓ elements is
int32[..., NLIMBS] in radix 2^LIMB_BITS (13), least-significant limb first,
signed with lazy carries (SURVEY.md §7.3: no 64-bit multiply on the TPU VPU,
so products of 13-bit limbs with ≤20-term column sums stay inside int32).
"""

from __future__ import annotations

import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, NLIMBS, P

TOTAL_BITS = LIMB_BITS * NLIMBS  # 260


def int_to_limbs(x: int) -> np.ndarray:
    """One integer -> (NLIMBS,) int32 (canonical, nonnegative limbs)."""
    x = int(x) % (1 << TOTAL_BITS)
    out = np.empty(NLIMBS, dtype=np.int32)
    for i in range(NLIMBS):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def limbs_to_int(limbs) -> int:
    """(..., NLIMBS) -> int (signed limbs fine).  Only for scalars/host use."""
    limbs = np.asarray(limbs)
    assert limbs.shape[-1] == NLIMBS
    acc = 0
    for i in range(NLIMBS - 1, -1, -1):
        acc = (acc << LIMB_BITS) + int(limbs[..., i])
    return acc


def ints_to_limbs(xs: list[int]) -> np.ndarray:
    """Vectorized batch pack: list of n ints -> (n, NLIMBS) int32.

    Goes through a 33-byte LE representation so numpy does the bit surgery
    (values must be < 2^260; field/scalar values always are).
    """
    n = len(xs)
    buf = np.frombuffer(
        b"".join(int(x).to_bytes(33, "little") for x in xs), dtype=np.uint8
    ).reshape(n, 33)
    bits = np.unpackbits(buf, axis=1, bitorder="little")[:, :TOTAL_BITS]
    bits = bits.reshape(n, NLIMBS, LIMB_BITS).astype(np.int32)
    weights = (1 << np.arange(LIMB_BITS, dtype=np.int32))
    return (bits * weights).sum(axis=2, dtype=np.int32)


def limbs_to_ints(limbs) -> list[int]:
    """(n, NLIMBS) int32 (possibly signed/unnormalized) -> list of ints."""
    arr = np.asarray(limbs, dtype=np.int64)
    n = arr.shape[0]
    weights = [1 << (LIMB_BITS * i) for i in range(NLIMBS)]
    return [
        sum(int(arr[j, i]) * weights[i] for i in range(NLIMBS)) for j in range(n)
    ]


def limbs_to_field_ints(limbs) -> list[int]:
    """As limbs_to_ints but reduced mod p."""
    return [x % P for x in limbs_to_ints(limbs)]
