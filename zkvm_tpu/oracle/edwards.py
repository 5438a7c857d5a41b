"""Twisted Edwards curve (-x² + y² = 1 + d x²y²) in extended coordinates.

Upstream counterpart: curve25519-dalek src/edwards.rs + src/backend/serial/curve_models
(ExtendedPoint / CompletedPoint / Niels points).  Formulas are the unified
add-2008-hwcd-3 (a = -1, k = 2d) and dbl-2008-hwcd, both branch-free — the same
formulas the device kernels implement over limb arrays, which is exactly why they
were chosen upstream (constant-time) and here (TPU-friendly, no data-dependent
control flow).

A point is the tuple (X, Y, Z, T) of ints with x = X/Z, y = Y/Z, T = XY/Z.
"""

from ..constants import P, EDWARDS_D2, BASE_X, BASE_Y, BASE_T

Point = tuple[int, int, int, int]

IDENTITY: Point = (0, 1, 1, 0)
BASEPOINT: Point = (BASE_X, BASE_Y, 1, BASE_T)


def add(p: Point, q: Point) -> Point:
    """Unified extended addition (add-2008-hwcd-3): 8M + 1 k-mult, complete on
    the prime-order (Ristretto) subgroup, valid for doubling and identity."""
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = (Y1 - X1) * (Y2 - X2) % P
    B = (Y1 + X1) * (Y2 + X2) % P
    C = T1 * EDWARDS_D2 % P * T2 % P
    D = 2 * Z1 * Z2 % P
    E = (B - A) % P
    F = (D - C) % P
    G = (D + C) % P
    H = (B + A) % P
    return (E * F % P, G * H % P, F * G % P, E * H % P)


def double(p: Point) -> Point:
    """dbl-2008-hwcd with a = -1: 4M + 4S."""
    X1, Y1, Z1, _ = p
    A = X1 * X1 % P
    B = Y1 * Y1 % P
    C = 2 * Z1 * Z1 % P
    D = (-A) % P
    E = ((X1 + Y1) * (X1 + Y1) - A - B) % P
    G = (D + B) % P
    F = (G - C) % P
    H = (D - B) % P
    return (E * F % P, G * H % P, F * G % P, E * H % P)


def neg(p: Point) -> Point:
    X, Y, Z, T = p
    return ((-X) % P, Y, Z, (-T) % P)


def sub(p: Point, q: Point) -> Point:
    return add(p, neg(q))


def scalar_mul(k: int, p: Point) -> Point:
    """Variable-base scalar multiplication, fixed 4-bit windows
    (oracle stand-in for upstream radix-16 / NAF paths)."""
    k = int(k)
    if k == 0:
        return IDENTITY
    # Precompute 0..15 multiples.
    table = [IDENTITY, p]
    for i in range(2, 16):
        table.append(add(table[i - 1], p))
    digits = []
    while k:
        digits.append(k & 15)
        k >>= 4
    acc = table[digits[-1]]
    for d in reversed(digits[:-1]):
        acc = double(double(double(double(acc))))
        acc = add(acc, table[d])
    return acc


def double_scalar_mul(a: int, A: Point, b: int, B: Point) -> Point:
    """a*A + b*B (upstream vartime::double_base — oracle-simple version)."""
    return add(scalar_mul(a, A), scalar_mul(b, B))


def multiscalar_mul(scalars, points) -> Point:
    """Reference MSM: Straus for small n, Pippenger beyond.

    Upstream counterpart: curve25519-dalek backend/serial/scalar_mul/
    {straus.rs, pippenger.rs} with the same size cutover idea.  Used as the
    oracle for the Pallas MSM kernel and as the CPU fallback for small
    protocol-side MSMs.
    """
    scalars = [int(s) for s in scalars]
    points = list(points)
    assert len(scalars) == len(points)
    n = len(scalars)
    if n == 0:
        return IDENTITY
    if n < 24:
        return _straus(scalars, points)
    w = 8 if n < 4096 else 12
    nbuckets = 1 << w
    mask = nbuckets - 1
    nwindows = (255 + w) // w
    acc = IDENTITY
    for win in range(nwindows - 1, -1, -1):
        if acc != IDENTITY:
            for _ in range(w):
                acc = double(acc)
        buckets = [IDENTITY] * nbuckets
        shift = win * w
        for s, pt in zip(scalars, points):
            d = (s >> shift) & mask
            if d:
                buckets[d] = add(buckets[d], pt)
        # running-sum bucket fold: sum_j j*buckets[j]
        running = IDENTITY
        total = IDENTITY
        for j in range(nbuckets - 1, 0, -1):
            running = add(running, buckets[j])
            total = add(total, running)
        acc = add(acc, total)
    return acc


def _straus(scalars: list[int], points: list[Point]) -> Point:
    """Interleaved 4-bit windows with shared doublings (upstream Straus)."""
    tables = []
    for p in points:
        t = [IDENTITY, p]
        for i in range(2, 16):
            t.append(add(t[i - 1], p))
        tables.append(t)
    acc = IDENTITY
    for win in range(63, -1, -1):
        if acc != IDENTITY:
            acc = double(double(double(double(acc))))
        shift = win * 4
        for s, t in zip(scalars, tables):
            d = (s >> shift) & 15
            if d:
                acc = add(acc, t[d])
    return acc


def is_identity(p: Point) -> bool:
    X, Y, Z, _ = p
    return X % P == 0 and (Y - Z) % P == 0


def to_affine(p: Point) -> tuple[int, int]:
    X, Y, Z, _ = p
    zi = pow(Z, P - 2, P)
    return (X * zi % P, Y * zi % P)


def on_curve(p: Point) -> bool:
    """Check -x² + y² = 1 + d x² y² and T = XY/Z (extended-coordinate invariant)."""
    X, Y, Z, T = p
    if Z % P == 0:
        return False
    x, y = to_affine(p)
    from ..constants import EDWARDS_D
    lhs = (-x * x + y * y) % P
    rhs = (1 + EDWARDS_D * x % P * x % P * y % P * y) % P
    tz = T * Z % P
    return lhs == rhs and tz == X * Y % P
