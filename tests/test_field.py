"""L0 field oracle tests (upstream analogue: curve25519-dalek field.rs mod test)."""

import random

from zkvm_tpu.constants import P, SQRT_M1, EDWARDS_D
from zkvm_tpu.oracle import field


def test_constants():
    assert P == 2**255 - 19
    assert SQRT_M1 * SQRT_M1 % P == P - 1
    assert SQRT_M1 % 2 == 0  # canonical nonnegative root
    # d = -121665/121666
    assert EDWARDS_D * 121666 % P == (-121665) % P


def test_ring_properties():
    r = random.Random(7)
    for _ in range(50):
        a, b, c = (r.randrange(P) for _ in range(3))
        assert field.mul(a, field.add(b, c)) == field.add(field.mul(a, b), field.mul(a, c))
        assert field.mul(a, b) == field.mul(b, a)
        assert field.sub(a, a) == 0
        assert field.add(a, field.neg(a)) == 0
        assert field.sqr(a) == field.mul(a, a)


def test_invert():
    r = random.Random(8)
    assert field.invert(0) == 0
    for _ in range(20):
        a = r.randrange(1, P)
        assert field.mul(a, field.invert(a)) == 1


def test_batch_invert():
    r = random.Random(9)
    xs = [r.randrange(P) for _ in range(33)]
    xs[5] = 0
    out = field.batch_invert(xs)
    for x, inv in zip(xs, out):
        assert inv == field.invert(x)


def test_sqrt_ratio():
    r = random.Random(10)
    # sqrt_ratio(0,0) = (True, 0); (u, 0) = (False, 0)
    assert field.sqrt_ratio(0, 0) == (True, 0)
    ok, root = field.sqrt_ratio(5, 0)
    assert not ok and root == 0
    for _ in range(30):
        u = r.randrange(1, P)
        v = r.randrange(1, P)
        was_square, rt = field.sqrt_ratio(u, v)
        assert not field.is_negative(rt)
        if was_square:
            assert rt * rt % P * v % P == u % P
        else:
            # rt is sqrt of SQRT_M1 * u/v
            assert rt * rt % P * v % P == u * SQRT_M1 % P


def test_encoding_round_trip():
    r = random.Random(11)
    for _ in range(20):
        a = r.randrange(P)
        assert field.from_bytes_strict(field.to_bytes(a)) == a
    # from_bytes masks top bit
    raw = bytes([0xFF] * 32)
    assert field.from_bytes(raw) == ((1 << 255) - 1) % P
