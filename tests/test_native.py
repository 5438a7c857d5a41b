"""Native C++ STROBE/Keccak vs the Python oracle: bit-exact equivalence."""

import os
import random

import pytest

from zkvm_tpu.native import get_lib, NativeStrobe128
from zkvm_tpu.oracle.strobe import Strobe128

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def test_keccak_parity():
    import ctypes
    from zkvm_tpu.oracle.keccak import keccak_f1600_bytes
    lib = get_lib()
    r = random.Random(1)
    for _ in range(5):
        state = bytearray(r.getrandbits(8) for _ in range(200))
        expect = bytearray(state)
        keccak_f1600_bytes(expect)
        buf = ctypes.create_string_buffer(bytes(state), 200)
        lib.keccak_f1600(buf)
        assert buf.raw[:200] == bytes(expect)


def test_strobe_parity_random_op_sequences():
    r = random.Random(2)
    for trial in range(10):
        py = Strobe128(b"parity test")
        nt = NativeStrobe128(b"parity test")
        for _ in range(30):
            op = r.choice(["meta_ad", "ad", "key", "prf"])
            if op == "prf":
                n = r.randrange(1, 200)
                assert py.prf(n, False) == nt.prf(n, False), (trial, op)
            else:
                data = bytes(r.getrandbits(8) for _ in range(r.randrange(0, 300)))
                getattr(py, op)(data, False)
                getattr(nt, op)(data, False)
        assert py.prf(32, False) == nt.prf(32, False)


def test_native_clone_independent():
    a = NativeStrobe128(b"clone")
    a.ad(b"x", False)
    b = a.clone()
    b.ad(b"y", False)
    a2 = a.prf(16, False)
    # a unaffected by b's mutation: replay a fresh pair
    p = Strobe128(b"clone")
    p.ad(b"x", False)
    assert a2 == p.prf(16, False)


def test_merlin_uses_native_and_matches_vector():
    from zkvm_tpu.oracle.merlin import Transcript
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert t.challenge_bytes(b"challenge", 32).hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


# ---------------------------------------------------------------- ristretto
def _rand_pts(n, seed):
    from zkvm_tpu.oracle.ristretto import RistrettoPoint
    r = random.Random(seed)
    return [
        RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        )
        for _ in range(n)
    ]


def test_native_compress_parity():
    """Native batch ENCODE bit-exact vs the Python oracle path."""
    from zkvm_tpu.oracle.ristretto import compress_batch
    pts = _rand_pts(64, seed=10)
    got = compress_batch([p.ep for p in pts])
    assert got is not None
    for p, enc in zip(pts, got):
        assert enc == p._compress_py()


def test_native_decompress_parity_and_rejection():
    from zkvm_tpu.oracle.ristretto import (
        RistrettoPoint, decompress_batch,
    )
    pts = _rand_pts(32, seed=11)
    encs = [p._compress_py() for p in pts]
    # corrupt a few: non-canonical s (p-1 has high bit pattern), odd s,
    # random junk
    from zkvm_tpu.constants import P
    bad = [
        (P - 1).to_bytes(32, "little"),   # negative s
        (P + 2).to_bytes(32, "little"),   # non-canonical
        bytes([0xFF] * 32),
    ]
    out = decompress_batch(encs + bad)
    assert out is not None
    for enc, q in zip(encs, out[:32]):
        assert q is not None
        # bit-exact vs the Python DECODE (decompress returns the canonical
        # coset representative, which may differ from the original point by
        # torsion — so compare decode-to-decode, not to the input point)
        assert q.ep == RistrettoPoint._decompress_py(enc).ep
    for i, b in enumerate(bad):
        native_invalid = out[32 + i] is None
        try:
            RistrettoPoint._decompress_py(b)
            py_invalid = False
        except ValueError:
            py_invalid = True
        assert native_invalid == py_invalid, (i, b.hex())


def test_native_decompress_identity_and_basepoint():
    from zkvm_tpu.oracle import ristretto
    from zkvm_tpu.oracle.ristretto import decompress_batch
    bp_enc = ristretto.BASEPOINT._compress_py()
    out = decompress_batch([b"\x00" * 32, bp_enc])
    assert out is not None
    ident, bp = out
    from zkvm_tpu.constants import P
    assert ident is not None and ident.ep[0] % P == 0  # X=0 -> identity
    assert bp.ep == ristretto.RistrettoPoint._decompress_py(bp_enc).ep


# ---------------------------------------------------------------- scalarvec
def test_scalarvec_parity():
    from zkvm_tpu.constants import L
    from zkvm_tpu.native import ScalarVec
    r = random.Random(12)
    a = [r.randrange(L) for _ in range(65)] + [0, 1, L - 1]
    b = [r.randrange(L) for _ in range(68)]
    A, B = ScalarVec.from_ints(a), ScalarVec.from_ints(b)
    assert A.mul(B).to_ints() == [x * y % L for x, y in zip(a, b)]
    assert A.add(B).to_ints() == [(x + y) % L for x, y in zip(a, b)]
    assert A.sub(B).to_ints() == [(x - y) % L for x, y in zip(a, b)]
    k, c = r.randrange(L), r.randrange(L)
    assert A.scale(k).to_ints() == [x * k % L for x in a]
    assert A.axpb(k, c).to_ints() == [(x * k + c) % L for x in a]
    C = ScalarVec.from_ints([r.randrange(L) for _ in range(68)])
    assert A.muladd(B, C).to_ints() == [
        (x * y + z) % L for x, y, z in zip(a, b, C.to_ints())
    ]
    assert A.neg().to_ints() == [-x % L for x in a]
    assert A.sum() == sum(a) % L
    assert A.inner(B) == sum(x * y for x, y in zip(a, b)) % L


def test_scalarvec_batch_invert_and_powers():
    from zkvm_tpu.constants import L
    from zkvm_tpu.native import ScalarVec
    r = random.Random(13)
    a = [r.randrange(1, L) for _ in range(40)]
    a[7] = 0  # zero passes through as zero (upstream batch_invert contract)
    inv = ScalarVec.from_ints(a).batch_invert().to_ints()
    for x, i in zip(a, inv):
        assert i == (pow(x, L - 2, L) if x else 0)
    x = r.randrange(L)
    ps = ScalarVec.powers(x, 50).to_ints()
    acc = 1
    for p in ps:
        assert p == acc
        acc = acc * x % L


def test_fixed_base_engine_parity():
    """Engine.basepoint_mul / commit / commit_batch (native fixed-base
    radix-16 tables, upstream EdwardsBasepointTable) vs the oracle, both
    ct modes, boundary scalars included."""
    import random

    from zkvm_tpu.constants import L
    from zkvm_tpu.oracle.ristretto import BASEPOINT
    from zkvm_tpu.proofs.engine import get_engine
    from zkvm_tpu.proofs.generators import PedersenGens

    eng = get_engine()
    r = random.Random(31)
    scalars = [0, 1, L - 1, L, 8, (1 << 252)] + [
        r.randrange(L) for _ in range(12)
    ]
    for s in scalars:
        want = BASEPOINT * s
        assert eng.basepoint_mul(s, ct=True) == want
        assert eng.basepoint_mul(s, ct=False) == want

    pc = PedersenGens()
    vs = [r.randrange(L) for _ in range(9)] + [0]
    bs = [r.randrange(L) for _ in range(9)] + [0]
    got = pc.commit_batch(vs, bs)
    for v, b, g in zip(vs, bs, got):
        want = pc.B * v + pc.B_blinding * b
        assert g == want
        assert pc.commit(v, b) == want


def test_rangeproof_scalar_assembly_parity():
    """The fused C++ scalar assembly (scalarvec.cpp) must match the
    ScalarVec-chain formulas for random challenges across (n, m) shapes."""
    import random

    from zkvm_tpu.constants import L
    from zkvm_tpu.native import ScalarVec, rangeproof_scalar_assembly
    from zkvm_tpu.oracle import scalar
    from zkvm_tpu.proofs.rangeproof import delta
    from zkvm_tpu.proofs.util import powers

    r = random.Random(20)
    for n, m in ((8, 1), (64, 1), (64, 4), (16, 8)):
        nm = n * m
        lg = nm.bit_length() - 1
        us = [r.randrange(1, L) for _ in range(lg)]
        y, z, a, b = (r.randrange(1, L) for _ in range(4))
        got = rangeproof_scalar_assembly(us, n, m, y, z, a, b)
        assert got is not None
        u_sq, u_inv_sq, g_v, h_v, d = got

        # reference: the formulas in their plain-int form
        ui = scalar.batch_invert(us)
        assert u_sq == [u * u % L for u in us]
        assert u_inv_sq == [u * u % L for u in ui]
        allinv = 1
        for x in ui:
            allinv = allinv * x % L
        s = [allinv]
        for j in range(lg):
            w = u_sq[lg - 1 - j]
            s = s + [x * w % L for x in s]
        y_inv = scalar.invert(y)
        zz = z * z % L
        g_ref = [(-z - a * si) % L for si in s]
        h_ref = []
        for i in range(nm):
            z2 = pow(z, i // n, L) * pow(2, i % n, L) % L
            h_ref.append(
                (z + pow(y_inv, i, L) * (zz * z2 - b * s[nm - 1 - i])) % L
            )
        assert g_v.to_ints() == g_ref, (n, m)
        assert h_v.to_ints() == h_ref, (n, m)
        assert d == delta(n, m, y, z), (n, m)
