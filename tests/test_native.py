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
