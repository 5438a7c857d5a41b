"""Merlin/STROBE known-answer + behavior tests (upstream: merlin/src/transcript.rs tests)."""

from zkvm_tpu.oracle.merlin import Transcript
from zkvm_tpu.oracle.strobe import Strobe128


def test_merlin_known_answer():
    """The upstream merlin 'equivalence_simple' test vector."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    ch = t.challenge_bytes(b"challenge", 32)
    assert ch.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_complex_transcript_self_consistent():
    """Mirrors upstream 'equivalence_complex': interleaved appends/challenges
    across many operations stay deterministic and order-sensitive."""

    def run(swap: bool) -> bytes:
        t = Transcript(b"test protocol")
        t.append_message(b"step1", b"some data")
        data = bytes(range(256)) * 4
        chal = b""
        for _ in range(32):
            chal = t.challenge_bytes(b"challenge", 32)
            t.append_message(b"bigdata", data if not swap else data[::-1])
            t.append_message(b"challengedata", chal)
        return chal

    a = run(False)
    b = run(False)
    c = run(True)
    assert a == b
    assert a != c


def test_challenge_sizes_cross_rate_boundary():
    t = Transcript(b"rate test")
    big = t.challenge_bytes(b"big", 500)  # > STROBE rate of 166
    assert len(big) == 500
    t2 = Transcript(b"rate test")
    big2 = t2.challenge_bytes(b"big", 500)
    assert big == big2


def test_append_u64_framing():
    t1 = Transcript(b"x")
    t1.append_u64(b"n", 64)
    t2 = Transcript(b"x")
    t2.append_message(b"n", (64).to_bytes(8, "little"))
    assert t1.challenge_bytes(b"c", 32) == t2.challenge_bytes(b"c", 32)


def test_transcript_rng():
    t = Transcript(b"rng test")
    t.append_message(b"data", b"hi")
    r1 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness").finalize(b"\x00" * 32)
    r2 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness").finalize(b"\x00" * 32)
    r3 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness2").finalize(b"\x00" * 32)
    r4 = t.build_rng().rekey_with_witness_bytes(b"w", b"witness").finalize(b"\x01" * 32)
    a, b = r1.fill_bytes(32), r2.fill_bytes(32)
    assert a == b  # deterministic given witness + entropy
    assert r3.fill_bytes(32) != a  # witness-sensitive
    assert r4.fill_bytes(32) != a  # entropy-sensitive
    s = r1.random_scalar()
    from zkvm_tpu.constants import L
    assert 0 <= s < L


def test_strobe_op_framing():
    """Different op sequences with identical absorbed bytes diverge."""
    s1 = Strobe128(b"p")
    s1.ad(b"ab", False)
    s2 = Strobe128(b"p")
    s2.ad(b"a", False)
    s2.ad(b"b", False)
    assert s1.prf(16, False) != s2.prf(16, False)
    # but 'more' continuation is equivalent to one op
    s3 = Strobe128(b"p")
    s3.ad(b"ab", False)
    s4 = Strobe128(b"p")
    s4.ad(b"a", False)
    s4.ad(b"b", True)
    assert s3.prf(16, False) == s4.prf(16, False)
