"""Range proof tests (upstream: bulletproofs/tests/range_proof.rs + range_proof/mod.rs
tests): prove -> serialize -> deserialize -> verify across n and m; soundness
negatives; MPC malicious-party attribution; batched verification."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.proofs.errors import MPCError, ProofError
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.mpc import Dealer, Party
from zkvm_tpu.proofs.rangeproof import RangeProof, batch_verify
from zkvm_tpu.proofs.transcript import ProofTranscript

PC_GENS = PedersenGens()
BP_GENS = BulletproofGens(64, 8)


def _prove_verify(n: int, m: int, seed: int = 0):
    r = random.Random(seed)
    values = [r.randrange(1 << n) for _ in range(m)]
    blindings = [r.randrange(L) for _ in range(m)]

    proof, commitments = RangeProof.prove_multiple(
        BP_GENS, PC_GENS, ProofTranscript(b"AggregatedRangeProofTest"),
        values, blindings, n,
    )
    # serialization round trip
    proof_bytes = proof.to_bytes()
    proof2 = RangeProof.from_bytes(proof_bytes)
    proof2.verify_multiple(
        BP_GENS, PC_GENS, ProofTranscript(b"AggregatedRangeProofTest"),
        commitments, n,
    )
    return proof_bytes, commitments


@pytest.mark.parametrize("n,m", [(8, 1), (16, 1), (32, 1), (64, 1),
                                 (8, 2), (16, 4), (64, 2)])
def test_prove_verify(n, m):
    _prove_verify(n, m, seed=n * 100 + m)


def test_out_of_range_value_rejected_at_prove():
    with pytest.raises(MPCError):
        RangeProof.prove_single(
            BP_GENS, PC_GENS, ProofTranscript(b"t"), 1 << 8, 5, 8
        )


def test_proof_for_wrong_statement_fails():
    """A valid proof must not verify against different commitments."""
    pb1, c1 = _prove_verify(16, 1, seed=1)
    pb2, c2 = _prove_verify(16, 1, seed=2)
    proof = RangeProof.from_bytes(pb1)
    with pytest.raises(ProofError):
        proof.verify_multiple(
            BP_GENS, PC_GENS, ProofTranscript(b"AggregatedRangeProofTest"),
            c2, 16,
        )
    # and not under a different transcript label
    with pytest.raises(ProofError):
        proof.verify_multiple(
            BP_GENS, PC_GENS, ProofTranscript(b"other label"), c1, 16
        )


def test_bitflip_soundness():
    """Every serialized byte position region must be integrity-checked."""
    pb, commitments = _prove_verify(8, 1, seed=3)
    r = random.Random(4)
    for _ in range(12):
        pos = r.randrange(len(pb))
        bad = bytearray(pb)
        bad[pos] ^= 1 << r.randrange(8)
        try:
            proof = RangeProof.from_bytes(bytes(bad))
            proof.verify_multiple(
                BP_GENS, PC_GENS,
                ProofTranscript(b"AggregatedRangeProofTest"), commitments, 8,
            )
            raise AssertionError(f"bit flip at {pos} accepted!")
        except (ProofError, ValueError):
            pass


def test_detect_dishonest_party():
    """MPC dealer attributes bad shares (upstream detect_dishonest_party_during_aggregation)."""
    n, m = 8, 4
    r = random.Random(5)
    values = [r.randrange(1 << n) for _ in range(m)]
    blindings = [r.randrange(L) for _ in range(m)]
    dealer = Dealer(BP_GENS, PC_GENS, ProofTranscript(b"mpc test"), n, m)
    parties = [
        Party(BP_GENS, PC_GENS, v, b, n) for v, b in zip(values, blindings)
    ]
    bcs = [p.assign_position(j) for j, p in enumerate(parties)]
    bch = dealer.receive_bit_commitments(bcs)
    pcs = [p.apply_challenge(bch) for p in parties]
    pch = dealer.receive_poly_commitments(pcs)
    shares = [p.apply_poly_challenge(pch) for p in parties]
    # party 1 lies about t_x
    shares[1].t_x = (shares[1].t_x + 1) % L
    with pytest.raises(MPCError) as exc_info:
        dealer.receive_shares(shares)
    assert exc_info.value.bad_shares == [1]


def test_detect_dishonest_dealer():
    """Party rejects aggregation sizes the dealer lies about via gens capacity."""
    with pytest.raises(MPCError):
        Dealer(BP_GENS, PC_GENS, ProofTranscript(b"t"), 8, 3)  # m not pow2
    with pytest.raises(MPCError):
        Dealer(BP_GENS, PC_GENS, ProofTranscript(b"t"), 7, 1)  # bad n


def test_batch_verify():
    r = random.Random(6)
    proofs, transcripts, vcs = [], [], []
    for i in range(4):
        m = [1, 2, 1, 4][i]
        values = [r.randrange(1 << 16) for _ in range(m)]
        blindings = [r.randrange(L) for _ in range(m)]
        proof, commitments = RangeProof.prove_multiple(
            BP_GENS, PC_GENS, ProofTranscript(b"batch"), values, blindings, 16
        )
        proofs.append(proof)
        transcripts.append(ProofTranscript(b"batch"))
        vcs.append(commitments)
    batch_verify(proofs, BP_GENS, PC_GENS, transcripts, vcs, 16)

    # one bad proof poisons the batch
    bad = RangeProof.from_bytes(proofs[0].to_bytes())
    bad.t_x = (bad.t_x + 1) % L
    with pytest.raises(ProofError):
        batch_verify(
            [bad] + proofs[1:], BP_GENS, PC_GENS,
            [ProofTranscript(b"batch") for _ in proofs], vcs, 16,
        )


def test_fused_replay_matches_python_strobe():
    """The fused native transcript replay (strobe.cpp rangeproof_replay)
    must be bit-identical to the pure-Python strobe sequence: identical
    mega-check scalars/points, and the transcript states must agree
    afterwards (a challenge drawn from each must match)."""
    from zkvm_tpu.oracle.strobe import Strobe128
    from zkvm_tpu.proofs.transcript import ProofTranscript

    pc, bp = PedersenGens(), BulletproofGens(64)
    proof, V = RangeProof.prove_single(
        bp, pc, ProofTranscript(b"fused"), 98765, 4321, 64
    )

    t_native = ProofTranscript(b"fused")
    assert hasattr(t_native.strobe, "_buf"), "native strobe expected"
    sc_n, pts_n = proof.verification_job(bp, pc, t_native, [V], 64)

    from zkvm_tpu.constants import MERLIN_DOMSEP_LABEL, MERLIN_PROTOCOL_LABEL
    t_py2 = ProofTranscript.__new__(ProofTranscript)
    t_py2.strobe = Strobe128(MERLIN_PROTOCOL_LABEL)
    t_py2.append_message(MERLIN_DOMSEP_LABEL, b"fused")
    sc_p, pts_p = proof.verification_job(bp, pc, t_py2, [V], 64)

    assert sc_n == sc_p
    assert [p.compress() for p in pts_n] == [p.compress() for p in pts_p]
    assert (t_native.challenge_scalar(b"post")
            == t_py2.challenge_scalar(b"post"))

    # identity A must be rejected by the fused path too
    import dataclasses
    bad = dataclasses.replace(proof, A=b"\x00" * 32)
    with pytest.raises(Exception):
        bad.verification_job(bp, pc, ProofTranscript(b"fused"), [V], 64)
