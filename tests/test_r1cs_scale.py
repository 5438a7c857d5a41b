"""R1CS at scale (VERDICT r2 #10): a 2^15-multiplier circuit (512 x 64-bit
range gadgets over committed values) proves and verifies end-to-end, with
metrics recording the constraint counts (BASELINE config 3).

Upstream counterpart: bulletproofs/src/r1cs/prover.rs handles 2^17-class
circuits; this pins the scaling behavior of the flattening, the two-phase
commitment split, and the IPP tail at 2^15."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.gadgets.range import range_proof_gadget
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.r1cs import Prover, R1CSProof, Verifier
from zkvm_tpu.proofs.transcript import ProofTranscript

NG = 512        # 512 gadgets x 64 bits = 2^15 multipliers
BITS = 64


@pytest.mark.timeout(600)
@pytest.mark.heavy
def test_r1cs_2e15_multipliers_prove_verify():
    pc, bp = PedersenGens(), BulletproofGens(1 << 16)
    r = random.Random(31337)

    prover = Prover(pc, ProofTranscript(b"r1cs-2e15"))
    commitments = []
    values = [r.randrange(1 << BITS) for _ in range(NG)]
    for v in values:
        com, var = prover.commit(v, r.randrange(L))
        commitments.append(com)
        range_proof_gadget(prover, var, BITS, v)
    m = prover.metrics()
    assert m.multipliers == NG * BITS == 1 << 15
    assert m.constraints >= 2 * m.multipliers  # bit + recomposition rows
    proof = prover.prove(bp)

    wire = proof.to_bytes()
    proof2 = R1CSProof.from_bytes(wire)

    verifier = Verifier(ProofTranscript(b"r1cs-2e15"))
    for com in commitments:
        var = verifier.commit(com)
        range_proof_gadget(verifier, var, BITS, None)
    verifier.verify(proof2, pc, bp)

    # soundness at scale: an out-of-range value must not prove... the
    # gadget catches it at constraint time or the proof fails; cheapest
    # negative here is a corrupted serialized proof
    bad = bytearray(wire)
    bad[100] ^= 0x40
    verifier2 = Verifier(ProofTranscript(b"r1cs-2e15"))
    for com in commitments:
        var = verifier2.commit(com)
        range_proof_gadget(verifier2, var, BITS, None)
    with pytest.raises(Exception):
        verifier2.verify(R1CSProof.from_bytes(bytes(bad)), pc, bp)


@pytest.mark.heavy
def test_r1cs_device_split_verify(monkeypatch):
    """Single-proof mega-check through the fused split device route
    (engine.verify_r1cs_split, interpret on CPU): accepts a valid proof,
    rejects a corrupted one.  Upstream seam: r1cs/verifier.rs one-MSM
    verify [U]."""
    from zkvm_tpu.gadgets import Value, allocate_value, cloak
    from zkvm_tpu.kernels.engine import JaxEngine
    from zkvm_tpu.proofs.engine import set_engine
    from zkvm_tpu.proofs.errors import VerificationError

    monkeypatch.setenv("ZKVM_R1CS_DEVICE", "1")
    pc, bp = PedersenGens(), BulletproofGens(4096)
    ins = [Value(10, 1), Value(20, 1)]
    outs = [Value(15, 1), Value(15, 1)]
    prover = Prover(pc, ProofTranscript(b"c"))
    in_a = [allocate_value(prover, v) for v in ins]
    out_a = [allocate_value(prover, v) for v in outs]
    cloak(prover, in_a, out_a, range_bits=8)
    proof = prover.prove(bp)

    old = set_engine(JaxEngine())
    try:
        verifier = Verifier(ProofTranscript(b"c"))
        in_a = [allocate_value(verifier, None) for _ in ins]
        out_a = [allocate_value(verifier, None) for _ in outs]
        cloak(verifier, in_a, out_a, range_bits=8)
        verifier.verify(proof, pc, bp)

        proof.t_x = (proof.t_x + 1) % (2**252)
        verifier2 = Verifier(ProofTranscript(b"c"))
        in_a = [allocate_value(verifier2, None) for _ in ins]
        out_a = [allocate_value(verifier2, None) for _ in outs]
        cloak(verifier2, in_a, out_a, range_bits=8)
        with pytest.raises(VerificationError):
            verifier2.verify(proof, pc, bp)
    finally:
        set_engine(old)
