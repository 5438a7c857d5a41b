"""Device prove path (VERDICT r2 #6): the aggregated prover's A/S bit
commitments batch through Engine.msm_batch; the JAX engine fuses them into
one grouped device dispatch.  Bit-exactness vs the host oracle engine with
the same deterministic witness RNG is the acceptance bar."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.oracle.merlin import Transcript
from zkvm_tpu.proofs.engine import Engine, set_engine
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.rangeproof import RangeProof
from zkvm_tpu.proofs.transcript import ProofTranscript

PC_GENS = PedersenGens()
BP_GENS = BulletproofGens(64, 16)


def _det_rng(seed: bytes):
    t = Transcript(b"test-witness-rng")
    return (t.build_rng()
            .rekey_with_witness_bytes(b"seed", seed)
            .finalize(b"\x00" * 32))


def _prove(n, m, seed):
    r = random.Random(seed)
    values = [r.randrange(1 << n) for _ in range(m)]
    blindings = [r.randrange(L) for _ in range(m)]
    proof, vcs = RangeProof.prove_multiple(
        BP_GENS, PC_GENS, ProofTranscript(b"dev-prove"),
        values, blindings, n, rng=_det_rng(seed.to_bytes(4, "little")),
    )
    return proof.to_bytes(), vcs


def test_msm_batch_grouped_device_parity():
    """JaxEngine.msm_batch (grouped single-dispatch device MSMs) ==
    host-engine per-group MSMs on identical inputs."""
    from zkvm_tpu.kernels.engine import JaxEngine
    from zkvm_tpu.oracle.ristretto import BASEPOINT

    r = random.Random(55)
    groups_s, groups_p = [], []
    for _ in range(8):  # 8 groups x 256 points clears the device gate
        groups_p.append([BASEPOINT * r.randrange(1, L) for _ in range(256)])
        groups_s.append([r.randrange(L) for _ in range(256)])
    host = Engine().msm_batch(groups_s, groups_p, ct=True)
    dev = JaxEngine().msm_batch(groups_s, groups_p, ct=True)
    assert [p.compress() for p in host] == [p.compress() for p in dev]


@pytest.mark.parametrize("n,m", [(64, 8)])
def test_aggregated_prove_bit_exact_across_engines(n, m):
    """prove_multiple under the JAX engine (batched device A/S commitments
    via msm_batch, m>=8 clears the grouped-device gate at n=64) must emit
    byte-identical proofs to the host oracle engine."""
    from zkvm_tpu.kernels.engine import JaxEngine

    host_bytes, host_vcs = _prove(n, m, seed=77)

    prev = set_engine(JaxEngine())
    try:
        dev_bytes, dev_vcs = _prove(n, m, seed=77)
    finally:
        set_engine(prev)
    assert host_vcs == dev_vcs
    assert host_bytes == dev_bytes

    # and the emitted proof verifies
    proof = RangeProof.from_bytes(dev_bytes)
    proof.verify_multiple(
        BP_GENS, PC_GENS, ProofTranscript(b"dev-prove"), dev_vcs, n
    )


def test_msm_secret_threshold_dispatch():
    """Below the measured tunnel crossover msm_secret stays on the native
    constant-time host path; above it, it matches the vartime result."""
    from zkvm_tpu.kernels.engine import JaxEngine
    from zkvm_tpu.oracle.ristretto import BASEPOINT

    r = random.Random(9)
    eng = JaxEngine()
    pts = [BASEPOINT * r.randrange(1, L) for _ in range(32)]
    ks = [r.randrange(L) for _ in range(32)]
    assert eng.msm_secret(ks, pts) == Engine().msm_secret(ks, pts)

    eng.secret_min_msm_size = 16  # force the device branch
    assert eng.msm_secret(ks, pts) == Engine().msm_secret(ks, pts)
