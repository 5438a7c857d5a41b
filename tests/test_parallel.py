"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 implication 3; conftest forces JAX_PLATFORMS=cpu + 8 devices)."""

import random

import jax
import jax.numpy as jnp
import pytest

from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import point as jp
from zkvm_tpu.oracle import edwards as oe
from zkvm_tpu.oracle import ristretto
from zkvm_tpu.parallel import make_mesh, sharded_msm
from zkvm_tpu.parallel.batch_verify import sharded_batch_verify_jobs
from zkvm_tpu.proofs.errors import VerificationError


def _rand_points(n, seed=0):
    r = random.Random(seed)
    return [
        ristretto.RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        )
        for _ in range(n)
    ]


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.heavy
def test_sharded_msm_matches_oracle():
    n = 64
    r = random.Random(1)
    pts_o = _rand_points(n, seed=1)
    ks = [r.randrange(L) for _ in range(n)]
    expect = oe.multiscalar_mul(ks, [p.ep for p in pts_o])

    mesh = make_mesh(dp=2, tp=4)
    pts = jp.pack_points([p.ep for p in pts_o])
    digits = jmsm.signed_digits_radix_2w(ks, 8)
    out = sharded_msm(mesh, pts, digits, wbits=8)
    got = jp.unpack_points(
        jp.PointBatch(out.x[None], out.y[None], out.z[None], out.t[None])
    )[0]
    gx, gy, gz, _ = got
    ex, ey, ez, _ = expect
    assert (gx * ez - ex * gz) % P == 0
    assert (gy * ez - ey * gz) % P == 0


@pytest.mark.heavy
def test_sharded_batch_verify_rangeproofs():
    """BASELINE config 2 shape: several rangeproof mega-checks on the mesh."""
    from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
    from zkvm_tpu.proofs.rangeproof import RangeProof
    from zkvm_tpu.proofs.transcript import ProofTranscript

    pc, bp = PedersenGens(), BulletproofGens(16, 1)
    r = random.Random(2)
    jobs = []
    proofs = []
    for i in range(3):
        proof, V = RangeProof.prove_single(
            bp, pc, ProofTranscript(b"shard batch"), r.randrange(1 << 16),
            r.randrange(L), 16,
        )
        proofs.append((proof, V))
        jobs.append(proof.verification_job(
            bp, pc, ProofTranscript(b"shard batch"), [V], 16
        ))

    mesh = make_mesh(dp=2, tp=4)
    sharded_batch_verify_jobs(mesh, jobs, wbits=8)

    # poison one job: flip its t_x
    bad_proof = RangeProof.from_bytes(proofs[1][0].to_bytes())
    bad_proof.t_x = (bad_proof.t_x + 1) % L
    bad_jobs = list(jobs)
    bad_jobs[1] = bad_proof.verification_job(
        bp, pc, ProofTranscript(b"shard batch"), [proofs[1][1]], 16
    )
    with pytest.raises(VerificationError):
        sharded_batch_verify_jobs(mesh, bad_jobs, wbits=8)


@pytest.mark.heavy
def test_sharded_msm_pallas_pipeline_parity():
    """The round-2 production pipeline sharded over the 8-device mesh
    (limb-major shards + all_gather'd window totals + traced Edwards tree
    combine + host Horner) must match the oracle."""
    from zkvm_tpu.kernels import pallas_msm as pm
    from zkvm_tpu.parallel.sharded_msm import sharded_msm_pallas

    n = 96
    r = random.Random(21)
    pts = _rand_points(n, seed=21)
    ks = [r.randrange(1 << 30) for _ in range(n)]
    ks[0] = 0
    expect = oe.multiscalar_mul(ks, [p.ep for p in pts])

    mesh = make_mesh(dp=2, tp=4)
    pb = pm.pack_points_lm([p.ep for p in pts])
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(ks, 8, 32))
    got = sharded_msm_pallas(mesh, pb, digits, wbits=8)
    gx, gy, gz, _ = got
    ex, ey, ez, _ = expect
    assert (gx * ez - ex * gz) % P == 0
    assert (gy * ez - ey * gz) % P == 0
