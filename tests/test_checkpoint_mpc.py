"""Checkpointed MSM resume + multi-host MPC proving driver tests."""

import os
import random

import jax.numpy as jnp
import pytest

from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import point as jp
from zkvm_tpu.oracle import edwards as oe, ristretto
from zkvm_tpu.parallel.checkpoint import CheckpointedMSM
from zkvm_tpu.parallel.mpc_hosts import distributed_prove
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.rangeproof import RangeProof
from zkvm_tpu.proofs.transcript import ProofTranscript


def test_checkpointed_msm_resumes(tmp_path):
    r = random.Random(1)
    n = 32
    pts_o = [
        ristretto.RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n)
    ]
    ks = [r.randrange(L) for _ in range(n)]
    pts = jp.pack_points(pts_o)
    digits = jmsm.signed_digits_radix_2w(ks, 8)

    path = str(tmp_path / "msm.ckpt.npz")
    ck = CheckpointedMSM(path, wbits=8)

    # run partially: compute a few windows, save, then "crash"
    done = {}
    import jax
    wt = jax.jit(lambda p, d: jmsm.window_total(p, d, 8))
    import numpy as np
    for w in range(5):
        t = wt(pts, jnp.asarray(digits)[:, w])
        done[w] = np.stack([np.asarray(t.x), np.asarray(t.y),
                            np.asarray(t.z), np.asarray(t.t)])
    ck._save(done)
    assert os.path.exists(path)

    # resume completes and matches the oracle
    result = ck.run(pts, digits)
    expect = oe.multiscalar_mul(ks, pts_o)
    ex, ey, ez, _ = expect
    X, Y, Z, _ = result
    assert (X * ez - ex * Z) % P == 0 and (Y * ez - ey * Z) % P == 0
    assert not os.path.exists(path)  # cleaned up after success


def test_distributed_mpc_prove():
    """4 values across 2 'hosts' -> one aggregated proof that verifies."""
    bp = BulletproofGens(16, 4)
    pc = PedersenGens()
    r = random.Random(2)
    values = [[r.randrange(1 << 16) for _ in range(2)] for _ in range(2)]
    blindings = [[r.randrange(L) for _ in range(2)] for _ in range(2)]

    proof, commitments = distributed_prove(
        bp, pc, b"mpc hosts", values, blindings, 16
    )
    proof.verify_multiple(
        bp, pc, ProofTranscript(b"mpc hosts"), commitments, 16
    )
    assert len(commitments) == 4
