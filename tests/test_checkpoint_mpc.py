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


@pytest.mark.heavy
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


def test_distributed_mpc_byzantine_host_attributed():
    """A host corrupting its share payload on the wire is caught by the
    dealer audit and attributed to the right party positions."""
    from zkvm_tpu.parallel import mpc_hosts
    from zkvm_tpu.proofs.errors import MPCError

    bp = BulletproofGens(16, 4)
    pc = PedersenGens()
    r = random.Random(5)
    values = [[r.randrange(1 << 16) for _ in range(2)] for _ in range(2)]
    blindings = [[r.randrange(L) for _ in range(2)] for _ in range(2)]

    def corrupt(payload: bytes) -> bytes:
        shares = mpc_hosts.deserialize_shares(payload)
        shares[0].t_x = (shares[0].t_x + 1) % L  # host 1, party idx 2
        return mpc_hosts.serialize_shares(shares)

    with pytest.raises(MPCError) as ei:
        distributed_prove(
            bp, pc, b"mpc byz", values, blindings, 16, corrupt={1: corrupt}
        )
    assert ei.value.bad_shares == [2]  # global party index of the bad share


def test_mpc_wire_round_trips():
    """Typed wire serialization round-trips and rejects junk."""
    from zkvm_tpu.parallel import mpc_hosts
    from zkvm_tpu.proofs.errors import MPCError
    from zkvm_tpu.proofs.mpc import ProofShare

    shares = [ProofShare(1, 2, 3, [4, 5], [6, 7]),
              ProofShare(L - 1, 0, 9, [], [8])]
    data = mpc_hosts.serialize_shares(shares)
    back = mpc_hosts.deserialize_shares(data)
    assert [s.__dict__ for s in back] == [s.__dict__ for s in shares]
    with pytest.raises(MPCError):
        mpc_hosts.deserialize_shares(data + b"\x00")
    # non-canonical scalar rejected
    bad = bytearray(data)
    bad[4:36] = (L + 1).to_bytes(32, "little")
    with pytest.raises(MPCError):
        mpc_hosts.deserialize_shares(bytes(bad))
    kind, sc = mpc_hosts.deserialize_challenge(
        mpc_hosts.serialize_challenge("bit", 11, 22)
    )
    assert kind == "bit" and sc == [11, 22]


def test_allgather_transport_single_process():
    """The DCN transport degenerates correctly at process_count()==1."""
    from zkvm_tpu.parallel.mpc_hosts import AllgatherTransport

    t = AllgatherTransport()
    assert t.num_hosts == 1 and t.rank == 0
    assert t.gather(b"hello") == [b"hello"]
    assert t.broadcast(b"world") == b"world"
