"""Two-process jax.distributed integration test (VERDICT r2 #7): spawn a
localhost coordinator pair and run the real DCN code paths — multi-process
MPC prove over AllgatherTransport and a cross-process sharded MSM.  Runs on
the CPU backend (2 virtual devices per process, 4 global)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(900)
@pytest.mark.heavy
def test_two_process_distributed():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_distributed_worker.py")
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # workers pick cpu via jax.config (conftest
    # can't help a subprocess; the axon plugin ignores env vars anyway)
    repo = os.path.dirname(here)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, addr, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(here), text=True,
        )
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "WORKER_OK" in out, f"rank {rank} incomplete:\n{out}"
