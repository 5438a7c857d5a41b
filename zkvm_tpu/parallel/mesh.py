"""Mesh construction helpers.

Pattern (SNIPPETS.md [2][3]): build a named-axis device mesh; annotate
shardings; let XLA insert collectives.  Axes:
  "dp" — data parallel over independent proofs / verification groups;
  "tp" — tensor parallel within one MSM (points/buckets partition).
Multi-host: the same code runs under jax.distributed with the global device
list; ICI carries `tp` collectives, DCN carries `dp` when crossing hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, tp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the available devices.

    Defaults: tp = all devices, dp = 1.  dp*tp must equal len(devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def host_mesh_info() -> dict:
    """Introspection for logging/benchmarks."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "platform": jax.devices()[0].platform,
    }


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """jax.distributed.initialize wrapper for multi-host pods; no-op when
    single-process (the common test/bench path)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
