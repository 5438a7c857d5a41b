"""Checkpoint/resume for long-running sharded computations (SURVEY.md §5.4).

Upstream persists only blockchain state; the TPU build adds per-window
partial results for multi-hour MSM/benchmark runs: the window loop runs on
the host, each window's total (a few hundred bytes) is appended to an .npz
checkpoint, and a restarted run resumes at the first missing window.
Deterministic re-execution of a window doubles as fault isolation
(SURVEY.md §5.3): a corrupted host's shard can be recomputed and compared.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import msm as jmsm
from ..kernels import point as jp
from ..kernels.point import PointBatch


class CheckpointedMSM:
    """MSM driver with host-side window loop + on-disk window checkpoints."""

    def __init__(self, path: str, wbits: int = jmsm.DEFAULT_WBITS):
        self.path = path
        self.wbits = wbits
        self.nw = jmsm.num_windows(wbits)

    def _load(self) -> dict[int, np.ndarray]:
        if not os.path.exists(self.path):
            return {}
        data = np.load(self.path)
        return {
            int(k.split("_")[1]): data[k] for k in data.files
            if k.startswith("win_")
        }

    def _save(self, done: dict[int, np.ndarray]):
        tmp = self.path + ".tmp.npz"
        np.savez(tmp, **{f"win_{w}": v for w, v in done.items()})
        os.replace(tmp, self.path)

    def run(self, points: PointBatch, digits) -> PointBatch:
        """Compute the MSM, resuming from any checkpointed windows."""
        digits = jnp.asarray(digits)
        done = self._load()
        wt = jax.jit(
            lambda p, d: jmsm.window_total(p, d, self.wbits)
        )
        for w in range(self.nw):
            if w in done:
                continue
            total = wt(points, digits[:, w])
            done[w] = np.stack([
                np.asarray(total.x), np.asarray(total.y),
                np.asarray(total.z), np.asarray(total.t),
            ])
            self._save(done)
        # combine on host-controlled device calls (cheap: single points)
        from ..oracle import edwards as oe
        from ..kernels.limbs import limbs_to_field_ints

        acc = oe.IDENTITY
        for w in range(self.nw - 1, -1, -1):
            arr = done[w]
            coords = [limbs_to_field_ints(arr[i][None])[0] for i in range(4)]
            for _ in range(self.wbits):
                acc = oe.double(acc)
            acc = oe.add(acc, tuple(coords))
        self.cleanup()
        return acc

    def cleanup(self):
        if os.path.exists(self.path):
            os.remove(self.path)
