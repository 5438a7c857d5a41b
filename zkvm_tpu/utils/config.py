"""Typed configuration — the role Cargo feature flags play upstream
(SURVEY.md §5.6: u32/u64/simd backend selection, yoloproofs, serde).

Here the switchable dimensions are the compute engine (cpu-oracle vs jax),
the MSM window width, mesh shape, and debug/interpret mode.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Config:
    engine: str = "oracle"          # "oracle" | "jax"
    msm_wbits: int = 16             # Pippenger window width on device
    min_msm_size: int = 16          # below this the host oracle wins
    mesh_dp: int | None = None      # data-parallel axis size (None = 1)
    mesh_tp: int | None = None      # tensor-parallel axis size (None = all)
    debug_interpret: bool = False   # Pallas/XLA interpret mode
    debug_checks: bool = False      # runtime limb-bound assertions (SURVEY §5.2)
    range_bits: int = 64            # default cloak range check width

    @staticmethod
    def from_env() -> "Config":
        c = Config()
        c.engine = os.environ.get("ZKVM_TPU_ENGINE", c.engine)
        c.msm_wbits = int(os.environ.get("ZKVM_TPU_MSM_WBITS", c.msm_wbits))
        c.min_msm_size = int(
            os.environ.get("ZKVM_TPU_MIN_MSM", c.min_msm_size)
        )
        if os.environ.get("ZKVM_TPU_MESH_DP"):
            c.mesh_dp = int(os.environ["ZKVM_TPU_MESH_DP"])
        if os.environ.get("ZKVM_TPU_MESH_TP"):
            c.mesh_tp = int(os.environ["ZKVM_TPU_MESH_TP"])
        c.debug_interpret = bool(os.environ.get("ZKVM_TPU_INTERPRET"))
        c.debug_checks = bool(os.environ.get("ZKVM_TPU_DEBUG_CHECKS"))
        return c

    def apply(self):
        """Install the configured engine as the process default."""
        from ..proofs.engine import Engine, set_engine
        if self.engine == "jax":
            from ..kernels.engine import JaxEngine
            set_engine(JaxEngine(self.min_msm_size, self.msm_wbits))
        else:
            set_engine(Engine())


_config = Config()


def get_config() -> Config:
    return _config


def set_config(c: Config):
    global _config
    _config = c
