"""Device-mesh runtime: multi-chip/multi-host sharding of the proving stack.

No upstream counterpart exists (the reference is a single-process library,
SURVEY.md §2.9 P6) — this layer is the TPU-native scaling story:

- sharded Pippenger MSM: points partitioned across chips, per-chip bucket
  accumulation, log-depth cross-chip combination over ICI (P5);
- data-parallel batched proof verification: proofs sharded across a `dp`
  axis, each mega-check MSM sharded across a `tp` axis (P2/P3);
- the mesh helpers follow the jax.sharding / shard_map idiom.
"""

from .mesh import make_mesh, host_mesh_info  # noqa: F401
from .sharded_msm import sharded_msm, sharded_grouped_msm  # noqa: F401
from .batch_verify import sharded_batch_verify_jobs  # noqa: F401
