"""Multi-host batched proof verification (BASELINE config 2/4).

Proofs are replayed on the host (transcript work, microseconds each) into
verification jobs — (scalars, points) MSMs that must sum to the identity.
Jobs are padded to a common size, stacked into group arrays, and dispatched
to the mesh: groups shard over `dp`, each group's MSM over `tp`
(SURVEY.md §2.9 P3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import L
from ..kernels import msm as jmsm
from ..kernels import point as jp
from ..kernels.engine import pack_point_list
from ..kernels.point import PointBatch
from ..oracle import ristretto
from ..proofs.errors import VerificationError
from .sharded_msm import sharded_grouped_msm


def jobs_to_arrays(jobs, wbits=jmsm.DEFAULT_WBITS):
    """jobs: list of (scalars, points) with oracle points.  Returns stacked
    (g, n, ...) arrays padded to a common power-of-two n."""
    g = len(jobs)
    nmax = max(len(s) for s, _ in jobs)
    size = 16
    while size < nmax:
        size *= 2
    xs, ys, zs, ts, dgs = [], [], [], [], []
    for scalars, points in jobs:
        pts = pack_point_list(points)
        digits = jnp.asarray(
            jmsm.signed_digits_radix_2w([int(s) % L for s in scalars], wbits)
        )
        pts, digits = jmsm.pad_batch(pts, digits)
        pad = size - digits.shape[0]
        if pad:
            ident = jp.identity((pad,))
            pts = PointBatch(
                jnp.concatenate([pts.x, ident.x]),
                jnp.concatenate([pts.y, ident.y]),
                jnp.concatenate([pts.z, ident.z]),
                jnp.concatenate([pts.t, ident.t]),
            )
            digits = jnp.concatenate(
                [digits, jnp.zeros((pad, digits.shape[1]), jnp.int32)]
            )
        xs.append(pts.x); ys.append(pts.y); zs.append(pts.z); ts.append(pts.t)
        dgs.append(digits)
    stacked = PointBatch(
        jnp.stack(xs), jnp.stack(ys), jnp.stack(zs), jnp.stack(ts)
    )
    return stacked, jnp.stack(dgs)


def pad_groups(points: PointBatch, digits, dp: int):
    """Pad the group axis to a multiple of dp with trivial (identity) jobs."""
    g = digits.shape[0]
    target = -(-g // dp) * dp
    if target == g:
        return points, digits, g
    pad = target - g
    ident = jp.identity((pad, digits.shape[1]))
    points = PointBatch(
        jnp.concatenate([points.x, ident.x]),
        jnp.concatenate([points.y, ident.y]),
        jnp.concatenate([points.z, ident.z]),
        jnp.concatenate([points.t, ident.t]),
    )
    digits = jnp.concatenate(
        [digits, jnp.zeros((pad,) + digits.shape[1:], jnp.int32)]
    )
    return points, digits, g


def sharded_batch_verify_jobs(mesh, jobs, wbits=jmsm.DEFAULT_WBITS) -> None:
    """Verify every job's MSM == identity on the mesh; raises on failure."""
    if not jobs:
        return
    points, digits = jobs_to_arrays(jobs, wbits)
    dp = mesh.shape["dp"]
    points, digits, g = pad_groups(points, digits, dp)
    out = sharded_grouped_msm(mesh, points, digits, wbits)
    # RISTRETTO identity check: the Edwards sum may be a small-torsion point
    # (decompressed coset representatives carry torsion), and the identity
    # coset is {(0,±1), (±i,0)} — i.e. X == 0 or Y == 0 projectively.
    eps = jp.unpack_points(
        PointBatch(out.x[:g], out.y[:g], out.z[:g], out.t[:g])
    )
    from ..constants import P
    for i, (X, Y, Z, T) in enumerate(eps):
        if X % P != 0 and Y % P != 0:
            raise VerificationError(f"batched verification failed (group {i})")
