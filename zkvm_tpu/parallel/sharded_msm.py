"""Sharded Pippenger MSM over a device mesh.

Design (SURVEY.md §2.9 P5): an MSM is a plain group-sum over disjoint point
sets, so the `tp` axis simply partitions points: each chip runs the local
Pippenger kernel on its shard, then the single per-chip results (a few
hundred bytes) are combined with log-depth Edwards additions after an
all_gather over ICI.  Bucket-level cross-chip reduction (psum of bucket
arrays per window) is a further optimization for small per-chip shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels import msm as jmsm
from ..kernels import point as jp
from ..kernels.point import PointBatch


def _combine_gathered(local: PointBatch, axis: str) -> PointBatch:
    """all_gather per-chip partial sums, tree-add them locally (identical on
    every chip, so the output is replicated along `axis`)."""
    gathered = PointBatch(
        jax.lax.all_gather(local.x, axis),
        jax.lax.all_gather(local.y, axis),
        jax.lax.all_gather(local.z, axis),
        jax.lax.all_gather(local.t, axis),
    )  # (ndev, 20) each
    n = gathered.x.shape[0]
    # pad to a power of two with identities for the tree fold
    size = 1
    while size < n:
        size *= 2
    if size != n:
        ident = jp.identity((size - n,))
        gathered = PointBatch(
            jnp.concatenate([gathered.x, ident.x]),
            jnp.concatenate([gathered.y, ident.y]),
            jnp.concatenate([gathered.z, ident.z]),
            jnp.concatenate([gathered.t, ident.t]),
        )
    out = jp.tree_reduce(gathered)
    return PointBatch(out.x[0], out.y[0], out.z[0], out.t[0])


def sharded_msm_fn(mesh: Mesh, wbits: int = jmsm.DEFAULT_WBITS):
    """Build the jitted sharded MSM: (points (n,20)x4, digits (n,W)) -> point.

    Points/digits are sharded over BOTH mesh axes (treated as one flat
    partition of n); result is fully replicated.
    """
    spec_in = P(("dp", "tp"))
    spec_out = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PointBatch(spec_in, spec_in, spec_in, spec_in), spec_in),
        out_specs=PointBatch(spec_out, spec_out, spec_out, spec_out),
        check_vma=False,
    )
    def _local(points, digits):
        local = jmsm.msm_device(points, digits, wbits)
        return _combine_gathered(local, ("dp", "tp"))

    return jax.jit(_local)


def sharded_msm(mesh: Mesh, points: PointBatch, digits, wbits=jmsm.DEFAULT_WBITS):
    """Convenience wrapper: pads n to a multiple of the device count times
    16 and runs the sharded kernel."""
    ndev = mesh.devices.size
    n = digits.shape[0]
    chunk = -(-n // (16 * ndev)) * 16 * ndev
    pts, dg = jmsm.pad_batch(points, jnp.asarray(digits))
    # pad further to a multiple of ndev
    while dg.shape[0] % ndev != 0 or dg.shape[0] < chunk:
        extra = max(chunk, -(-dg.shape[0] // ndev) * ndev) - dg.shape[0]
        if extra == 0:
            break
        ident = jp.identity((extra,))
        pts = PointBatch(
            jnp.concatenate([pts.x, ident.x]), jnp.concatenate([pts.y, ident.y]),
            jnp.concatenate([pts.z, ident.z]), jnp.concatenate([pts.t, ident.t]),
        )
        dg = jnp.concatenate([dg, jnp.zeros((extra, dg.shape[1]), jnp.int32)])
    fn = sharded_msm_fn(mesh, wbits)
    return fn(pts, dg)


def sharded_grouped_msm_fn(mesh: Mesh, wbits: int = jmsm.DEFAULT_WBITS):
    """Grouped form: g independent MSMs (one per verification group).

    points (g, n, 20) x4 and digits (g, n, W): groups shard over `dp`,
    points within each group over `tp`.  Output: (g, 20) x4 group results,
    replicated over `tp` and sharded over `dp`.
    """
    spec_in = P("dp", "tp")
    spec_out = P("dp")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PointBatch(spec_in, spec_in, spec_in, spec_in), spec_in),
        out_specs=PointBatch(spec_out, spec_out, spec_out, spec_out),
        check_vma=False,
    )
    def _local(points, digits):
        g_local = digits.shape[0]

        def one(i, acc):
            pt = jp.gather(points, i)
            local = jmsm.msm_device(pt, digits[i], wbits)
            combined = _combine_gathered(local, "tp")
            return PointBatch(
                acc.x.at[i].set(combined.x),
                acc.y.at[i].set(combined.y),
                acc.z.at[i].set(combined.z),
                acc.t.at[i].set(combined.t),
            )

        acc0 = jp.identity((g_local,))
        return jax.lax.fori_loop(0, g_local, one, acc0)

    return jax.jit(_local)


def sharded_grouped_msm(mesh: Mesh, points: PointBatch, digits,
                        wbits=jmsm.DEFAULT_WBITS) -> PointBatch:
    return sharded_grouped_msm_fn(mesh, wbits)(points, jnp.asarray(digits))


# ---------------------------------------------------- Pallas-pipeline shard
def sharded_window_totals_fn(mesh: Mesh, wbits: int):
    """Sharded MSM on the round-2 production pipeline: points in LIMB-MAJOR
    (NLIMBS, n) layout shard their batch axis over the flat mesh; each
    device runs the local per-window bucket pipeline (Pallas kernels on
    TPU, the jnp window-totals elsewhere — same dispatcher contract as
    kernels/msm.msm_device); per-device totals are all_gathered (a few KB)
    and tree-combined with the same Edwards add formula, XLA-traced.
    Result: packed (4, NLIMBS, nw) per-window totals, replicated — callers
    finish with kernels.pallas_msm.combine_window_totals on the host.
    """
    import numpy as np

    from ..constants import EDWARDS_D2, NLIMBS
    from ..kernels import pallas_msm as pm
    from ..kernels.limbs import int_to_limbs

    axes = ("dp", "tp")
    spec_pts = P(None, axes)    # (NLIMBS, n): shard the batch axis
    spec_dig = P(axes, None)    # (n, nw)
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")
    d2col = jnp.asarray(int_to_limbs(EDWARDS_D2)[:, None].astype(np.int32))

    def _local_totals(points: PointBatch, digits):
        if use_pallas:
            t = pm.window_totals(points, digits, wbits, False)
            return jnp.stack([t.x, t.y, t.z, t.t])  # (4, NLIMBS, nw)
        # jnp fallback: batch-major kernel, then relayout
        bm = jp.PointBatch(points.x.T, points.y.T, points.z.T, points.t.T)
        t = jmsm._all_window_totals(bm, digits, wbits)  # (nw, 20) coords
        return jnp.stack([t.x.T, t.y.T, t.z.T, t.t.T])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(PointBatch(spec_pts, spec_pts, spec_pts, spec_pts),
                  spec_dig),
        out_specs=P(),
        check_vma=False,
    )
    def _sharded(points, digits):
        local = _local_totals(points, digits)          # (4, NLIMBS, nw)
        g = jax.lax.all_gather(local, axes)            # (ndev, 4, NLIMBS, nw)
        g = jnp.moveaxis(g, 2, 1)                      # (ndev, NLIMBS, 4, nw)
        assert g.shape[0] & (g.shape[0] - 1) == 0, "mesh size: power of two"
        d2 = d2col[:, None, :]                          # (NLIMBS, 1, 1)
        while g.shape[0] > 1:
            h = g.shape[0] // 2
            a, b = g[:h], g[h:]
            def coords(v):
                # (h, NLIMBS, 4, nw) -> tuple of (NLIMBS, h, nw)
                return tuple(jnp.moveaxis(v[:, :, i, :], 0, 1)
                             for i in range(4))
            s = pm._add_formula(coords(a), coords(b), d2)
            g = jnp.moveaxis(jnp.stack(s, axis=2), 1, 0)  # back to layout
        out = g[0]                                      # (NLIMBS, 4, nw)
        return jnp.moveaxis(out, 0, 1)                  # (4, NLIMBS, nw)

    return jax.jit(_sharded)


def sharded_msm_pallas(mesh: Mesh, points_lm, digits, wbits: int):
    """Convenience wrapper: pads the limb-major batch to the pipeline's
    tile requirements times the device count, runs the sharded window
    totals, and finishes with the host Horner combine.  Returns an oracle
    extended point."""
    from ..kernels import pallas_msm as pm

    ndev = mesh.devices.size
    # power-of-two padding is divisible by the (power-of-two) device count
    pts, dg = pm.pad_batch_lm(points_lm, jnp.asarray(digits),
                              min_size=ndev * 16)
    totals = sharded_window_totals_fn(mesh, wbits)(pts, dg)
    return pm.combine_window_totals(totals, wbits)
