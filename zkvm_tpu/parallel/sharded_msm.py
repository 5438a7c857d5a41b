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
