"""Batched Edwards point kernel parity vs the oracle."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.kernels import point as jp
from zkvm_tpu.oracle import edwards as oe
from zkvm_tpu.oracle.ristretto import RistrettoPoint

_add = jax.jit(jp.add)
_double = jax.jit(jp.double)
_neg = jax.jit(jp.neg)
_tree_reduce = jax.jit(jp.tree_reduce)
_scalar_mul = jax.jit(jp.scalar_mul_fixed_window)
_dsm = jax.jit(jp.double_scalar_mul)


def _rand_points(n, seed=0):
    r = random.Random(seed)
    pts = [
        RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n - 1)
    ]
    return [oe.IDENTITY] + pts  # always include identity


def _eq_points(jax_pts, oracle_pts):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
    from zkvm_tpu.constants import P
    for (X, Y, Z, T), q in zip(jax_pts, oracle_pts):
        x2, y2, z2 = q[0], q[1], q[2]
        assert (X * z2 - x2 * Z) % P == 0
        assert (Y * z2 - y2 * Z) % P == 0
        # extended coordinate invariant
        assert (T * Z - X * Y) % P == 0


def test_add_double_parity():
    n = 16
    ps = _rand_points(n, seed=1)
    qs = _rand_points(n, seed=2)
    a, b = jp.pack_points(ps), jp.pack_points(qs)
    _eq_points(jp.unpack_points(_add(a, b)),
               [oe.add(p, q) for p, q in zip(ps, qs)])
    _eq_points(jp.unpack_points(_double(a)), [oe.double(p) for p in ps])
    _eq_points(jp.unpack_points(_neg(a)), [oe.neg(p) for p in ps])


def test_add_edge_cases():
    """identity+identity, P+P (doubling through unified add), P+(-P)."""
    ps = _rand_points(4, seed=3)
    a = jp.pack_points(ps)
    _eq_points(jp.unpack_points(_add(a, a)), [oe.double(p) for p in ps])
    negs = [oe.neg(p) for p in ps]
    out = jp.unpack_points(_add(a, jp.pack_points(negs)))
    _eq_points(out, [oe.IDENTITY] * 4)


def test_tree_reduce():
    n = 32
    ps = _rand_points(n, seed=4)
    total = oe.IDENTITY
    for p in ps:
        total = oe.add(total, p)
    out = jp.unpack_points(_tree_reduce(jp.pack_points(ps)))
    _eq_points(out, [total])


@pytest.mark.heavy
def test_scalar_mul_parity():
    n = 8
    ps = _rand_points(n, seed=5)
    r = random.Random(6)
    ks = [0, 1, L - 1] + [r.randrange(L) for _ in range(n - 3)]
    digits = jnp.asarray(jp.scalars_to_radix16(ks))
    out = jp.unpack_points(_scalar_mul(jp.pack_points(ps), digits))
    _eq_points(out, [oe.scalar_mul(k, p) for k, p in zip(ks, ps)])


@pytest.mark.heavy
def test_double_scalar_mul_parity():
    n = 8
    ps = _rand_points(n, seed=7)
    qs = _rand_points(n, seed=8)
    r = random.Random(9)
    k1 = [r.randrange(L) for _ in range(n)]
    k2 = [r.randrange(L) for _ in range(n)]
    d1 = jnp.asarray(jp.scalars_to_radix16(k1))
    d2 = jnp.asarray(jp.scalars_to_radix16(k2))
    out = jp.unpack_points(
        _dsm(d1, jp.pack_points(ps), d2, jp.pack_points(qs))
    )
    expect = [
        oe.add(oe.scalar_mul(a, p), oe.scalar_mul(b, q))
        for a, p, b, q in zip(k1, ps, k2, qs)
    ]
    _eq_points(out, expect)
