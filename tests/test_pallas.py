"""Pallas kernel parity tests (interpret mode on CPU; the same kernels run
compiled on TPU — see BASELINE.md for measured throughput)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import zkvm_tpu.kernels.limbs as lb
from zkvm_tpu.constants import P
from zkvm_tpu.kernels import pallas_field as pf
from zkvm_tpu.oracle import edwards as oe
from zkvm_tpu.oracle import field as of
from zkvm_tpu.oracle.ristretto import RistrettoPoint

B = pf.LANE_TILE  # one tile


def _tileT(ints):
    reps = B // len(ints)
    return jnp.tile(jnp.asarray(lb.ints_to_limbs(ints)).T, (1, reps))


def test_pallas_mul_parity(rng):
    xs = [rng.randrange(P) for _ in range(64)]
    ys = [rng.randrange(P) for _ in range(64)]
    out = pf.mul(_tileT(xs), _tileT(ys), interpret=True)
    got = lb.limbs_to_field_ints(np.asarray(out)[:, :64].T)
    assert got == [of.mul(x, y) for x, y in zip(xs, ys)]


def test_pallas_add_parity(rng):
    xs = [rng.randrange(P) for _ in range(64)]
    ys = [rng.randrange(P) for _ in range(64)]
    out = pf.add(_tileT(xs), _tileT(ys), interpret=True)
    got = lb.limbs_to_field_ints(np.asarray(out)[:, :64].T)
    assert got == [of.add(x, y) for x, y in zip(xs, ys)]


def test_pallas_point_add_parity(rng):
    n = 32
    p1 = [
        RistrettoPoint.from_uniform_bytes(
            rng.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n)
    ]
    p2 = [
        RistrettoPoint.from_uniform_bytes(
            rng.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n)
    ]

    def packT(pts):
        return tuple(_tileT([p[i] for p in pts]) for i in range(4))

    out = pf.point_add(packT(p1), packT(p2), interpret=True)
    gx = lb.limbs_to_field_ints(np.asarray(out[0])[:, :n].T)
    gy = lb.limbs_to_field_ints(np.asarray(out[1])[:, :n].T)
    gz = lb.limbs_to_field_ints(np.asarray(out[2])[:, :n].T)
    gt = lb.limbs_to_field_ints(np.asarray(out[3])[:, :n].T)
    for i, (a, b) in enumerate(zip(p1, p2)):
        e = oe.add(a, b)
        assert (gx[i] * e[2] - e[0] * gz[i]) % P == 0, i
        assert (gy[i] * e[2] - e[1] * gz[i]) % P == 0, i
        assert (gt[i] * gz[i] - gx[i] * gy[i]) % P == 0, i  # T invariant


def test_vmem_sqr_matches_mul():
    """_vmem_sqr (symmetric-product square) must agree with _vmem_mul(a,a)
    in VALUE mod p on canonical and loose (negative-limb) inputs."""
    import numpy as np

    from zkvm_tpu.constants import P
    from zkvm_tpu.kernels.limbs import int_to_limbs
    from zkvm_tpu.kernels.pallas_field import _vmem_mul, _vmem_sqr

    r = np.random.RandomState(9)
    import random as _rnd
    rr = _rnd.Random(9)
    vals = [rr.randrange(P) for _ in range(8)]
    a = np.stack([int_to_limbs(v) for v in vals]).T.astype(np.int32)
    loose = a.copy()
    loose[:, :4] -= 2          # negative-limb loose representation
    for arr in (a, loose):
        import jax.numpy as jnp
        got = np.asarray(_vmem_sqr(jnp.asarray(arr)))
        exp = np.asarray(_vmem_mul(jnp.asarray(arr), jnp.asarray(arr)))
        for i in range(arr.shape[1]):
            gv = sum(int(got[j, i]) << (13 * j) for j in range(got.shape[0]))
            ev = sum(int(exp[j, i]) << (13 * j) for j in range(exp.shape[0]))
            assert gv % P == ev % P
