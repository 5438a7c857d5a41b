"""Device mod-ℓ kernel parity vs the host oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from zkvm_tpu.constants import L
from zkvm_tpu.kernels import scalarmod as sm
from zkvm_tpu.kernels.limbs import ints_to_limbs, limbs_to_ints

_mul = jax.jit(sm.mul)
_add = jax.jit(sm.add)
_sub = jax.jit(sm.sub)
_neg = jax.jit(sm.neg)
_ip = jax.jit(sm.inner_product)

MUL_SAFE = 10000


def _pack(xs):
    return jnp.asarray(ints_to_limbs(xs))


def _unpack_mod_l(arr):
    return [x % L for x in limbs_to_ints(np.asarray(arr))]


def _cases(r, n):
    specials = [0, 1, L - 1, L - 2, 2**252, (L + 1) // 2, 2**260 - 1 - 2**253]
    return (specials + [r.randrange(L) for _ in range(n)])[:n]


def test_scalar_ops_parity(rng):
    xs = _cases(rng, 48)
    ys = list(reversed(_cases(rng, 48)))
    a, b = _pack(xs), _pack(ys)
    assert _unpack_mod_l(_mul(a, b)) == [x * y % L for x, y in zip(xs, ys)]
    assert _unpack_mod_l(_add(a, b)) == [(x + y) % L for x, y in zip(xs, ys)]
    assert _unpack_mod_l(_sub(a, b)) == [(x - y) % L for x, y in zip(xs, ys)]
    assert _unpack_mod_l(_neg(a)) == [(-x) % L for x in xs]


def test_scalar_chain_stays_bounded(rng):
    """Adversarial op chains: outputs must stay mul-safe with exact parity."""
    xs = _cases(rng, 24)
    ys = [pow(3, i, L) for i in range(24)]
    a, b = _pack(xs), _pack(ys)
    ra, rb = list(xs), list(ys)
    step = jax.jit(lambda a, b: (sm.mul(a, b), sm.sub(sm.add(a, a), sm.mul(b, b))))
    for i in range(15):
        assert int(jnp.max(jnp.abs(a))) <= MUL_SAFE, f"step {i}"
        assert int(jnp.max(jnp.abs(b))) <= MUL_SAFE, f"step {i}"
        a, b = step(a, b)
        ra, rb = (
            [x * y % L for x, y in zip(ra, rb)],
            [(2 * x - y * y) % L for x, y in zip(ra, rb)],
        )
    assert _unpack_mod_l(a) == ra
    assert _unpack_mod_l(b) == rb


def test_inner_product(rng):
    n = 64
    xs = [rng.randrange(L) for _ in range(n)]
    ys = [rng.randrange(L) for _ in range(n)]
    a = _pack(xs)  # (n, 20)
    b = _pack(ys)
    out = _ip(a, b)
    assert _unpack_mod_l(out[None])[0] == (
        sum(x * y for x, y in zip(xs, ys)) % L
    )
