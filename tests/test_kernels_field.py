"""Device field-kernel parity tests vs the oracle (the backend-agreement
discipline of SURVEY.md §4: every Pallas/JAX kernel property-tested against
the CPU ground truth on random + adversarial inputs)."""

import random

import numpy as np
import pytest

from zkvm_tpu.constants import P, SQRT_M1
from zkvm_tpu.kernels import field as jf
from zkvm_tpu.kernels.limbs import ints_to_limbs, limbs_to_field_ints
from zkvm_tpu.oracle import field as of

import jax
import jax.numpy as jnp

# jit entry points once: eager per-op dispatch makes the 254-squaring chains crawl
_add = jax.jit(jf.add)
_sub = jax.jit(jf.sub)
_mul = jax.jit(jf.mul)
_sqr = jax.jit(jf.sqr)
_neg = jax.jit(jf.neg)
_invert = jax.jit(jf.invert)
_sqrt_ratio = jax.jit(jf.sqrt_ratio)
_normalize = jax.jit(jf.normalize)
_is_negative = jax.jit(jf.is_negative)
_eq = jax.jit(jf.eq)
_mul_small = jax.jit(jf.mul_small, static_argnums=1)
_chain_step = jax.jit(lambda a, b: (_mul(a, b), _sub(_add(a, a), b)))


def _rand_elems(r, n):
    specials = [0, 1, 2, P - 1, P - 2, (P - 1) // 2, P - 19, 19, 2**255 - 20]
    xs = specials + [r.randrange(P) for _ in range(n - len(specials))]
    return xs[:n]


def _pack(xs):
    return jnp.asarray(ints_to_limbs(xs))


def _unpack(arr):
    return limbs_to_field_ints(np.asarray(arr))


MUL_SAFE = 10000  # |limb| bound required before a mul


def test_add_sub_mul_parity(rng):
    xs = _rand_elems(rng, 64)
    ys = list(reversed(xs))
    a, b = _pack(xs), _pack(ys)
    assert _unpack(_add(a, b)) == [of.add(x, y) for x, y in zip(xs, ys)]
    assert _unpack(_sub(a, b)) == [of.sub(x, y) for x, y in zip(xs, ys)]
    assert _unpack(_mul(a, b)) == [of.mul(x, y) for x, y in zip(xs, ys)]
    assert _unpack(_sqr(a)) == [of.sqr(x) for x in xs]
    assert _unpack(_neg(a)) == [of.neg(x) for x in xs]


def test_deep_op_chain_stays_bounded(rng):
    """Adversarial chains: limbs must stay mul-safe with no normalization."""
    xs = _rand_elems(rng, 32)
    ys = [r % P for r in range(101, 133)]
    a, b = _pack(xs), _pack(ys)
    ref_a = list(xs)
    ref_b = list(ys)
    for step in range(30):
        assert int(jnp.max(jnp.abs(a))) <= MUL_SAFE, f"step {step}: bound blown"
        assert int(jnp.max(jnp.abs(b))) <= MUL_SAFE
        a, b = _mul(a, b), _sub(_add(a, a), b)
        ref_a, ref_b = (
            [of.mul(x, y) for x, y in zip(ref_a, ref_b)],
            [of.sub(of.add(x, x), y) for x, y in zip(ref_a, ref_b)],
        )
    assert _unpack(a) == ref_a
    assert _unpack(b) == ref_b


def test_normalize_canonical(rng):
    xs = _rand_elems(rng, 32)
    a = _pack(xs)
    # drag through ops that leave loose/negative limbs
    a = _sub(_mul(a, a), a)
    n = _normalize(a)
    arr = np.asarray(n)
    assert (arr >= 0).all() and (arr < 2**13).all()
    vals = limbs_to_field_ints(arr)
    expect = [of.sub(of.mul(x, x), x) for x in xs]
    assert vals == expect
    # canonical: value < p and limbs are the canonical decomposition
    raw = [
        sum(int(arr[j, i]) << (13 * i) for i in range(20))
        for j in range(arr.shape[0])
    ]
    assert all(v < P for v in raw)


def test_invert_parity(rng):
    xs = _rand_elems(rng, 16)
    out = _unpack(_invert(_pack(xs)))
    assert out == [of.invert(x) for x in xs]


def test_sqrt_ratio_parity(rng):
    us = _rand_elems(rng, 24)
    vs = list(reversed(_rand_elems(rng, 24)))
    vs = [v if v != 0 else 7 for v in vs]
    ok, r = _sqrt_ratio(_pack(us), _pack(vs))
    ok = np.asarray(ok)
    r = _unpack(r)
    for i, (u, v) in enumerate(zip(us, vs)):
        eok, er = of.sqrt_ratio(u, v)
        assert bool(ok[i]) == eok, f"case {i}"
        assert r[i] == er, f"case {i}"


def test_is_negative_eq(rng):
    xs = _rand_elems(rng, 16)
    a = _pack(xs)
    negs = np.asarray(_is_negative(a))
    for i, x in enumerate(xs):
        assert bool(negs[i]) == of.is_negative(x)
    assert bool(np.asarray(_eq(a, a)).all())
    b = _add(a, _pack([1] * 16))
    assert not bool(np.asarray(_eq(a, b)).any())


def test_mul_small(rng):
    xs = _rand_elems(rng, 16)
    out = _unpack(_mul_small(_pack(xs), 121666))
    assert out == [x * 121666 % P for x in xs]
    out = _unpack(_mul_small(_pack(xs), -121665))
    assert out == [x * -121665 % P for x in xs]


def test_debug_limb_bound_checks():
    """Config.debug_checks turns on runtime limb-bound assertions
    (SURVEY.md §5.2 analogue of upstream debug_assert! invariants):
    in-range muls pass, a hand-built overflow trips the callback."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from zkvm_tpu.kernels import field as kf
    from zkvm_tpu.utils.config import get_config

    cfg = get_config()
    assert not cfg.debug_checks  # default off: checker is free
    cfg.debug_checks = True
    try:
        a = kf.constant(12345)[None]
        out = kf.mul(jnp.asarray(a), jnp.asarray(a))  # in-range: passes
        np.asarray(out)
        bad = jnp.full((1, 20), 1 << 20, jnp.int32)
        with pytest.raises(Exception):
            np.asarray(kf.debug_assert_limb_bounds(bad, bits=14))
    finally:
        cfg.debug_checks = False
