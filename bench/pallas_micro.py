#!/usr/bin/env python
"""Micro-benchmarks for Pallas field/point kernel variants on the real chip.

Run directly (uses the TPU; do not run concurrently with other chip users):
    python bench/pallas_micro.py [variant ...]

Measures, per variant, the sustained rate in Gop/s-equivalents and Madd/s /
Mmul/s so kernel design choices are driven by measured numbers, not models
(round-1 lesson: the axon tunnel breaks naive timing; materialize with
np.asarray).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from zkvm_tpu.constants import LIMB_BITS, LIMB_MASK, NLIMBS, P, WRAP
from zkvm_tpu.kernels import pallas_field as pf
from zkvm_tpu.kernels.limbs import int_to_limbs, limbs_to_int

LANE_TILE = 512


def timed(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(np.asarray, out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        best = min(best, time.time() - t0)
    return best


def rand_limbs(rng, shape_tail):
    """(NLIMBS, B) canonical-ish limbs < 2^13."""
    return jnp.asarray(
        rng.integers(0, 1 << LIMB_BITS, size=(NLIMBS,) + shape_tail, dtype=np.int32)
    )


# ---------------------------------------------------------------- mul variants
def _carry(x):
    hi = x >> LIMB_BITS
    lo = x & LIMB_MASK
    return jnp.concatenate(
        [lo[:1, :] + WRAP * hi[-1:, :], lo[1:, :] + hi[:-1, :]], axis=0
    )


def _mul_roll(a, b):
    """Roll-based schoolbook: single (20,T) accumulator pair, no 39-row pads."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (NLIMBS, 1), 0)
    acc_lo = a * b[0:1, :]
    acc_hi = jnp.zeros_like(a)
    for j in range(1, NLIMBS):
        r = pltpu.roll(a, j, 0) * b[j: j + 1, :]
        big = rows >= j
        acc_lo = acc_lo + jnp.where(big, r, 0)
        acc_hi = acc_hi + jnp.where(big, 0, r)
    lo13 = acc_hi & LIMB_MASK
    hi13 = acc_hi >> LIMB_BITS
    f = WRAP * lo13 + jnp.concatenate(
        [jnp.zeros((1,) + acc_hi.shape[1:], jnp.int32), (WRAP * hi13)[:-1, :]],
        axis=0,
    )
    r = acc_lo + f
    for _ in range(3):
        r = _carry(r)
    return r


def _mul_kernel_roll(a_ref, b_ref, o_ref):
    o_ref[:, :] = _mul_roll(a_ref[:, :], b_ref[:, :])


def _pallas_binop(kernel, B, n_out=1):
    spec = pl.BlockSpec((NLIMBS, LANE_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    shapes = jax.ShapeDtypeStruct((NLIMBS, B), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=shapes if n_out == 1 else (shapes,) * n_out,
        grid=(B // LANE_TILE,),
        in_specs=[spec, spec],
        out_specs=spec if n_out == 1 else (spec,) * n_out,
    )


def _chain_kernel_factory(mulfn, depth):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:, :]
        b = b_ref[:, :]
        for _ in range(depth):
            a = mulfn(a, b)
        o_ref[:, :] = a
    return kernel


# ------------------------------------------------------------ point-add chain
def _point_add_lm(mulfn, X1, Y1, Z1, T1, X2, Y2, Z2, T2, d2):
    m = mulfn
    A = m(_carry(Y1 - X1), _carry(Y2 - X2))
    Bv = m(_carry(Y1 + X1), _carry(Y2 + X2))
    C = m(m(T1, d2), T2)
    D = m(Z1, _carry(Z2 + Z2))
    E = _carry(Bv - A)
    F = _carry(D - C)
    G = _carry(D + C)
    H = _carry(Bv + A)
    return m(E, F), m(G, H), m(F, G), m(E, H)


def _add_chain_kernel_factory(mulfn, depth):
    def kernel(x1, y1, z1, t1, x2, y2, z2, t2, d2_ref, ox, oy, oz, ot):
        p = (x1[:, :], y1[:, :], z1[:, :], t1[:, :])
        q = (x2[:, :], y2[:, :], z2[:, :], t2[:, :])
        d2 = d2_ref[:, :]
        for _ in range(depth):
            q = _point_add_lm(mulfn, *p, *q, d2)
        ox[:, :], oy[:, :], oz[:, :], ot[:, :] = q
    return kernel


def _make_add_chain(mulfn, depth, B):
    spec = pl.BlockSpec((NLIMBS, LANE_TILE), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    d2_spec = pl.BlockSpec((NLIMBS, LANE_TILE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((NLIMBS, B), jnp.int32)] * 4
    return pl.pallas_call(
        _add_chain_kernel_factory(mulfn, depth),
        out_shape=tuple(shapes),
        grid=(B // LANE_TILE,),
        in_specs=[spec] * 8 + [d2_spec],
        out_specs=tuple([spec] * 4),
    )


def _d2_tile():
    d2 = np.broadcast_to(
        int_to_limbs((P + 2 * (-121665 * pow(121666, P - 2, P))) % P)[:, None],
        (NLIMBS, LANE_TILE),
    )
    # recompute EDWARDS_D2 properly
    from zkvm_tpu.constants import EDWARDS_D2
    d2 = np.broadcast_to(int_to_limbs(EDWARDS_D2)[:, None], (NLIMBS, LANE_TILE))
    return jnp.asarray(d2.copy())


def check_mul(mul_pallas, B):
    """Parity check one lane against python ints."""
    rng = np.random.default_rng(0)
    a = rand_limbs(rng, (B,))
    b = rand_limbs(rng, (B,))
    out = np.asarray(mul_pallas(a, b))
    for lane in (0, 1, B - 1):
        av = limbs_to_int(np.asarray(a)[:, lane])
        bv = limbs_to_int(np.asarray(b)[:, lane])
        got = limbs_to_int(out[:, lane]) % P
        assert got == (av * bv) % P, f"mul mismatch lane {lane}"
    assert np.abs(out).max() < 12000, f"limb bound {np.abs(out).max()}"


def main():
    which = set(sys.argv[1:])
    B = 1 << 16
    rng = np.random.default_rng(1)
    a = rand_limbs(rng, (B,))
    b = rand_limbs(rng, (B,))
    print(f"platform={jax.devices()[0].platform} B=2^16", flush=True)

    results = {}

    def report(name, secs, nmul):
        rate = nmul / secs / 1e6
        results[name] = rate
        print(f"{name:28s} {secs*1e3:8.2f} ms  {rate:8.1f} Mmul/s", flush=True)

    # raw elementwise int32 mul for reference
    if not which or "rawmul" in which:
        f = jax.jit(lambda x, y: x * y)
        t = timed(f, a, b)
        print(f"{'raw elementwise i32 mul':28s} {t*1e3:8.2f} ms  "
              f"({NLIMBS*B/t/1e9:.1f} Gop/s)", flush=True)

    # single-mul kernels (HBM streaming)
    if not which or "mul_pad" in which:
        f = jax.jit(_pallas_binop(pf._mul_kernel, B))
        check_mul(f, 2048) if False else None
        t = timed(f, a, b)
        report("mul pad (current)", t, B)
    if not which or "mul_roll" in which:
        f = jax.jit(_pallas_binop(_mul_kernel_roll, B))
        out = np.asarray(f(a, b))
        av = limbs_to_int(np.asarray(a)[:, 7]); bv = limbs_to_int(np.asarray(b)[:, 7])
        assert limbs_to_int(out[:, 7]) % P == (av * bv) % P, "roll mul wrong"
        assert np.abs(out).max() < 12000, f"roll limb bound {np.abs(out).max()}"
        t = timed(f, a, b)
        report("mul roll", t, B)

    # chained muls in VMEM (compute-bound truth)
    for depth in (8,):
        if not which or "chain" in which:
            f = jax.jit(_pallas_binop(_chain_kernel_factory(pf._vmem_mul, depth), B))
            t = timed(f, a, b)
            report(f"mul pad chain x{depth}", t, B * depth)
            f = jax.jit(_pallas_binop(_chain_kernel_factory(_mul_roll, depth), B))
            t = timed(f, a, b)
            report(f"mul roll chain x{depth}", t, B * depth)

    # point-add chains
    d2 = _d2_tile()
    p1 = tuple(rand_limbs(rng, (B,)) for _ in range(4))
    p2 = tuple(rand_limbs(rng, (B,)) for _ in range(4))
    for depth in (1, 8):
        if not which or "addchain" in which:
            f = jax.jit(_make_add_chain(pf._vmem_mul, depth, B))
            t = timed(f, *p1, *p2, d2)
            print(f"{'point-add pad x%d' % depth:28s} {t*1e3:8.2f} ms  "
                  f"{B*depth/t/1e6:8.2f} Madd/s", flush=True)
            f = jax.jit(_make_add_chain(_mul_roll, depth, B))
            t = timed(f, *p1, *p2, d2)
            print(f"{'point-add roll x%d' % depth:28s} {t*1e3:8.2f} ms  "
                  f"{B*depth/t/1e6:8.2f} Madd/s", flush=True)


if __name__ == "__main__":
    main()
