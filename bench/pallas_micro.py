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
    """Time fn with its outputs REDUCED on-device inside the jit: the axon
    tunnel fetches device->host at ~40 MB/s, so materializing full outputs
    (np.asarray) measures the transfer, not the kernel.  A jnp.sum keeps
    the data dependency (block_until_ready lies on this tunnel; a 4-byte
    scalar fetch does not)."""
    reduced = jax.jit(
        lambda *a: jax.tree.reduce(
            lambda x, y: x + y,
            jax.tree.map(jnp.sum, fn(*a)),
        )
    )
    for _ in range(warmup):
        np.asarray(reduced(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(reduced(*args))
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


# ----------------------------------------------------- limb-plane variants
# Layout experiment: coords (NLIMBS, R, 128) with the kernel unrolling limbs
# into SEPARATE (8,128) vreg planes.  Every op is then dense elementwise —
# no pads/rolls/concats (which relayout across sublane tiles in the (20,T)
# layout above).
def _carry_planes(r):
    his = [x >> LIMB_BITS for x in r]
    los = [x & LIMB_MASK for x in r]
    return [los[0] + WRAP * his[-1]] + [
        los[k] + his[k - 1] for k in range(1, NLIMBS)
    ]


def _mul_planes(a, b):
    c = [None] * (2 * NLIMBS - 1)
    for i in range(NLIMBS):
        ai = a[i]
        for j in range(NLIMBS):
            p = ai * b[j]
            k = i + j
            c[k] = p if c[k] is None else c[k] + p
    r = list(c[:NLIMBS])
    for k in range(NLIMBS, 2 * NLIMBS - 1):
        hi = c[k] >> LIMB_BITS
        lo = c[k] & LIMB_MASK
        r[k - NLIMBS] = r[k - NLIMBS] + WRAP * lo
        r[k - NLIMBS + 1] = r[k - NLIMBS + 1] + WRAP * hi
    for _ in range(3):
        r = _carry_planes(r)
    return r


def _mul_kernel_planes(a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(NLIMBS)]
    b = [b_ref[i] for i in range(NLIMBS)]
    r = _mul_planes(a, b)
    for i in range(NLIMBS):
        o_ref[i] = r[i]


def _raw_kernel_planes(a_ref, b_ref, o_ref):
    """Control: one elementwise multiply in the planes layout."""
    o_ref[...] = a_ref[...] * b_ref[...]


def _prod_kernel_planes(a_ref, b_ref, o_ref):
    """400 products into 39 accumulators, no fold/carries."""
    a = [a_ref[i] for i in range(NLIMBS)]
    b = [b_ref[i] for i in range(NLIMBS)]
    c = [None] * (2 * NLIMBS - 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            p = a[i] * b[j]
            k = i + j
            c[k] = p if c[k] is None else c[k] + p
    for i in range(NLIMBS):
        o_ref[i] = c[i] + c[i + NLIMBS - 1]


def _carry_kernel_planes(a_ref, b_ref, o_ref):
    """8 chained carry passes, no products."""
    r = [a_ref[i] + b_ref[i] for i in range(NLIMBS)]
    for _ in range(8):
        r = _carry_planes(r)
    for i in range(NLIMBS):
        o_ref[i] = r[i]


def _chain_kernel_planes(depth):
    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(NLIMBS)]
        b = [b_ref[i] for i in range(NLIMBS)]
        for _ in range(depth):
            a = _mul_planes(a, b)
        for i in range(NLIMBS):
            o_ref[i] = a[i]
    return kernel


PLANE_SUB = 8  # sublane rows per grid step


def _pallas_binop_planes(kernel, _B_unused=None, n_out=1):
    spec = pl.BlockSpec((NLIMBS, PLANE_SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)

    def wrapped(a, b):
        B = a.shape[1]
        R = B // 128
        shapes = jax.ShapeDtypeStruct((NLIMBS, R, 128), jnp.int32)
        inner = pl.pallas_call(
            kernel,
            out_shape=shapes if n_out == 1 else (shapes,) * n_out,
            grid=(R // PLANE_SUB,),
            in_specs=[spec, spec],
            out_specs=spec if n_out == 1 else (spec,) * n_out,
        )
        a3 = a.reshape(NLIMBS, R, 128)
        b3 = b.reshape(NLIMBS, R, 128)
        out = inner(a3, b3)
        if n_out == 1:
            return out.reshape(NLIMBS, B)
        return tuple(o.reshape(NLIMBS, B) for o in out)

    return wrapped


def _mul_const_planes(a, consts):
    """a * constant (limbs as Python ints, folded at trace time)."""
    c = [None] * (2 * NLIMBS - 1)
    for i in range(NLIMBS):
        ai = a[i]
        for j, cj in enumerate(consts):
            if cj == 0:
                continue
            p = ai * cj
            k = i + j
            c[k] = p if c[k] is None else c[k] + p
    zero = jnp.zeros_like(a[0])
    c = [zero if x is None else x for x in c]
    r = list(c[:NLIMBS])
    for k in range(NLIMBS, 2 * NLIMBS - 1):
        hi = c[k] >> LIMB_BITS
        lo = c[k] & LIMB_MASK
        r[k - NLIMBS] = r[k - NLIMBS] + WRAP * lo
        r[k - NLIMBS + 1] = r[k - NLIMBS + 1] + WRAP * hi
    for _ in range(3):
        r = _carry_planes(r)
    return r


def _add_planes(d2_limbs):
    def sub(p, q):
        return [x - y for x, y in zip(p, q)]

    def addl(p, q):
        return [x + y for x, y in zip(p, q)]

    def point_add(p1, p2):
        X1, Y1, Z1, T1 = p1
        X2, Y2, Z2, T2 = p2
        A = _mul_planes(_carry_planes(sub(Y1, X1)), _carry_planes(sub(Y2, X2)))
        Bv = _mul_planes(_carry_planes(addl(Y1, X1)), _carry_planes(addl(Y2, X2)))
        Td = _mul_const_planes(T1, d2_limbs)
        C = _mul_planes(Td, T2)
        D = _mul_planes(Z1, _carry_planes(addl(Z2, Z2)))
        E = _carry_planes(sub(Bv, A))
        F = _carry_planes(sub(D, C))
        G = _carry_planes(addl(D, C))
        H = _carry_planes(addl(Bv, A))
        return (_mul_planes(E, F), _mul_planes(G, H),
                _mul_planes(F, G), _mul_planes(E, H))

    return point_add


def _add_chain_kernel_planes(depth, d2_limbs):
    padd = _add_planes(d2_limbs)

    def kernel(x1, y1, z1, t1, x2, y2, z2, t2, ox, oy, oz, ot):
        p = tuple([r[i] for i in range(NLIMBS)] for r in (x1, y1, z1, t1))
        q = tuple([r[i] for i in range(NLIMBS)] for r in (x2, y2, z2, t2))
        for _ in range(depth):
            q = padd(p, q)
        for out_ref, coord in zip((ox, oy, oz, ot), q):
            for i in range(NLIMBS):
                out_ref[i] = coord[i]
    return kernel


def _make_add_chain_planes(depth, B):
    from zkvm_tpu.constants import EDWARDS_D2
    d2_limbs = [int(v) for v in int_to_limbs(EDWARDS_D2)]
    R = B // 128
    spec = pl.BlockSpec((NLIMBS, PLANE_SUB, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    shapes = [jax.ShapeDtypeStruct((NLIMBS, R, 128), jnp.int32)] * 4
    inner = pl.pallas_call(
        _add_chain_kernel_planes(depth, d2_limbs),
        out_shape=tuple(shapes),
        grid=(R // PLANE_SUB,),
        in_specs=[spec] * 8,
        out_specs=tuple([spec] * 4),
    )

    def wrapped(*coords):
        c3 = [c.reshape(NLIMBS, R, 128) for c in coords]
        out = inner(*c3)
        return tuple(o.reshape(NLIMBS, B) for o in out)

    return wrapped


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

    if not which or "mul_planes" in which:
        f = jax.jit(_pallas_binop_planes(_mul_kernel_planes, B))
        check_mul(f, 2048)
        t = timed(f, a, b)
        report("mul planes", t, B)
    if "planes_parts" in which:
        for name, k in (("raw", _raw_kernel_planes),
                        ("prod400", _prod_kernel_planes),
                        ("carry8", _carry_kernel_planes)):
            f = jax.jit(_pallas_binop_planes(k, B))
            t = timed(f, a, b)
            print(f"{'planes ' + name:28s} {t*1e3:8.2f} ms", flush=True)

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
        if not which or "addplanes" in which:
            f = jax.jit(_make_add_chain_planes(depth, B))
            t = timed(f, *p1, *p2)
            print(f"{'point-add planes x%d' % depth:28s} {t*1e3:8.2f} ms  "
                  f"{B*depth/t/1e6:8.2f} Madd/s", flush=True)


if __name__ == "__main__":
    main()
