#!/usr/bin/env python
"""Measure the Pallas MSM pipeline on the real chip.

Usage: python bench/pallas_msm_bench.py [log_n ...] (default 14 16)
Env: PMB_WBITS to force a window width; PMB_ITERS (default 3).

Prints per size: compile seconds, best run ms, points/s, and the derived
rangeproof verifies/s/chip (147-point mega-check per 64-bit proof).
Runs a small-n oracle parity check first so a wrong kernel can't
produce a fast-but-bogus number.
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle import edwards as oe
from zkvm_tpu.oracle.ristretto import RistrettoPoint

ITERS = int(os.environ.get("PMB_ITERS", "3"))


def rand_points(n, seed=0):
    r = random.Random(seed)
    return [
        RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(n)
    ]


def parity_check():
    n = 256
    pts = rand_points(n, seed=3)
    r = random.Random(4)
    ks = [r.randrange(L) for _ in range(n)]
    got = pm.msm(pts, ks, wbits=12, interpret=False)
    want = oe.multiscalar_mul(ks, pts)
    assert (got[0] * want[2] - want[0] * got[2]) % P == 0
    assert (got[1] * want[2] - want[1] * got[2]) % P == 0
    print("parity n=256 wbits=12: OK", flush=True)


def bench_size(log_n: int, wbits: int | None):
    n = 1 << log_n
    base = rand_points(256, seed=1)
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = pm.PointBatch(
        jnp.tile(pb.x, (1, reps)), jnp.tile(pb.y, (1, reps)),
        jnp.tile(pb.z, (1, reps)), jnp.tile(pb.t, (1, reps)),
    )
    r = random.Random(42)
    scalars = [r.randrange(L) for _ in range(n)]
    if wbits is None:
        wbits = pm.best_wbits(n)
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, wbits))

    t0 = time.time()
    out = pm.window_totals_packed(pts, digits, wbits, False)
    np.asarray(out)
    compile_s = time.time() - t0

    # same-shape sanity: zero digits -> identity totals
    z = pm.window_totals_packed(pts, jnp.zeros_like(digits), wbits, False)
    zc = pm.combine_window_totals(z, wbits)
    assert zc[0] % P == 0, "zero MSM is not the identity"

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        totals = pm.window_totals_packed(pts, digits, wbits, False)
        res = pm.combine_window_totals(totals, wbits)  # forces the fetch
        times.append(time.time() - t0)
    best = min(times)
    vps = n / best / 147
    print(
        f"n=2^{log_n} w={wbits}: compile {compile_s:6.1f}s  best "
        f"{best*1e3:8.1f} ms  {n/best/1e6:6.2f} Mpts/s  "
        f"{vps:8.1f} verifies/s ({vps/1000:.2f}x baseline)",
        flush=True,
    )


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [14, 16]
    wbits = int(os.environ["PMB_WBITS"]) if "PMB_WBITS" in os.environ else None
    print(f"platform={jax.devices()[0].platform}", flush=True)
    parity_check()
    for log_n in sizes:
        bench_size(log_n, wbits)


if __name__ == "__main__":
    main()
