#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE configs 0/2): Bulletproofs rangeproof verification
throughput per chip, derived from the device Pippenger MSM rate.  A single
64-bit rangeproof verifies with one 147-point MSM (4 + 2*log2(64)=12 wait:
2*64 G/H + 2*6 L/R + A,S,T1,T2 + B,B~ + V = 147); batched verification
shares the 128 static G/H columns, so marginal cost per proof in a large
batch is ~19 points + the shared static columns amortized.  We report the
conservative single-proof figure: (points/sec) / 147.

vs_baseline: the upstream dalek stack verifies ~1000 proofs/s on one x86
core (BASELINE.md, unverified ballpark) — vs_baseline = ours / 1000.

Env knobs: BENCH_LOG_N (default 16), BENCH_WBITS (default 16),
BENCH_ITERS (default 3).
"""

import json
import os
import random
import sys
import time

N_LOG = int(os.environ.get("BENCH_LOG_N", "16"))
WBITS = int(os.environ.get("BENCH_WBITS", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "3"))
POINTS_PER_VERIFY = 147  # single 64-bit rangeproof mega-check MSM size
BASELINE_VERIFIES_PER_SEC = 1000.0


def main():
    import jax

    # persistent compilation cache: MSM kernel compiles are minutes-scale on
    # the axon TPU; cache them across bench runs
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from zkvm_tpu.constants import L
    from zkvm_tpu.kernels import msm as jmsm
    from zkvm_tpu.kernels import point as jp
    from zkvm_tpu.oracle.ristretto import RistrettoPoint

    n = 1 << N_LOG
    r = random.Random(42)

    # distinct base points (host-generated), tiled to n on device
    base_count = 256
    base = [
        RistrettoPoint.from_uniform_bytes(
            r.getrandbits(512).to_bytes(64, "little")
        ).ep
        for _ in range(base_count)
    ]
    pb = jp.pack_points(base)
    reps = n // base_count
    pts = jp.PointBatch(
        jnp.tile(pb.x, (reps, 1)), jnp.tile(pb.y, (reps, 1)),
        jnp.tile(pb.z, (reps, 1)), jnp.tile(pb.t, (reps, 1)),
    )
    scalars = [r.randrange(L) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, WBITS))

    # correctness guard on a small prefix
    small = 64
    guard = jmsm.msm(base[:small], scalars[:small], wbits=8)
    from zkvm_tpu.oracle import edwards as oe
    expect = oe.multiscalar_mul(scalars[:small], base[:small])
    from zkvm_tpu.constants import P
    gx, gy, gz, _ = guard
    ex, ey, ez, _ = expect
    assert (gx * ez - ex * gz) % P == 0 and (gy * ez - ey * gz) % P == 0, (
        "device MSM mismatch vs oracle"
    )

    # compile + warmup
    t0 = time.time()
    out = jmsm.msm_device(pts, digits, WBITS)
    out.x.block_until_ready()
    compile_s = time.time() - t0

    times = []
    for _ in range(ITERS):
        t0 = time.time()
        out = jmsm.msm_device(pts, digits, WBITS)
        out.x.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)

    points_per_sec = n / best
    verifies_per_sec = points_per_sec / POINTS_PER_VERIFY

    print(json.dumps({
        "metric": "rangeproof_verifies_per_sec_per_chip",
        "value": round(verifies_per_sec, 2),
        "unit": "verifies/s/chip",
        "vs_baseline": round(verifies_per_sec / BASELINE_VERIFIES_PER_SEC, 3),
    }))
    print(
        f"# msm n=2^{N_LOG} wbits={WBITS}: best {best*1000:.1f} ms "
        f"({points_per_sec/1e6:.2f} Mpoints/s), compile {compile_s:.1f}s, "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
