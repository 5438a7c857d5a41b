#!/usr/bin/env python
"""A/B the affine-gather MSM frontend on the real chip (VERDICT r4
task 2).  The XLA permutation gather is op-bound per element (28.8 ms of
the 71.5 ms at 2^16 w=13), so gathering 16 affine words instead of 80
limb words should cut it ~5x at the cost of one batched affine
normalization (Montgomery trick, ~6n field muls).

Run: MS_LOG_N=16 python bench/affine_probe.py
"""

import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from zkvm_tpu.constants import L, P
from zkvm_tpu.kernels import msm as jmsm
from zkvm_tpu.kernels import pallas_msm as pm
from zkvm_tpu.oracle.ristretto import RistrettoPoint

LOG_N = int(os.environ.get("MS_LOG_N", "16"))
WBITS = int(os.environ.get("MS_WBITS", "13"))
ITERS = int(os.environ.get("MS_ITERS", "3"))


def main():
    n = 1 << LOG_N
    r = random.Random(42)
    base = [RistrettoPoint.from_uniform_bytes(
        r.getrandbits(512).to_bytes(64, "little")).ep for _ in range(256)]
    pb = pm.pack_points_lm(base)
    reps = n // 256
    pts = pm.PointBatch(
        jnp.tile(pb.x, (1, reps)), jnp.tile(pb.y, (1, reps)),
        jnp.tile(pb.z, (1, reps)), jnp.tile(pb.t, (1, reps)),
    )
    scalars = [r.randrange(L) for _ in range(n)]
    digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, WBITS))
    print(f"platform={jax.devices()[0].platform} n=2^{LOG_N} w={WBITS}",
          flush=True)

    results = {}
    for mode in ("0", "1"):
        os.environ["ZKVM_MSM_AFFINE"] = mode

        def wt(px, py, pz, pt, d):
            return pm._bucket_totals_seq(
                pm.PointBatch(px, py, pz, pt), d, WBITS, False)

        name = "affine" if mode == "1" else "extended"
        f = jax.jit(wt)
        t0 = time.time()
        out = f(pts.x, pts.y, pts.z, pts.t, digits)
        got = [np.asarray(c) for c in out]
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.time()
            out = f(pts.x, pts.y, pts.z, pts.t, digits)
            np.asarray(out.x)
            best = min(best, time.time() - t0)
        print(f"window_totals {name:9s} {best*1e3:9.1f} ms "
              f"(compile {compile_s:.0f}s)", flush=True)
        results[name] = got

    # parity: both modes must produce the same projective points
    from zkvm_tpu.kernels.limbs import limbs_to_int
    ext, aff = results["extended"], results["affine"]
    for w in range(ext[0].shape[1]):
        xe, ye, ze = (limbs_to_int(ext[i][:, w]) for i in (0, 1, 2))
        xa, ya, za = (limbs_to_int(aff[i][:, w]) for i in (0, 1, 2))
        assert (xe * za - xa * ze) % P == 0, f"x mismatch window {w}"
        assert (ye * za - ya * ze) % P == 0, f"y mismatch window {w}"
    print("affine/extended parity OK", flush=True)


if __name__ == "__main__":
    main()
