#!/usr/bin/env python
"""Fixed-base vs variable-base scalar-mul micro-bench (VERDICT round-1 #10:
fixed-base must measure >=4x variable-base).

Paths compared, all through the native module (edwards255.cpp):
- variable-base: ed_msm n=1 (Straus radix-16: 256 doublings + 64 adds)
- fixed-base ct / vartime: ed_fixed_mul (64 table adds, zero doublings)
- batched Pedersen commits: ed_fixed_commit_batch vs per-commit ed_msm n=2
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zkvm_tpu.constants import L
from zkvm_tpu.native import ed_fixed_mul, ed_fixed_slot, ed_msm, get_lib
from zkvm_tpu.oracle.ristretto import BASEPOINT
from zkvm_tpu.proofs.generators import PedersenGens


def rate(fn, iters):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = time.perf_counter() - t0
    return iters / dt, dt / iters


def main():
    assert get_lib() is not None, "native library unavailable"
    r = random.Random(5)
    ks = [r.randrange(L) for _ in range(256)]
    slot = ed_fixed_slot(BASEPOINT.ep)
    it = iter(range(1 << 30))

    def var_base():
        ed_msm([ks[next(it) % 256]], [BASEPOINT.ep])

    def fixed_ct():
        ed_fixed_mul(slot, ks[next(it) % 256], ct=True)

    def fixed_vt():
        ed_fixed_mul(slot, ks[next(it) % 256], ct=False)

    vb, vb_s = rate(var_base, 2000)
    fc, fc_s = rate(fixed_ct, 2000)
    fv, fv_s = rate(fixed_vt, 2000)
    print(f"variable-base (Straus n=1): {vb:9.0f} ops/s  {vb_s*1e6:7.1f} us")
    print(f"fixed-base ct:              {fc:9.0f} ops/s  {fc_s*1e6:7.1f} us"
          f"   {fc/vb:4.1f}x")
    print(f"fixed-base vartime:         {fv:9.0f} ops/s  {fv_s*1e6:7.1f} us"
          f"   {fv/vb:4.1f}x")

    pc = PedersenGens()
    vs = [r.randrange(L) for _ in range(512)]
    bs = [r.randrange(L) for _ in range(512)]

    def commit_batch():
        pc.commit_batch(vs, bs)

    def commit_msm():
        for v, b in zip(vs[:32], bs[:32]):
            ed_msm([v, b], [pc.B.ep, pc.B_blinding.ep])

    cb, cb_s = rate(commit_batch, 20)
    cm, cm_s = rate(commit_msm, 20)
    per_batch = cb_s / 512 * 1e6
    per_msm = cm_s / 32 * 1e6
    print(f"Pedersen commit, batched fixed-base: {per_batch:7.1f} us/commit")
    print(f"Pedersen commit, per-op Straus MSM:  {per_msm:7.1f} us/commit"
          f"   ({per_msm/per_batch:4.1f}x slower)")


if __name__ == "__main__":
    main()
