"""JaxEngine: the device-accelerated implementation of the proof-layer Engine
seam (zkvm_tpu/proofs/engine.py).

Protocol code stays host-side Python over oracle RistrettoPoints; this engine
packs point/scalar batches into limb arrays, runs the Pippenger MSM and fold
kernels on the device, and unpacks the (single) resulting point.  Limb packs
are cached on the point objects so static generator vectors convert once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import L
from ..oracle import edwards, ristretto
from ..proofs.engine import Engine
from . import msm as jmsm
from . import point as jp
from .limbs import int_to_limbs
from .point import PointBatch


def _point_limbs(p: ristretto.RistrettoPoint) -> np.ndarray:
    """(4, 20) int32 for one point, cached on the object."""
    cached = getattr(p, "_limbs", None)
    if cached is None:
        cached = np.stack([int_to_limbs(c) for c in p.ep])
        p._limbs = cached
    return cached


def _point_words(p: ristretto.RistrettoPoint) -> np.ndarray:
    """(4, 8) uint32 canonical words for one point, cached on the object
    (the compact upload form; see pallas_msm.pack_words)."""
    cached = getattr(p, "_words", None)
    if cached is None:
        from .pallas_msm import point_words
        cached = point_words(p.ep)
        p._words = cached
    return cached


def pack_point_list(points) -> PointBatch:
    rows = np.stack([_point_limbs(p) for p in points])  # (n, 4, 20)
    return PointBatch(
        jnp.asarray(rows[:, 0]), jnp.asarray(rows[:, 1]),
        jnp.asarray(rows[:, 2]), jnp.asarray(rows[:, 3]),
    )


def _unpack_single(out: PointBatch) -> ristretto.RistrettoPoint:
    ep = jp.unpack_points(
        PointBatch(out.x[None], out.y[None], out.z[None], out.t[None])
    )[0]
    return ristretto.RistrettoPoint(ep)


class JaxEngine(Engine):
    """MSMs and IPP folds on the TPU (or any JAX backend).

    pipeline: "auto" picks the Pallas bucket pipeline on TPU (the fused
    VMEM point-add path, kernels/pallas_msm.py) and the jnp kernels
    elsewhere; "pallas"/"xla" force one.  wbits None = per-size best_wbits.
    """

    name = "jax"

    # proofs.rangeproof.batch_verify routes through the fused device path
    # (kernels/batch_verify_device.py: on-chip scalar synthesis + resident
    # generator cache) when this engine runs a real Pallas backend —
    # interpret-mode Pallas on CPU is orders of magnitude slower than the
    # host-assembled path, so "auto" engines on CPU keep the host route
    # (tests force it with pipeline="pallas")
    @property
    def supports_fused_batch_verify(self) -> bool:
        return self._use_pallas()

    def __init__(self, min_msm_size: int = 2048, wbits: int | None = None,
                 pipeline: str = "auto"):
        # below this size the native host MSM beats a device round trip:
        # the axon tunnel charges a ~24 ms dispatch/fetch floor while the
        # native Straus path clears a 1k-point MSM in a few ms, so the
        # measured crossover sits near 2^11 (it also keeps the prover's
        # per-round IPP MSMs — 2nm down to 2 — off the device, where they
        # would serialize 2·log(nm) fetch floors per proof)
        self.min_msm_size = min_msm_size
        self.wbits = wbits
        self.pipeline = pipeline
        self._oracle = Engine()

    def _use_pallas(self) -> bool:
        import jax
        if self.pipeline == "auto":
            return jax.default_backend() in ("tpu", "axon")
        return self.pipeline == "pallas"

    def msm(self, scalars, points) -> ristretto.RistrettoPoint:
        if not hasattr(scalars, "buf"):  # ScalarVec stays packed
            scalars = [int(s) % L for s in scalars]
        points = list(points)
        if len(scalars) < self.min_msm_size:
            return self._oracle.msm(scalars, points)
        if self._use_pallas():
            from . import pallas_msm as pmsm
            wbits = self.wbits or pmsm.best_wbits(len(scalars))
            # compact-upload frontend: 128 B/point + 32 B/scalar canonical
            # u32 words, limb decode + signed digit recode ON DEVICE (the
            # axon tunnel moves ~40 MB/s, and the host digit decompose was
            # ~30 ms at batch-verify sizes)
            pw, sw = pmsm.pack_words(
                [_point_words(p) for p in points], scalars
            )
            import jax
            interpret = jax.default_backend() not in ("tpu", "axon")
            totals = pmsm.window_totals_from_words(
                jnp.asarray(pw), jnp.asarray(sw), wbits, interpret
            )
            return ristretto.RistrettoPoint(
                pmsm.combine_window_totals(totals, wbits)
            )
        wbits = self.wbits or 16
        pts = pack_point_list(points)
        digits = jnp.asarray(jmsm.signed_digits_radix_2w(scalars, wbits))
        pts, digits = jmsm.pad_batch(pts, digits)
        return _unpack_single(jmsm.msm_device(pts, digits, wbits))

    # --------------------------------------------------- prover-side seams
    # The device pipeline's schedule is data-independent (fixed-shape sorts,
    # gathers and adds — no secret-indexed table lookups or branches), so it
    # serves the SECRET-scalar prover MSMs too; below the measured tunnel
    # crossover (~24 ms dispatch/fetch floor) the native constant-time host
    # path wins and the dispatcher keeps it.
    secret_min_msm_size = 4096

    # proofs.ipp.InnerProductProof.create routes to the device-resident
    # argument (kernels/ipp_device.py) at or above this n: below it the
    # per-round tunnel fetch floor (~24 ms x lg n) outweighs the native
    # host rounds
    ipp_device_min_n = 4096

    def msm_secret(self, scalars, points):
        if len(points) < self.secret_min_msm_size or not self._use_pallas():
            return self._oracle.msm_secret(scalars, points)
        return self.msm(scalars, points)

    def msm_batch(self, scalars_groups, points_groups, ct: bool = False):
        """Grouped MSMs in one dispatch+fetch (proofs/mpc.py A/S
        commitments).  Device when the combined work clears the tunnel
        floor; the groups must be same-sized (they are: 2n+1 per party)."""
        sizes = {len(p) for p in points_groups}
        total = sum(len(p) for p in points_groups)
        if (len(sizes) != 1 or total < 2048 or len(points_groups) < 4
                or not self._use_pallas()):
            return super().msm_batch(scalars_groups, points_groups, ct)
        from . import pallas_msm as pmsm
        import jax
        interpret = jax.default_backend() not in ("tpu", "axon")
        g = len(points_groups)
        wbits = self.wbits or pmsm.best_wbits(next(iter(sizes)))
        pws, sws = [], []
        for sc, pts in zip(scalars_groups, points_groups):
            if not hasattr(sc, "buf"):
                sc = [int(s) % L for s in sc]
            pw, sw = pmsm.pack_words([_point_words(p) for p in pts], sc)
            pws.append(pw)
            sws.append(sw)
        pw = np.stack(pws, axis=2)            # (4, 8, g, np)
        sw = np.stack(sws, axis=1)            # (8, g, np)
        totals = np.asarray(pmsm.grouped_window_totals_from_words(
            jnp.asarray(pw), jnp.asarray(sw), wbits, interpret
        ))
        return [
            ristretto.RistrettoPoint(
                pmsm.combine_window_totals(totals[i], wbits)
            )
            for i in range(g)
        ]

    # ------------------------------------------------------ async pipeline
    def msm_start(self, scalars, points):
        """Dispatch the device half of an MSM WITHOUT fetching: jax
        dispatch is asynchronous, so the host can assemble the next
        batch's verification job while the chip runs this one
        (bench.py's pipelined batched-verification measurement)."""
        from . import pallas_msm as pmsm
        if not hasattr(scalars, "buf"):  # ScalarVec stays packed
            scalars = [int(s) % L for s in scalars]
        wbits = self.wbits or pmsm.best_wbits(len(scalars))
        pw, sw = pmsm.pack_words(
            [_point_words(p) for p in points], scalars
        )
        import jax
        interpret = jax.default_backend() not in ("tpu", "axon")
        totals = pmsm.window_totals_from_words(
            jnp.asarray(pw), jnp.asarray(sw), wbits, interpret
        )
        return (totals, wbits)

    def msm_finish_is_identity(self, handle) -> bool:
        from . import pallas_msm as pmsm
        totals, wbits = handle
        return ristretto.RistrettoPoint(
            pmsm.combine_window_totals(totals, wbits)
        ).is_identity()

    def msm_is_identity(self, scalars, points) -> bool:
        """Verifier mega-checks: window totals + the rolled device Horner
        combine + Ristretto identity test in back-to-back dispatches, so a
        single int32 crosses back instead of the (4, NLIMBS, nw) totals
        (VERDICT r3 #3; vm/verifier.py, parallel/tx_batch.py ride this)."""
        import os

        if (len(points) < self.min_msm_size or not self._use_pallas()
                or os.environ.get("ZKVM_DEV_COMBINE") in ("0", "false")):
            return super().msm_is_identity(scalars, points)
        from . import pallas_msm as pmsm
        if not hasattr(scalars, "buf"):
            scalars = [int(s) % L for s in scalars]
        wbits = self.wbits or pmsm.best_wbits(len(scalars))
        pw, sw = pmsm.pack_words(
            [_point_words(p) for p in points], scalars
        )
        import jax
        interpret = jax.default_backend() not in ("tpu", "axon")
        totals = pmsm.window_totals_from_words(
            jnp.asarray(pw), jnp.asarray(sw), wbits, interpret
        )
        return bool(int(pmsm.combine_and_check_device(totals, wbits)))

    def verify_r1cs_split(self, bb: int, bs: int, g_v, h_v,
                          dyn_s, dyn_enc: list[bytes], bp_gens,
                          pc_gens) -> bool:
        """Single-proof R1CS mega-check through the fused split device
        path: the G/H column scalars stay as packed ScalarVecs over the
        RESIDENT generator columns and the ~40 dyn points upload as raw
        encodings — replacing msm_is_identity's per-point Python packing
        of the 2·padded_n generator points (~1.3 s at 2^15 multipliers,
        campaign log 2026-08-20).  proofs/r1cs/verifier.py dispatches
        here when the engine exposes this method."""
        from .batch_verify_device import fused_split_check

        static_buf = ((bb % L).to_bytes(32, "little")
                      + (bs % L).to_bytes(32, "little")
                      + g_v.buf + h_v.buf)
        return fused_split_check(static_buf, dyn_s, b"".join(dyn_enc),
                                 bp_gens, pc_gens)

    def fold_points(self, s1, s2, P, Q):
        # same crossover reasoning as msm: the native threaded fold clears
        # the prover's per-round G/H folds far below one tunnel round trip
        if len(P) < max(4, self.min_msm_size // 2):
            return self._oracle.fold_points(s1, s2, P, Q)
        d1 = jnp.asarray(jp.scalars_to_radix16([int(x) % L for x in s1]))
        d2 = jnp.asarray(jp.scalars_to_radix16([int(x) % L for x in s2]))
        out = jp.double_scalar_mul(
            d1, pack_point_list(P), d2, pack_point_list(Q)
        )
        eps = jp.unpack_points(out)
        return [ristretto.RistrettoPoint(ep) for ep in eps]
