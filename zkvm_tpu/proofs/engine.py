"""The host↔device seam: every heavy group operation in the proof layer funnels
through an Engine, mirroring how upstream funnels everything into
`RistrettoPoint::vartime_multiscalar_mul` (SURVEY.md §2.9 P2/P3).

The default engine computes on the CPU oracle; `zkvm_tpu.kernels.engine`
registers a JAX/TPU engine that executes the same MSMs as Pippenger device
kernels (and shards them over a mesh in `zkvm_tpu.parallel`).
"""

from __future__ import annotations

from ..oracle import ristretto


class Engine:
    """Abstract compute engine for protocol-layer group math.

    The host engine prefers the native C++ Straus module (native/
    edwards255.cpp, ~35x the Python oracle) and falls back to the
    pure-Python oracle, which stays the semantic ground truth."""

    name = "oracle"

    def msm(self, scalars, points) -> ristretto.RistrettoPoint:
        """Variable-time multiscalar multiplication: sum_i scalars[i] * points[i].
        `scalars` may be a packed ScalarVec (zero-copy into the native call)."""
        from ..native import ed_msm
        eps = [p.ep for p in points]
        native = ed_msm(scalars, eps) if eps else None
        if native is not None:
            return ristretto.RistrettoPoint(native)
        if hasattr(scalars, "to_ints"):
            scalars = scalars.to_ints()
        return ristretto.multiscalar_mul(scalars, points)

    def msm_secret(self, scalars, points) -> ristretto.RistrettoPoint:
        """MSM over SECRET scalars (prover commitments): constant-time table
        selects in the native path (upstream multiscalar_mul vs vartime_)."""
        from ..native import ed_msm
        eps = [p.ep for p in points]
        native = ed_msm(scalars, eps, ct=True) if eps else None
        if native is not None:
            return ristretto.RistrettoPoint(native)
        if hasattr(scalars, "to_ints"):
            scalars = scalars.to_ints()
        return ristretto.multiscalar_mul(scalars, points)

    def basepoint_mul(self, scalar: int,
                      ct: bool = True) -> ristretto.RistrettoPoint:
        """scalar * B via the precomputed fixed-base table (upstream
        EdwardsBasepointTable: 64 radix-16 table adds, zero doublings —
        measured ~5x the variable-base Straus path, bench/fixed_base_micro).
        ct=True keeps table selects constant-time for secret scalars
        (signing nonces, private keys)."""
        from ..native import ed_fixed_mul, ed_fixed_slot
        slot = ed_fixed_slot(ristretto.BASEPOINT.ep)
        if slot is not None:
            return ristretto.RistrettoPoint(ed_fixed_mul(slot, scalar, ct))
        return ristretto.BASEPOINT * scalar

    def commit(self, value: int, blinding: int, B, B_blinding
               ) -> ristretto.RistrettoPoint:
        """Pedersen commit v*B + b*B_blinding through BOTH fixed-base
        tables in one native call (128 ct table adds, zero doublings)."""
        out = self.commit_batch([value], [blinding], B, B_blinding)
        return out[0]

    def commit_batch(self, values, blindings, B, B_blinding
                     ) -> list[ristretto.RistrettoPoint]:
        """[v_i*B + b_i*B_blinding] — thread-parallel native batch over the
        fixed tables; falls back to per-commit secret MSMs."""
        from ..native import ed_fixed_commit_batch, ed_fixed_slot
        sv, sb = ed_fixed_slot(B.ep), ed_fixed_slot(B_blinding.ep)
        if sv is not None and sb is not None:
            eps = ed_fixed_commit_batch(sv, sb, values, blindings)
            return [ristretto.RistrettoPoint(ep) for ep in eps]
        return [
            self.msm_secret([v, b], [B, B_blinding])
            for v, b in zip(values, blindings, strict=True)
        ]

    def bit_commit_batch(self, jobs) -> list[ristretto.RistrettoPoint]:
        """Range-proof A commitments: jobs = [(a_blinding, a_L_bits,
        B_blinding, G, H)] -> [a_blinding*B_blinding + <a_L,G> + <a_R,H>]
        with a_R = a_L - 1.  Because a_L is a bit vector, the whole
        size-(2n+1) constant-time MSM collapses to one ct fixed ladder plus
        n ct two-way selects (native ed_bit_commit, ~45us vs ~750us); the
        generic msm_secret stays the fallback/ground truth."""
        from ..constants import L
        from ..native import ed_bit_commit
        out = []
        for blind, bits, Bb, G, H in jobs:
            native = ed_bit_commit(blind, Bb.ep, bits,
                                   [g.ep for g in G], [h.ep for h in H])
            if native is not None:
                out.append(ristretto.RistrettoPoint(native))
            else:
                sa = [blind] + list(bits) + [(b - 1) % L for b in bits]
                out.append(self.msm_secret(sa, [Bb] + list(G) + list(H)))
        return out

    def msm_is_identity(self, scalars, points) -> bool:
        """Check sum_i s_i P_i == identity (the verifier's single mega-check)."""
        return self.msm(scalars, points).is_identity()

    def msm_batch(self, scalars_groups, points_groups,
                  ct: bool = False) -> list[ristretto.RistrettoPoint]:
        """Many independent MSMs in one engine call (the aggregated-prover
        A/S commitment seam: 2m groups of 2n+1).  The host engine loops;
        the JAX engine fuses all groups into one device dispatch so the
        whole batch pays a single tunnel round trip."""
        f = self.msm_secret if ct else self.msm
        return [f(s, p) for s, p in
                zip(scalars_groups, points_groups, strict=True)]

    def fold_points(self, s1, s2, P, Q) -> list[ristretto.RistrettoPoint]:
        """Batched 2-term MSMs: [s1_i*P_i + s2_i*Q_i] — the IPP G/H fold step
        (inner_product_proof.rs round fold).  The JAX engine runs this as one
        batched double-scalar-mul kernel."""
        from ..native import ed_fold
        native = ed_fold(s1, s2, [p.ep for p in P], [q.ep for q in Q])
        if native is not None:
            return [ristretto.RistrettoPoint(ep) for ep in native]
        from ..oracle import edwards
        out = []
        for a, b, p, q in zip(s1, s2, P, Q, strict=True):
            out.append(
                ristretto.RistrettoPoint(
                    edwards.add(
                        edwards.scalar_mul(a, p.ep), edwards.scalar_mul(b, q.ep)
                    )
                )
            )
        return out


_default_engine: Engine = Engine()


def get_engine() -> Engine:
    return _default_engine


def set_engine(engine: Engine) -> Engine:
    global _default_engine
    prev = _default_engine
    _default_engine = engine
    return prev
