"""R1CS verifier (upstream bulletproofs/src/r1cs/verifier.rs).

Replays the constraint system symbolically (no witness), reproduces the
transcript, and folds the whole verification into ONE MSM == identity
(the same seam the rangeproof verifier uses; batchable across proofs).
"""

from __future__ import annotations

from ...constants import L
from ...oracle import scalar
from ...oracle.ristretto import RistrettoPoint
from ..engine import get_engine
from ..errors import R1CSError, VerificationError
from ..generators import BulletproofGens, PedersenGens
from ..transcript import ProofTranscript
from ..util import next_power_of_two
from .constraint_system import Metrics, flatten_constraints
from .lc import LinearCombination, Variable, _as_lc
from .proof import R1CSProof


class Verifier:
    """ConstraintSystem implementation without a witness."""

    def __init__(self, transcript: ProofTranscript):
        self.transcript = transcript
        transcript.r1cs_domain_sep()
        self.num_v = 0
        self.V: list[bytes] = []
        self.num_multipliers = 0
        self.constraints: list[LinearCombination] = []
        self.deferred: list = []
        self.pending_multiplier: int | None = None
        self.num_phase1_multipliers: int | None = None
        self._num_phase1_constraints: int | None = None
        self._in_phase2 = False

    def commit(self, V: bytes) -> Variable:
        j = self.num_v
        self.num_v += 1
        self.V.append(V)
        self.transcript.append_point(b"V", V)
        return Variable.committed(j)

    # --------------------------------------------------- ConstraintSystem API
    def multiply(self, left, right):
        left = _as_lc(left)
        right = _as_lc(right)
        i = self.num_multipliers
        self.num_multipliers += 1
        vl = Variable.multiplier_left(i)
        vr = Variable.multiplier_right(i)
        vo = Variable.multiplier_output(i)
        self.constrain(left - vl)
        self.constrain(right - vr)
        return vl, vr, vo

    def allocate(self, assignment=None) -> Variable:
        if self.pending_multiplier is None:
            i = self.num_multipliers
            self.num_multipliers += 1
            self.pending_multiplier = i
            return Variable.multiplier_left(i)
        i = self.pending_multiplier
        self.pending_multiplier = None
        return Variable.multiplier_right(i)

    def allocate_multiplier(self, assignment=None):
        i = self.num_multipliers
        self.num_multipliers += 1
        return (
            Variable.multiplier_left(i),
            Variable.multiplier_right(i),
            Variable.multiplier_output(i),
        )

    def constrain(self, lc):
        # no eager simplify: flatten_constraints merges duplicate terms
        # anyway, and the per-constraint dict pass was ~25% of a full-tx
        # VM replay (parallel/tx_batch.py batch verification)
        self.constraints.append(_as_lc(lc))

    def specify_randomized_constraints(self, closure):
        self.deferred.append(closure)

    def challenge_scalar(self, label: bytes) -> int:
        if not self._in_phase2:
            raise R1CSError(
                "challenges are only available inside randomized constraints"
            )
        return self.transcript.challenge_scalar(label)

    def metrics(self) -> Metrics:
        p1 = (
            self._num_phase1_constraints
            if self._num_phase1_constraints is not None
            else len(self.constraints)
        )
        return Metrics(
            multipliers=self.num_multipliers,
            constraints=len(self.constraints),
            phase_one_constraints=p1,
            phase_two_constraints=len(self.constraints) - p1,
        )

    # ----------------------------------------------------------------- verify
    def verification_job_split(
        self, proof: R1CSProof, bp_gens: BulletproofGens, pc_gens: PedersenGens
    ):
        """Mega-check MSM inputs, split into per-proof dynamic terms and
        scalars over the SHARED static columns: returns
        (dyn_scalars, dyn_points, static_scalars, padded_n) with the static
        convention [B_blinding, B] + G(padded_n) + H(padded_n)."""
        dyn_s, dyn_p, bb, bs, g_v, h_v, padded_n = \
            self.verification_job_split_vec(proof, bp_gens, pc_gens)
        return (dyn_s, dyn_p,
                [bb, bs] + g_v.to_ints() + h_v.to_ints(), padded_n)

    def verification_job_split_vec(
        self, proof: R1CSProof, bp_gens: BulletproofGens,
        pc_gens: PedersenGens, decompress_dyn: bool = True,
    ):
        """verification_job_split with the G/H static-column scalars kept
        as native ScalarVecs: (dyn_scalars, dyn_points, bb, bs, g_vec,
        h_vec, padded_n).  Batch verifiers (parallel/tx_batch.py) weight
        and accumulate the vectors with native AXPY passes instead of
        padded_n-long Python loops (~0.8 ms/tx of the round-4 replay).

        decompress_dyn=False returns dyn_points as the raw 32-byte
        COMPRESSED encodings (skipping the host decompress entirely) for
        callers that decode on device (kernels/pallas_decompress.py) —
        the device decode validates the encodings, so invalid points
        reject there instead of here."""
        ts = self.transcript
        ts.append_u64(b"m", self.num_v)

        ts.validate_and_append_point(b"A_I1", proof.A_I1)
        ts.validate_and_append_point(b"A_O1", proof.A_O1)
        ts.validate_and_append_point(b"S1", proof.S1)

        self.num_phase1_multipliers = n1 = self.num_multipliers
        self._num_phase1_constraints = len(self.constraints)
        if not self.deferred:
            ts.r1cs_1phase_domain_sep()
        else:
            ts.r1cs_2phase_domain_sep()
            self._in_phase2 = True
            deferred, self.deferred = self.deferred, []
            for closure in deferred:
                closure(self)
        self.pending_multiplier = None

        # phase-2 commitment points may be the identity: plain append
        ts.append_point(b"A_I2", proof.A_I2)
        ts.append_point(b"A_O2", proof.A_O2)
        ts.append_point(b"S2", proof.S2)

        u = ts.challenge_scalar(b"u")
        y = ts.challenge_scalar(b"y")
        z = ts.challenge_scalar(b"z")

        n = self.num_multipliers
        n2 = n - n1
        padded_n = next_power_of_two(n)
        pad = padded_n - n
        if bp_gens.gens_capacity < padded_n:
            raise R1CSError("invalid generators length")

        # constraint flatten: one native per-z pass (scl_flatten) emitting
        # the wire-weight vectors as packed ScalarVecs; the Python fold
        # stays as the bit-exact ground truth (ZKVM_TPU_PY_FLATTEN=1)
        import os as _os
        nf = None
        if not _os.environ.get("ZKVM_TPU_PY_FLATTEN"):
            from ...native import flatten_constraints_vec
            nf = flatten_constraints_vec(
                self.constraints, z, n, self.num_v, pad)
        if nf is None:
            wL, wR, wO, wV, wc = flatten_constraints(
                self.constraints, z, n, self.num_v
            )

        for i in (1, 3, 4, 5, 6):
            ts.validate_and_append_point(
                f"T_{i}".encode(), getattr(proof, f"T_{i}")
            )

        x = ts.challenge_scalar(b"x")
        ts.append_scalar(b"t_x", proof.t_x)
        ts.append_scalar(b"t_x_blinding", proof.t_x_blinding)
        ts.append_scalar(b"e_blinding", proof.e_blinding)
        w = ts.challenge_scalar(b"w")

        # verifier-local weight combining the t-check and P-check
        c = ts.build_rng().finalize(b"\x00" * 32).random_scalar()

        u_sq, u_inv_sq, sv_s = proof.ipp_proof.verification_scalars_vec(
            padded_n, ts)
        a, b = proof.ipp_proof.a % L, proof.ipp_proof.b % L

        # bulk vector math through the native ScalarVec (scalarvec.cpp):
        # the Python comprehensions here were ~0.5 ms/tx of the batched
        # full-tx verification's replay cost (parallel/tx_batch.py)
        from ...native import ScalarVec
        y_inv = scalar.invert(y)
        sv_yinv = ScalarVec.powers(y_inv, padded_n)
        if nf is not None:
            sv_wL, sv_wR, sv_wO, wV, wc = nf
        else:
            sv_wL = ScalarVec.from_ints(wL + [0] * pad)
            sv_wO = ScalarVec.from_ints(wO + [0] * pad)
            sv_wR = ScalarVec.from_ints(wR + [0] * pad)
        # constant-shaped vectors by byte repetition (from_ints was
        # ~0.3 ms/tx of the batched tx replay)
        one_b = (1).to_bytes(32, "little")
        sv_fac = ScalarVec(
            one_b * n1 + (u % L).to_bytes(32, "little") * (n2 + pad),
            padded_n)
        ones = ScalarVec(one_b * padded_n, padded_n)

        yneg_wR = sv_yinv.mul(sv_wR)
        delta = ScalarVec(yneg_wR.buf[: 32 * n], n).inner(
            ScalarVec(sv_wL.buf[: 32 * n], n))
        # g_i = fac_i · (x·yneg_wR_i − a·s_i)
        g_v = yneg_wR.scale(x).sub(sv_s.scale(a)).mul(sv_fac)
        # h_i = fac_i · (y^{-i}·(x·wL_i + wO_i − b·s_inv_i) − 1)
        h_v = (sv_wL.scale(x).add(sv_wO).sub(sv_s.reverse().scale(b))
               .mul(sv_yinv).sub(ones).mul(sv_fac))
        xx = x * x % L
        basepoint_scalar = (
            w * ((proof.t_x - a * b) % L)
            + c * ((xx * ((wc + delta) % L) - proof.t_x) % L)
        ) % L

        dyn_scalars = (
            [
                x,                      # A_I1
                xx,                     # A_O1
                xx * x % L,             # S1
                u * x % L,              # A_I2
                u * xx % L,             # A_O2
                u * xx % L * x % L,     # S2
                c * x % L,              # T_1
                c * pow(x, 3, L) % L,   # T_3
                c * pow(x, 4, L) % L,   # T_4
                c * pow(x, 5, L) % L,   # T_5
                c * pow(x, 6, L) % L,   # T_6
            ]
            + [c * xx % L * wVj % L for wVj in wV]          # V_j
            + list(u_sq) + list(u_inv_sq)                   # L_vec, R_vec
        )
        compressed = (list(proof.points()) + list(self.V)
                      + list(proof.ipp_proof.L_vec)
                      + list(proof.ipp_proof.R_vec))
        if decompress_dyn:
            from ...oracle.ristretto import decompress_many
            dyn_points = decompress_many(compressed)
        else:
            dyn_points = compressed
        # static head + G/H column vectors: [B_blinding, B] + G + H —
        # batch verifiers accumulate these per-column across proofs
        bb = (-proof.e_blinding - c * proof.t_x_blinding) % L
        return (dyn_scalars, dyn_points, bb, basepoint_scalar,
                g_v, h_v, padded_n)

    def verification_job(
        self, proof: R1CSProof, bp_gens: BulletproofGens, pc_gens: PedersenGens
    ) -> tuple[list[int], list[RistrettoPoint]]:
        """Emit the (scalars, points) of the mega-check MSM (batching seam)."""
        dyn_s, dyn_p, stat_s, padded_n = self.verification_job_split(
            proof, bp_gens, pc_gens
        )
        gens = bp_gens.share(0)
        scalars = dyn_s + stat_s
        points = (
            dyn_p
            + [pc_gens.B_blinding, pc_gens.B]
            + gens.G(padded_n)
            + gens.H(padded_n)
        )
        return scalars, points

    def verify(
        self, proof: R1CSProof, pc_gens: PedersenGens, bp_gens: BulletproofGens
    ) -> None:
        eng = get_engine()
        fast = getattr(eng, "verify_r1cs_split", None)
        if fast is not None:
            # only worth it on a real chip (interpret-mode decompress is
            # minutes-slow); ZKVM_R1CS_DEVICE=1/0 overrides for parity
            # tests / A/Bs
            import os as _os
            env = _os.environ.get("ZKVM_R1CS_DEVICE")
            if env in ("0", "1"):
                use_fast = env == "1"
            else:
                import jax
                use_fast = jax.default_backend() in ("tpu", "axon")
            if not use_fast:
                fast = None
        if fast is not None:
            # fused split device path: resident generator columns + raw
            # dyn encodings, one dispatch (kernels/batch_verify_device.
            # fused_split_check); the encodings are validated on device
            dyn_s, dyn_enc, bb, bs, g_v, h_v, _padded_n = \
                self.verification_job_split_vec(
                    proof, bp_gens, pc_gens, decompress_dyn=False)
            try:
                ok = fast(bb, bs, g_v, h_v, dyn_s, dyn_enc,
                          bp_gens, pc_gens)
            except Exception:
                # device graph unavailable: host decompress + engine MSM
                from ...oracle.ristretto import decompress_many
                gens = bp_gens.share(0)
                maxpad = len(g_v)
                scalars = (dyn_s + [bb, bs]
                           + g_v.to_ints() + h_v.to_ints())
                points = (decompress_many(dyn_enc)
                          + [pc_gens.B_blinding, pc_gens.B]
                          + gens.G(maxpad) + gens.H(maxpad))
                ok = eng.msm_is_identity(scalars, points)
            if not ok:
                raise VerificationError("R1CS proof verification failed")
            return
        scalars, points = self.verification_job(proof, bp_gens, pc_gens)
        if not eng.msm_is_identity(scalars, points):
            raise VerificationError("R1CS proof verification failed")
