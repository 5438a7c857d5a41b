"""Bulletproofs range proofs: single, aggregated, and batched verification.

Upstream counterpart: bulletproofs/src/range_proof/mod.rs —
RangeProof::{prove_single, prove_multiple, verify_single, verify_multiple} plus
the batch-verification seam (`PointOp`-style random linear combination).

The verifier's entire work folds into ONE multiscalar multiplication of size
2nm + 2·log2(nm) + m + 5 (SURVEY.md §3.2) — the north-star hot path.  Batched
verification combines many proofs' mega-checks with random weights into a single
larger MSM, which the TPU engine shards across chips (zkvm_tpu.parallel).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..constants import L
from ..oracle import scalar
from ..oracle.merlin import TranscriptRng
from ..oracle.ristretto import RistrettoPoint
from .engine import get_engine
from .errors import FormatError, ProofError, VerificationError
from .generators import BulletproofGens, PedersenGens
from .ipp import InnerProductProof
from .mpc import Dealer, Party
from .transcript import ProofTranscript
from .util import powers


def delta(n: int, m: int, y: int, z: int) -> int:
    """delta(y,z) = (z - z^2) <1, y^nm> - sum_j z^{j+3} <1, 2^n>
    (upstream range_proof::delta)."""
    sum_y = scalar.sum_of_powers(y, n * m)
    sum_2 = scalar.sum_of_powers(2, n)
    zz = z * z % L
    acc = (z - zz) % L * sum_y % L
    zexp = zz * z % L
    for _ in range(m):
        acc = (acc - zexp * sum_2) % L
        zexp = zexp * z % L
    return acc


@dataclass
class RangeProof:
    A: bytes
    S: bytes
    T_1: bytes
    T_2: bytes
    t_x: int
    t_x_blinding: int
    e_blinding: int
    ipp_proof: InnerProductProof

    # ------------------------------------------------------------------ prove
    @staticmethod
    def prove_multiple(
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        values: list[int],
        blindings: list[int],
        n: int,
        rng: TranscriptRng | None = None,
    ) -> tuple["RangeProof", list[bytes]]:
        """Aggregated proof over m values (upstream prove_multiple_with_rng).

        Runs the full dealer/party MPC locally.  Returns (proof, commitments).
        """
        if len(values) != len(blindings):
            raise ValueError("mismatched values/blindings lengths")
        m = len(values)
        dealer = Dealer(bp_gens, pc_gens, transcript, n, m)
        parties = [
            Party(bp_gens, pc_gens, v, b, n, rng=rng)
            for v, b in zip(values, blindings)
        ]
        # every party's S commitment MSM in ONE engine msm_batch call
        # (m groups of 2n+1) — the host+TPU hybrid prove seam: the JAX
        # engine fuses the whole batch into a single device dispatch once
        # the work clears its measured crossover.  A commitments take the
        # bit-structured fast path (a_L bits / a_R = a_L - 1 collapse the
        # ct MSM to n ct selects; engine.bit_commit_batch)
        groups_s, groups_p, a_jobs = [], [], []
        for j, p in enumerate(parties):
            _sa, pa, ss, ps = p.bit_commitment_parts(j)
            a_jobs.append((p.a_blinding, p.a_L, pc_gens.B_blinding,
                           pa[1:n + 1], pa[n + 1:]))
            groups_s.append(ss)
            groups_p.append(ps)
        eng = get_engine()
        outs_s = eng.msm_batch(groups_s, groups_p, ct=True)
        outs_a = eng.bit_commit_batch(a_jobs)
        bit_commitments = [
            p.finish_bit_commitment(outs_a[j], outs_s[j])
            for j, p in enumerate(parties)
        ]
        value_commitments = [bc.V_j for bc in bit_commitments]
        bit_challenge = dealer.receive_bit_commitments(bit_commitments)
        poly_commitments = [p.apply_challenge(bit_challenge) for p in parties]
        poly_challenge = dealer.receive_poly_commitments(poly_commitments)
        shares = [p.apply_poly_challenge(poly_challenge) for p in parties]
        proof = dealer.receive_trusted_shares(shares)
        return proof, value_commitments

    @staticmethod
    def prove_single(
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        v: int,
        v_blinding: int,
        n: int,
        rng: TranscriptRng | None = None,
    ) -> tuple["RangeProof", bytes]:
        proof, commitments = RangeProof.prove_multiple(
            bp_gens, pc_gens, transcript, [v], [v_blinding], n, rng=rng
        )
        return proof, commitments[0]

    def dyn_compressed(self, value_commitments: list[bytes]) -> list[bytes]:
        """This proof's dynamic mega-check points, compressed, in MSM
        order: A, S, T1, T2, L..., R..., V... (decompress in one native
        batch across proofs — see batch_verification_job)."""
        return (
            [self.A, self.S, self.T_1, self.T_2]
            + list(self.ipp_proof.L_vec) + list(self.ipp_proof.R_vec)
            + list(value_commitments)
        )

    # ----------------------------------------------------------------- verify
    def _replay_challenges(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        value_commitments: list[bytes],
        n: int,
        c: int | None = None,
        raw: bool = False,
    ) -> dict:
        """Validate proof structure and replay the verification transcript;
        returns {"y","z","x","w","c","u"}.  The challenge-only seam shared
        by the host scalar assembly (_job_parts) and the fused device path
        (kernels/batch_verify_device.py), which synthesizes all vector
        scalars on-chip from exactly these values.

        raw=True (fused-batch fast path; requires the native strobe and no
        c override) returns {"raw": blob} instead — the (5+lg)*32-byte
        canonical (y,z,x,w,c,u...) blob, which is byte-identical to what
        fused_params_assembly consumes, skipping every int round-trip."""
        m = len(value_commitments)
        if n not in (8, 16, 32, 64):
            raise FormatError("invalid bitsize")
        if m == 0 or m & (m - 1):
            raise FormatError("invalid aggregation size")
        if bp_gens.gens_capacity < n or bp_gens.party_capacity < m:
            raise FormatError("invalid generators length")

        lg_nm = (n * m).bit_length() - 1
        for pb in ([self.A, self.S, self.T_1, self.T_2]
                   + list(self.ipp_proof.L_vec) + list(self.ipp_proof.R_vec)
                   + list(value_commitments)):
            if len(pb) != 32:
                raise ProofError("point validation failed: bad length")
        if len(self.ipp_proof.L_vec) != lg_nm or n * m != 1 << lg_nm:
            raise FormatError("inner product proof size mismatch")

        # fused native transcript replay: one ctypes crossing for the whole
        # challenge sequence (native/strobe.cpp rangeproof_replay,
        # bit-identical to the Python sequence in the else-branch)
        from ..constants import LABEL_IPP, LABEL_RANGEPROOF
        from ..native import rangeproof_replay
        rep = rangeproof_replay(
            transcript.strobe, LABEL_RANGEPROOF, LABEL_IPP, n, m,
            b"".join(value_commitments),
            self.A + self.S + self.T_1 + self.T_2
            + scalar.to_bytes(self.t_x)
            + scalar.to_bytes(self.t_x_blinding)
            + scalar.to_bytes(self.e_blinding),
            b"".join(
                lb + rb for lb, rb in
                zip(self.ipp_proof.L_vec, self.ipp_proof.R_vec)
            ),
            lg_nm,
            want_raw=raw and c is None,
        )
        if rep is not None and isinstance(rep, bytes):
            return {"raw": rep}
        if rep is not None:
            y, z, x, w, c_rng, u_challenges = rep
            if c is None:
                c = c_rng
        else:  # pure-Python strobe fallback (semantic ground truth)
            transcript.rangeproof_domain_sep(n, m)
            for V in value_commitments:
                transcript.append_point(b"V", V)
            transcript.validate_and_append_point(b"A", self.A)
            transcript.validate_and_append_point(b"S", self.S)
            y = transcript.challenge_scalar(b"y")
            z = transcript.challenge_scalar(b"z")
            transcript.validate_and_append_point(b"T_1", self.T_1)
            transcript.validate_and_append_point(b"T_2", self.T_2)
            x = transcript.challenge_scalar(b"x")
            transcript.append_scalar(b"t_x", self.t_x)
            transcript.append_scalar(b"t_x_blinding", self.t_x_blinding)
            transcript.append_scalar(b"e_blinding", self.e_blinding)
            w = transcript.challenge_scalar(b"w")

            # Verifier-local random weight combining the t-check and
            # P-check; drawn from the transcript RNG (upstream: thread rng)
            if c is None:
                c = (transcript.build_rng().finalize(b"\x00" * 32)
                     .random_scalar())

            transcript.innerproduct_domain_sep(n * m)
            u_challenges = []
            for Lb, Rb in zip(self.ipp_proof.L_vec, self.ipp_proof.R_vec):
                transcript.validate_and_append_point(b"L", Lb)
                transcript.validate_and_append_point(b"R", Rb)
                u_challenges.append(transcript.challenge_scalar(b"u"))
        return {"y": y, "z": z, "x": x, "w": w, "c": c, "u": u_challenges}

    def _job_parts(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        value_commitments: list[bytes],
        n: int,
        c: int | None = None,
        decompressed: list | None = None,
    ) -> "_JobParts":
        """Replay the transcript and emit the mega-check MSM sections.
        This is the batching seam: callers combine several jobs with random
        weights into one MSM; the g/h columns stay as packed ScalarVec.
        """
        m = len(value_commitments)
        rep = self._replay_challenges(
            bp_gens, pc_gens, transcript, value_commitments, n, c
        )
        y, z, x, w, c = rep["y"], rep["z"], rep["x"], rep["w"], rep["c"]
        u_challenges = rep["u"]
        a, b = self.ipp_proof.a % L, self.ipp_proof.b % L

        zz = z * z % L

        # fused per-proof scalar assembly (scalarvec.cpp): u^2/u^-2, the
        # g/h columns (packed), and delta in ONE native call
        from ..native import rangeproof_scalar_assembly
        asm = rangeproof_scalar_assembly(u_challenges, n, m, y, z, a, b)
        if asm is not None:
            u_sq, u_inv_sq, g_v, h_v, delta_val = asm
        else:
            # ScalarVec-chain fallback (semantic ground truth):
            #   g_i = -z - a*s_i
            #   h_i = z + y^-i * (z^2 * z_and_2_i - b / s_i)
            from ..native import ScalarVec
            u_sq, u_inv_sq, sv = self.ipp_proof.scalars_from_challenges(
                u_challenges
            )
            s_inv_v = sv.reverse()  # 1/s_i = s_{nm-1-i}
            y_inv = scalar.invert(y)
            exp_y_inv_v = ScalarVec.powers(y_inv, n * m)
            exp_2_v = ScalarVec.powers(2, n)
            z2_parts = []
            zexp = 1
            for _ in range(m):  # concat_z_and_2: z^j * 2^i, party j, bit i
                z2_parts.append(exp_2_v.scale(zexp))
                zexp = zexp * z % L
            z2_v = ScalarVec.concat(*z2_parts)

            g_v = sv.axpb((-a) % L, (-z) % L)
            h_v = (
                z2_v.scale(zz).sub(s_inv_v.scale(b)).mul(exp_y_inv_v)
                .axpb(1, z)
            )
            delta_val = delta(n, m, y, z)
        value_commitment_scalars = [
            c * zz % L * ze % L for ze in powers(z, m)
        ]
        basepoint_scalar = (
            w * ((self.t_x - a * b) % L)
            + c * ((delta_val - self.t_x) % L)
        ) % L

        head = (
            [1, x, c * x % L, c * x % L * x % L]
            + list(u_sq)
            + list(u_inv_sq)
        )
        bb_s = (-self.e_blinding - c * self.t_x_blinding) % L
        if decompressed is None:
            from ..oracle.ristretto import decompress_many
            decompressed = decompress_many(self.dyn_compressed(
                value_commitments
            ))  # batch callers pre-decompress ALL proofs in one call
        dyn = decompressed
        k = 4 + len(self.ipp_proof.L_vec) + len(self.ipp_proof.R_vec)
        return _JobParts(
            head=head, bb_s=bb_s, b_s=basepoint_scalar, g_v=g_v, h_v=h_v,
            v_s=value_commitment_scalars, head_points=dyn[:k],
            v_points=dyn[k:],
        )

    def verification_job(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        value_commitments: list[bytes],
        n: int,
        c: int | None = None,
    ) -> tuple[list[int], list[RistrettoPoint]]:
        """Replay the transcript and emit the mega-check MSM
        (scalars, points) that must sum to the identity — the flat-list
        view of _job_parts (single-proof verify; batch_verification_job
        consumes the structured parts directly to stay packed)."""
        m = len(value_commitments)
        p = self._job_parts(bp_gens, pc_gens, transcript,
                            value_commitments, n, c)
        scalars = (
            p.head + [p.bb_s, p.b_s] + p.g_v.to_ints() + p.h_v.to_ints()
            + p.v_s
        )
        points = (
            p.head_points
            + [pc_gens.B_blinding, pc_gens.B]
            + bp_gens.G(n, m)
            + bp_gens.H(n, m)
            + p.v_points
        )
        return scalars, points

    def verify_multiple(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        value_commitments: list[bytes],
        n: int,
    ) -> None:
        """One-MSM verification (upstream verify_multiple_with_rng)."""
        scalars, points = self.verification_job(
            bp_gens, pc_gens, transcript, value_commitments, n
        )
        if not get_engine().msm_is_identity(scalars, points):
            raise VerificationError("range proof verification failed")

    def verify_single(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        V: bytes,
        n: int,
    ) -> None:
        self.verify_multiple(bp_gens, pc_gens, transcript, [V], n)

    # -------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        return (
            self.A + self.S + self.T_1 + self.T_2
            + scalar.to_bytes(self.t_x)
            + scalar.to_bytes(self.t_x_blinding)
            + scalar.to_bytes(self.e_blinding)
            + self.ipp_proof.to_bytes()
        )

    @staticmethod
    def from_bytes(data: bytes) -> "RangeProof":
        if len(data) % 32 != 0 or len(data) < 7 * 32:
            raise FormatError("bad range proof length")
        A, S, T_1, T_2 = (data[i * 32: (i + 1) * 32] for i in range(4))
        t_x = scalar.from_canonical_bytes(data[128:160])
        t_x_blinding = scalar.from_canonical_bytes(data[160:192])
        e_blinding = scalar.from_canonical_bytes(data[192:224])
        ipp = InnerProductProof.from_bytes(data[224:])
        return RangeProof(A, S, T_1, T_2, t_x, t_x_blinding, e_blinding, ipp)


@dataclass
class _JobParts:
    """Sections of one proof's mega-check MSM, with the big per-entry
    columns (g/h) as packed ScalarVec so batching never round-trips
    through Python ints (see _job_parts / batch_verification_job)."""
    head: list          # [1, x, cx, cxx] + u_sq + u_inv_sq  (ints)
    bb_s: int           # B_blinding scalar
    b_s: int            # B scalar
    g_v: "object"       # ScalarVec, len n*m
    h_v: "object"       # ScalarVec, len n*m
    v_s: list           # value-commitment scalars (ints, len m)
    head_points: list   # A,S,T1,T2,L...,R... (decompressed)
    v_points: list      # value commitments (decompressed)


def batch_verification_job(
    proofs: list[RangeProof],
    bp_gens: BulletproofGens,
    pc_gens: PedersenGens,
    transcripts: list[ProofTranscript],
    value_commitments: list[list[bytes]],
    n: int,
    entropy: bytes = b"\x01" * 32,
) -> tuple["object", list]:
    """Host half of batched verification: assemble the combined mega-check
    as (ScalarVec, points) — scalars stay in packed 32-byte form all the
    way into the engine
    (scalars, points) that must sum to the identity.  Split out so callers
    can PIPELINE host assembly of batch k+1 against the device MSM of
    batch k (bench.py measures the overlapped throughput).

    Static generator columns (G, H, B, B_blinding) are shared: their scalars
    accumulate across proofs, so the combined MSM has
    2·n·max_m + 2 + sum_p (m_p + 4 + 2 log2(n m_p)) points instead of the sum
    of the individual sizes.
    """
    assert len(proofs) == len(transcripts) == len(value_commitments)
    if not proofs:
        return

    from ..native import ScalarVec

    max_m = max(len(vc) for vc in value_commitments)
    nm_max = n * max_m
    static_points = (
        [pc_gens.B_blinding, pc_gens.B]
        + bp_gens.G(n, max_m)
        + bp_gens.H(n, max_m)
    )
    static_acc = ScalarVec.from_ints([0] * (2 + 2 * nm_max))
    zero32 = b"\x00" * 32
    dyn_chunks: list[ScalarVec] = []
    dyn_points: list[RistrettoPoint] = []

    # ONE threaded native decompress for every proof's dynamic points
    # (per-proof calls ran single-threaded at ~17 points each)
    from ..oracle.ristretto import decompress_many
    all_compressed: list[bytes] = []
    offsets = [0]
    for proof, vcs in zip(proofs, value_commitments):
        all_compressed.extend(proof.dyn_compressed(vcs))
        offsets.append(len(all_compressed))
    all_dyn = decompress_many(all_compressed)

    import hashlib
    for idx, (proof, transcript, vcs) in enumerate(
        zip(proofs, transcripts, value_commitments)
    ):
        m = len(vcs)
        nm = n * m
        p = proof._job_parts(
            bp_gens, pc_gens, transcript, vcs, n,
            decompressed=all_dyn[offsets[idx]: offsets[idx + 1]],
        )
        # random per-proof weight
        weight = scalar.from_bytes_mod_order_wide(
            hashlib.sha3_512(entropy + idx.to_bytes(8, "little")
                             + proof.to_bytes()).digest()
        )
        dyn_chunks.append(
            ScalarVec.from_ints(p.head + p.v_s).scale(weight)
        )
        dyn_points.extend(p.head_points + p.v_points)
        # static columns accumulate weight * scalar, zero-padded to nm_max;
        # everything stays in packed 32-byte form (no int round trips)
        pad = zero32 * (nm_max - nm)
        col = ScalarVec(
            ScalarVec.from_ints([p.bb_s, p.b_s]).buf
            + p.g_v.buf + pad + p.h_v.buf + pad,
            2 + 2 * nm_max,
        )
        static_acc = static_acc.add(col.scale(weight))

    combined = ScalarVec(
        static_acc.buf + b"".join(c.buf for c in dyn_chunks),
        len(static_acc) + sum(len(c) for c in dyn_chunks),
    )
    return combined, static_points + dyn_points


def batch_verify(
    proofs: list[RangeProof],
    bp_gens: BulletproofGens,
    pc_gens: PedersenGens,
    transcripts: list[ProofTranscript],
    value_commitments: list[list[bytes]],
    n: int,
    entropy: bytes = b"\x01" * 32,
) -> None:
    """Verify many range proofs in one MSM via a random linear combination
    (SURVEY.md §2.9 P3; the BASELINE config-2 hot path).

    Engines advertising `supports_fused_batch_verify` (the JAX engine on a
    device backend) route through kernels/batch_verify_device.py, which
    synthesizes every vector scalar on-chip and keeps the static generators
    device-resident; other engines (and mixed aggregation sizes) use the
    host-assembled combined MSM below."""
    eng = get_engine()
    if (getattr(eng, "supports_fused_batch_verify", False) and proofs
            and len(value_commitments) == len(proofs)
            and all(len(vc) == len(value_commitments[0])
                    for vc in value_commitments)):
        from ..kernels.batch_verify_device import batch_verify_device
        if not batch_verify_device(
            proofs, bp_gens, pc_gens, transcripts, value_commitments, n,
            entropy,
        ):
            raise VerificationError("batch range proof verification failed")
        return
    scalars, points = batch_verification_job(
        proofs, bp_gens, pc_gens, transcripts, value_commitments, n, entropy
    )
    if not get_engine().msm_is_identity(scalars, points):
        raise VerificationError("batch range proof verification failed")
