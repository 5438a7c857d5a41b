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
from .errors import FormatError, VerificationError
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
        bit_commitments = [p.assign_position(j) for j, p in enumerate(parties)]
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

    # ----------------------------------------------------------------- verify
    def verification_job(
        self,
        bp_gens: BulletproofGens,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        value_commitments: list[bytes],
        n: int,
        c: int | None = None,
    ) -> tuple[list[int], list[RistrettoPoint]]:
        """Replay the transcript and emit the mega-check MSM (scalars, points)
        that must sum to the identity.  This is the batching seam: callers
        combine several jobs with random weights into one MSM.
        """
        m = len(value_commitments)
        if n not in (8, 16, 32, 64):
            raise FormatError("invalid bitsize")
        if m == 0 or m & (m - 1):
            raise FormatError("invalid aggregation size")
        if bp_gens.gens_capacity < n or bp_gens.party_capacity < m:
            raise FormatError("invalid generators length")

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

        # Verifier-local random weight combining the t-check and P-check;
        # drawn from the transcript RNG (upstream uses the thread rng).
        if c is None:
            c = transcript.build_rng().finalize(b"\x00" * 32).random_scalar()

        u_sq, u_inv_sq, s = self.ipp_proof.verification_scalars(n * m, transcript)
        a, b = self.ipp_proof.a % L, self.ipp_proof.b % L

        zz = z * z % L
        minus_z = (-z) % L

        # scalar assembly on ScalarVec (native 4x64 Montgomery vectors):
        #   g_i = -z - a*s_i
        #   h_i = z + y^-i * (z^2 * z_and_2_i - b / s_i)
        from ..native import ScalarVec
        sv = ScalarVec.from_ints(s)
        s_inv_v = sv.reverse()  # 1/s_i = s_{nm-1-i}
        y_inv = scalar.invert(y)
        exp_y_inv_v = ScalarVec.powers(y_inv, n * m)
        exp_2_v = ScalarVec.powers(2, n)
        z2_parts = []
        zexp = 1
        for _ in range(m):  # concat_z_and_2: z^j * 2^i for party j, bit i
            z2_parts.append(exp_2_v.scale(zexp))
            zexp = zexp * z % L
        z2_v = ScalarVec.concat(*z2_parts)

        g_scalars = sv.axpb((-a) % L, minus_z).to_ints()
        h_scalars = (
            z2_v.scale(zz).sub(s_inv_v.scale(b)).mul(exp_y_inv_v)
            .axpb(1, z).to_ints()
        )
        value_commitment_scalars = [
            c * zz % L * ze % L for ze in powers(z, m)
        ]
        basepoint_scalar = (
            w * ((self.t_x - a * b) % L) + c * ((delta(n, m, y, z) - self.t_x) % L)
        ) % L

        scalars = (
            [1, x, c * x % L, c * x % L * x % L]
            + list(u_sq)
            + list(u_inv_sq)
            + [(-self.e_blinding - c * self.t_x_blinding) % L, basepoint_scalar]
            + g_scalars
            + h_scalars
            + value_commitment_scalars
        )
        from ..oracle.ristretto import decompress_many
        dyn = decompress_many(
            [self.A, self.S, self.T_1, self.T_2]
            + list(self.ipp_proof.L_vec) + list(self.ipp_proof.R_vec)
            + list(value_commitments)
        )  # one native batch call: the host profile is decompress-dominated
        k = 4 + len(self.ipp_proof.L_vec) + len(self.ipp_proof.R_vec)
        points = (
            dyn[:k]
            + [pc_gens.B_blinding, pc_gens.B]
            + bp_gens.G(n, m)
            + bp_gens.H(n, m)
            + dyn[k:]
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


def batch_verification_job(
    proofs: list[RangeProof],
    bp_gens: BulletproofGens,
    pc_gens: PedersenGens,
    transcripts: list[ProofTranscript],
    value_commitments: list[list[bytes]],
    n: int,
    entropy: bytes = b"\x01" * 32,
) -> tuple[list[int], list]:
    """Host half of batched verification: assemble the combined mega-check
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
    dyn_scalars: list[int] = []
    dyn_points: list[RistrettoPoint] = []

    import hashlib
    for idx, (proof, transcript, vcs) in enumerate(
        zip(proofs, transcripts, value_commitments)
    ):
        m = len(vcs)
        nm = n * m
        scalars, points = proof.verification_job(
            bp_gens, pc_gens, transcript, vcs, n
        )
        # random per-proof weight
        weight = scalar.from_bytes_mod_order_wide(
            hashlib.sha3_512(entropy + idx.to_bytes(8, "little")
                             + proof.to_bytes()).digest()
        )
        n_dyn_head = 4 + 2 * len(proof.ipp_proof.L_vec)  # A,S,T1,T2,L,R
        head_s, head_p = scalars[:n_dyn_head], points[:n_dyn_head]
        bb_s = scalars[n_dyn_head]          # B_blinding
        b_s = scalars[n_dyn_head + 1]       # B
        g_s = scalars[n_dyn_head + 2: n_dyn_head + 2 + nm]
        h_s = scalars[n_dyn_head + 2 + nm: n_dyn_head + 2 + 2 * nm]
        v_s = scalars[n_dyn_head + 2 + 2 * nm:]
        v_p = points[n_dyn_head + 2 + 2 * nm:]

        dyn_scalars.extend(
            ScalarVec.from_ints(head_s + v_s).scale(weight).to_ints()
        )
        dyn_points.extend(head_p + v_p)
        # static columns accumulate weight * scalar, zero-padded to nm_max
        pad = [0] * (nm_max - nm)
        col = ScalarVec.from_ints([bb_s, b_s] + g_s + pad + h_s + pad)
        static_acc = static_acc.add(col.scale(weight))

    return (static_acc.to_ints() + dyn_scalars,
            static_points + dyn_points)


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
    (SURVEY.md §2.9 P3; the BASELINE config-2 hot path)."""
    scalars, points = batch_verification_job(
        proofs, bp_gens, pc_gens, transcripts, value_commitments, n, entropy
    )
    if not get_engine().msm_is_identity(scalars, points):
        raise VerificationError("batch range proof verification failed")
