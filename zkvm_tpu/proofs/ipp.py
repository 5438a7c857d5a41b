"""The inner-product argument.

Upstream counterpart: bulletproofs/src/inner_product_proof.rs —
InnerProductProof::{create, verification_scalars, verify, to_bytes, from_bytes}.

Structure (SURVEY.md §3.1/§3.2): log2(n) rounds; each round emits L/R commitments
(two MSMs of size n_k+1), draws a transcript challenge u (the sequential spine),
and folds a/b/G/H in half.  Verification avoids the fold entirely: the
``verification_scalars`` s-vector lets the whole proof be checked with ONE MSM —
the seam the TPU engine accelerates.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..constants import L
from ..oracle import scalar
from ..oracle.ristretto import RistrettoPoint
from .engine import get_engine
from .errors import FormatError, VerificationError
from .transcript import ProofTranscript


@dataclass
class InnerProductProof:
    L_vec: list[bytes]  # compressed round commitments
    R_vec: list[bytes]
    a: int
    b: int

    @staticmethod
    def create(
        transcript: ProofTranscript,
        Q: RistrettoPoint,
        G_factors: list[int],
        H_factors: list[int],
        G: list[RistrettoPoint],
        H: list[RistrettoPoint],
        a: list[int],
        b: list[int],
    ) -> "InnerProductProof":
        """Prove <a,b> = c w.r.t. P = <a,G∘G_factors> + <b,H∘H_factors> + c·Q.

        The G_factors/H_factors (typically 1 and y^-i) are folded into the
        points lazily on the first round, exactly as upstream.
        """
        eng = get_engine()
        n = len(G)
        assert n == len(H) == len(a) == len(b) == len(G_factors) == len(H_factors)
        assert n & (n - 1) == 0, "n must be a power of two"

        # device-resident argument (kernels/ipp_device.py): generators stay
        # on device in original index space, L/R come from coefficient MSMs
        # instead of fold chains — bit-identical proofs, Θ(n·lg n) bucket
        # adds instead of Θ(n·256) fold group-ops
        def _l(v):
            # callers may pass packed ScalarVecs (the R1CS prover's vector
            # algebra); the fused-native path consumes them zero-copy, the
            # device/Python paths want plain int lists
            return v.to_ints() if hasattr(v, "to_ints") else v

        min_n = getattr(eng, "ipp_device_min_n", None)
        use_pallas = getattr(eng, "_use_pallas", None)
        if (min_n is not None and n >= min_n
                and use_pallas is not None and use_pallas()):
            # gate on a REAL Pallas backend: interpret-mode rounds on CPU
            # are far slower than the native host fold chain
            from ..kernels.ipp_device import device_ipp_create
            return device_ipp_create(
                transcript, Q, _l(G_factors), _l(H_factors), G, H,
                _l(a), _l(b)
            )

        # fused native path (native/ipp_create.cpp): all rounds in one host
        # call — removes the per-round Python marshalling that dominated the
        # 25 ms prove (VERDICT r3 #4); bit-identical to the loop below
        # (tests/test_ipp.py parity), which stays the ground truth.
        # ZKVM_TPU_PY_IPP=1 forces the Python rounds.
        import os as _os
        if not _os.environ.get("ZKVM_TPU_PY_IPP"):
            from ..constants import LABEL_IPP
            from ..native import ipp_create_fused
            fused = ipp_create_fused(
                transcript.strobe, LABEL_IPP, Q.ep, G_factors, H_factors,
                [g.ep for g in G], [h.ep for h in H], a, b,
            )
            if fused is not None:
                L_vec, R_vec, a_fin, b_fin = fused
                return InnerProductProof(L_vec, R_vec, a_fin, b_fin)

        transcript.innerproduct_domain_sep(n)

        G = list(G)
        H = list(H)
        G_factors = _l(G_factors)
        H_factors = _l(H_factors)
        a = [x % L for x in _l(a)]
        b = [x % L for x in _l(b)]

        L_vec: list[bytes] = []
        R_vec: list[bytes] = []
        first = True

        while n != 1:
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            G_L, G_R = G[:n], G[n:]
            H_L, H_R = H[:n], H[n:]

            c_L = scalar.inner_product(a_L, b_R)
            c_R = scalar.inner_product(a_R, b_L)

            if first:
                gf_L, gf_R = G_factors[:2 * n][:n], G_factors[n:2 * n]
                hf_L, hf_R = H_factors[:n], H_factors[n:2 * n]
                Lp = eng.msm(
                    [x * g % L for x, g in zip(a_L, gf_R)]
                    + [x * h % L for x, h in zip(b_R, hf_L)]
                    + [c_L],
                    G_R + H_L + [Q],
                )
                Rp = eng.msm(
                    [x * g % L for x, g in zip(a_R, gf_L)]
                    + [x * h % L for x, h in zip(b_L, hf_R)]
                    + [c_R],
                    G_L + H_R + [Q],
                )
            else:
                Lp = eng.msm(a_L + b_R + [c_L], G_R + H_L + [Q])
                Rp = eng.msm(a_R + b_L + [c_R], G_L + H_R + [Q])

            L_bytes = Lp.compress()
            R_bytes = Rp.compress()
            L_vec.append(L_bytes)
            R_vec.append(R_bytes)
            transcript.append_point(b"L", L_bytes)
            transcript.append_point(b"R", R_bytes)

            u = transcript.challenge_scalar(b"u")
            u_inv = scalar.invert(u)

            a = [(x * u + u_inv * y) % L for x, y in zip(a_L, a_R)]
            b = [(x * u_inv + u * y) % L for x, y in zip(b_L, b_R)]
            if first:
                G = eng.fold_points(
                    [u_inv * g % L for g in gf_L],
                    [u * g % L for g in gf_R],
                    G_L, G_R,
                )
                H = eng.fold_points(
                    [u * h % L for h in hf_L],
                    [u_inv * h % L for h in hf_R],
                    H_L, H_R,
                )
                first = False
            else:
                G = eng.fold_points([u_inv] * n, [u] * n, G_L, G_R)
                H = eng.fold_points([u] * n, [u_inv] * n, H_L, H_R)

        return InnerProductProof(L_vec, R_vec, a[0], b[0])

    def verification_scalars(
        self, n: int, transcript: ProofTranscript
    ) -> tuple[list[int], list[int], list[int]]:
        """Replay challenges and expand the s-vector (upstream verification_scalars).

        Returns (u_sq, u_inv_sq, s) where s_i = prod_j u_j^{±1} per the binary
        expansion of i — the inputs to the verifier's single MSM.
        """
        lg_n = len(self.L_vec)
        if lg_n >= 32:
            raise FormatError("inner product proof too large")
        if n != (1 << lg_n):
            raise FormatError(f"n={n} does not match lg_n={lg_n}")

        transcript.innerproduct_domain_sep(n)

        challenges = []
        for Lb, Rb in zip(self.L_vec, self.R_vec):
            transcript.validate_and_append_point(b"L", Lb)
            transcript.validate_and_append_point(b"R", Rb)
            challenges.append(transcript.challenge_scalar(b"u"))
        u_sq, u_inv_sq, s_vec = self.scalars_from_challenges(challenges)
        return u_sq, u_inv_sq, s_vec.to_ints()

    def verification_scalars_vec(
        self, n: int, transcript: ProofTranscript
    ):
        """verification_scalars with the s-vector kept as a packed native
        ScalarVec (no to_ints/from_ints round trip — the R1CS verifier
        feeds it straight back into ScalarVec algebra)."""
        lg_n = len(self.L_vec)
        if lg_n >= 32:
            raise FormatError("inner product proof too large")
        if n != (1 << lg_n):
            raise FormatError(f"n={n} does not match lg_n={lg_n}")
        transcript.innerproduct_domain_sep(n)
        challenges = []
        for Lb, Rb in zip(self.L_vec, self.R_vec):
            transcript.validate_and_append_point(b"L", Lb)
            transcript.validate_and_append_point(b"R", Rb)
            challenges.append(transcript.challenge_scalar(b"u"))
        return self.scalars_from_challenges(challenges)

    def scalars_from_challenges(self, challenges: list[int]):
        """The transcript-free tail of verification_scalars: u^2 / u^-2 and
        the s-vector (as a packed ScalarVec — stays packed all the way into
        the device engine) from already-drawn round challenges (the fused
        native replay draws them in one call — native/strobe.cpp)."""
        lg_n = len(self.L_vec)
        challenges_inv = scalar.batch_invert(challenges)
        allinv = 1
        for ci in challenges_inv:
            allinv = allinv * ci % L

        u_sq = [u * u % L for u in challenges]
        u_inv_sq = [u * u % L for u in challenges_inv]

        # s expansion by doubling: s[2^j .. 2^{j+1}) = s[0 .. 2^j) * u_sq_j
        # — lg_n vector scales instead of n Python big-int muls
        from ..native import ScalarVec
        sv = ScalarVec.from_ints([allinv])
        for j in range(lg_n):
            scaled = sv.scale(u_sq[(lg_n - 1) - j])
            sv = ScalarVec(sv.buf + scaled.buf, 2 * sv.n)

        return u_sq, u_inv_sq, sv

    def verify(
        self,
        n: int,
        transcript: ProofTranscript,
        G_factors: list[int],
        H_factors: list[int],
        P: RistrettoPoint,
        Q: RistrettoPoint,
        G: list[RistrettoPoint],
        H: list[RistrettoPoint],
    ) -> None:
        """Stand-alone one-MSM verification (upstream InnerProductProof::verify)."""
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)
        s_inv = list(reversed(s))  # 1/s_i = s_{n-1-i}

        a, b = self.a, self.b
        g_scalars = [a * si % L * gf % L for si, gf in zip(s, G_factors)]
        h_scalars = [b * si % L * hf % L for si, hf in zip(s_inv, H_factors)]
        neg_u_sq = [(-u) % L for u in u_sq]
        neg_u_inv_sq = [(-u) % L for u in u_inv_sq]

        Ls = [RistrettoPoint.decompress(x) for x in self.L_vec]
        Rs = [RistrettoPoint.decompress(x) for x in self.R_vec]

        expect_P = get_engine().msm(
            [a * b % L] + g_scalars + h_scalars + neg_u_sq + neg_u_inv_sq,
            [Q] + G + H + Ls + Rs,
        )
        if expect_P != P:
            raise VerificationError("inner product proof verification failed")

    # -- serialization ------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray()
        for Lb, Rb in zip(self.L_vec, self.R_vec):
            out += Lb
            out += Rb
        out += scalar.to_bytes(self.a)
        out += scalar.to_bytes(self.b)
        return bytes(out)

    @staticmethod
    def from_bytes(data: bytes) -> "InnerProductProof":
        if len(data) % 32 != 0 or len(data) < 64:
            raise FormatError("bad inner product proof length")
        num_elems = len(data) // 32
        lg_n = (num_elems - 2) // 2
        if 2 * lg_n + 2 != num_elems or lg_n >= 32:
            raise FormatError("bad inner product proof structure")
        L_vec, R_vec = [], []
        for i in range(lg_n):
            L_vec.append(data[64 * i: 64 * i + 32])
            R_vec.append(data[64 * i + 32: 64 * i + 64])
        a = scalar.from_canonical_bytes(data[-64:-32])
        b = scalar.from_canonical_bytes(data[-32:])
        return InnerProductProof(L_vec, R_vec, a, b)
