"""R1CS prover (upstream bulletproofs/src/r1cs/prover.rs).

Protocol (SURVEY.md §3.3 tail; algebra re-derived from scratch — see the
step comments — and enforced against the verifier by round-trip tests):

  phase 1: commit A_I1 = ĩ1·B~ + <a_L1,G> + <a_R1,H>, A_O1, S1
  randomized phase: gadget callbacks draw transcript challenges and may
    allocate more multipliers (phase 2), committed as A_I2, A_O2, S2
  u: phase-separation challenge — verification weights phase-2 commitments
    and generators by u so phases cannot cancel each other
  y, z: flatten constraints into wL,wR,wO,wV,wc with z^{q+1} weights
  l(X) = (a_L + y^-n ∘ wR)·X + a_O·X² + s_L·X³
  r(X) = (wO - y^n) + (y^n ∘ a_R + wL)·X + (y^n ∘ s_R)·X³
  t(X) = <l,r>: t2 carries the statement (t2 = δ + wc + <wV,v>,
    δ = <y^-n ∘ wR, wL>); commit T_1,T_3..T_6
  x: evaluate l,r; t_x, blindings; w: Q = w·B; run the IPP over
    G_factors = (1...1, u...u), H_factors = y^-i * G_factors.
"""

from __future__ import annotations

from ...constants import L
from ...oracle import scalar
from ...oracle.merlin import TranscriptRng
from ...oracle.ristretto import RistrettoPoint
from ..engine import get_engine
from ..errors import R1CSError
from ..generators import BulletproofGens, PedersenGens
from ..ipp import InnerProductProof
from ..transcript import ProofTranscript
from ..util import VecPoly3, next_power_of_two, powers
from .constraint_system import Metrics, flatten_constraints
from .lc import LinearCombination, Variable, _as_lc
from .proof import R1CSProof


def _ints(v) -> list[int]:
    """ScalarVec or plain list -> list of ints."""
    return v.to_ints() if hasattr(v, "to_ints") else list(v)


class Prover:
    """ConstraintSystem implementation holding the witness."""

    def __init__(
        self,
        pc_gens: PedersenGens,
        transcript: ProofTranscript,
        rng: TranscriptRng | None = None,
    ):
        self.pc_gens = pc_gens
        self.transcript = transcript
        transcript.r1cs_domain_sep()
        self.v: list[int] = []
        self.v_blinding: list[int] = []
        self.a_L: list[int] = []
        self.a_R: list[int] = []
        self.a_O: list[int] = []
        self.constraints: list[LinearCombination] = []
        self.deferred: list = []
        self.pending_multiplier: int | None = None
        self.num_phase1_multipliers: int | None = None  # set at phase switch
        self._num_phase1_constraints: int | None = None
        self._rng = rng
        self._in_phase2 = False

    # ------------------------------------------------------------ witness io
    def _random_scalar(self) -> int:
        if self._rng is not None:
            return self._rng.random_scalar()
        import os
        return scalar.from_bytes_mod_order_wide(os.urandom(64))

    def _random_scalars(self, n: int):
        """n blinding scalars as a packed ScalarVec.  With an explicit
        TranscriptRng the draws stay on its PRF stream (sequential, exactly
        one random_scalar per element, so both prover paths consume the
        same randomness); otherwise one batched urandom draw."""
        from ...native import ScalarVec
        if self._rng is not None:
            return ScalarVec.from_ints(
                [self._rng.random_scalar() for _ in range(n)])
        return ScalarVec.random(n)

    def commit(self, v: int, v_blinding: int) -> tuple[bytes, Variable]:
        """Commit a high-level value; returns (compressed V, variable)."""
        j = len(self.v)
        self.v.append(v % L)
        self.v_blinding.append(v_blinding % L)
        V = self.pc_gens.commit(v, v_blinding).compress()
        self.transcript.append_point(b"V", V)
        return V, Variable.committed(j)

    # --------------------------------------------------- ConstraintSystem API
    def eval(self, lc) -> int:
        lc = _as_lc(lc)
        acc = 0
        for var, coeff in lc.terms:
            if var.kind == "ml":
                val = self.a_L[var.index]
            elif var.kind == "mr":
                val = self.a_R[var.index]
            elif var.kind == "mo":
                val = self.a_O[var.index]
            elif var.kind == "v":
                val = self.v[var.index]
            else:
                val = 1
            acc = (acc + coeff * val) % L
        return acc

    def multiply(self, left, right) -> tuple[Variable, Variable, Variable]:
        left = _as_lc(left)
        right = _as_lc(right)
        l = self.eval(left)
        r = self.eval(right)
        i = len(self.a_L)
        self.a_L.append(l)
        self.a_R.append(r)
        self.a_O.append(l * r % L)
        vl = Variable.multiplier_left(i)
        vr = Variable.multiplier_right(i)
        vo = Variable.multiplier_output(i)
        # bind the LC values to the multiplier wires
        self.constrain(left - vl)
        self.constrain(right - vr)
        return vl, vr, vo

    def allocate(self, assignment: int | None) -> Variable:
        if assignment is None:
            raise R1CSError("prover allocation requires an assignment")
        x = int(assignment) % L
        if self.pending_multiplier is None:
            i = len(self.a_L)
            self.pending_multiplier = i
            self.a_L.append(x)
            self.a_R.append(0)
            self.a_O.append(0)
            return Variable.multiplier_left(i)
        i = self.pending_multiplier
        self.pending_multiplier = None
        self.a_R[i] = x
        self.a_O[i] = self.a_L[i] * x % L
        return Variable.multiplier_right(i)

    def allocate_multiplier(
        self, assignment: tuple[int, int] | None
    ) -> tuple[Variable, Variable, Variable]:
        if assignment is None:
            raise R1CSError("prover allocation requires an assignment")
        l, r = (int(a) % L for a in assignment)
        i = len(self.a_L)
        self.a_L.append(l)
        self.a_R.append(r)
        self.a_O.append(l * r % L)
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
        """Defer a gadget closure to the randomizing (challenge) phase
        (upstream RandomizedConstraintSystem)."""
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
            multipliers=len(self.a_L),
            constraints=len(self.constraints),
            phase_one_constraints=p1,
            phase_two_constraints=len(self.constraints) - p1,
        )

    # ------------------------------------------------------------------ prove
    def prove(self, bp_gens: BulletproofGens) -> R1CSProof:
        eng = get_engine()
        ts = self.transcript
        B_b = self.pc_gens.B_blinding

        ts.append_u64(b"m", len(self.v))

        # --- phase 1 commitments
        n1 = len(self.a_L)
        if bp_gens.gens_capacity < n1:
            raise R1CSError("invalid generators length")
        gens = bp_gens.share(0)
        G = gens.G(n1)
        H = gens.H(n1)

        from ...native import ScalarVec as _SV

        i_blinding1 = self._random_scalar()
        o_blinding1 = self._random_scalar()
        s_blinding1 = self._random_scalar()
        s_L1 = self._random_scalars(n1)
        s_R1 = self._random_scalars(n1)

        A_I1 = eng.msm([i_blinding1] + self.a_L + self.a_R, [B_b] + G + H).compress()
        A_O1 = eng.msm([o_blinding1] + self.a_O, [B_b] + G).compress()
        S1 = eng.msm(
            _SV.concat(_SV.from_ints([s_blinding1]), s_L1, s_R1),
            [B_b] + G + H,
        ).compress()
        ts.append_point(b"A_I1", A_I1)
        ts.append_point(b"A_O1", A_O1)
        ts.append_point(b"S1", S1)

        # --- randomized phase
        self.num_phase1_multipliers = n1
        self._num_phase1_constraints = len(self.constraints)
        if not self.deferred:
            ts.r1cs_1phase_domain_sep()
        else:
            ts.r1cs_2phase_domain_sep()
            self._in_phase2 = True
            deferred, self.deferred = self.deferred, []
            for closure in deferred:
                closure(self)
        if self.pending_multiplier is not None:
            # fill the half-allocated multiplier so vectors are consistent
            self.pending_multiplier = None

        # --- phase 2 commitments
        n = len(self.a_L)
        n2 = n - n1
        if bp_gens.gens_capacity < n:
            raise R1CSError("invalid generators length")
        G = gens.G(n)
        H = gens.H(n)

        if n2 > 0:
            i_blinding2 = self._random_scalar()
            o_blinding2 = self._random_scalar()
            s_blinding2 = self._random_scalar()
            s_L2 = self._random_scalars(n2)
            s_R2 = self._random_scalars(n2)
            A_I2 = eng.msm(
                [i_blinding2] + self.a_L[n1:] + self.a_R[n1:],
                [B_b] + G[n1:] + H[n1:],
            ).compress()
            A_O2 = eng.msm([o_blinding2] + self.a_O[n1:], [B_b] + G[n1:]).compress()
            S2 = eng.msm(
                _SV.concat(_SV.from_ints([s_blinding2]), s_L2, s_R2),
                [B_b] + G[n1:] + H[n1:],
            ).compress()
        else:
            i_blinding2 = o_blinding2 = s_blinding2 = 0
            s_L2 = s_R2 = _SV(b"", 0)
            identity = b"\x00" * 32
            A_I2 = A_O2 = S2 = identity
        ts.append_point(b"A_I2", A_I2)
        ts.append_point(b"A_O2", A_O2)
        ts.append_point(b"S2", S2)

        u = ts.challenge_scalar(b"u")
        y = ts.challenge_scalar(b"y")
        z = ts.challenge_scalar(b"z")

        # --- flatten constraints & build l/r polynomials
        wL, wR, wO, wV, wc = flatten_constraints(
            self.constraints, z, n, len(self.v)
        )
        padded_n = next_power_of_two(n)
        pad = padded_n - n

        y_inv = scalar.invert(y)

        # Vector algebra over the native ScalarVec seam (VERDICT r4 task 3;
        # upstream r1cs/prover.rs flattening + t-poly: the vectors are
        # dense, so the l/r assembly, the six special inner products and
        # the Horner evals are bulk mod-ℓ passes — ScalarVec.buf is also
        # exactly the packed layout ipp_create consumes, so the IPP call
        # pays zero re-packing).  ZKVM_TPU_PY_R1CS=1 forces the pure-Python
        # chain below, the bit-exact ground truth (tests assert parity).
        import os as _os

        from ...native import ScalarVec as SV
        from ...native import get_lib
        use_sv = (get_lib() is not None
                  and not _os.environ.get("ZKVM_TPU_PY_R1CS"))
        if use_sv:
            zpad = b"\x00" * (32 * pad)
            exp_y_sv = SV.powers(y, padded_n)
            exp_y_inv_sv = SV.powers(y_inv, padded_n)
            aL_sv = SV(SV.from_ints(self.a_L).buf + zpad, padded_n)
            aR_sv = SV(SV.from_ints(self.a_R).buf + zpad, padded_n)
            aO_sv = SV(SV.from_ints(self.a_O).buf + zpad, padded_n)
            sL_sv = SV(s_L1.buf + s_L2.buf + zpad, padded_n)
            sR_sv = SV(s_R1.buf + s_R2.buf + zpad, padded_n)
            wL_sv = SV(SV.from_ints(wL).buf + zpad, padded_n)
            wR_sv = SV(SV.from_ints(wR).buf + zpad, padded_n)
            wO_sv = SV(SV.from_ints(wO).buf + zpad, padded_n)

            l1 = exp_y_inv_sv.muladd(wR_sv, aL_sv)
            l2, l3 = aO_sv, sL_sv
            r0 = wO_sv.sub(exp_y_sv)
            r1 = exp_y_sv.muladd(aR_sv, wL_sv)
            r3 = exp_y_sv.mul(sR_sv)
            from ..util import Poly6
            t_poly = Poly6(
                0,
                l1.inner(r0),
                l1.inner(r1) + l2.inner(r0),
                l2.inner(r1) + l3.inner(r0),
                l1.inner(r3) + l3.inner(r1),
                l2.inner(r3),
                l3.inner(r3),
            )
        else:
            exp_y = powers(y, padded_n)
            exp_y_inv = powers(y_inv, padded_n)

            s_L = _ints(s_L1) + _ints(s_L2) + [0] * pad
            s_R = _ints(s_R1) + _ints(s_R2) + [0] * pad
            a_L = self.a_L + [0] * pad
            a_R = self.a_R + [0] * pad
            a_O = self.a_O + [0] * pad
            wLp = wL + [0] * pad
            wRp = wR + [0] * pad
            wOp = wO + [0] * pad

            l1 = [(a_L[i] + exp_y_inv[i] * wRp[i]) % L
                  for i in range(padded_n)]
            l2 = list(a_O)
            l3 = list(s_L)
            r0 = [(wOp[i] - exp_y[i]) % L for i in range(padded_n)]
            r1 = [(exp_y[i] * a_R[i] + wLp[i]) % L for i in range(padded_n)]
            r3 = [exp_y[i] * s_R[i] % L for i in range(padded_n)]

            l_poly = VecPoly3([0] * padded_n, l1, l2, l3)
            r_poly = VecPoly3(r0, r1, [0] * padded_n, r3)
            t_poly = l_poly.special_inner_product(r_poly)

        t_blind = {i: self._random_scalar() for i in (1, 3, 4, 5, 6)}
        T = {
            i: self.pc_gens.commit(t_poly.t[i], t_blind[i]).compress()
            for i in (1, 3, 4, 5, 6)
        }
        for i in (1, 3, 4, 5, 6):
            ts.append_point(f"T_{i}".encode(), T[i])

        x = ts.challenge_scalar(b"x")

        # t2 blinding comes from the committed values: <wV, v_blinding>
        t_2_blinding = scalar.inner_product(wV, self.v_blinding)
        t_x = t_poly.eval(x)
        t_x_blinding = 0
        xx = 1
        blinds = {0: 0, 1: t_blind[1], 2: t_2_blinding, 3: t_blind[3],
                  4: t_blind[4], 5: t_blind[5], 6: t_blind[6]}
        for i in range(7):
            t_x_blinding = (t_x_blinding + xx * blinds[i]) % L
            xx = xx * x % L
        e_blinding = (
            x * ((i_blinding1 + u * i_blinding2) % L)
            + x * x % L * ((o_blinding1 + u * o_blinding2) % L)
            + pow(x, 3, L) * ((s_blinding1 + u * s_blinding2) % L)
        ) % L

        ts.append_scalar(b"t_x", t_x)
        ts.append_scalar(b"t_x_blinding", t_x_blinding)
        ts.append_scalar(b"e_blinding", e_blinding)

        w = ts.challenge_scalar(b"w")
        # w is a public challenge: vartime fixed-base table mul instead of
        # the oracle double-and-add (cf. mpc.py dealer)
        from ...native import ed_fixed_mul, ed_fixed_slot
        from ...oracle.ristretto import RistrettoPoint
        _slot = ed_fixed_slot(self.pc_gens.B.ep)
        if _slot is not None:
            Q = RistrettoPoint(ed_fixed_mul(_slot, w, ct=False))
        else:
            Q = self.pc_gens.B * w

        if use_sv:
            one_b = (1).to_bytes(32, "little")
            u_b = (u % L).to_bytes(32, "little")
            G_factors = SV(one_b * n1 + u_b * (n2 + pad), padded_n)
            H_factors = G_factors.mul(exp_y_inv_sv)
            # Horner evals: l = x(l1 + x(l2 + x·l3)); r = r0 + x·r1 + x³·r3
            l_vec = l3.scale(x).add(l2).scale(x).add(l1).scale(x)
            r_vec = r3.scale(pow(x, 3, L)).add(r1.scale(x)).add(r0)
        else:
            G_factors = [1] * n1 + [u] * (n2 + pad)
            H_factors = [gf * yi % L for gf, yi in zip(G_factors, exp_y_inv)]
            l_vec = l_poly.eval(x)
            r_vec = r_poly.eval(x)

        if bp_gens.gens_capacity < padded_n:
            raise R1CSError("invalid generators length (padding)")
        G_pad = gens.G(padded_n)
        H_pad = gens.H(padded_n)

        ipp = InnerProductProof.create(
            ts, Q, G_factors, H_factors, G_pad, H_pad, l_vec, r_vec
        )
        return R1CSProof(
            A_I1, A_O1, S1, A_I2, A_O2, S2,
            T[1], T[3], T[4], T[5], T[6],
            t_x, t_x_blinding, e_blinding, ipp,
        )
