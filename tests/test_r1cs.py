"""R1CS constraint-system proof tests.

Upstream analogue: bulletproofs/tests/r1cs.rs — gadget round trips (including
the 2-phase shuffle gadget), soundness negatives, serialization, metrics.
"""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.proofs.errors import ProofError, R1CSError
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.r1cs import Prover, R1CSProof, Variable, Verifier
from zkvm_tpu.proofs.transcript import ProofTranscript

PC = PedersenGens()
BP = BulletproofGens(128)


# --------------------------------------------------------------------------
# Example gadget 1: prove v0 * v1 = v2 over committed values (1-phase).
# --------------------------------------------------------------------------
def mul_gadget(cs, a, b, c):
    _, _, out = cs.multiply(a + 0, b + 0)
    cs.constrain(out - c)


def test_mul_gadget_round_trip():
    r = random.Random(1)
    a, b = r.randrange(L), r.randrange(L)
    c = a * b % L

    prover = Prover(PC, ProofTranscript(b"R1CSMulTest"))
    Va, va = prover.commit(a, r.randrange(L))
    Vb, vb = prover.commit(b, r.randrange(L))
    Vc, vc = prover.commit(c, r.randrange(L))
    mul_gadget(prover, va, vb, vc)
    proof = prover.prove(BP)
    assert prover.metrics().multipliers == 1

    verifier = Verifier(ProofTranscript(b"R1CSMulTest"))
    wa = verifier.commit(Va)
    wb = verifier.commit(Vb)
    wc = verifier.commit(Vc)
    mul_gadget(verifier, wa, wb, wc)
    verifier.verify(proof, PC, BP)

    # serialization round trip
    proof2 = R1CSProof.from_bytes(proof.to_bytes())
    verifier2 = Verifier(ProofTranscript(b"R1CSMulTest"))
    mul_gadget(
        verifier2, verifier2.commit(Va), verifier2.commit(Vb), verifier2.commit(Vc)
    )
    verifier2.verify(proof2, PC, BP)


def test_mul_gadget_soundness():
    r = random.Random(2)
    a, b = r.randrange(L), r.randrange(L)
    c_bad = (a * b + 1) % L

    prover = Prover(PC, ProofTranscript(b"R1CSMulTest"))
    Va, va = prover.commit(a, r.randrange(L))
    Vb, vb = prover.commit(b, r.randrange(L))
    Vc, vc = prover.commit(c_bad, r.randrange(L))
    mul_gadget(prover, va, vb, vc)
    proof = prover.prove(BP)  # prover can produce bytes, but...

    verifier = Verifier(ProofTranscript(b"R1CSMulTest"))
    mul_gadget(
        verifier, verifier.commit(Va), verifier.commit(Vb), verifier.commit(Vc)
    )
    with pytest.raises(ProofError):
        verifier.verify(proof, PC, BP)


# --------------------------------------------------------------------------
# Example gadget 2: k-shuffle (2-phase, challenge-dependent) — upstream's
# canonical randomized-constraint example (bulletproofs/tests/r1cs.rs).
# --------------------------------------------------------------------------
def shuffle_gadget(cs, x_vars, y_vars):
    k = len(x_vars)
    assert k == len(y_vars)
    if k == 1:
        cs.constrain(y_vars[0] - x_vars[0])
        return

    def randomized(rcs):
        z = rcs.challenge_scalar(b"shuffle challenge")
        # prod (x_i - z) == prod (y_i - z)
        _, _, last_x = rcs.multiply(x_vars[-1] - z, x_vars[-2] - z)
        for i in range(k - 3, -1, -1):
            _, _, last_x = rcs.multiply(last_x + 0, x_vars[i] - z)
        _, _, last_y = rcs.multiply(y_vars[-1] - z, y_vars[-2] - z)
        for i in range(k - 3, -1, -1):
            _, _, last_y = rcs.multiply(last_y + 0, y_vars[i] - z)
        rcs.constrain(last_x - last_y)

    cs.specify_randomized_constraints(randomized)


@pytest.mark.parametrize("k", [1, 2, 5, 8])
def test_shuffle_gadget_round_trip(k):
    r = random.Random(10 + k)
    xs = [r.randrange(L) for _ in range(k)]
    ys = list(xs)
    r.shuffle(ys)

    prover = Prover(PC, ProofTranscript(b"ShuffleTest"))
    V_x, x_vars = [], []
    for x in xs:
        V, var = prover.commit(x, r.randrange(L))
        V_x.append(V)
        x_vars.append(var)
    V_y, y_vars = [], []
    for y in ys:
        V, var = prover.commit(y, r.randrange(L))
        V_y.append(V)
        y_vars.append(var)
    shuffle_gadget(prover, x_vars, y_vars)
    proof = prover.prove(BP)

    verifier = Verifier(ProofTranscript(b"ShuffleTest"))
    x_vars = [verifier.commit(V) for V in V_x]
    y_vars = [verifier.commit(V) for V in V_y]
    shuffle_gadget(verifier, x_vars, y_vars)
    verifier.verify(proof, PC, BP)
    if k > 1:
        m = verifier.metrics()
        assert m.phase_two_constraints > 0


def test_shuffle_gadget_rejects_non_permutation():
    r = random.Random(42)
    xs = [r.randrange(L) for _ in range(4)]
    ys = list(xs)
    ys[2] = (ys[2] + 1) % L  # not a permutation

    prover = Prover(PC, ProofTranscript(b"ShuffleTest"))
    V_x, x_vars, V_y, y_vars = [], [], [], []
    for x in xs:
        V, var = prover.commit(x, r.randrange(L))
        V_x.append(V); x_vars.append(var)
    for y in ys:
        V, var = prover.commit(y, r.randrange(L))
        V_y.append(V); y_vars.append(var)
    shuffle_gadget(prover, x_vars, y_vars)
    proof = prover.prove(BP)

    verifier = Verifier(ProofTranscript(b"ShuffleTest"))
    x_vars = [verifier.commit(V) for V in V_x]
    y_vars = [verifier.commit(V) for V in V_y]
    shuffle_gadget(verifier, x_vars, y_vars)
    with pytest.raises(ProofError):
        verifier.verify(proof, PC, BP)


def test_bitflip_soundness():
    r = random.Random(3)
    a, b = r.randrange(L), r.randrange(L)
    prover = Prover(PC, ProofTranscript(b"flip"))
    Va, va = prover.commit(a, r.randrange(L))
    Vb, vb = prover.commit(b, r.randrange(L))
    Vc, vc = prover.commit(a * b % L, r.randrange(L))
    mul_gadget(prover, va, vb, vc)
    pb = prover.prove(BP).to_bytes()

    for _ in range(10):
        pos = r.randrange(len(pb))
        bad = bytearray(pb)
        bad[pos] ^= 1 << r.randrange(8)
        verifier = Verifier(ProofTranscript(b"flip"))
        mul_gadget(
            verifier, verifier.commit(Va), verifier.commit(Vb), verifier.commit(Vc)
        )
        try:
            verifier.verify(R1CSProof.from_bytes(bytes(bad)), PC, BP)
            raise AssertionError(f"accepted bit flip at {pos}")
        except (ProofError, ValueError):
            pass


def test_challenge_outside_phase2_rejected():
    prover = Prover(PC, ProofTranscript(b"t"))
    with pytest.raises(R1CSError):
        prover.challenge_scalar(b"zzz")


def test_allocate_pairs_into_multipliers():
    prover = Prover(PC, ProofTranscript(b"t"))
    v1 = prover.allocate(3)
    v2 = prover.allocate(5)
    v3 = prover.allocate(7)
    assert v1.kind == "ml" and v2.kind == "mr" and v1.index == v2.index
    assert v3.kind == "ml" and v3.index == 1
    assert prover.a_O[0] == 15
    l, r, o = prover.allocate_multiplier((4, 6))
    assert prover.a_O[o.index] == 24


def test_prover_scalarvec_matches_python_vectors(monkeypatch):
    """The ScalarVec vector-algebra path (VERDICT r4 task 3) must produce
    BYTE-IDENTICAL proofs to the pure-Python VecPoly3 chain under a fixed
    TranscriptRng (both paths draw the same randomness in the same order).
    Covers two-phase circuits (shuffle gadget allocates phase-2
    multipliers) so the s_L2/s_R2 and u-weighted G_factors lines differ
    from 1."""
    import random

    from zkvm_tpu.gadgets import Value, allocate_value, cloak
    from zkvm_tpu.native import get_lib
    from zkvm_tpu.oracle.merlin import Transcript

    if get_lib() is None:
        pytest.skip("native library unavailable; only the Python path runs")

    def prove_once():
        rng = (Transcript(b"seed").build_rng()
               .rekey_with_witness_bytes(b"w", b"fixed")
               .finalize(entropy=b"\x42" * 32))
        prover = Prover(PC, ProofTranscript(b"sv-parity"), rng=rng)
        ins = [Value(10, 1), Value(20, 1)]
        outs = [Value(5, 1), Value(25, 1)]
        in_a = [allocate_value(prover, v) for v in ins]
        out_a = [allocate_value(prover, v) for v in outs]
        cloak(prover, in_a, out_a, range_bits=8)
        return prover.prove(BP).to_bytes()

    monkeypatch.delenv("ZKVM_TPU_PY_R1CS", raising=False)
    sv_bytes = prove_once()
    monkeypatch.setenv("ZKVM_TPU_PY_R1CS", "1")
    py_bytes = prove_once()
    assert sv_bytes == py_bytes


def test_flatten_native_vs_python(monkeypatch):
    """scl_flatten must agree bit-for-bit with the pure-Python
    flatten_constraints fold across kinds, signs, negative/large coeffs,
    and skipped-power edge cases (a full verification run under
    ZKVM_TPU_PY_FLATTEN=1 vs the default)."""
    import random as _r

    from zkvm_tpu.constants import L
    from zkvm_tpu.native import flatten_constraints_vec, get_lib
    from zkvm_tpu.proofs.r1cs.constraint_system import flatten_constraints
    from zkvm_tpu.proofs.r1cs.lc import LinearCombination, Variable

    if get_lib() is None:
        import pytest as _pytest
        _pytest.skip("native library unavailable")

    rng = _r.Random(5)
    n, m = 13, 4
    constraints = []
    for q in range(40):
        terms = []
        for _ in range(rng.randrange(0, 5)):
            kind = rng.choice(["ml", "mr", "mo", "v", "one"])
            idx = rng.randrange(m if kind == "v" else n)
            coeff = rng.choice([
                1, -1, 2, -(1 << 63), (1 << 64) + 5, rng.randrange(L),
                -rng.randrange(L), 1 << 63, 0,
            ])
            if kind == "one":
                terms.append((Variable("one", None), coeff))
            else:
                terms.append((Variable(kind, idx), coeff))
        constraints.append(LinearCombination(tuple(terms)))

    wL, wR, wO, wV, wc = flatten_constraints(constraints, 12345, n, m)
    pad = 3
    out = flatten_constraints_vec(constraints, 12345, n, m, pad)
    assert out is not None
    svL, svR, svO, nwV, nwc = out
    assert svL.to_ints() == wL + [0] * pad
    assert svR.to_ints() == wR + [0] * pad
    assert svO.to_ints() == wO + [0] * pad
    assert nwV == wV
    assert nwc == wc
