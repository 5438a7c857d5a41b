"""Inner-product proof tests (upstream: inner_product_proof.rs mod tests)."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.oracle import scalar
from zkvm_tpu.proofs.engine import get_engine
from zkvm_tpu.proofs.errors import ProofError
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.ipp import InnerProductProof
from zkvm_tpu.proofs.transcript import ProofTranscript
from zkvm_tpu.proofs.util import powers


def _ipp_round_trip(n: int):
    r = random.Random(n)
    bp_gens = BulletproofGens(n)
    G = bp_gens.share(0).G(n)
    H = bp_gens.share(0).H(n)
    pc = PedersenGens()
    Q = pc.B_blinding  # arbitrary Q

    a = [r.randrange(L) for _ in range(n)]
    b = [r.randrange(L) for _ in range(n)]
    c = scalar.inner_product(a, b)

    y_inv = r.randrange(1, L)
    G_factors = [1] * n
    H_factors = powers(y_inv, n)

    # P = <a, G> + <b*y^-i, H> + c*Q
    eng = get_engine()
    b_prime = [x * h % L for x, h in zip(b, H_factors)]
    P = eng.msm(a + b_prime + [c], G + H + [Q])

    proof = InnerProductProof.create(
        ProofTranscript(b"innerproducttest"), Q, G_factors, H_factors,
        G, H, a, b,
    )
    proof.verify(
        n, ProofTranscript(b"innerproducttest"), G_factors, H_factors,
        P, Q, G, H,
    )

    # serialization round trip
    proof2 = InnerProductProof.from_bytes(proof.to_bytes())
    proof2.verify(
        n, ProofTranscript(b"innerproducttest"), G_factors, H_factors,
        P, Q, G, H,
    )

    # wrong P fails
    with pytest.raises(ProofError):
        proof.verify(
            n, ProofTranscript(b"innerproducttest"), G_factors, H_factors,
            P + Q, Q, G, H,
        )
    # wrong transcript fails (n=1 has zero rounds, hence no challenges to bind)
    if n > 1:
        with pytest.raises(ProofError):
            proof.verify(
                n, ProofTranscript(b"wrong"), G_factors, H_factors, P, Q, G, H,
            )


@pytest.mark.parametrize("n", [1, 2, 4, 16, 32, 64])
def test_ipp_round_trip(n):
    _ipp_round_trip(n)


def test_verification_scalars_structure():
    n = 16
    r = random.Random(99)
    bp_gens = BulletproofGens(n)
    G = bp_gens.share(0).G(n)
    H = bp_gens.share(0).H(n)
    Q = PedersenGens().B
    a = [r.randrange(L) for _ in range(n)]
    b = [r.randrange(L) for _ in range(n)]
    proof = InnerProductProof.create(
        ProofTranscript(b"t"), Q, [1] * n, [1] * n, G, H, a, b
    )
    u_sq, u_inv_sq, s = proof.verification_scalars(n, ProofTranscript(b"t"))
    assert len(u_sq) == len(u_inv_sq) == 4
    assert len(s) == n
    for usq, uisq in zip(u_sq, u_inv_sq):
        assert usq * uisq % L == 1
    # s_i * s_{n-1-i} == 1 (inverse symmetry used by the verifier)
    for i in range(n):
        assert s[i] * s[n - 1 - i] % L == 1
    # wrong n rejected
    with pytest.raises(ProofError):
        proof.verification_scalars(n * 2, ProofTranscript(b"t"))


def _create_with(monkeypatch, py: bool, n: int, seed: int):
    """Build one IPP proof with the fused-native or pure-Python rounds and
    return (proof bytes, post-create transcript challenge)."""
    r = random.Random(seed)
    bp_gens = BulletproofGens(max(n, 1))
    G = bp_gens.share(0).G(n)
    H = bp_gens.share(0).H(n)
    Q = PedersenGens().B_blinding
    a = [r.randrange(L) for _ in range(n)]
    b = [r.randrange(L) for _ in range(n)]
    y_inv = r.randrange(1, L)
    G_factors = [1] * n
    H_factors = powers(y_inv, n)
    if py:
        monkeypatch.setenv("ZKVM_TPU_PY_IPP", "1")
    else:
        monkeypatch.delenv("ZKVM_TPU_PY_IPP", raising=False)
    t = ProofTranscript(b"ipp-parity")
    proof = InnerProductProof.create(t, Q, G_factors, H_factors, G, H, a, b)
    return proof.to_bytes(), t.challenge_scalar(b"post")


@pytest.mark.parametrize("n", [1, 64, 1024])
def test_ipp_fused_native_matches_python_rounds(monkeypatch, n):
    """The fused native prover (native/ipp_create.cpp) must produce
    BYTE-IDENTICAL proofs to the pure-Python rounds (the declared ground
    truth, forced via ZKVM_TPU_PY_IPP=1) AND leave the shared transcript in
    the same state (checked via a post-create challenge).  VERDICT r4
    task 7a; upstream invariant: one InnerProductProof::create,
    inner_product_proof.rs."""
    from zkvm_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable; only the Python path runs")
    py_bytes, py_chal = _create_with(monkeypatch, True, n, seed=n + 7)
    nat_bytes, nat_chal = _create_with(monkeypatch, False, n, seed=n + 7)
    assert py_bytes == nat_bytes
    assert py_chal == nat_chal


def test_ipp_python_prover_round_trip(monkeypatch):
    """Keep the pure-Python prover rounds alive in every CI run (they are
    the parity ground truth): force ZKVM_TPU_PY_IPP=1 through a full
    round-trip including the soundness-negative checks (VERDICT r4
    task 7b)."""
    monkeypatch.setenv("ZKVM_TPU_PY_IPP", "1")
    _ipp_round_trip(16)
