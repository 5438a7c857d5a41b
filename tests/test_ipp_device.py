"""Device-resident IPP create (kernels/ipp_device.py): bit-exact parity
with the host InnerProductProof.create — identical L/R bytes, identical
final a/b, identical post-state transcript — and end-to-end verification
of the emitted proof.  Upstream semantics: inner_product_proof.rs create."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.oracle import scalar
from zkvm_tpu.proofs.engine import get_engine
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.ipp import InnerProductProof
from zkvm_tpu.proofs.transcript import ProofTranscript
from zkvm_tpu.proofs.util import powers

PC = PedersenGens()
BP = BulletproofGens(128)


def _setup(n, seed, with_factors):
    r = random.Random(seed)
    share = BP.share(0)
    G, H = share.G(n), share.H(n)
    a = [r.randrange(L) for _ in range(n)]
    b = [r.randrange(L) for _ in range(n)]
    gf = [1] * n
    hf = powers(r.randrange(1, L), n) if with_factors else [1] * n
    return G, H, a, b, gf, hf


@pytest.mark.parametrize("n,with_factors", [(32, True), (64, False),
                                            (128, True)])
@pytest.mark.heavy
def test_device_ipp_create_bit_exact(n, with_factors):
    from zkvm_tpu.kernels.ipp_device import device_ipp_create

    G, H, a, b, gf, hf = _setup(n, n, with_factors)
    Q = PC.B_blinding

    t_host = ProofTranscript(b"ipp-dev")
    host = InnerProductProof.create(t_host, Q, gf, hf, G, H, a, b)

    t_dev = ProofTranscript(b"ipp-dev")
    dev = device_ipp_create(t_dev, Q, gf, hf, G, H, a, b)

    assert dev.L_vec == host.L_vec
    assert dev.R_vec == host.R_vec
    assert dev.a == host.a and dev.b == host.b
    # transcript states agree afterwards
    assert (t_host.challenge_scalar(b"post")
            == t_dev.challenge_scalar(b"post"))

    # and the device-built proof verifies standalone
    c = scalar.inner_product(a, b)
    b_prime = [x * h % L for x, h in zip(b, hf)]
    P = get_engine().msm(a + b_prime + [c], G + H + [Q])
    dev.verify(n, ProofTranscript(b"ipp-dev"), gf, hf, P, Q, G, H)


def test_engine_threshold_routes_create():
    """With ipp_device_min_n lowered, InnerProductProof.create itself takes
    the device path and still produces verifying proofs."""
    from zkvm_tpu.kernels.engine import JaxEngine
    from zkvm_tpu.proofs.engine import set_engine

    n = 32
    G, H, a, b, gf, hf = _setup(n, 5, True)
    Q = PC.B_blinding
    host = InnerProductProof.create(
        ProofTranscript(b"route"), Q, gf, hf, G, H, a, b
    )
    eng = JaxEngine(pipeline="pallas")
    eng.ipp_device_min_n = 16
    prev = set_engine(eng)
    try:
        dev = InnerProductProof.create(
            ProofTranscript(b"route"), Q, gf, hf, G, H, a, b
        )
    finally:
        set_engine(prev)
    assert dev.to_bytes() == host.to_bytes()
