"""Encrypted peer channel (chain/p2p.py — the cybershake-role subsystem,
upstream slingshot/p2p): mutual-auth handshake, frame confidentiality +
integrity, tamper/replay poisoning, MITM rejection, and the block-sync
protocol driven end-to-end through sealed frames."""

import threading

import pytest

from zkvm_tpu.chain.p2p import (
    ChannelError, HandshakeError, PeerIdentity, SecurePeer, duplex_pair,
)


def _pair():
    ia, ib = PeerIdentity.generate(), PeerIdentity.generate()
    (sa, ra), (sb, rb) = duplex_pair()
    out = {}

    def run(role, ident, s, r, init):
        out[role] = SecurePeer.handshake(ident, s, r, init)

    ta = threading.Thread(target=run, args=("a", ia, sa, ra, True))
    tb = threading.Thread(target=run, args=("b", ib, sb, rb, False))
    ta.start(); tb.start(); ta.join(30); tb.join(30)
    return ia, ib, out["a"], out["b"]


def test_handshake_and_framing():
    ia, ib, pa, pb = _pair()
    # each side authenticated the other's static key
    assert pa.peer_key == ib.public.point
    assert pb.peer_key == ia.public.point

    # bidirectional frames, multiple in flight, empty payloads included
    msgs = [b"hello", b"", b"x" * 1000, bytes(range(256))]
    for m in msgs:
        assert pb.open(pa.seal(m)) == m
    for m in msgs:
        assert pa.open(pb.seal(m)) == m

    # ciphertext hides the plaintext
    frame = pa.seal(b"secret-payload")
    assert b"secret-payload" not in frame


def test_tampered_frame_poisons_channel():
    _, _, pa, pb = _pair()
    frame = bytearray(pa.seal(b"payload"))
    frame[7] ^= 1
    with pytest.raises(ChannelError):
        pb.open(bytes(frame))
    # channel is dead afterwards even for honest frames
    with pytest.raises(ChannelError):
        pb.open(pa.seal(b"next"))


def test_replayed_frame_rejected():
    _, _, pa, pb = _pair()
    f1 = pa.seal(b"one")
    assert pb.open(f1) == b"one"
    with pytest.raises(ChannelError):
        pb.open(f1)  # the ratchet advanced; replay cannot MAC


def test_mitm_substituted_identity_rejected():
    """An attacker replacing the responder's signature with their own must
    fail authentication (the signature covers the DH transcript the
    attacker cannot complete for the victim's static key)."""
    ia = PeerIdentity.generate()
    mallory = PeerIdentity.generate()
    victim = PeerIdentity.generate()
    (sa, ra), (sb, rb) = duplex_pair()
    err = {}

    def initiator():
        try:
            SecurePeer.handshake(ia, sa, ra, True)
        except HandshakeError as e:
            err["a"] = e

    def fake_responder():
        # claims the VICTIM's static key but can only sign with mallory's
        hello = rb()
        import os
        from zkvm_tpu.oracle import scalar
        from zkvm_tpu.proofs.engine import get_engine
        e = scalar.from_bytes_mod_order_wide(os.urandom(64))
        E = get_engine().basepoint_mul(e).compress()
        sb(victim.public.point + E + os.urandom(16))
        rb()  # initiator's signature
        from zkvm_tpu.crypto import starsig
        from zkvm_tpu.oracle.merlin import Transcript
        t = Transcript(b"zkvm-tpu.cybershake.v1")  # wrong transcript anyway
        sb(starsig.sign(t, mallory.secret).to_bytes())

    ta = threading.Thread(target=initiator)
    tb = threading.Thread(target=fake_responder)
    ta.start(); tb.start(); ta.join(30); tb.join(30)
    assert isinstance(err.get("a"), HandshakeError)


def test_reflection_attack_rejected():
    """Echoing the initiator's own hello and signature back must fail: the
    handshake signature is role-tagged, so Alice's initiator-signature can
    never verify as a responder-signature even over an identical
    transcript."""
    ia = PeerIdentity.generate()
    (sa, ra), (sb, rb) = duplex_pair()
    err = {}

    def initiator():
        try:
            SecurePeer.handshake(ia, sa, ra, True)
            err["a"] = None
        except HandshakeError as e:
            err["a"] = e

    def reflector():
        hello = rb()
        sb(hello)       # echo Alice's hello verbatim
        sig = rb()
        sb(sig)         # echo Alice's signature verbatim

    ta = threading.Thread(target=initiator)
    tb = threading.Thread(target=reflector)
    ta.start(); tb.start(); ta.join(30); tb.join(30)
    assert isinstance(err.get("a"), HandshakeError)


def test_garbage_hello_is_handshake_error():
    """Invalid point encodings in the hello must surface as HandshakeError,
    not a raw ValueError."""
    ia = PeerIdentity.generate()
    (sa, ra), (sb, rb) = duplex_pair()
    err = {}

    def initiator():
        try:
            SecurePeer.handshake(ia, sa, ra, True)
        except HandshakeError as e:
            err["a"] = e

    def garbage():
        rb()
        sb(b"\xff" * 80)  # not valid ristretto encodings

    ta = threading.Thread(target=initiator)
    tb = threading.Thread(target=garbage)
    ta.start(); tb.start(); ta.join(30); tb.join(30)
    assert isinstance(err.get("a"), HandshakeError)


def test_encrypted_block_sync():
    """A cold node catches up through the encrypted channel: the same
    message loop as tests/test_node_sync.py but every byte rides a sealed
    frame (the upstream p2p crate's role)."""
    from zkvm_tpu.chain import BlockchainState
    from zkvm_tpu.chain.node import Node
    from zkvm_tpu.chain.p2p import encrypted_sync
    from zkvm_tpu.proofs.generators import BulletproofGens

    bp = BulletproofGens(1024)
    state = BlockchainState.make_initial(timestamp_ms=1000)
    full = Node(state, bp)
    for i in range(3):
        full.make_block(timestamp_ms=2000 + i)  # mines AND applies
    cold = Node(BlockchainState.make_initial(timestamp_ms=1000), bp)
    rounds = encrypted_sync(cold, full, PeerIdentity.generate(),
                            PeerIdentity.generate())
    assert rounds > 0
    assert cold.tip == full.tip
