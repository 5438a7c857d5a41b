"""L2 crypto tests: starsig, musig, keytree, merkle
(upstream analogues: each crate's mod tests)."""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.crypto.keytree import Xprv
from zkvm_tpu.crypto.merkle import MerkleTree
from zkvm_tpu.crypto.musig import Multikey, MusigError, aggregate_shares, sign_multi
from zkvm_tpu.crypto.starsig import (
    Signature, VerificationKey, sign, verify, verify_batch,
)
from zkvm_tpu.oracle.merlin import Transcript
from zkvm_tpu.vm.errors import InvalidSignature


def _msg_transcript(msg: bytes) -> Transcript:
    t = Transcript(b"starsig test")
    t.append_message(b"msg", msg)
    return t


def test_starsig_round_trip():
    x = 123456789
    key = VerificationKey.from_secret(x)
    sig = sign(_msg_transcript(b"hello"), x)
    verify(sig, _msg_transcript(b"hello"), key)
    # serialization
    sig2 = Signature.from_bytes(sig.to_bytes())
    verify(sig2, _msg_transcript(b"hello"), key)


def test_starsig_rejects():
    x = 5555
    key = VerificationKey.from_secret(x)
    sig = sign(_msg_transcript(b"hello"), x)
    with pytest.raises(InvalidSignature):
        verify(sig, _msg_transcript(b"other message"), key)
    with pytest.raises(InvalidSignature):
        verify(sig, _msg_transcript(b"hello"), VerificationKey.from_secret(x + 1))
    bad = Signature((sig.s + 1) % L, sig.R)
    with pytest.raises(InvalidSignature):
        verify(bad, _msg_transcript(b"hello"), key)


def test_starsig_batch():
    r = random.Random(1)
    keys, sigs, ts = [], [], []
    for i in range(8):
        x = r.randrange(1, L)
        keys.append(VerificationKey.from_secret(x))
        t = _msg_transcript(f"msg {i}".encode())
        sigs.append(sign(t.clone(), x))
        ts.append(t)
    verify_batch(sigs, ts, keys)
    # poison one
    sigs[3] = Signature((sigs[3].s + 1) % L, sigs[3].R)
    with pytest.raises(InvalidSignature):
        verify_batch(sigs, ts, keys)


def test_musig_round_trip():
    r = random.Random(2)
    keys = [r.randrange(1, L) for _ in range(3)]
    t = _msg_transcript(b"musig message")
    sig, agg_key = sign_multi(keys, t.clone())
    verify(sig, t.clone(), agg_key)
    # aggregated key differs from naive sum (delinearization)
    from zkvm_tpu.oracle.ristretto import BASEPOINT
    naive = None
    for x in keys:
        p = BASEPOINT * x
        naive = p if naive is None else naive + p
    assert agg_key.point != naive.compress()


def test_musig_bad_share_attribution():
    r = random.Random(3)
    privs = [r.randrange(1, L) for _ in range(3)]
    from zkvm_tpu.crypto.musig import Party
    t = _msg_transcript(b"m")
    multikey = Multikey([VerificationKey.from_secret(x) for x in privs])
    parties = [Party(multikey, x, i, t.clone()) for i, x in enumerate(privs)]
    pres = [p.precommitment() for p in parties]
    coms = [p.commitment() for p in parties]
    shares = [p.share(pres, coms) for p in parties]
    shares[1] = (shares[1] + 1) % L
    with pytest.raises(MusigError) as e:
        aggregate_shares(multikey, t, coms, shares)
    assert e.value.bad_parties == [1]


def test_keytree_derivation():
    xprv = Xprv.random(b"\x42" * 64)
    xpub = xprv.to_xpub()

    def sel(t):
        t.append_u64(b"account", 7)

    child_prv = xprv.derive_key(sel)
    child_pub = xpub.derive_key(sel)
    # public derivation matches private derivation
    assert child_prv.to_xpub().point == child_pub.point
    assert child_prv.to_xpub().dk == child_pub.dk
    # different selectors diverge
    child2 = xprv.derive_key(lambda t: t.append_u64(b"account", 8))
    assert child2.to_xpub().point != child_pub.point
    # derived keys sign
    sig = sign(_msg_transcript(b"child msg"), child_prv.scalar_key)
    verify(sig, _msg_transcript(b"child msg"), child_pub.verification_key())


def test_merkle_tree():
    items = [f"item {i}".encode() for i in range(7)]  # non-power-of-two
    tree = MerkleTree(b"test.merkle", items)
    root = tree.root()
    for i, item in enumerate(items):
        path = tree.prove_inclusion(i)
        assert tree.verify_inclusion(item, path)
        assert path.compute_root(b"test.merkle", item) == root
        # wrong item fails
        assert not tree.verify_inclusion(b"evil", path)
    # wrong position fails
    p0 = tree.prove_inclusion(0)
    assert p0.compute_root(b"test.merkle", items[1]) != root
    # determinism + sensitivity
    assert MerkleTree(b"test.merkle", items).root() == root
    assert MerkleTree(b"other.label", items).root() != root
    assert MerkleTree(b"test.merkle", items[:-1]).root() != root
    # empty and singleton
    assert MerkleTree(b"x", []).root() != MerkleTree(b"x", [b""]).root()
