"""L6 chain tests: utreexo properties, block/state round trips, mempool,
short ids (upstream analogue: slingshot/blockchain tests)."""

import random

import pytest

from zkvm_tpu.chain.shortid import ShortIDNonce, siphash24
from zkvm_tpu.chain.utreexo import (
    Catchup, Utreexo, UtreexoError, UtreexoProof, leaf_hash,
)


def _items(n, tag=b""):
    return [b"utxo-%d-" % i + tag for i in range(n)]


def test_utreexo_insert_and_prove_via_catchup():
    u = Utreexo()
    items = _items(8)
    catchup = u.update([], items)
    assert u.num_leaves == 8
    proofs = {}
    for it in items:
        p = catchup.update_proof(it, UtreexoProof(0, []))
        u.verify(it, p)
        proofs[it] = p
    # wrong item fails
    with pytest.raises(UtreexoError):
        u.verify(b"missing", proofs[items[0]])


def test_utreexo_delete_and_catchup_chain():
    u = Utreexo()
    items = _items(8)
    c0 = u.update([], items)
    proofs = {it: c0.update_proof(it, UtreexoProof(0, [])) for it in items}

    # delete two, insert one new
    new_items = _items(1, tag=b"new")
    c1 = u.update(
        [(items[0], proofs[items[0]]), (items[3], proofs[items[3]])],
        new_items,
    )
    assert u.num_leaves == 7
    # deleted items no longer provable even with catchup
    for gone in (items[0], items[3]):
        with pytest.raises(UtreexoError):
            p = c1.update_proof(gone, proofs[gone])
            u.verify(gone, p)
    # survivors provable after catchup
    survivors = [it for it in items if it not in (items[0], items[3])]
    for it in survivors:
        p = c1.update_proof(it, proofs[it])
        u.verify(it, p)
        proofs[it] = p
    # new item provable
    p_new = c1.update_proof(new_items[0], UtreexoProof(0, []))
    u.verify(new_items[0], p_new)

    # another round: delete a survivor with its refreshed proof
    c2 = u.update([(survivors[0], proofs[survivors[0]])], [])
    assert u.num_leaves == 6
    for it in survivors[1:]:
        p = c2.update_proof(it, proofs[it])
        u.verify(it, p)


def test_utreexo_state_hash_changes():
    u = Utreexo()
    h0 = u.state_hash()
    u.update([], _items(3))
    h1 = u.state_hash()
    assert h0 != h1
    u2 = Utreexo()
    u2.update([], _items(3))
    assert u2.state_hash() == h1  # deterministic


def test_utreexo_atomic_on_bad_proof():
    u = Utreexo()
    c = u.update([], _items(4))
    good = c.update_proof(_items(4)[0], UtreexoProof(0, []))
    bad = UtreexoProof(good.position, [b"\x00" * 32] * len(good.neighbors))
    snapshot = u.root_list()
    with pytest.raises(UtreexoError):
        u.update([(_items(4)[0], bad)], [b"x"])
    assert u.root_list() == snapshot  # unchanged


def test_siphash_vector():
    """SipHash-2-4 reference vector (from the SipHash paper appendix)."""
    key = bytes(range(16))
    data = bytes(range(15))
    assert siphash24(key, data) == 0xA129CA6149BE45E5


def test_short_ids():
    n1 = ShortIDNonce(b"seed", 1)
    n2 = ShortIDNonce(b"seed", 2)
    h = b"\xab" * 32
    assert len(n1.short_id(h)) == 6
    assert n1.short_id(h) != n2.short_id(h)
    assert n1.short_id(h) == ShortIDNonce(b"seed", 1).short_id(h)


def test_protocol_messages_round_trip():
    from zkvm_tpu.chain.block import BlockHeader
    from zkvm_tpu.chain.protocol import (
        Blocks, GetBlocks, GetInventory, GetMempoolTxs, Inventory,
        MempoolTxs, encode_message, inventory_for, parse_message,
    )

    tip = BlockHeader.make_initial(1234, b"\x11" * 32)
    inv = inventory_for(tip, [b"\xaa" * 32, b"\xbb" * 32], b"seed", 7)
    for msg in (
        GetInventory(1, 7),
        inv,
        GetBlocks(b"\x22" * 32),
        Blocks([tip]),
        GetMempoolTxs(7, inv.mempool_short_ids),
        MempoolTxs([b"tx-bytes-1", b"tx-bytes-2"]),
    ):
        wire = encode_message(msg)
        back = parse_message(wire)
        assert encode_message(back) == wire, type(msg).__name__
    # short ids depend on the nonce
    inv2 = inventory_for(tip, [b"\xaa" * 32], b"seed", 8)
    assert inv2.mempool_short_ids[0] != inv.mempool_short_ids[0]


def test_mempool_evicts_lowest_feerate_not_lowest_fee(monkeypatch):
    """Eviction victim must be the lowest fee/size ratio, not the lowest
    absolute fee (upstream slingshot mempool ordering)."""
    from zkvm_tpu.chain import mempool as mp
    from zkvm_tpu.vm.tx import TxHeader, VerifiedTx

    class FakeTx:
        def __init__(self, tag: bytes, size: int):
            self.tag = tag
            self.size = size

        def to_bytes(self):
            return self.tag.ljust(self.size, b"\0")

    fees = {}

    def fake_verify(tx, bp_gens):
        return VerifiedTx(
            header=TxHeader(0, 0, 2**63), id=tx.tag, log=[], fee=fees[tx.tag]
        )

    monkeypatch.setattr(mp, "verify_tx", fake_verify)
    pool = mp.Mempool(bp_gens=None, max_size=2)

    # big low-rate tx with HIGH absolute fee: rate 100/1000 = 0.1
    fees[b"bigslow"] = 100
    pool.append(FakeTx(b"bigslow", 1000))
    # small tx with LOW absolute fee but high rate: 10/10 = 1.0
    fees[b"smallfast"] = 10
    pool.append(FakeTx(b"smallfast", 10))

    # incoming rate 50/100 = 0.5: must evict bigslow (lowest rate), and the
    # min-fee bug would instead pick smallfast
    fees[b"mid"] = 50
    pool.append(FakeTx(b"mid", 100))
    assert set(pool.entries) == {b"smallfast", b"mid"}

    # incoming with rate below every entry is rejected, pool unchanged
    fees[b"dust"] = 1
    with pytest.raises(mp.MempoolError):
        pool.append(FakeTx(b"dust", 1000))
    assert set(pool.entries) == {b"smallfast", b"mid"}

    # block-template order is by descending feerate
    assert [t.tag for t in pool.ordered_txs()] == [b"smallfast", b"mid"]
