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


def test_utreexo_randomized_property():
    """N random blocks of interleaved insert/delete; a wallet refreshes every
    proof through each block's Catchup and every survivor must stay provable
    (upstream forest.rs randomized update tests)."""
    rng = random.Random(2024)
    u = Utreexo()
    proofs: dict[bytes, UtreexoProof] = {}
    next_id = 0

    for _block in range(30):
        live = list(proofs)
        k_del = rng.randint(0, min(4, len(live)))
        victims = rng.sample(live, k_del)
        k_ins = rng.randint(0, 5)
        fresh = [b"rnd-%d" % (next_id + i) for i in range(k_ins)]
        next_id += k_ins

        c = u.update([(v, proofs[v]) for v in victims], fresh)
        u.check_invariants()
        for v in victims:
            old = proofs.pop(v)
            # deleted items must not be resurrectable through the catchup
            with pytest.raises(UtreexoError):
                u.verify(v, c.update_proof(v, old))
        for it in list(proofs):
            proofs[it] = c.update_proof(it, proofs[it])
            u.verify(it, proofs[it])
        for it in fresh:
            proofs[it] = c.proof_for_new_item(it)
            u.verify(it, proofs[it])
        assert u.num_leaves == len(proofs)


def test_utreexo_same_block_deletions_order_independent():
    """Multiple deletions in ONE update must succeed regardless of list
    order and land on the same forest: all proofs are resolved against the
    pre-state fragment set before any carries run (the eager-carry design
    this replaced failed when a reinserted sibling merged into another
    tree's root ahead of a later deletion)."""
    items = _items(13)  # 13 = 0b1101: trees of height 3, 2, 0
    base = Utreexo()
    c = base.update([], items)
    proofs = {it: c.proof_for_new_item(it) for it in items}
    # victims spanning different trees, plus a sibling pair
    victims = [items[0], items[1], items[8], items[12], items[5]]

    hashes = set()
    for seed in range(6):
        order = list(victims)
        random.Random(seed).shuffle(order)
        u = Utreexo()
        u.roots = list(base.roots)
        u.num_leaves = base.num_leaves
        c2 = u.update([(v, proofs[v]) for v in order], [b"post"])
        hashes.add(u.state_hash())
        for it in items:
            if it not in victims:
                u.verify(it, c2.update_proof(it, proofs[it]))
    assert len(hashes) == 1


def test_utreexo_double_delete_rejected():
    u = Utreexo()
    items = _items(4)
    c = u.update([], items)
    p = c.proof_for_new_item(items[0])
    snapshot = u.root_list()
    with pytest.raises(UtreexoError):
        u.update([(items[0], p), (items[0], p)], [])
    assert u.root_list() == snapshot


def test_utreexo_adversarial_mutated_proofs():
    """Bit-flipped neighbors and wrong positions must fail verify AND must
    not sneak through a catchup re-base."""
    u = Utreexo()
    items = _items(8)
    c = u.update([], items)
    p = c.proof_for_new_item(items[3])
    u.verify(items[3], p)

    for lvl in range(len(p.neighbors)):
        bad = UtreexoProof(p.position, list(p.neighbors))
        bad.neighbors[lvl] = bytes(b ^ 0x01 for b in bad.neighbors[lvl])
        with pytest.raises(UtreexoError):
            u.verify(items[3], bad)
        with pytest.raises(UtreexoError):
            c2 = u.copy().update([(items[3], bad)], [])
            del c2
    wrong_pos = UtreexoProof(p.position ^ 0b1, p.neighbors)
    with pytest.raises(UtreexoError):
        u.verify(items[3], wrong_pos)
    # a proof for one item never verifies another
    with pytest.raises(UtreexoError):
        u.verify(items[4], p)


def test_catchup_chain_multi_block_stale_proofs():
    """A wallet offline for several blocks re-bases through the retained
    window of Catchups (CatchupChain); beyond the window it fails loudly."""
    from zkvm_tpu.chain.utreexo import CatchupChain

    u = Utreexo()
    items = _items(10)
    c0 = u.update([], items)
    stale = {it: c0.proof_for_new_item(it) for it in items}

    chain = CatchupChain(max_window=3)
    # three blocks pass while the wallet sleeps; each block's spender holds
    # a CURRENT proof (re-based through the prior catchups)
    chain.push(u.update([(items[0], stale[items[0]])], [b"b1"]))
    b1p = chain.catchups[-1].proof_for_new_item(b"b1")
    p1 = chain.update_proof(items[1], stale[items[1]], stale_by=1)
    chain.push(u.update([(items[1], p1)], [b"b2", b"b3"]))
    b1p = chain.catchups[-1].update_proof(b"b1", b1p)  # re-base past block 2
    chain.push(u.update([(b"b1", b1p)], []))

    for it in items[2:]:
        fresh = chain.update_proof(it, stale[it], stale_by=3)
        u.verify(it, fresh)
    # un-re-based stale proofs no longer verify directly
    with pytest.raises(UtreexoError):
        u.verify(items[2], stale[items[2]])
    # window bound enforced
    with pytest.raises(UtreexoError):
        chain.update_proof(items[2], stale[items[2]], stale_by=4)
    # deleted-in-window items cannot be caught up
    with pytest.raises(UtreexoError):
        p = chain.update_proof(items[0], stale[items[0]], stale_by=3)
        u.verify(items[0], p)


def test_utreexo_serialization_round_trips():
    u = Utreexo()
    items = _items(11)
    c = u.update([], items)
    p = c.proof_for_new_item(items[2])

    u2 = Utreexo.deserialize(u.serialize())
    assert u2.state_hash() == u.state_hash()
    assert u2.num_leaves == u.num_leaves
    u2.verify(items[2], p)

    p2 = UtreexoProof.deserialize(p.serialize())
    assert (p2.position, p2.neighbors) == (p.position, p.neighbors)

    c2 = Catchup.deserialize(c.serialize())
    assert c2.parent == c.parent and c2.root_set == c.root_set
    u2.verify(items[5], c2.proof_for_new_item(items[5]))

    # corrupted payloads raise, never mis-parse
    with pytest.raises(UtreexoError):
        Utreexo.deserialize(u.serialize() + b"\x00")
    raw = bytearray(u.serialize())
    raw[8+4] = 63  # first root height -> nonsense: invariant sum breaks
    with pytest.raises(UtreexoError):
        Utreexo.deserialize(bytes(raw))
    with pytest.raises(UtreexoError):
        UtreexoProof.deserialize(p.serialize() + b"\x01")


def test_blockchain_state_serialization():
    from zkvm_tpu.chain import BlockchainState
    from zkvm_tpu.chain.state import BlockchainError

    st = BlockchainState.make_initial(timestamp_ms=1000)
    st.utreexo.update([], _items(5))
    st.tip.utxoroot = st.utreexo.state_hash()

    back = BlockchainState.deserialize(st.serialize())
    assert back.tip == st.tip
    assert back.utreexo.state_hash() == st.utreexo.state_hash()

    # a tip that disagrees with the restored forest is rejected
    st.tip.utxoroot = b"\xff" * 32
    with pytest.raises(BlockchainError):
        BlockchainState.deserialize(st.serialize())


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
        Blocks([__import__('zkvm_tpu.chain.block', fromlist=['Block']).Block(tip, [], {})]),
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
