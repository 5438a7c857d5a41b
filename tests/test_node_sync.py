"""Block sync + relay protocol tests (upstream protocol.rs node handlers):
full wire round-trips for every message, a node that mines from its mempool,
a cold peer catching up block-by-block through the message loop, short-id
mempool relay, and rejection of tampered blocks.
"""

import random

import pytest

from zkvm_tpu.chain import BlockchainState
from zkvm_tpu.chain.block import Block, block_id
from zkvm_tpu.chain.node import Node, NodeError, sync
from zkvm_tpu.chain.protocol import (
    Blocks, GetBlocks, GetInventory, GetMempoolTxs, Inventory, MempoolTxs,
    encode_message, parse_message,
)
from zkvm_tpu.chain.shortid import ShortIDNonce, siphash24
from zkvm_tpu.constants import L
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import Instruction, TxHeader, build_tx
from zkvm_tpu.vm.constraints import Commitment
from zkvm_tpu.vm.contract import contract_id, parse_contract
from zkvm_tpu.vm.scalar_witness import ScalarWitness
from zkvm_tpu.vm.types import Value
from zkvm_tpu.vm.vm import _flavor_scalar

BP = BulletproofGens(1024)
ISSUER_KEY = 4242
ISSUER_PRED = VerificationKey.from_secret(ISSUER_KEY).point
HEADER = TxHeader(version=1, mintime_ms=0, maxtime_ms=1 << 40)
_r = random.Random(77)


def _issue_tx(qty: int, metadata: bytes):
    flavor = _flavor_scalar(ISSUER_PRED, metadata)
    qty_com = Commitment.blinded(
        ScalarWitness.from_integer(qty), _r.randrange(L))
    out_qty = Commitment.blinded(
        ScalarWitness.from_integer(qty), _r.randrange(L))
    out_flv = Commitment.blinded(
        ScalarWitness.from_scalar(flavor), _r.randrange(L))
    prog = [
        Instruction("push", data=ISSUER_PRED),
        Instruction("push", data=metadata),
        Instruction("push", data=qty_com.point, witness=qty_com),
        Instruction("issue"),
        Instruction("signtx"),
        Instruction("push", data=out_flv.point, witness=out_flv),
        Instruction("push", data=out_qty.point, witness=out_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=ISSUER_PRED),
        Instruction("output", k=1),
    ]
    tx, v = build_tx(prog, HEADER, BP, {ISSUER_PRED: ISSUER_KEY})
    return tx, v, (out_qty, out_flv)


def _spend_tx(output_bytes: bytes, out_qty, out_flv):
    contract = parse_contract(output_bytes)
    contract.payload = [Value(out_qty, out_flv)]
    new_qty = Commitment.blinded(
        out_qty.ensure_open()[0], _r.randrange(L))
    new_flv = Commitment.blinded(
        out_flv.ensure_open()[0], _r.randrange(L))
    prog = [
        Instruction("push", data=output_bytes, witness=contract),
        Instruction("input"),
        Instruction("signtx"),
        Instruction("push", data=new_flv.point, witness=new_flv),
        Instruction("push", data=new_qty.point, witness=new_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=ISSUER_PRED),
        Instruction("output", k=1),
    ]
    tx, v = build_tx(prog, HEADER, BP, {ISSUER_PRED: ISSUER_KEY})
    return tx, v, (new_qty, new_flv)


def _genesis():
    return BlockchainState.make_initial(timestamp_ms=1000)


def test_message_wire_round_trips():
    state = _genesis()
    tip = state.tip
    msgs = [
        GetInventory(version=1, shortid_nonce=99),
        Inventory(tip, 99, [b"\x01" * 6, b"\x02" * 6]),
        GetBlocks(after=b"\xab" * 32),
        Blocks([Block(tip, [], {})]),
        GetMempoolTxs(99, [b"\x03" * 6]),
        MempoolTxs([b"rawtx-1", b"rawtx-2"]),
    ]
    for m in msgs:
        got = parse_message(encode_message(m))
        assert type(got) is type(m)
        assert encode_message(got) == encode_message(m)


def test_shortid_stability_and_keying():
    # SipHash-2-4 reference vector (key 000102..0f, data 00..3e prefix 8)
    key = bytes(range(16))
    assert siphash24(key, bytes(range(8))) == 0x93F5F5799A932462
    a = ShortIDNonce(b"seed" * 8, 7)
    b = ShortIDNonce(b"seed" * 8, 8)
    h = b"\x11" * 32
    assert a.short_id(h) != b.short_id(h)       # nonce separates
    assert a.short_id(h) == ShortIDNonce(b"seed" * 8, 7).short_id(h)
    assert len(a.short_id(h)) == 6


def test_node_mines_and_cold_peer_syncs():
    """Node A mines 3 blocks (issue, then two chained spends); cold node B
    syncs through the message loop, every hop on the wire."""
    a = Node(_genesis(), BP)
    b = Node(_genesis(), BP)

    tx1, v1, coms = _issue_tx(500, b"sync-token")
    a.submit_tx(tx1)
    blk = a.make_block(timestamp_ms=2000)
    assert blk.header.height == 2 and len(blk.txs) == 1
    # an input-less (issuance) tx must leave the mempool once mined
    assert len(a.mempool) == 0

    out_bytes = v1.outputs[0]
    for i in range(2):
        tx, v, coms = _spend_tx(out_bytes, *coms)
        a.submit_tx(tx)
        mined = a.make_block(timestamp_ms=3000 + i)
        assert len(mined.txs) == 1 and len(a.mempool) == 0
        out_bytes = v.outputs[0]

    assert a.tip.height == 4
    rounds = sync(b, a)
    assert b.tip.height == 4
    assert block_id(b.tip) == block_id(a.tip)
    assert b.state.utreexo.state_hash() == a.state.utreexo.state_hash()
    assert rounds >= 2
    # B independently tracked the live utxo set
    assert set(b.utxos.proofs) == set(a.utxos.proofs)
    for cid, p in b.utxos.proofs.items():
        b.state.utreexo.verify(cid, p)


def test_block_pagination():
    """A peer many blocks behind pages through max_blocks_per_reply."""
    a = Node(_genesis(), BP, max_blocks_per_reply=2)
    b = Node(_genesis(), BP)
    tx1, v1, coms = _issue_tx(100, b"page-token")
    a.submit_tx(tx1)
    a.make_block(timestamp_ms=2000)
    out_bytes = v1.outputs[0]
    for i in range(4):
        tx, v, coms = _spend_tx(out_bytes, *coms)
        a.submit_tx(tx)
        a.make_block(timestamp_ms=3000 + i)
        out_bytes = v.outputs[0]
    assert a.tip.height == 6
    sync(b, a)
    assert b.tip.height == 6


def test_mempool_shortid_relay():
    """Two synced nodes exchange mempool contents via short ids."""
    a = Node(_genesis(), BP)
    b = Node(_genesis(), BP)
    tx1, _, _ = _issue_tx(123, b"relay-token")
    a.submit_tx(tx1)
    assert len(b.mempool) == 0
    sync(b, a)   # same height; inventory round fetches the missing tx
    assert len(b.mempool) == 1
    assert list(b.mempool.entries) == list(a.mempool.entries)


def test_tampered_block_rejected():
    a = Node(_genesis(), BP)
    b = Node(_genesis(), BP)
    tx1, _, _ = _issue_tx(11, b"tamper-token")
    a.submit_tx(tx1)
    blk = a.make_block(timestamp_ms=2000)

    # tamper: drop the tx but keep the header
    bad = Block(blk.header, [], {})
    with pytest.raises(Exception):
        b.receive_block(bad)
    assert b.tip.height == 1  # unchanged

    # tamper: flip a byte inside the embedded utxo proof section
    raw = bytearray(blk.to_bytes())
    raw[-1] ^= 0x01
    from zkvm_tpu.chain.protocol import Blocks as BlocksMsg
    wire = encode_message(BlocksMsg([blk]))
    # re-encode with the corrupted block payload
    corrupted = wire[:-len(blk.to_bytes())] + bytes(raw)
    with pytest.raises(Exception):
        for reply in b.handle_message(corrupted):
            pass
    assert b.tip.height == 1


def test_unknown_sync_point():
    a = Node(_genesis(), BP)
    with pytest.raises(NodeError):
        a.handle_message(encode_message(GetBlocks(after=b"\x99" * 32)))


def test_node_snapshot_restart():
    """A node restarted from its serialized snapshot keeps mining and
    serving sync (upstream's checkpoint use-case at the node level);
    a snapshot with a stale utxo proof is rejected."""
    a = Node(_genesis(), BP)
    tx1, v1, coms = _issue_tx(77, b"persist-token")
    a.submit_tx(tx1)
    a.make_block(timestamp_ms=2000)

    blob = a.serialize()
    a2 = Node.deserialize(blob, BP)
    assert block_id(a2.tip) == block_id(a.tip)
    assert a2.utxos.proofs == a.utxos.proofs

    # restarted node mines the next block
    tx2, v2, _ = _spend_tx(v1.outputs[0], *coms)
    a2.submit_tx(tx2)
    a2.make_block(timestamp_ms=3000)
    assert a2.tip.height == 3

    # and serves a cold peer
    b = Node(_genesis(), BP)
    sync(b, a2)
    assert block_id(b.tip) == block_id(a2.tip)

    # tampered snapshot (stale/corrupt proof) must be rejected
    bad = bytearray(blob)
    bad[-1] ^= 0x01
    with pytest.raises(Exception):
        Node.deserialize(bytes(bad), BP)
