"""End-to-end blockchain test: issue in block 1, spend in block 2 with a
catchup-refreshed utxo proof (upstream analogue: blockchain state tests)."""

import random

import pytest

from zkvm_tpu.chain import BlockchainState
from zkvm_tpu.chain.state import BlockchainError
from zkvm_tpu.chain.utreexo import UtreexoProof
from zkvm_tpu.constants import L
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import Instruction, Tx, TxHeader, build_tx
from zkvm_tpu.vm.constraints import Commitment
from zkvm_tpu.vm.contract import contract_id, parse_contract
from zkvm_tpu.vm.scalar_witness import ScalarWitness
from zkvm_tpu.vm.types import Value
from zkvm_tpu.vm.vm import _flavor_scalar

BP = BulletproofGens(1024)

ISSUER_KEY = 31337
ISSUER_PRED = VerificationKey.from_secret(ISSUER_KEY).point


def test_two_block_chain():
    r = random.Random(9)
    state0 = BlockchainState.make_initial(timestamp_ms=1000)

    # --- block 1: issuance tx
    qty = 500
    metadata = b"blockchain-token"
    flavor = _flavor_scalar(ISSUER_PRED, metadata)
    qty_com = Commitment.blinded(ScalarWitness.from_integer(qty), r.randrange(L))
    out_qty = Commitment.blinded(ScalarWitness.from_integer(qty), r.randrange(L))
    out_flv = Commitment.blinded(ScalarWitness.from_scalar(flavor), r.randrange(L))
    header = TxHeader(version=1, mintime_ms=0, maxtime_ms=10_000)
    program1 = [
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
    tx1, v1 = build_tx(program1, header, BP, {ISSUER_PRED: ISSUER_KEY})

    block1, state1, catchup1, verified1 = state0.make_block(
        [tx1], {}, BP, timestamp_ms=2000
    )
    assert state1.tip.height == 2
    assert len(verified1[0].outputs) == 1

    # peer applies the same block to the same pre-state
    state1b, catchup1b, _ = state0.apply_block(block1, {}, BP)
    assert state1b.tip == state1.tip
    assert state1b.utreexo.state_hash() == state1.utreexo.state_hash()

    # --- block 2: spend the output
    output_bytes = verified1[0].outputs[0]
    cid = contract_id(parse_contract(output_bytes))
    utxo_proof = catchup1.update_proof(cid, UtreexoProof(0, []))
    state1.utreexo.verify(cid, utxo_proof)

    contract = parse_contract(output_bytes)
    contract.payload = [Value(out_qty, out_flv)]
    new_qty = Commitment.blinded(out_qty.ensure_open()[0], r.randrange(L))
    new_flv = Commitment.blinded(out_flv.ensure_open()[0], r.randrange(L))
    program2 = [
        Instruction("push", data=output_bytes, witness=contract),
        Instruction("input"),
        Instruction("signtx"),
        Instruction("push", data=new_flv.point, witness=new_flv),
        Instruction("push", data=new_qty.point, witness=new_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=ISSUER_PRED),
        Instruction("output", k=1),
    ]
    tx2, _ = build_tx(program2, header, BP, {ISSUER_PRED: ISSUER_KEY})

    block2, state2, catchup2, verified2 = state1.make_block(
        [tx2], {cid: utxo_proof}, BP, timestamp_ms=3000
    )
    assert state2.tip.height == 3
    assert verified2[0].inputs == [cid]

    # spending again must fail (utxo gone)
    with pytest.raises(Exception):
        state2.make_block([tx2], {cid: utxo_proof}, BP, timestamp_ms=4000)

    # a block that doesn't extend the tip is rejected
    with pytest.raises(BlockchainError):
        state2.apply_block(block1, {}, BP)
