"""End-to-end ZkVM transaction tests.

Upstream analogue: slingshot/zkvm/tests/zkvm.rs — build a tx with the prover
(issue -> cloak -> output programs), verify with the verifier; malformed
programs yield typed VMErrors; bytecode round-trips.
"""

import random

import pytest

from zkvm_tpu.constants import L
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.oracle import scalar as sc
from zkvm_tpu.proofs.errors import ProofError
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import (
    Instruction, Tx, TxHeader, build_tx, encode_program, parse_program,
    verify_tx,
)
from zkvm_tpu.vm.constraints import Commitment
from zkvm_tpu.vm.errors import (
    InvalidSignature, StackUnderflow, UnsignedTx, VMError,
)
from zkvm_tpu.vm.scalar_witness import ScalarWitness
from zkvm_tpu.vm.types import String
from zkvm_tpu.vm.vm import _flavor_scalar

BP = BulletproofGens(1024)
HEADER = TxHeader(version=1, mintime_ms=0, maxtime_ms=10_000)

ISSUER_KEY = 77777
ISSUER_PRED = VerificationKey.from_secret(ISSUER_KEY).point
RECIPIENT_KEY = 88888
RECIPIENT_PRED = VerificationKey.from_secret(RECIPIENT_KEY).point


def _issue_tx(qty: int = 100, metadata: bytes = b"token-metadata"):
    """issue qty units, cloak them, lock to the recipient predicate."""
    r = random.Random(1)
    qty_com = Commitment.blinded(ScalarWitness.from_integer(qty), r.randrange(L))
    flavor = _flavor_scalar(ISSUER_PRED, metadata)
    out_qty = Commitment.blinded(ScalarWitness.from_integer(qty), r.randrange(L))
    out_flv = Commitment.blinded(ScalarWitness.from_scalar(flavor), r.randrange(L))

    program = [
        Instruction("push", data=ISSUER_PRED),
        Instruction("push", data=metadata),
        Instruction("push", data=qty_com.point, witness=qty_com),
        Instruction("issue"),
        Instruction("signtx"),
        Instruction("push", data=out_flv.point, witness=out_flv),
        Instruction("push", data=out_qty.point, witness=out_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=RECIPIENT_PRED),
        Instruction("output", k=1),
    ]
    return build_tx(
        program, HEADER, BP, signing_keys={ISSUER_PRED: ISSUER_KEY}
    ), (out_qty, out_flv)


def test_issue_cloak_output_round_trip():
    (tx, verified_p), _ = _issue_tx()
    # wire round trip
    tx2 = Tx.from_bytes(tx.to_bytes())
    verified = verify_tx(tx2, BP)
    assert verified.id == verified_p.id
    kinds = [e.kind for e in verified.log]
    assert kinds == ["header", "issue", "output"]
    assert len(verified.outputs) == 1


def test_spend_output_in_second_tx():
    """Spend tx1's output in tx2: input -> signtx -> cloak -> output."""
    (tx1, verified1), (out_qty, out_flv) = _issue_tx()
    verify_tx(Tx.from_bytes(tx1.to_bytes()), BP)
    output_bytes = verified1.outputs[0]

    # prover-side witness for the input contract
    from zkvm_tpu.vm.contract import parse_contract
    from zkvm_tpu.vm.types import Value
    contract = parse_contract(output_bytes)
    contract.payload = [Value(out_qty, out_flv)]  # open commitments

    r = random.Random(2)
    qty_val, _ = out_qty.ensure_open()
    flv_val, _ = out_flv.ensure_open()
    new_qty = Commitment.blinded(qty_val, r.randrange(L))
    new_flv = Commitment.blinded(flv_val, r.randrange(L))

    program = [
        Instruction("push", data=output_bytes, witness=contract),
        Instruction("input"),
        Instruction("signtx"),
        Instruction("push", data=new_flv.point, witness=new_flv),
        Instruction("push", data=new_qty.point, witness=new_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=ISSUER_PRED),
        Instruction("output", k=1),
    ]
    tx2, verified2 = build_tx(
        program, HEADER, BP, signing_keys={RECIPIENT_PRED: RECIPIENT_KEY}
    )
    v = verify_tx(Tx.from_bytes(tx2.to_bytes()), BP)
    assert [e.kind for e in v.log] == ["header", "input", "output"]
    assert v.inputs[0] == verified2.inputs[0]


def test_wrong_signing_key_fails():
    r = random.Random(3)
    qty_com = Commitment.blinded(ScalarWitness.from_integer(5), r.randrange(L))
    program = [
        Instruction("push", data=ISSUER_PRED),
        Instruction("push", data=b"m"),
        Instruction("push", data=qty_com.point, witness=qty_com),
        Instruction("issue"),
        Instruction("signtx"),
        Instruction("retire"),
    ]
    # signing with the wrong key produces a tx whose signature fails
    tx, _ = build_tx(
        program, HEADER, BP, signing_keys={ISSUER_PRED: ISSUER_KEY + 1}
    )
    with pytest.raises((InvalidSignature, ProofError)):
        verify_tx(tx, BP)
    # missing key entirely
    with pytest.raises(UnsignedTx):
        build_tx(program, HEADER, BP, signing_keys={})


def test_tampered_program_fails():
    (tx, _), _ = _issue_tx()
    raw = bytearray(tx.to_bytes())
    # flip a byte inside the program section
    raw[30] ^= 0x01
    with pytest.raises((VMError, ProofError, ValueError)):
        verify_tx(Tx.from_bytes(bytes(raw)), BP)


def test_unclean_stack_rejected():
    program = [Instruction("push", data=b"junk")]
    with pytest.raises(VMError):
        build_tx(program, HEADER, BP)


def test_stack_underflow():
    program = [Instruction("drop")]
    with pytest.raises(StackUnderflow):
        build_tx(program, HEADER, BP)


def test_program_encoding_round_trip():
    prog = [
        Instruction("push", data=b"hello"),
        Instruction("dup", k=3),
        Instruction("roll", k=1),
        Instruction("cloak", k=2, n=3),
        Instruction("signtx"),
        Instruction("program", data=b"\x02"),
    ]
    enc = encode_program(prog)
    dec = parse_program(enc)
    assert [(i.op, i.data, i.k, i.n) for i in dec] == [
        (i.op, i.data, i.k, i.n) for i in prog
    ]
    assert encode_program(dec) == enc


def test_expression_ops_and_constraints():
    """const/var/alloc/expr/neg/add/mul/eq/verify through a full tx."""
    r = random.Random(4)
    a = 20
    b = 22
    com_a = Commitment.blinded(ScalarWitness.from_integer(a), r.randrange(L))

    program = [
        # prove committed a times 2 plus 2 equals 42: a*2+2 == 42
        Instruction("push", data=com_a.point, witness=com_a),
        Instruction("var"),
        Instruction("expr"),
        Instruction("push", data=sc.to_bytes(2)),
        Instruction("const"),
        Instruction("mul"),
        Instruction("push", data=sc.to_bytes(2)),
        Instruction("const"),
        Instruction("add"),
        Instruction("push", data=sc.to_bytes(42)),
        Instruction("const"),
        Instruction("eq"),
        Instruction("verify"),
    ]
    tx, _ = build_tx(program, HEADER, BP)
    verify_tx(Tx.from_bytes(tx.to_bytes()), BP)

    # and the same with a false statement must fail
    com_bad = Commitment.blinded(ScalarWitness.from_integer(a + 1), r.randrange(L))
    program[0] = Instruction("push", data=com_bad.point, witness=com_bad)
    tx_bad, _ = build_tx(program, HEADER, BP)
    with pytest.raises(ProofError):
        verify_tx(tx_bad, BP)
