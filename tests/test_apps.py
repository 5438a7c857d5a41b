"""L7 helper tests: token issuance + account payment with change
(upstream analogue: slingshot/{token,accounts} usage in zkvm e2e tests)."""

import pytest

from zkvm_tpu.apps import Account, Receiver, Token, issue_program, pay_program
from zkvm_tpu.apps.accounts import Utxo
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import Tx, TxHeader, build_tx, verify_tx

BP = BulletproofGens(1024)
HEADER = TxHeader(1, 0, 10_000)

ISSUER = 1111
ALICE = 2222
BOB = 3333
P_ISSUER = VerificationKey.from_secret(ISSUER).point
P_ALICE = VerificationKey.from_secret(ALICE).point
P_BOB = VerificationKey.from_secret(BOB).point


def test_issue_then_pay_with_change():
    token = Token(P_ISSUER, b"demo-coin")

    # issue 100 to alice
    prog, out_qty, out_flv = issue_program(token, 100, P_ALICE)
    tx1, v1 = build_tx(prog, HEADER, BP, {P_ISSUER: ISSUER})
    verify_tx(Tx.from_bytes(tx1.to_bytes()), BP)
    alice_utxo = Utxo(v1.outputs[0], out_qty, out_flv)

    alice = Account(P_ALICE, [alice_utxo])
    assert alice.balance(token.flavor) == 100

    # alice pays bob 30, keeps 70 change
    recv = Receiver(P_BOB, 30, token.flavor)
    prog2, recv_utxo, chg_utxo = pay_program([alice_utxo], recv)
    tx2, v2 = build_tx(prog2, HEADER, BP, {P_ALICE: ALICE})
    verified = verify_tx(Tx.from_bytes(tx2.to_bytes()), BP)
    assert len(verified.outputs) == 2

    # outputs: [change (locked first), receiver]
    chg_utxo.output_bytes = verified.outputs[0]
    recv_utxo.output_bytes = verified.outputs[1]

    bob = Account(P_BOB, [recv_utxo])
    assert bob.balance(token.flavor) == 30
    alice2 = Account(P_ALICE, [chg_utxo])
    assert alice2.balance(token.flavor) == 70

    # bob can spend his utxo onward (no change)
    recv_back = Receiver(P_ALICE, 30, token.flavor)
    prog3, r3, c3 = pay_program([recv_utxo], recv_back)
    assert c3 is None
    tx3, _ = build_tx(prog3, HEADER, BP, {P_BOB: BOB})
    verify_tx(Tx.from_bytes(tx3.to_bytes()), BP)


def test_pay_program_validations():
    token = Token(P_ISSUER, b"x")
    from zkvm_tpu.vm.constraints import Commitment
    from zkvm_tpu.vm.scalar_witness import ScalarWitness
    u = Utxo(
        b"", Commitment.blinded(ScalarWitness.from_integer(10), 1),
        Commitment.blinded(ScalarWitness.from_scalar(token.flavor), 2),
    )
    with pytest.raises(ValueError):
        pay_program([u], Receiver(P_BOB, 11, token.flavor))  # insufficient
    with pytest.raises(ValueError):
        pay_program([u], Receiver(P_BOB, 5, token.flavor + 1))  # flavor
