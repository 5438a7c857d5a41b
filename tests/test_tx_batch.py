"""BASELINE config 4: batched full-tx verification on the sharded mesh."""

import random

import pytest

from zkvm_tpu.apps import Token, issue_program
from zkvm_tpu.constants import L
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.parallel import make_mesh
from zkvm_tpu.parallel.tx_batch import verify_tx_batch
from zkvm_tpu.proofs.errors import VerificationError
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import Tx, TxHeader, build_tx

BP = BulletproofGens(1024)
HEADER = TxHeader(1, 0, 10_000)


def _make_txs(k):
    txs = []
    for i in range(k):
        secret = 1000 + i
        pred = VerificationKey.from_secret(secret).point
        token = Token(pred, b"batch-%d" % i)
        prog, _, _ = issue_program(token, 10 + i, pred)
        tx, _ = build_tx(prog, HEADER, BP, {pred: secret})
        txs.append(Tx.from_bytes(tx.to_bytes()))
    return txs


def test_tx_batch_single_device():
    txs = _make_txs(3)
    verified = verify_tx_batch(txs, BP, mesh=None)
    assert len(verified) == 3
    assert all(len(v.outputs) == 1 for v in verified)


@pytest.mark.heavy
def test_tx_batch_on_mesh_and_poisoned():
    txs = _make_txs(3)
    mesh = make_mesh(dp=2, tp=4)
    verified = verify_tx_batch(txs, BP, mesh=mesh, wbits=8)
    assert len(verified) == 3

    # tamper with one signature byte: batch must fail
    raw = bytearray(txs[1].to_bytes())
    # signature field follows the program; flip a byte near the end of sig
    from zkvm_tpu.vm.tx import Tx as TxT
    t = TxT.from_bytes(bytes(raw))
    sig = bytearray(t.signature)
    sig[5] ^= 1
    t.signature = bytes(sig)
    bad_txs = [txs[0], TxT.from_bytes(t.to_bytes()), txs[2]]
    with pytest.raises(VerificationError):
        verify_tx_batch(bad_txs, BP, mesh=mesh, wbits=8)


def test_fused_tx_batch_matches_and_rejects():
    """fused_verify_tx_batch (one deduped RLC MSM for the whole batch) must
    accept exactly what the per-job path accepts and attribute a poisoned
    tx (VERDICT r4 task 5)."""
    from zkvm_tpu.parallel.tx_batch import (
        fused_verify_tx_batch, verify_tx_batch,
    )
    from zkvm_tpu.proofs.errors import VerificationError
    from zkvm_tpu.vm import Tx

    txs = _make_txs(3)
    ref = verify_tx_batch(txs, BP)
    got = fused_verify_tx_batch(txs, BP)
    assert [v.id for v in ref] == [v.id for v in got]

    bad_wire = bytearray(txs[1].to_bytes())
    bad_wire[-40] ^= 0x11
    bad = Tx.from_bytes(bytes(bad_wire))
    with pytest.raises(VerificationError, match="tx 1"):
        fused_verify_tx_batch([txs[0], bad, txs[2]], BP)


def test_fused_tx_batch_heterogeneous_circuit_sizes():
    """Mixed circuit sizes in one fused batch: a tiny expression-only tx
    (a few multipliers, small padded_n) alongside 64-bit-range issue txs
    (padded_n in the hundreds).  The G/H static-column accumulators must
    stay segment-aligned — positional accumulation of the flat
    [Bb,B]+G+H layout would pair the small tx's H scalars with G points
    and reject a fully valid batch (ADVICE r4 high #2)."""
    from zkvm_tpu.oracle import scalar as sc
    from zkvm_tpu.parallel.tx_batch import fused_verify_tx_batch
    from zkvm_tpu.vm import Instruction
    from zkvm_tpu.vm.constraints import Commitment
    from zkvm_tpu.vm.scalar_witness import ScalarWitness

    r = random.Random(7)
    com = Commitment.blinded(ScalarWitness.from_integer(21), r.randrange(L))
    small_prog = [
        Instruction("push", data=com.point, witness=com),
        Instruction("var"),
        Instruction("expr"),
        Instruction("push", data=sc.to_bytes(2)),
        Instruction("const"),
        Instruction("mul"),
        Instruction("push", data=sc.to_bytes(42)),
        Instruction("const"),
        Instruction("eq"),
        Instruction("verify"),
    ]
    small_tx, _ = build_tx(small_prog, HEADER, BP)
    small_tx = Tx.from_bytes(small_tx.to_bytes())

    txs = _make_txs(2)
    # small tx between / around the big ones, both orders
    for batch in ([txs[0], small_tx, txs[1]], [small_tx, txs[0], txs[1]],
                  [txs[0], txs[1], small_tx]):
        got = fused_verify_tx_batch(batch, BP)
        assert len(got) == 3

    # and a poisoned small tx in a mixed batch is still attributed
    bad_wire = bytearray(small_tx.to_bytes())
    bad_wire[-40] ^= 0x11
    bad = Tx.from_bytes(bytes(bad_wire))
    with pytest.raises(VerificationError):
        fused_verify_tx_batch([txs[0], bad, txs[1]], BP)
