"""Fused tx-batch DEVICE mega-check parity (parallel/tx_batch.py device
path: resident static gens + on-device decompress + packed-scalar upload,
kernels/batch_verify_device.txbatch_msm_check).

Upstream counterpart: verifier.rs + PointOp::verify_batch single MSM
[SURVEY §3.4]; the device graph must accept exactly the batches the host
engine accepts and reject corrupted ones.
"""

import os
import random
import subprocess
import sys

import pytest

from zkvm_tpu.apps import Token, issue_program
from zkvm_tpu.constants import L
from zkvm_tpu.crypto.starsig import VerificationKey
from zkvm_tpu.parallel.tx_batch import fused_verify_tx_batch
from zkvm_tpu.proofs.errors import VerificationError
from zkvm_tpu.proofs.generators import BulletproofGens
from zkvm_tpu.vm import Tx, TxHeader, build_tx


def _mk_txs(n, bp, seed=7):
    header = TxHeader(1, 0, 10_000)
    r = random.Random(seed)
    txs = []
    for i in range(n):
        secret = r.randrange(1, L)
        pred = VerificationKey.from_secret(secret).point
        prog, _, _ = issue_program(Token(pred, b"t%d" % i), 10 + i, pred)
        tx, _ = build_tx(prog, header, bp, {pred: secret})
        txs.append(Tx.from_bytes(tx.to_bytes()))
    return txs


@pytest.mark.heavy
def test_fused_tx_device_parity_and_soundness(monkeypatch):
    """Device graph (interpret on CPU) accepts a valid batch the host path
    accepts, and rejects a corrupted proof."""
    bp = BulletproofGens(1024)
    txs = _mk_txs(3, bp)

    monkeypatch.setenv("ZKVM_TX_DEVICE", "0")
    host_out = fused_verify_tx_batch(txs, bp, entropy=b"\x05" * 32)
    assert len(host_out) == 3

    monkeypatch.setenv("ZKVM_TX_DEVICE", "1")
    dev_out = fused_verify_tx_batch(txs, bp, entropy=b"\x05" * 32)
    assert len(dev_out) == 3
    assert [v.id for v in dev_out] == [v.id for v in host_out]

    bad_wire = bytearray(txs[1].to_bytes())
    bad_wire[-40] ^= 1
    bad = [txs[0], Tx.from_bytes(bytes(bad_wire)), txs[2]]
    with pytest.raises(VerificationError):
        fused_verify_tx_batch(bad, bp, entropy=b"\x05" * 32,
                              attribute_failures=False)
