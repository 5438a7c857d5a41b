"""Wire-format mutation fuzz: every public parser must either round-trip
or raise a TYPED error on corrupted input — never crash, hang, or accept
(upstream analogue: serde round-trip tests + Encodable error paths)."""

import random

import pytest

from zkvm_tpu.chain import BlockchainState
from zkvm_tpu.chain.block import Block
from zkvm_tpu.chain.protocol import encode_message, parse_message
from zkvm_tpu.chain.utreexo import Utreexo, UtreexoProof
from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
from zkvm_tpu.proofs.ipp import InnerProductProof
from zkvm_tpu.proofs.rangeproof import RangeProof
from zkvm_tpu.proofs.transcript import ProofTranscript
from zkvm_tpu.vm.tx import Tx

# a bounded set of exception types parsers may raise on garbage
ALLOWED = (ValueError, KeyError, IndexError, OverflowError, AssertionError)


def _typed_errors():
    from zkvm_tpu.chain.state import BlockchainError
    from zkvm_tpu.chain.utreexo import UtreexoError
    from zkvm_tpu.proofs.errors import ProofError
    from zkvm_tpu.vm.errors import FormatError, VMError
    return ALLOWED + (FormatError, VMError, ProofError, UtreexoError,
                      BlockchainError)


def _mutations(blob: bytes, rng: random.Random, rounds: int = 120):
    yield b""
    yield blob[: len(blob) // 2]
    yield blob + b"\x00"
    yield blob + blob[-8:]
    for _ in range(rounds):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0 and b:          # flip a byte
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        elif op == 1 and b:        # truncate
            del b[rng.randrange(len(b)):]
        else:                      # splice garbage
            i = rng.randrange(len(b) + 1)
            b[i:i] = rng.randbytes(rng.randrange(1, 9))
        yield bytes(b)


def _fuzz(parse, blob, seed):
    rng = random.Random(seed)
    errs = _typed_errors()
    accepted = 0
    for mut in _mutations(blob, rng):
        try:
            parse(mut)
            accepted += 1  # structurally valid mutation — fine, must not crash
        except errs:
            pass
    # sanity: the unmutated blob parses
    parse(blob)
    return accepted


def test_fuzz_rangeproof_and_ipp():
    pc, bp = PedersenGens(), BulletproofGens(16)
    proof, V = RangeProof.prove_single(
        bp, pc, ProofTranscript(b"fuzz"), 77, 5, 16
    )
    blob = proof.to_bytes()
    _fuzz(RangeProof.from_bytes, blob, 1)
    _fuzz(InnerProductProof.from_bytes, proof.ipp_proof.to_bytes(), 2)

    # every surviving mutation that parses must FAIL verification
    rng = random.Random(3)
    for mut in _mutations(blob, rng, rounds=40):
        try:
            p2 = RangeProof.from_bytes(mut)
        except _typed_errors():
            continue
        if mut == blob:
            continue
        with pytest.raises(Exception):
            p2.verify_single(bp, pc, ProofTranscript(b"fuzz"), V, 16)


def test_fuzz_utreexo_and_state():
    u = Utreexo()
    items = [b"leaf-%02d" % i for i in range(9)]
    c = u.update([], items)
    proof = c.proof_for_new_item(items[4])
    _fuzz(UtreexoProof.deserialize, proof.serialize(), 4)
    _fuzz(Utreexo.deserialize, u.serialize(), 5)

    from zkvm_tpu.chain.block import BlockHeader
    st = BlockchainState(
        tip=BlockHeader.make_initial(1234, u.state_hash()), utreexo=u
    )
    _fuzz(BlockchainState.deserialize, st.serialize(), 6)


def test_fuzz_protocol_messages():
    from zkvm_tpu.chain.protocol import (
        Blocks, GetBlocks, GetInventory, GetMempoolTxs, Inventory,
        MempoolTxs,
    )
    from zkvm_tpu.chain.block import BlockHeader

    tip = BlockHeader.make_initial(99, b"\x11" * 32)
    for msg in (
        GetInventory(1, 5),
        Inventory(tip, 5, [b"\xaa" * 6]),
        GetBlocks(b"\x22" * 32),
        Blocks([Block(tip, [], {})]),
        GetMempoolTxs(5, [b"\xbb" * 6]),
        MempoolTxs([b"tx-bytes"]),
    ):
        _fuzz(parse_message, encode_message(msg), 7)


def test_fuzz_tx_wire():
    """Tx.from_bytes on mutated wire: typed errors only; surviving parses
    must fail verify_tx."""
    from zkvm_tpu.apps import Token, issue_program
    from zkvm_tpu.crypto.starsig import VerificationKey
    from zkvm_tpu.vm import TxHeader, build_tx, verify_tx

    bp = BulletproofGens(1024)
    key = 777777
    pred = VerificationKey.from_secret(key).point
    prog, _, _ = issue_program(Token(pred, b"fuzz"), 5, pred)
    tx, _ = build_tx(prog, TxHeader(1, 0, 1 << 40), bp, {pred: key})
    blob = tx.to_bytes()
    _fuzz(Tx.from_bytes, blob, 8)

    rng = random.Random(9)
    for mut in _mutations(blob, rng, rounds=25):
        try:
            tx2 = Tx.from_bytes(mut)
        except _typed_errors():
            continue
        if mut == blob:
            continue
        with pytest.raises(Exception):
            verify_tx(tx2, bp)
