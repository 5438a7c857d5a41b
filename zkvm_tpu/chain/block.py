"""Blocks and block headers.

Upstream counterpart: slingshot/blockchain/src/block.rs — BlockHeader
{version, height, prev, timestamp_ms, txroot, utxoroot, ext}, BlockID via
Merlin hashing, Block = header + txs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..crypto.merkle import MerkleTree
from ..oracle.merlin import Transcript
from ..vm.encoding import Reader, Writer
from ..vm.tx import Tx

_LABEL = b"ZkVM.block"


@dataclass
class BlockHeader:
    version: int
    height: int
    prev: bytes           # 32-byte previous block id
    timestamp_ms: int
    txroot: bytes         # merkle root of witness tx hashes
    utxoroot: bytes       # utreexo state hash
    ext: bytes = b""

    def encode(self, w: Writer):
        w.write_u64(self.version)
        w.write_u64(self.height)
        w.write_bytes(self.prev)
        w.write_u64(self.timestamp_ms)
        w.write_bytes(self.txroot)
        w.write_bytes(self.utxoroot)
        w.write_prefixed_bytes(self.ext)

    @staticmethod
    def parse(r: Reader) -> "BlockHeader":
        return BlockHeader(
            version=r.read_u64(), height=r.read_u64(), prev=r.read_u8x32(),
            timestamp_ms=r.read_u64(), txroot=r.read_u8x32(),
            utxoroot=r.read_u8x32(), ext=r.read_prefixed_bytes(),
        )

    @staticmethod
    def make_initial(timestamp_ms: int, utxoroot: bytes) -> "BlockHeader":
        return BlockHeader(
            version=1, height=1, prev=b"\x00" * 32,
            timestamp_ms=timestamp_ms,
            txroot=MerkleTree.root_of(_LABEL, []),
            utxoroot=utxoroot,
        )


def block_id(header: BlockHeader) -> bytes:
    w = Writer()
    header.encode(w)
    t = Transcript(_LABEL)
    t.append_message(b"header", w.to_bytes())
    return t.challenge_bytes(b"id", 32)


def txroot(txs: list[Tx]) -> bytes:
    return MerkleTree.root_of(_LABEL, [tx.witness_hash() for tx in txs])


@dataclass
class Block:
    header: BlockHeader
    txs: list[Tx] = field(default_factory=list)

    def id(self) -> bytes:
        return block_id(self.header)
