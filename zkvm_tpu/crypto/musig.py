"""MuSig: n-of-n multisignatures with key aggregation.

Upstream counterpart: slingshot/musig/src/* — Multikey aggregation with
delinearization factors from a Merlin transcript, and the 3-round signing
state machine (nonce precommit -> nonce commit -> share), with share-level
error attribution.  Aggregated signatures verify exactly like starsig
signatures under the aggregated key.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from ..constants import L, LABEL_MUSIG
from ..oracle import scalar
from ..oracle.merlin import Transcript
from ..oracle.ristretto import BASEPOINT, RistrettoPoint
from ..proofs.engine import get_engine
from .starsig import Signature, VerificationKey, _challenge


class MusigError(Exception):
    def __init__(self, msg: str, bad_parties: list[int] | None = None):
        super().__init__(msg)
        self.bad_parties = bad_parties or []


@dataclass
class Multikey:
    """Aggregated key: X = sum_i a_i * X_i with delinearization factors
    a_i = H(<L>, X_i) (upstream Multikey)."""

    keys: list[VerificationKey]

    def _factor_transcript(self) -> Transcript:
        t = Transcript(LABEL_MUSIG)
        t.append_u64(b"n", len(self.keys))
        for k in self.keys:
            t.append_message(b"X", k.point)
        return t

    def factor(self, i: int) -> int:
        t = self._factor_transcript()
        t.append_u64(b"i", i)
        return scalar.from_bytes_mod_order_wide(t.challenge_bytes(b"a_i", 64))

    def aggregated_key(self) -> VerificationKey:
        if not self.keys:
            raise MusigError("empty multikey")
        from ..proofs.engine import get_engine
        agg = get_engine().msm(
            [self.factor(i) for i in range(len(self.keys))],
            [k.decompress() for k in self.keys],
        )
        return VerificationKey(agg.compress())


class Party:
    """One signer in the 3-round protocol (upstream party state machine)."""

    def __init__(self, multikey: Multikey, privkey: int, position: int,
                 transcript: Transcript):
        self.multikey = multikey
        self.x = privkey % L
        self.i = position
        self.transcript = transcript  # carries the message being signed
        self.r = (
            transcript.clone().build_rng()
            .rekey_with_witness_bytes(b"x", scalar.to_bytes(self.x))
            .finalize(os.urandom(32))
            .random_scalar()
        )
        self.R_i = get_engine().basepoint_mul(self.r).compress()

    # round 1: precommit H(R_i)
    def precommitment(self) -> bytes:
        t = Transcript(b"Musig.precommitment")
        t.append_message(b"R", self.R_i)
        return t.challenge_bytes(b"precommitment", 32)

    # round 2: reveal R_i
    def commitment(self) -> bytes:
        return self.R_i

    # round 3: share s_i given everyone's R
    def share(self, precommitments: list[bytes], commitments: list[bytes]) -> int:
        bad = []
        for j, (pre, com) in enumerate(zip(precommitments, commitments, strict=True)):
            t = Transcript(b"Musig.precommitment")
            t.append_message(b"R", com)
            if t.challenge_bytes(b"precommitment", 32) != pre:
                bad.append(j)
        if bad:
            raise MusigError("nonce precommitment mismatch", bad_parties=bad)
        R = _sum_compressed(commitments)
        X = self.multikey.aggregated_key()
        c = _challenge(self.transcript, X.point, R)
        a_i = self.multikey.factor(self.i)
        return (self.r + c * a_i % L * self.x) % L


def _sum_compressed(commitments: list[bytes]) -> bytes:
    acc = None
    for c in commitments:
        p = RistrettoPoint.decompress(c)
        acc = p if acc is None else acc + p
    return acc.compress()


def aggregate_shares(
    multikey: Multikey,
    transcript: Transcript,
    commitments: list[bytes],
    shares: list[int],
) -> Signature:
    """Dealer: s = sum s_i, R = sum R_i; verifies each share and attributes
    failures (upstream receive_trusted/untrusted pattern)."""
    R = _sum_compressed(commitments)
    X = multikey.aggregated_key()
    c = _challenge(transcript, X.point, R)
    bad = []
    for i, (R_i, s_i) in enumerate(zip(commitments, shares, strict=True)):
        # s_i * B == R_i + c * a_i * X_i
        lhs = get_engine().basepoint_mul(s_i, ct=False)
        a_i = multikey.factor(i)
        rhs = RistrettoPoint.decompress(R_i) + (
            multikey.keys[i].decompress() * (c * a_i % L)
        )
        if lhs != rhs:
            bad.append(i)
    if bad:
        raise MusigError("invalid signature shares", bad_parties=bad)
    return Signature(sum(shares) % L, R)


def sign_multi(
    privkeys: list[int], transcript: Transcript
) -> tuple[Signature, VerificationKey]:
    """Run the whole protocol locally (the single-process path used by the
    ZkVM prover driver for signtx)."""
    multikey = Multikey([VerificationKey.from_secret(x) for x in privkeys])
    parties = [
        Party(multikey, x, i, transcript.clone())
        for i, x in enumerate(privkeys)
    ]
    pres = [p.precommitment() for p in parties]
    coms = [p.commitment() for p in parties]
    shares = [p.share(pres, coms) for p in parties]
    sig = aggregate_shares(multikey, transcript, coms, shares)
    return sig, multikey.aggregated_key()
