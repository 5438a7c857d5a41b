"""Deferred point operations — THE key TPU interface of the verifier.

Upstream counterpart: slingshot/zkvm point_ops / musig BatchVerification
(SURVEY.md §2.6): every signature check, taproot check, and (optionally) the
R1CS mega-check is expressed as a PointOp and funneled into ONE random-
linear-combination MSM per transaction batch — which the engine executes as
a single device Pippenger kernel (and shards across hosts in zkvm_tpu.parallel).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..constants import L
from ..oracle.ristretto import RistrettoPoint
from ..proofs.engine import get_engine
from ..proofs.generators import PedersenGens
from .errors import InvalidSignature


@dataclass
class PointOp:
    """primary*B + secondary*B_blinding + sum_i w_i*P_i == 0"""
    primary: int | None = None
    secondary: int | None = None
    arbitrary: list[tuple[int, bytes]] = field(default_factory=list)

    def verify(self) -> None:
        verify_batch([self])


def verify_batch(ops: list["PointOp"], entropy: bytes = b"") -> None:
    """Combine all ops with random weights into one MSM == identity.

    Weights are derived by hashing the ops themselves plus caller entropy, so
    a malicious prover cannot craft cancelling ops without breaking the hash.
    """
    if not ops:
        return
    pc = PedersenGens()

    h = hashlib.sha3_512()
    h.update(entropy)
    for op in ops:
        h.update(b"op")
        h.update((op.primary or 0).to_bytes(32, "little"))
        h.update((op.secondary or 0).to_bytes(32, "little"))
        for w, p in op.arbitrary:
            h.update(int(w % L).to_bytes(32, "little"))
            h.update(p)
    seed = h.digest()

    prim = 0
    sec = 0
    scalars: list[int] = []
    points: list[RistrettoPoint] = []
    for i, op in enumerate(ops):
        r = int.from_bytes(
            hashlib.sha3_512(seed + i.to_bytes(8, "little")).digest(), "little"
        ) % L
        if op.primary is not None:
            prim = (prim + r * op.primary) % L
        if op.secondary is not None:
            sec = (sec + r * op.secondary) % L
        for w, pbytes in op.arbitrary:
            scalars.append(r * (w % L) % L)
            points.append(RistrettoPoint.decompress(pbytes))
    scalars = [prim, sec] + scalars
    points = [pc.B, pc.B_blinding] + points

    if not get_engine().msm_is_identity(scalars, points):
        raise InvalidSignature("batched point-op verification failed")
