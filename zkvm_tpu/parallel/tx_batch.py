"""Batched full-transaction verification over the device mesh
(BASELINE config 4: "full ZkVM tx verification, proofs sharded across a
multi-host pod").

Per tx, the host replays the VM (microseconds with the native transcript)
producing (a) the R1CS mega-check MSM job and (b) the deferred PointOps
(signatures, taproot, unblind).  All R1CS jobs become one group each; all
PointOps across the whole batch fold into ONE extra random-linear-
combination group (upstream PointOp::verify_batch, SURVEY §3.4).  Groups
shard over the mesh `dp` axis, each MSM over `tp`.
"""

from __future__ import annotations

import hashlib

from ..constants import L
from ..oracle.ristretto import RistrettoPoint
from ..proofs.errors import VerificationError
from ..proofs.generators import BulletproofGens, PedersenGens
from ..vm.point_ops import PointOp
from ..vm.tx import Tx, VerifiedTx
from ..vm.verifier import precompute_tx
from .batch_verify import sharded_batch_verify_jobs


def _point_ops_job(all_ops: list[PointOp], entropy: bytes):
    """Fold every deferred PointOp into one MSM job (random weights)."""
    pc = PedersenGens()
    h = hashlib.sha3_512()
    h.update(entropy)
    for op in all_ops:
        h.update(b"op")
        h.update((op.primary or 0).to_bytes(32, "little"))
        h.update((op.secondary or 0).to_bytes(32, "little"))
        for w, p in op.arbitrary:
            h.update(int(w % L).to_bytes(32, "little"))
            h.update(p)
    seed = h.digest()

    prim = sec = 0
    scalars: list[int] = []
    points: list[RistrettoPoint] = []
    for i, op in enumerate(all_ops):
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
    return [prim, sec] + scalars, [pc.B, pc.B_blinding] + points


def verify_tx_batch(
    txs: list[Tx],
    bp_gens: BulletproofGens,
    mesh=None,
    wbits: int = 8,
    entropy: bytes = b"\x07" * 32,
) -> list[VerifiedTx]:
    """Verify a batch of transactions with all group math on the mesh.

    Host: VM replay + transcripts per tx.  Device: one grouped MSM dispatch
    covering every tx's R1CS mega-check plus one combined point-op check.
    Raises VerificationError if any check fails (group attribution in the
    error message).
    """
    if not txs:
        return []
    verified: list[VerifiedTx] = []
    jobs = []
    all_ops: list[PointOp] = []
    for tx in txs:
        vtx, point_ops, r1cs_job = precompute_tx(tx, bp_gens)
        verified.append(vtx)
        jobs.append(r1cs_job)
        all_ops.extend(point_ops)
    if all_ops:
        jobs.append(_point_ops_job(all_ops, entropy))

    if mesh is None:
        # single-device fallback: engine-checked job by job
        from ..proofs.engine import get_engine
        eng = get_engine()
        for i, (scalars, points) in enumerate(jobs):
            if not eng.msm_is_identity(scalars, points):
                raise VerificationError(f"tx batch check failed (job {i})")
    else:
        sharded_batch_verify_jobs(mesh, jobs, wbits=wbits)
    return verified


def fused_verify_tx_batch(
    txs: list[Tx],
    bp_gens: BulletproofGens,
    entropy: bytes = b"\x07" * 32,
    attribute_failures: bool = True,
) -> list[VerifiedTx]:
    """Single-chip fused tx batch verification (VERDICT r4 task 5): every
    tx's R1CS mega-check and the combined point-op check fold into ONE MSM
    (per-job random weights, exactly upstream PointOp::verify_batch's
    random-linear-combination argument applied across jobs), with points
    DEDUPED across txs — the bp/pc generator columns appear once for the
    whole batch, so the device MSM grows ~O(unique proof points) rather
    than O(txs * gens).  One engine dispatch verifies the whole batch.

    Host precompute (VM replay + transcripts) runs on a thread pool: the
    native STROBE/scalar calls release the GIL.

    Raises VerificationError on a bad batch; when attribute_failures, falls
    back to per-job checks to name the failing tx (slow path, only on
    failure — upstream batch verification has the same rejection shape).
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    from ..proofs.engine import get_engine

    if not txs:
        return []
    workers = int(os.environ.get("ZKVM_HOST_THREADS", "0")) or min(
        4, len(txs))
    if workers > 1:
        with ThreadPoolExecutor(workers) as ex:
            pre = list(ex.map(lambda tx: precompute_tx(tx, bp_gens), txs))
    else:
        pre = [precompute_tx(tx, bp_gens) for tx in txs]

    verified = [p[0] for p in pre]
    jobs = [p[2] for p in pre]
    all_ops: list[PointOp] = []
    for p in pre:
        all_ops.extend(p[1])
    if all_ops:
        jobs.append(_point_ops_job(all_ops, entropy))

    # batch randomness bound to the whole batch content
    h = hashlib.sha3_512()
    h.update(entropy)
    for vtx in verified:
        h.update(vtx.id)
    seed = h.digest()

    acc: dict[tuple, int] = {}   # point.ep -> accumulated scalar
    pts: dict[tuple, RistrettoPoint] = {}
    for i, (scalars, points) in enumerate(jobs):
        r = int.from_bytes(
            hashlib.sha3_512(seed + i.to_bytes(8, "little")).digest(),
            "little") % L
        for s, p in zip(scalars, points, strict=True):
            key = p.ep
            acc[key] = (acc.get(key, 0) + r * s) % L
            pts.setdefault(key, p)

    eng = get_engine()
    if not eng.msm_is_identity(list(acc.values()),
                               [pts[k] for k in acc]):
        if attribute_failures:
            for i, (scalars, points) in enumerate(jobs):
                if not eng.msm_is_identity(scalars, points):
                    which = (f"tx {i}" if i < len(txs)
                             else "combined point-op check")
                    raise VerificationError(
                        f"fused tx batch verification failed ({which})")
        raise VerificationError("fused tx batch verification failed")
    return verified
