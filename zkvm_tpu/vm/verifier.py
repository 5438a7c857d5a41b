"""Verifier driver: verify a serialized transaction.

Upstream counterpart: slingshot/zkvm/src/verifier.rs (SURVEY.md §3.4):
replay the VM with opaque commitments, collect deferred point ops (taproot,
signid/signtag, unblind, plus the tx signature), verify the R1CS proof, and
fold every point op into one batched MSM.  `verification_jobs` exposes the
seam used to batch across a whole block of txs (sharded in zkvm_tpu.parallel).
"""

from __future__ import annotations

from ..constants import L, LABEL_ZKVM_R1CS, LABEL_ZKVM_TXID
from ..crypto.musig import Multikey
from ..crypto.starsig import Signature, VerificationKey, verify_op
from ..oracle.merlin import Transcript
from ..proofs.generators import BulletproofGens, PedersenGens
from ..proofs.r1cs import R1CSProof
from ..proofs.r1cs import Verifier as R1CSVerifier
from ..proofs.transcript import ProofTranscript
from .constraints import Commitment
from .errors import UnsignedTx, VMError
from .point_ops import PointOp, verify_batch
from .tx import Tx, VerifiedTx
from .vm import VM


class _VerifierDelegate:
    is_prover = False

    def __init__(self, cs: R1CSVerifier):
        self.cs = cs
        self._committed: dict[bytes, object] = {}

    def commit_variable(self, commitment: Commitment):
        cached = self._committed.get(commitment.point)
        if cached is not None:
            return cached
        var = self.cs.commit(commitment.point)
        self._committed[commitment.point] = var
        return var


def _replay_tx(tx: Tx, bp_gens: BulletproofGens):
    pc_gens = PedersenGens()
    transcript = ProofTranscript(LABEL_ZKVM_R1CS)
    cs = R1CSVerifier(transcript)
    delegate = _VerifierDelegate(cs)

    vm = VM(tx.header, tx.program, delegate)
    vm.run()
    vm.check_stack_clean()
    txid = vm.finalize_txid()

    point_ops = list(vm.point_ops)

    # tx signature over txid by the aggregated signtx predicate keys
    if vm.signtx_keys:
        sig = Signature.from_bytes(tx.signature)
        multikey = Multikey([VerificationKey(p) for p in vm.signtx_keys])
        agg = multikey.aggregated_key()
        sig_transcript = Transcript(LABEL_ZKVM_TXID)
        sig_transcript.append_message(b"txid", txid)
        point_ops.append(verify_op(sig, sig_transcript, agg))
    elif tx.signature != b"\x00" * 64:
        raise UnsignedTx("unexpected signature on unsigned tx")

    proof = R1CSProof.from_bytes(tx.proof)
    verified = VerifiedTx(
        header=tx.header, id=txid, log=vm.txlog, fee=vm.total_fee
    )
    return verified, point_ops, cs, proof, pc_gens


def precompute_tx(tx: Tx, bp_gens: BulletproofGens):
    """Replay the VM and emit everything needed for (batched) verification:
    (VerifiedTx, point_ops, r1cs (scalars, points) job)."""
    verified, point_ops, cs, proof, pc_gens = _replay_tx(tx, bp_gens)
    r1cs_job = cs.verification_job(proof, bp_gens, pc_gens)
    return verified, point_ops, r1cs_job


def precompute_tx_split(tx: Tx, bp_gens: BulletproofGens):
    """precompute_tx with the R1CS job split into dynamic terms and
    shared-static-column scalars (parallel/tx_batch.py worker form):
    (VerifiedTx, point_ops, (dyn_scalars, dyn_points, static_scalars,
    padded_n)) — static convention [B_blinding, B] + G + H."""
    verified, point_ops, cs, proof, pc_gens = _replay_tx(tx, bp_gens)
    split = cs.verification_job_split(proof, bp_gens, pc_gens)
    return verified, point_ops, split


def precompute_tx_split_vec(tx: Tx, bp_gens: BulletproofGens,
                            decompress_dyn: bool = True):
    """precompute_tx_split with the static G/H column scalars kept as
    native ScalarVecs (the tx-batch worker form): (VerifiedTx, point_ops,
    (dyn_scalars, dyn_points, bb, bs, g_vec, h_vec, padded_n)).  With
    decompress_dyn=False the dyn points stay as raw 32-byte encodings
    for device-side decode."""
    verified, point_ops, cs, proof, pc_gens = _replay_tx(tx, bp_gens)
    split = cs.verification_job_split_vec(
        proof, bp_gens, pc_gens, decompress_dyn=decompress_dyn)
    return verified, point_ops, split


def verify_tx(tx: Tx, bp_gens: BulletproofGens) -> VerifiedTx:
    """Full single-tx verification (upstream Verifier::verify_tx)."""
    verified, point_ops, (scalars, points) = precompute_tx(tx, bp_gens)
    from ..proofs.engine import get_engine
    if not get_engine().msm_is_identity(scalars, points):
        from ..proofs.errors import VerificationError
        raise VerificationError("R1CS proof verification failed")
    verify_batch(point_ops)
    return verified
