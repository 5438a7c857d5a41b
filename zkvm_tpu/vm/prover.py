"""Prover driver: build a complete transaction.

Upstream counterpart: slingshot/zkvm/src/prover.rs (SURVEY.md §3.3):
run the VM with witnesses, collect constraints, compute the TxID, sign it
with MuSig over the signtx predicates, and produce the R1CS proof.
"""

from __future__ import annotations

from ..constants import LABEL_ZKVM_R1CS, LABEL_ZKVM_TXID
from ..crypto import musig
from ..oracle.merlin import Transcript
from ..proofs.generators import BulletproofGens, PedersenGens
from ..proofs.r1cs import Prover as R1CSProver
from ..proofs.transcript import ProofTranscript
from .constraints import Commitment
from .errors import UnsignedTx, VMError
from .ops import Instruction, encode_program
from .tx import Tx, TxHeader, VerifiedTx
from .vm import VM


class _ProverDelegate:
    is_prover = True

    def __init__(self, cs: R1CSProver):
        self.cs = cs
        self._committed: dict[bytes, object] = {}

    def commit_variable(self, commitment: Commitment):
        cached = self._committed.get(commitment.point)
        if cached is not None:
            return cached
        value, blinding = commitment.ensure_open()
        _, var = self.cs.commit(value.to_scalar(), blinding)
        self._committed[commitment.point] = var
        return var


def build_tx(
    program: list[Instruction],
    header: TxHeader,
    bp_gens: BulletproofGens,
    signing_keys: dict[bytes, int] | None = None,
) -> tuple[Tx, VerifiedTx]:
    """Build and sign a transaction.

    signing_keys maps predicate points (compressed) to the secret scalars
    whose public keys they are — needed for every `signtx` contract.
    Returns (tx, its VerifiedTx view as seen by the prover).
    """
    pc_gens = PedersenGens()
    transcript = ProofTranscript(LABEL_ZKVM_R1CS)
    cs = R1CSProver(pc_gens, transcript)
    delegate = _ProverDelegate(cs)

    vm = VM(header, program, delegate)
    vm.run()
    vm.check_stack_clean()

    txid = vm.finalize_txid()

    # sign txid with musig over the aggregated signtx predicate keys
    if vm.signtx_keys:
        signing_keys = signing_keys or {}
        try:
            privs = [signing_keys[p] for p in vm.signtx_keys]
        except KeyError as e:
            raise UnsignedTx(f"missing signing key for predicate") from e
        sig_transcript = Transcript(LABEL_ZKVM_TXID)
        sig_transcript.append_message(b"txid", txid)
        sig, _ = musig.sign_multi(privs, sig_transcript)
        signature = sig.to_bytes()
    else:
        signature = b"\x00" * 64

    proof = cs.prove(bp_gens)

    tx = Tx(
        header=header,
        program=encode_program(program),
        signature=signature,
        proof=proof.to_bytes(),
    )
    verified = VerifiedTx(
        header=header, id=txid, log=vm.txlog, fee=vm.total_fee
    )
    return tx, verified
