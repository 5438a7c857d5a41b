#!/usr/bin/env python
"""Generate the pinned cross-stack vector corpus (SURVEY Appendix A).

Run from the repo root: `python tests/vectors/generate.py` rewrites
pinned.json.  tests/test_pinned_vectors.py re-derives every entry and
fails on drift, so constant/label/wire-format changes must be deliberate
(regenerate + commit + explain).

Entries marked "external" are ground truths from public specs (RFC 9496,
merlin's README known-answer) — those may NEVER change; the rest pin this
stack's own derivations (generator chain, opcode bytes, TxID) against
accidental drift.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")


def build() -> dict:
    from zkvm_tpu import constants as C
    from zkvm_tpu.oracle.merlin import Transcript
    from zkvm_tpu.oracle.ristretto import BASEPOINT
    from zkvm_tpu.proofs.generators import BulletproofGens, PedersenGens
    from zkvm_tpu.vm.ops import OPCODES

    v = {}

    # --- external ground truths (specs; never regenerate these away)
    v["ristretto_basepoint"] = {
        "external": "RFC 9496",
        "hex": BASEPOINT.compress().hex(),
    }
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    v["merlin_known_answer"] = {
        "external": "merlin README",
        "hex": t.challenge_bytes(b"challenge", 32).hex(),
    }

    # --- field/scalar constants
    v["constants"] = {
        "P": hex(C.P), "L": hex(C.L), "EDWARDS_D": hex(C.EDWARDS_D),
        "SQRT_M1": hex(C.SQRT_M1),
    }

    # --- Pedersen + generator chain (SHAKE-256 seeding)
    pc = PedersenGens()
    bp = BulletproofGens(4, 2)
    v["pedersen_B_blinding"] = pc.B_blinding.compress().hex()
    v["bp_gens_first"] = {
        "G00": bp.share(0).G(1)[0].compress().hex(),
        "H00": bp.share(0).H(1)[0].compress().hex(),
        "G10": bp.share(1).G(1)[0].compress().hex(),
    }

    # --- ZkVM opcode byte table (wire format pin)
    v["opcodes"] = {name: code for name, code in sorted(OPCODES.items())}

    # --- TxID of a fixed issuance transaction with pinned blindings
    # (whole-stack wire pin: opcode encoding, issue/cloak/output semantics,
    # contract ids, txlog merkle labels)
    import random

    from zkvm_tpu.crypto.starsig import VerificationKey
    from zkvm_tpu.vm import Instruction, TxHeader, build_tx
    from zkvm_tpu.vm.constraints import Commitment
    from zkvm_tpu.vm.scalar_witness import ScalarWitness
    from zkvm_tpu.vm.vm import _flavor_scalar

    key = 424242
    pred = VerificationKey.from_secret(key).point
    r = random.Random(20260818)
    flavor = _flavor_scalar(pred, b"vector")
    qty_com = Commitment.blinded(
        ScalarWitness.from_integer(1000), r.randrange(C.L))
    out_qty = Commitment.blinded(
        ScalarWitness.from_integer(1000), r.randrange(C.L))
    out_flv = Commitment.blinded(
        ScalarWitness.from_scalar(flavor), r.randrange(C.L))
    prog = [
        Instruction("push", data=pred),
        Instruction("push", data=b"vector"),
        Instruction("push", data=qty_com.point, witness=qty_com),
        Instruction("issue"),
        Instruction("signtx"),
        Instruction("push", data=out_flv.point, witness=out_flv),
        Instruction("push", data=out_qty.point, witness=out_qty),
        Instruction("cloak", k=1, n=1),
        Instruction("push", data=pred),
        Instruction("output", k=1),
    ]
    _tx, verified = build_tx(prog, TxHeader(1, 0, 1 << 40),
                             BulletproofGens(1024), {pred: key})
    v["issue_txid"] = verified.id.hex()
    v["program_bytes_sha3"] = __import__("hashlib").sha3_256(
        __import__("zkvm_tpu.vm.ops", fromlist=["encode_program"]).encode_program(prog)
    ).hexdigest()
    return v


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "pinned.json")
    with open(out, "w") as f:
        json.dump(build(), f, indent=1, sort_keys=True)
    print(f"wrote {out}")
