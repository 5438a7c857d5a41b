"""Command-line interface (replaces the upstream actix demo node per
SURVEY.md §2.8: "replace with CLI + benchmark harness").

  python -m zkvm_tpu.cli keygen                      -> secret/predicate pair
  python -m zkvm_tpu.cli issue --key-file k.json ... -> build+verify an issue tx
  python -m zkvm_tpu.cli verify --tx-file tx.bin     -> verify a serialized tx
  python -m zkvm_tpu.cli bench-msm --log-n 14        -> device MSM benchmark
  python -m zkvm_tpu.cli rangeproof --bits 64 -v 123 -> prove+verify roundtrip
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _cmd_keygen(args):
    from .constants import L
    from .crypto.starsig import VerificationKey
    from .oracle import scalar as sc
    secret = sc.from_bytes_mod_order_wide(os.urandom(64))
    pred = VerificationKey.from_secret(secret).point
    out = {"secret": hex(secret), "predicate": pred.hex()}
    print(json.dumps(out))


def _cmd_rangeproof(args):
    from .proofs.generators import BulletproofGens, PedersenGens
    from .proofs.rangeproof import RangeProof
    from .proofs.transcript import ProofTranscript
    from .oracle import scalar as sc

    pc, bp = PedersenGens(), BulletproofGens(args.bits)
    blinding = sc.from_bytes_mod_order_wide(os.urandom(64))
    t0 = time.time()
    proof, V = RangeProof.prove_single(
        bp, pc, ProofTranscript(b"zkvm_tpu.cli"), args.value, blinding, args.bits
    )
    t_prove = time.time() - t0
    wire = proof.to_bytes()
    t0 = time.time()
    RangeProof.from_bytes(wire).verify_single(
        bp, pc, ProofTranscript(b"zkvm_tpu.cli"), V, args.bits
    )
    t_verify = time.time() - t0
    print(json.dumps({
        "bits": args.bits, "proof_bytes": len(wire),
        "prove_ms": round(t_prove * 1e3, 1),
        "verify_ms": round(t_verify * 1e3, 1),
        "commitment": V.hex(),
    }))


def _cmd_batch_verify(args):
    """Prove a batch of range proofs, then verify them all in ONE combined
    MSM — on the device engine's fused pipeline when a TPU backend is up,
    the host-assembled combined check otherwise."""
    from .constants import L
    from .oracle import scalar as sc
    from .proofs.engine import set_engine
    from .proofs.generators import BulletproofGens, PedersenGens
    from .proofs.rangeproof import RangeProof, batch_verify
    from .proofs.transcript import ProofTranscript

    pc, bp = PedersenGens(), BulletproofGens(args.bits)
    proofs, transcripts, vcs = [], [], []
    t0 = time.time()
    for i in range(args.count):
        proof, V = RangeProof.prove_single(
            bp, pc, ProofTranscript(b"zkvm_tpu.cli.batch"),
            (args.value + i) % (1 << args.bits),
            sc.from_bytes_mod_order_wide(os.urandom(64)), args.bits,
        )
        proofs.append(proof)
        transcripts.append(ProofTranscript(b"zkvm_tpu.cli.batch"))
        vcs.append([V])
    t_prove = time.time() - t0

    engine = "host"
    if args.engine == "jax":
        from .kernels.engine import JaxEngine
        eng = JaxEngine()
        set_engine(eng)
        engine = ("jax-fused" if eng.supports_fused_batch_verify
                  else "jax(host-route)")
    t0 = time.time()
    batch_verify(proofs, bp, pc, transcripts, vcs, args.bits)
    t_verify = time.time() - t0
    print(json.dumps({
        "count": args.count, "bits": args.bits, "engine": engine,
        "prove_ms_total": round(t_prove * 1e3, 1),
        "batch_verify_ms": round(t_verify * 1e3, 1),
        "verifies_per_sec": round(args.count / t_verify, 1),
    }))


def _cmd_issue(args):
    from .apps import Token, issue_program
    from .proofs.generators import BulletproofGens
    from .vm import Tx, TxHeader, build_tx, verify_tx

    with open(args.key_file) as f:
        key = json.load(f)
    secret = int(key["secret"], 16)
    pred = bytes.fromhex(key["predicate"])
    token = Token(pred, args.metadata.encode())
    program, out_qty, out_flv = issue_program(token, args.qty, pred)
    bp = BulletproofGens(1024)
    tx, verified = build_tx(
        program, TxHeader(1, 0, 2**63 - 1), bp, {pred: secret}
    )
    verify_tx(Tx.from_bytes(tx.to_bytes()), bp)
    if args.out:
        with open(args.out, "wb") as f:
            f.write(tx.to_bytes())
    print(json.dumps({
        "txid": verified.id.hex(), "tx_bytes": len(tx.to_bytes()),
        "outputs": len(verified.outputs), "flavor": hex(token.flavor),
    }))


def _cmd_verify(args):
    from .proofs.generators import BulletproofGens
    from .vm import Tx, verify_tx

    with open(args.tx_file, "rb") as f:
        tx = Tx.from_bytes(f.read())
    t0 = time.time()
    verified = verify_tx(tx, BulletproofGens(1024))
    print(json.dumps({
        "txid": verified.id.hex(),
        "log": [e.kind for e in verified.log],
        "fee": verified.fee,
        "verify_ms": round((time.time() - t0) * 1e3, 1),
    }))


def _cmd_node_demo(args):
    """Two-node blockchain demo: A issues a token and mines, B cold-syncs
    over the wire protocol, a tx relays via short ids, B mines it, A
    catches up (the role of the upstream actix demo node)."""
    import random

    from .apps import Token, issue_program
    from .chain import BlockchainState
    from .chain.block import block_id
    from .chain.node import Node, sync
    from .crypto.starsig import VerificationKey
    from .oracle import scalar as sc
    from .proofs.generators import BulletproofGens
    from .vm import TxHeader, build_tx
    from .vm.constraints import Commitment
    from .vm.contract import parse_contract
    from .vm.scalar_witness import ScalarWitness
    from .vm.types import Value

    r = random.Random(args.seed)
    bp = BulletproofGens(1024)
    secret = sc.from_bytes_mod_order_wide(r.getrandbits(512).to_bytes(64, "little"))
    pred = VerificationKey.from_secret(secret).point
    header = TxHeader(1, 0, 2**63 - 1)

    a = Node(BlockchainState.make_initial(timestamp_ms=1000), bp)
    b = Node(BlockchainState.make_initial(timestamp_ms=1000), bp)

    token = Token(pred, b"cli-demo")
    prog, out_qty, out_flv = issue_program(token, args.qty, pred)
    tx, v = build_tx(prog, header, bp, {pred: secret})
    a.submit_tx(tx)
    blk = a.make_block(timestamp_ms=2000)

    from .constants import L
    out_bytes = v.outputs[0]
    for i in range(args.blocks - 1):
        c = parse_contract(out_bytes)
        c.payload = [Value(out_qty, out_flv)]
        nq = Commitment.blinded(out_qty.ensure_open()[0], r.randrange(L))
        nf = Commitment.blinded(out_flv.ensure_open()[0], r.randrange(L))
        from .vm import Instruction
        prog2 = [
            Instruction("push", data=out_bytes, witness=c),
            Instruction("input"), Instruction("signtx"),
            Instruction("push", data=nf.point, witness=nf),
            Instruction("push", data=nq.point, witness=nq),
            Instruction("cloak", k=1, n=1),
            Instruction("push", data=pred), Instruction("output", k=1),
        ]
        tx, v = build_tx(prog2, header, bp, {pred: secret})
        a.submit_tx(tx)
        a.make_block(timestamp_ms=3000 + i)
        out_bytes = v.outputs[0]
        out_qty, out_flv = nq, nf

    rounds = sync(b, a)
    ok = block_id(a.tip) == block_id(b.tip)
    print(json.dumps({
        "height": b.tip.height,
        "sync_rounds": rounds,
        "tips_agree": ok,
        "utxoroot": b.state.utreexo.state_hash().hex(),
        "live_utxos": len(b.utxos.proofs),
    }))
    if not ok:
        sys.exit(1)


def _cmd_bench_msm(args):
    os.environ["BENCH_LOG_N"] = str(args.log_n)
    os.environ["BENCH_WBITS"] = str(args.wbits)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    bench.main()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zkvm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("keygen").set_defaults(fn=_cmd_keygen)

    bv = sub.add_parser("batch-verify")
    bv.add_argument("--count", type=int, default=32)
    bv.add_argument("--bits", type=int, default=64)
    bv.add_argument("--value", type=int, default=1234)
    bv.add_argument("--engine", choices=["host", "jax"], default="host")
    bv.set_defaults(fn=_cmd_batch_verify)

    rp = sub.add_parser("rangeproof")
    rp.add_argument("--bits", type=int, default=64, choices=[8, 16, 32, 64])
    rp.add_argument("-v", "--value", type=int, default=1234567)
    rp.set_defaults(fn=_cmd_rangeproof)

    iss = sub.add_parser("issue")
    iss.add_argument("--key-file", required=True)
    iss.add_argument("--qty", type=int, default=100)
    iss.add_argument("--metadata", default="cli-token")
    iss.add_argument("--out")
    iss.set_defaults(fn=_cmd_issue)

    ver = sub.add_parser("verify")
    ver.add_argument("--tx-file", required=True)
    ver.set_defaults(fn=_cmd_verify)

    nd = sub.add_parser("node-demo")
    nd.add_argument("--blocks", type=int, default=3)
    nd.add_argument("--qty", type=int, default=100)
    nd.add_argument("--seed", type=int, default=7)
    nd.set_defaults(fn=_cmd_node_demo)

    bm = sub.add_parser("bench-msm")
    bm.add_argument("--log-n", type=int, default=16)
    bm.add_argument("--wbits", type=int, default=16)
    bm.set_defaults(fn=_cmd_bench_msm)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
