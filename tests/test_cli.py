"""CLI surface tests (upstream analogue: the demo node's HTTP endpoints —
SURVEY.md §2.8 'replace with CLI'): every subcommand except the device
bench runs end-to-end and emits parseable JSON."""

import json
import random

import pytest

from zkvm_tpu import cli


def _run(capsys, argv):
    cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_keygen_and_rangeproof(capsys):
    key = _run(capsys, ["keygen"])
    assert len(bytes.fromhex(key["predicate"])) == 32
    rp = _run(capsys, ["rangeproof", "--bits", "32", "-v", "123456"])
    assert rp["bits"] == 32 and rp["proof_bytes"] > 0
    assert len(bytes.fromhex(rp["commitment"])) == 32


def test_cli_issue_verify_round_trip(tmp_path, capsys, monkeypatch):
    # deterministic key for the tx builder
    monkeypatch.setattr(random, "seed", lambda *a: None, raising=False)
    key = _run(capsys, ["keygen"])
    key_file = tmp_path / "key.json"
    key_file.write_text(json.dumps(key))
    tx_file = tmp_path / "tx.bin"
    issued = _run(capsys, [
        "issue", "--key-file", str(key_file), "--qty", "42",
        "--out", str(tx_file),
    ])
    assert issued["outputs"] == 1
    verified = _run(capsys, ["verify", "--tx-file", str(tx_file)])
    assert verified["txid"] == issued["txid"]

    # corrupting the wire must fail
    blob = bytearray(tx_file.read_bytes())
    blob[-5] ^= 0x10
    tx_file.write_bytes(bytes(blob))
    with pytest.raises(Exception):
        _run(capsys, ["verify", "--tx-file", str(tx_file)])


def test_cli_node_demo(capsys):
    out = _run(capsys, ["node-demo", "--blocks", "2", "--qty", "9"])
    assert out["tips_agree"] is True
    assert out["height"] == 3
    assert out["live_utxos"] == 1


def test_cli_batch_verify(capsys):
    import json

    from zkvm_tpu.cli import main

    main(["batch-verify", "--count", "3", "--bits", "8"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == 3 and out["batch_verify_ms"] > 0
