"""Cross-stack bit-exactness corpus (SURVEY Appendix A): every entry of
tests/vectors/pinned.json re-derives from the live stack.  Drift in
constants, transcript labels, generator seeding, opcode bytes, or the tx
wire format fails here — regenerate with tests/vectors/generate.py ONLY
for deliberate format changes (entries marked "external" are spec ground
truths and must never change)."""

import json
import os
import sys


def test_pinned_vectors_rederive():
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "vectors", "pinned.json")) as f:
        pinned = json.load(f)
    sys.path.insert(0, os.path.join(here, "vectors"))
    try:
        import generate
        fresh = generate.build()
    finally:
        sys.path.pop(0)
    assert fresh == pinned

    # spec ground truths, hardcoded here so a regenerated corpus cannot
    # silently launder a break of the external contracts
    assert pinned["ristretto_basepoint"]["hex"] == (
        "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76")
    assert pinned["merlin_known_answer"]["hex"] == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615")
