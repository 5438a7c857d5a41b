"""Bulletproofs proof system (L3): generators, transcript protocol, the
inner-product argument, range proofs (single/aggregated/batched + MPC
dealer/party), and the two-phase R1CS constraint system.

Upstream counterpart: the dalek-cryptography/bulletproofs crate, interstellar
fork with the `yoloproofs` R1CS feature (SURVEY.md §2.4).
"""

from .errors import ProofError, MPCError, R1CSError  # noqa: F401
