"""tpu-zkvm: a TPU-native Bulletproofs/ZkVM proving stack.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
interstellar/zkvm (the slingshot workspace + dalek-cryptography stack;
see /root/reference/README.md:1-7 and SURVEY.md for the structural map).

Layering (bottom → top), mirroring SURVEY.md §1:

- ``zkvm_tpu.oracle``   — pure-Python CPU reference ("ground truth"):
  GF(2^255-19), scalars mod ℓ, Edwards/Ristretto255, Keccak-f[1600],
  STROBE-128, Merlin transcripts.  Plays the role the u32/u64 serial
  backends play in curve25519-dalek: the bit-exact target every device
  kernel is property-tested against.
- ``zkvm_tpu.kernels``  — JAX/Pallas device kernels: lane-packed limb
  field arithmetic, batched Edwards point ops, Pippenger MSM.
- ``zkvm_tpu.proofs``   — Bulletproofs: generators, transcript protocol,
  inner-product argument, range proofs (single/aggregated/batched + MPC
  dealer/party), the two-phase R1CS constraint system.
- ``zkvm_tpu.gadgets``  — the Cloak gadget library (range, mix/merge/
  split, shuffle) a la slingshot/spacesuit.
- ``zkvm_tpu.vm``       — the ZkVM transaction machine: encoding,
  opcodes, typed stack items, constraints bridge, taproot predicates,
  contracts, txlog/TxID, prover/verifier drivers, deferred point ops.
- ``zkvm_tpu.crypto``   — starsig Schnorr, MuSig, keytree, Merkle trees.
- ``zkvm_tpu.chain``    — blockchain state machine, utreexo accumulator,
  mempool.
- ``zkvm_tpu.parallel`` — device-mesh runtime: sharded Pippenger MSM and
  multi-host batched proof verification via collectives.
"""

__version__ = "0.1.0"
