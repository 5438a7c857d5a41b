"""Pure-Python CPU oracle: the bit-exact ground truth for every device kernel.

Plays the role the serial u32/u64 backends play upstream in curve25519-dalek
(backend cross-agreement testing, SURVEY.md §4): slow but trivially auditable
big-int implementations of the field, scalar, Edwards/Ristretto255 group,
Keccak-f[1600], STROBE-128, and Merlin transcripts.
"""
