"""JAX/Pallas device kernels: lane-packed limb arithmetic for GF(2^255-19),
scalars mod ℓ, batched Edwards/Ristretto point ops, and the Pippenger MSM.

Design stance (SURVEY.md §7.1): arrays, not objects.  A batch of field elements
is int32[..., 20] in radix 2^13 (signed, lazily-carried); a batch of points is
four such arrays (X, Y, Z, T).  This generalizes the 4-way AVX2 vector backend
of curve25519-dalek (backend/vector/avx2) to TPU lane width.  Everything is
jnp-level first (portable CPU/TPU, oracle-parity-tested); Pallas variants of
the hot kernels live in pallas_field.py / pallas_msm.py.
"""
