"""JAX/XLA execution backend: the TPU compute path.

Ciphertext polynomials are [n_sub, N] uint32 limb-plane tensors; modular
arithmetic runs on 32-bit lanes (16-bit split mulhi + Montgomery
reduction) so the same compiled program runs bit-identically on TPU
(VPU/MXU integer ops) and CPU (test mesh). Data stays in the standard
residue domain; all precomputed operands — NTT twiddles, key-switch keys,
encoded plaintexts, inverse factors — are stored in Montgomery form, so
every multiply is a single mont_mul that also reduces unreduced inputs
(any a < 2^32 is a valid first operand)."""
