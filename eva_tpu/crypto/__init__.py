"""CKKS crypto runtime: the TPU-native replacement for the external SEAL
library the reference delegates to (surface inventoried in SURVEY.md §2.8).

Design: every RNS sub-prime is < 2^31 so residue arithmetic fits machine
words on both numpy (uint64 products) and TPU (32-bit Montgomery lanes).
Abstract >=31-bit coeff-modulus entries from the compiler map to a *pair*
of sub-primes whose product is searched to lie within ~2^-22 relative of
2^bits; exact value drift is handled by tracking true scales (floats)
through execution rather than forcing scale = 2^nominal like SEAL's
executor does (reference seal_executor.h:209-215 forces; we track)."""
