"""Logical vectors larger than one ciphertext (vec_size > N/2 slots).

The reference caps a program's vector at the slot count and, when the
security-mandated ring is too small, GROWS the ring to 2*vec_size
(eva/ckks/ckks_compiler.h:201-221) — paying bigger-N cost on every op.
The TPU-native extension (SURVEY.md §5 extension point) instead shards a
logical vector across k = vec_size/(N/2) ciphertexts and keeps the ring
at its security minimum; the shard axis is a leading array axis that
rides the same mesh/batch machinery as ciphertext batching.

Layout: STRIDED (round-robin). Logical slot s lives in shard (s mod k),
position (s div k). With this layout every cyclic rotation of the
logical vector is EXACT without masking:

    out_shard[j] = intra_rotate(in_shard[(j + c) mod k], a + [j >= k - c])

where r = a*k + c is the rotation amount. Proof: slot s = q*k + j maps
under s -> s + r to shard (j + c) mod k at position (q + a + carry) mod
N/2, and the carry pattern over j is exactly the intra-ciphertext cyclic
wrap. A blocked layout would need plaintext 0/1 masks (an extra scale
level and 2x the key-switch work); the strided layout needs none, so the
compiler's scale/level model is untouched and only rotation-key steps
are translated.

Each logical rotation costs at most two distinct intra rotations (a and
a+1), so at most two Galois keys, and both act on disjoint shard groups
of one rolled shard stack — the shard roll itself is free (a pair of
slices on TPU, a roll in numpy)."""

from __future__ import annotations

from typing import Iterable, List, Tuple


def shard_count(vec_size: int, slots: int) -> int:
    """Ciphertexts per logical vector (1 when the vector fits)."""
    if vec_size <= slots:
        return 1
    assert vec_size % slots == 0, "vec_size must be a multiple of slot count"
    return vec_size // slots


def rotation_plan(steps: int, k: int, slots: int) -> Tuple[int, int, int]:
    """Lower a logical left-rotation to the sharded form.

    Returns (c, amt_lo, amt_hi): roll the shard axis by c (out shard j
    reads in shard (j+c) mod k), then intra-rotate shards [0, k-c) left
    by amt_lo and shards [k-c, k) left by amt_hi. Amounts are reduced
    mod `slots`; an amount of 0 means passthrough (no key switch)."""
    S = k * slots
    r = steps % S
    a, c = divmod(r, k)
    return c, a % slots, (a + 1) % slots


def translate_rotation_steps(steps: Iterable[int], vec_size: int,
                             slots: int) -> List[int]:
    """Map the compiler's logical rotation-step set to the intra-ciphertext
    Galois steps the sharded runtime key-switches with. Identity (k == 1)
    keeps the reference's step list untouched (including negative right-
    rotation encodings)."""
    k = shard_count(vec_size, slots)
    if k == 1:
        return sorted(set(steps))
    out = set()
    for r in steps:
        c, lo, hi = rotation_plan(r, k, slots)
        if lo:
            out.add(lo)
        if c and hi:
            out.add(hi)
    return sorted(out)
