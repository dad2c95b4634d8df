"""NTT-friendly prime generation and RNS chain construction.

Replaces seal::CoeffModulus::Create (reference call site eva/seal/seal.cpp:
179-182): the compiler's abstract prime bit list becomes a chain of
machine-word sub-primes, all == 1 (mod 2N) so the size-N negacyclic NTT
exists mod each.

Entries <= 30 bits use a single prime as close as possible to 2^bits.
Larger entries use a *pair* of sub-primes (each < 2^31) whose product is
as close as possible to 2^bits; rescaling by the entry divides by both."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Set

_SMALL_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 2^64."""
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


MAX_SUBPRIME = (1 << 31) - 1


def _nearest_ntt_prime(target: int, m: int, used: Set[int],
                       lo: int = 2, hi: int = MAX_SUBPRIME) -> int:
    """Prime p == 1 (mod m) closest to `target`, within [lo, hi], not used."""
    base = (target // m) * m + 1
    best = None
    for step in range(0, 1 << 20):
        for cand in (base + step * m, base - step * m):
            if cand < lo or cand > hi or cand in used or not is_prime(cand):
                continue
            if best is None or abs(cand - target) < abs(best - target):
                best = cand
        if best is not None and step * m > abs(best - target):
            return best
    raise RuntimeError(f"No NTT prime == 1 mod {m} near {target}")


def _best_pair(bits: int, m: int, used: Set[int]):
    """Pair (p_a, p_b), both == 1 (mod m), both <= 2^31, product as close as
    possible to 2^bits. Scans p_a over the prime lattice and picks the
    nearest-prime p_b to 2^bits / p_a."""
    T = 1 << bits
    lo_a = max(m + 1, T // MAX_SUBPRIME + 1)
    # p_a ranges up to sqrt(T); p_b = T/p_a down from 2^31.
    hi_a = int(T ** 0.5) + 1
    if lo_a > hi_a:
        raise RuntimeError(f"Cannot split {bits}-bit modulus over lattice mod {m}")
    best = None  # (abs_err, p_a, p_b)
    a0 = lo_a // m
    a1 = hi_a // m + 1
    scanned = 0
    for a in range(a1, a0 - 1, -1):
        p_a = 1 + m * a
        if p_a < lo_a or p_a > hi_a or p_a in used or not is_prime(p_a):
            continue
        scanned += 1
        ideal = T // p_a
        base = (ideal // m) * m + 1
        for step in range(0, 64):
            done = False
            for p_b in (base + step * m, base - step * m):
                if (p_b <= p_a or p_b > MAX_SUBPRIME or p_b in used
                        or p_b == p_a or not is_prime(p_b)):
                    continue
                err = abs(p_a * p_b - T)
                if best is None or err < best[0]:
                    best = (err, p_a, p_b)
                done = True
            if done:
                break
        if scanned >= 2048 or (best is not None and best[0] <= (T >> 32)):
            break
    if best is None:
        raise RuntimeError(f"No sub-prime pair found for {bits}-bit modulus mod {m}")
    return best[1], best[2]


@dataclass
class ChainEntry:
    """One abstract coeff-modulus entry realized as 1-2 machine sub-primes."""
    bits: int
    primes: List[int]

    @property
    def product(self) -> int:
        p = 1
        for q in self.primes:
            p *= q
        return p


def build_chain(prime_bits: List[int], poly_degree: int) -> List[ChainEntry]:
    """Realize the compiler's abstract prime_bits list as machine sub-primes.

    The list layout follows the reference (encryption_parameter_selector.h:
    146-196): output primes first, then rescale primes, then the key prime
    last. The data chain drops entries from the END (before the key prime)
    as levels increase, matching SEAL's context chain."""
    m = 2 * poly_degree
    used: Set[int] = set()
    chain: List[ChainEntry] = []
    for bits in prime_bits:
        if bits <= 30:
            p = _nearest_ntt_prime(1 << bits, m, used,
                                   lo=max(m + 1, 1 << max(2, bits - 2)))
            entry = ChainEntry(bits, [p])
        else:
            p_a, p_b = _best_pair(bits, m, used)
            entry = ChainEntry(bits, [p_a, p_b])
        used.update(entry.primes)
        chain.append(entry)
    return chain
