// Native host kernels for the CKKS runtime's CPU path.
//
// The reference delegates all polynomial arithmetic to native SEAL
// (SURVEY.md §2.8); our TPU path runs it in XLA, and this library is the
// native implementation for the HOST side (keygen, the numpy reference
// backend, tests): negacyclic NTT/iNTT with Shoup-precomputed twiddles
// and fused dyadic modular ops, exposed through a C ABI for ctypes.
//
// Layout matches crypto/ntt.py exactly: Gentleman-Sande forward (natural
// in, bit-reversed out), Cooley-Tukey inverse (bit-reversed in, natural
// out), twist/untwist merged at the ends. Results are bit-identical to
// the numpy implementation.

#include <cstdint>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

namespace {

inline u64 mulmod(u64 a, u64 b, u64 q) {
    return static_cast<u64>((static_cast<u128>(a) * b) % q);
}

inline u64 addmod(u64 a, u64 b, u64 q) {
    u64 s = a + b;
    return s >= q ? s - q : s;
}

inline u64 submod(u64 a, u64 b, u64 q) {
    return a >= b ? a - b : a + q - b;
}

// Shoup multiplication by a precomputed constant: w_shoup = floor(w<<64/q).
inline u64 mulmod_shoup(u64 a, u64 w, u64 w_shoup, u64 q) {
    u64 hi = static_cast<u64>((static_cast<u128>(a) * w_shoup) >> 64);
    u64 r = a * w - hi * q;  // wrapping arithmetic; r < 2q
    return r >= q ? r - q : r;
}

}  // namespace

extern "C" {

// stage_w layout: stages packed from m=2 upward; stage with block size
// m=2^s contributes m/2 twiddles at offset (m/2 - 1). Total n-1 entries.
// shoup arrays hold the matching precomputed Shoup constants.

void ntt_forward(u64* data, long batch, long n, u64 q,
                 const u64* twist, const u64* twist_shoup,
                 const u64* stage_w, const u64* stage_w_shoup) {
    for (long b = 0; b < batch; ++b) {
        u64* x = data + b * n;
        for (long k = 0; k < n; ++k)
            x[k] = mulmod_shoup(x[k], twist[k], twist_shoup[k], q);
        for (long m = n; m >= 2; m >>= 1) {
            long half = m >> 1;
            const u64* w = stage_w + (half - 1);
            const u64* ws = stage_w_shoup + (half - 1);
            for (long blk = 0; blk < n; blk += m) {
                u64* lo = x + blk;
                u64* hi = lo + half;
                for (long i = 0; i < half; ++i) {
                    u64 a = lo[i], c = hi[i];
                    lo[i] = addmod(a, c, q);
                    hi[i] = mulmod_shoup(submod(a, c, q), w[i], ws[i], q);
                }
            }
        }
    }
}

void ntt_inverse(u64* data, long batch, long n, u64 q,
                 const u64* untwist, const u64* untwist_shoup,
                 const u64* stage_w_inv, const u64* stage_w_inv_shoup) {
    for (long b = 0; b < batch; ++b) {
        u64* x = data + b * n;
        for (long m = 2; m <= n; m <<= 1) {
            long half = m >> 1;
            const u64* w = stage_w_inv + (half - 1);
            const u64* ws = stage_w_inv_shoup + (half - 1);
            for (long blk = 0; blk < n; blk += m) {
                u64* lo = x + blk;
                u64* hi = lo + half;
                for (long i = 0; i < half; ++i) {
                    u64 a = lo[i];
                    u64 c = mulmod_shoup(hi[i], w[i], ws[i], q);
                    lo[i] = addmod(a, c, q);
                    hi[i] = submod(a, c, q);
                }
            }
        }
        for (long k = 0; k < n; ++k)
            x[k] = mulmod_shoup(x[k], untwist[k], untwist_shoup[k], q);
    }
}

// Fused dyadic ops over flat arrays (already length batch*n).
void dyadic_mul(const u64* a, const u64* b, u64* out, long len, u64 q) {
    for (long i = 0; i < len; ++i) out[i] = mulmod(a[i], b[i], q);
}

void dyadic_mul_acc(const u64* a, const u64* b, u64* acc, long len, u64 q) {
    for (long i = 0; i < len; ++i)
        acc[i] = addmod(acc[i], mulmod(a[i], b[i], q), q);
}

void dyadic_add(const u64* a, const u64* b, u64* out, long len, u64 q) {
    for (long i = 0; i < len; ++i) out[i] = addmod(a[i], b[i], q);
}

void dyadic_sub(const u64* a, const u64* b, u64* out, long len, u64 q) {
    for (long i = 0; i < len; ++i) out[i] = submod(a[i], b[i], q);
}

// Garner mixed-radix CRT decode (crypto/encoder.residues_to_coeffs):
// residues [n_sub, n] -> centered float64 coefficients. The Python
// caller supplies inv[i*n_sub+j] = q_j^-1 mod q_i and the mixed-radix
// digits of floor(Q/2) (half_digits). Per coefficient: compute the
// Garner digits v_i exactly, decide the sign by lexicographic compare
// against half_digits (most-significant first), negate digit-wise for
// high values (digits of Q - x), then Horner-fold to float64 so the
// result carries the top 53 bits of the SMALL centered value.
void garner_decode(const u64* residues, long n_sub, long n,
                   const u64* primes, const u64* inv, const u64* inv_shoup,
                   const u64* half_digits, double* out) {
    // Per-coefficient scratch on the stack (n_sub is small, <= 64).
    // All reductions — the input row (like the numpy path, unreduced
    // inputs are accepted) and the cross-prime digits (v_j can exceed
    // q_i by a large factor: sub-primes range ~2^20..2^31) — go through
    // a Shoup multiply by 1, so the hot loop has no hardware division.
    u64 v[64];
    u64 one_shoup[64];
    for (long i = 0; i < n_sub; ++i)
        one_shoup[i] = static_cast<u64>(
            (static_cast<u128>(1) << 64) / primes[i]);
    for (long k = 0; k < n; ++k) {
        for (long i = 0; i < n_sub; ++i) {
            u64 q = primes[i];
            u64 t = mulmod_shoup(residues[i * n + k], 1, one_shoup[i], q);
            for (long j = 0; j < i; ++j) {
                u64 vj = mulmod_shoup(v[j], 1, one_shoup[i], q);
                t = mulmod_shoup(submod(t, vj, q), inv[i * n_sub + j],
                                 inv_shoup[i * n_sub + j], q);
            }
            v[i] = t;
        }
        // Sign: x >= floor(Q/2) iff digits > half_digits lexicographically
        // (most significant digit last in v; compare from the top).
        bool high = true;  // equality -> high (matches numpy path)
        for (long i = n_sub - 1; i >= 0; --i) {
            if (v[i] != half_digits[i]) {
                high = v[i] > half_digits[i];
                break;
            }
        }
        double mag = 0.0;
        if (high) {
            // digits of Q - x: w_i = (q_i - 1) - v_i, then +1 with carry.
            u64 carry = 1;
            for (long i = 0; i < n_sub; ++i) {
                u64 s = (primes[i] - 1) - v[i] + carry;
                carry = (s == primes[i]) ? 1 : 0;
                v[i] = carry ? 0 : s;
            }
            for (long i = n_sub - 1; i >= 0; --i)
                mag = mag * static_cast<double>(primes[i])
                      + static_cast<double>(v[i]);
            out[k] = -mag;
        } else {
            for (long i = n_sub - 1; i >= 0; --i)
                mag = mag * static_cast<double>(primes[i])
                      + static_cast<double>(v[i]);
            out[k] = mag;
        }
    }
}

// Rescale helper: out_i = (x_i - centered) * p_inv mod q, with
// centered = lift > p/2 ? lift - p : lift  (lift is the dropped limb).
void divide_round(const u64* x, const u64* lift, u64* out, long len,
                  u64 q, u64 p, u64 p_inv) {
    for (long i = 0; i < len; ++i) {
        u64 l = lift[i];
        // v = x + p - lift == (x - centered) + p*(lift <= p/2)
        u64 v = x[i] + p - l;
        u64 r = mulmod(v % q, p_inv, q);
        if (l <= p / 2) {  // correction: subtract the extra +p/p == 1
            r = submod(r, 1, q);
        }
        out[i] = r;
    }
}

}  // extern "C"
