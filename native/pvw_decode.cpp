// Native PVW sequential-rounding decoder.
//
// The decode recurrence (reference: /root/reference/src/crypto/decryption.rs
// lines 10-58 and helpers 61-247) is exact multiprecision integer work on
// CRT-lifted, centered coefficients — host-side by design (the TPU keeps the
// <s,c1> contraction and inverse NTT; see pvw_tpu/crypto/decryption.py).
// This C++ engine replaces the Python-int fallback for throughput: fixed-
// width sign-magnitude bigints (NW 64-bit words), __int128 word products,
// OpenMP across the decode batch.
//
// Conventions preserved EXACTLY (same as the Python reference path, which
// remains the source of truth and the differential-test oracle):
//   * centering subtracts q only for values STRICTLY greater than q/2
//   * every intermediate value is re-reduced mod q
//   * rounding division is sign-split truncated: (2a +/- d) / (2d)
//   * reduction mod delta^(l-1) uses truncated % with half_mod centering
//   * final clamp: small negatives (|v| <= 1000) -> 0; large negatives wrap
//     mod q; values >= 2^64 -> 0.
//
// Requirements checked by the Python wrapper: delta < 2^63, total q fits in
// MAX_NW words.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int MAX_NW = 18;  // up to 1152-bit q (17x61-bit limbs + margin)

struct Big {
    uint64_t w[MAX_NW + 2];  // little-endian magnitude
    int neg;                 // sign flag (value == 0 => neg == 0)
};

// Active word count for all Big arithmetic: nw(q) + 2 headroom words.
// Every value the decode touches fits (lift acc < 64q, products < q*2^63,
// numerators < 2q + delta); looping only over the active words instead of
// the fixed 20 is a ~5x saving on shallow chains. Words >= na stay zero
// (big_zero clears the full array; no op writes past na).
// NOT thread-safe across concurrent calls with different parameter sets
// (single global, matching the Python wrapper's usage); OpenMP workers
// inside one call share the same na.
int g_na = MAX_NW + 2;

inline void big_zero(Big &a) {
    std::memset(a.w, 0, sizeof(a.w));
    a.neg = 0;
}

inline bool big_is_zero(const Big &a) {
    for (int i = 0; i < g_na; ++i)
        if (a.w[i]) return false;
    return true;
}

// compare magnitudes
inline int mag_cmp(const Big &a, const Big &b) {
    for (int i = g_na - 1; i >= 0; --i) {
        if (a.w[i] != b.w[i]) return a.w[i] > b.w[i] ? 1 : -1;
    }
    return 0;
}

inline void mag_add(Big &r, const Big &a, const Big &b) {
    unsigned __int128 carry = 0;
    for (int i = 0; i < g_na; ++i) {
        unsigned __int128 s = (unsigned __int128)a.w[i] + b.w[i] + carry;
        r.w[i] = (uint64_t)s;
        carry = s >> 64;
    }
}

// r = a - b, requires |a| >= |b|
inline void mag_sub(Big &r, const Big &a, const Big &b) {
    unsigned __int128 borrow = 0;
    for (int i = 0; i < g_na; ++i) {
        unsigned __int128 d =
            (unsigned __int128)a.w[i] - b.w[i] - borrow;
        r.w[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

// signed add: r = a + b
inline void big_add(Big &r, const Big &a, const Big &b) {
    if (a.neg == b.neg) {
        mag_add(r, a, b);
        r.neg = a.neg;
    } else if (mag_cmp(a, b) >= 0) {
        mag_sub(r, a, b);
        r.neg = a.neg;
    } else {
        mag_sub(r, b, a);
        r.neg = b.neg;
    }
    if (big_is_zero(r)) r.neg = 0;
}

inline void big_sub(Big &r, const Big &a, const Big &b) {
    Big nb = b;
    nb.neg = b.neg ? 0 : 1;
    big_add(r, a, nb);
}

// r = a * m (u64), magnitude only
inline void mag_mul_u64(Big &r, const Big &a, uint64_t m) {
    unsigned __int128 carry = 0;
    for (int i = 0; i < g_na; ++i) {
        unsigned __int128 p = (unsigned __int128)a.w[i] * m + carry;
        r.w[i] = (uint64_t)p;
        carry = p >> 64;
    }
    r.neg = a.neg;
    if (big_is_zero(r)) r.neg = 0;
}

// acc += a * m (u64), magnitudes (acc.neg ignored; caller guarantees >=0)
inline void mag_addmul_u64(Big &acc, const Big &a, uint64_t m) {
    unsigned __int128 carry = 0;
    for (int i = 0; i < g_na; ++i) {
        unsigned __int128 p =
            (unsigned __int128)a.w[i] * m + acc.w[i] + carry;
        acc.w[i] = (uint64_t)p;
        carry = p >> 64;
    }
}

inline int bit_length(const Big &a) {
    for (int i = g_na - 1; i >= 0; --i) {
        if (a.w[i]) {
            int b = 64;
            uint64_t v = a.w[i];
            while (!(v & 0x8000000000000000ull)) {
                v <<= 1;
                --b;
            }
            return i * 64 + b;
        }
    }
    return 0;
}

inline void mag_shl1(Big &a) {
    uint64_t carry = 0;
    for (int i = 0; i < g_na; ++i) {
        uint64_t nc = a.w[i] >> 63;
        a.w[i] = (a.w[i] << 1) | carry;
        carry = nc;
    }
}

inline void mag_shr1(Big &a) {
    uint64_t carry = 0;
    for (int i = g_na - 1; i >= 0; --i) {
        uint64_t nc = a.w[i] & 1;
        a.w[i] = (a.w[i] >> 1) | (carry << 63);
        carry = nc;
    }
}

// magnitude remainder: r = a mod m (m > 0), shift-subtract
inline void mag_mod(Big &r, const Big &a, const Big &m) {
    r = a;
    r.neg = 0;
    if (mag_cmp(r, m) < 0) return;
    int shift = bit_length(a) - bit_length(m);
    Big d = m;
    for (int i = 0; i < shift; ++i) mag_shl1(d);
    for (int i = shift; i >= 0; --i) {
        if (mag_cmp(r, d) >= 0) {
            Big t;
            mag_sub(t, r, d);
            r = t;
        }
        mag_shr1(d);
    }
}

// truncated division magnitude by u64 divisor: q = a / d, also remainder
inline uint64_t mag_div_u64(Big &q, const Big &a, uint64_t d) {
    unsigned __int128 rem = 0;
    for (int i = g_na - 1; i >= 0; --i) {
        unsigned __int128 cur = (rem << 64) | a.w[i];
        q.w[i] = (uint64_t)(cur / d);
        rem = cur % d;
    }
    for (int i = g_na; i < MAX_NW + 2; ++i) q.w[i] = 0;
    q.neg = 0;
    return (uint64_t)rem;
}

// value = residue mod q in [0, q): signed-center with STRICT > q/2 rule
// (half = q/2 floor).
inline void center_mod_q(Big &v, const Big &q, const Big &half_q) {
    // v in [0, q)
    if (mag_cmp(v, half_q) > 0) {
        Big t;
        mag_sub(t, q, v);
        v = t;
        v.neg = 1;
        if (big_is_zero(v)) v.neg = 0;
    } else {
        v.neg = 0;
    }
}

// signed x -> canonical residue in [0, q): r = x mod q (x magnitude < B*q
// for moderate B; uses mag_mod then one fix-up for negatives)
inline void to_residue(Big &r, const Big &x, const Big &q) {
    Big m;
    mag_mod(m, x, q);
    if (x.neg && !big_is_zero(m)) {
        Big t;
        mag_sub(t, q, m);
        m = t;
    }
    m.neg = 0;
    r = m;
}

struct DecodeCtx {
    int L;
    int ell;
    const uint64_t *moduli;
    const uint64_t *qhat_inv;
    const uint64_t *qhat_words;  // [L, nw_in]
    int nw_in;
    Big q;
    Big half_q;
    Big dpow;       // delta^(l-1)
    Big half_dpow;  // dpow / 2 (truncated)
    uint64_t delta; // < 2^63
    uint64_t delta_mod[64];      // delta % q_j per limb
};

inline uint64_t mulmod_u64(uint64_t a, uint64_t b, uint64_t m) {
    return (uint64_t)((unsigned __int128)a * b % m);
}

// CRT-lift residues[L] (strided by `stride`) into [0, q), then center.
inline void lift_center(Big &out, const DecodeCtx &c,
                        const uint64_t *res, int stride) {
    Big acc;
    big_zero(acc);
    for (int i = 0; i < c.L; ++i) {
        uint64_t t = mulmod_u64(res[(size_t)i * stride], c.qhat_inv[i],
                                c.moduli[i]);
        Big qh;
        big_zero(qh);
        for (int wix = 0; wix < c.nw_in; ++wix)
            qh.w[wix] = c.qhat_words[(size_t)i * c.nw_in + wix];
        mag_addmul_u64(acc, qh, t);
    }
    // acc < L * q: conditional subtracts
    while (mag_cmp(acc, c.q) >= 0) {
        Big t;
        mag_sub(t, acc, c.q);
        acc = t;
    }
    out = acc;
    center_mod_q(out, c.q, c.half_q);
}

// signed multiword -> canonical residue mod a u64 modulus
inline uint64_t signed_mod_u64(const Big &a, uint64_t q) {
    unsigned __int128 rem = 0;
    for (int i = g_na - 1; i >= 0; --i)
        rem = ((rem << 64) | a.w[i]) % q;
    uint64_t r = (uint64_t)rem;
    if (a.neg && r) r = q - r;
    return r;
}

// decode one message; coeff residues laid out [L, ell] row-major.
//
// The tmp chain and Horner fold (decryption.rs:19-33) run in RNS: every
// step is mod q, and the residues mod each q_j of the centered
// coefficients ARE the input residues (zc[i] == res[i,j] mod q_j) — the
// same derivation as the on-device decode (pvw_tpu/crypto/
// device_decode.py). Full CRT lifts happen only where the algorithm
// genuinely compares or divides: the Horner result, the ell-1 backward
// numerators, and zc[0] — replacing the multiword shift-subtract
// reductions of the earlier all-Big form (~2x single-message decode).
uint64_t decode_one(const DecodeCtx &c, const uint64_t *res) {
    const int ell = c.ell;
    const int L = c.L;

    // tmp[i] = zc[i]*delta - zc[i+1] mod q, Horner fold — per limb
    uint64_t tmp[64][64];   // [pos][limb], residues in [0, q_j)
    uint64_t last[64];
    for (int j = 0; j < L; ++j) {
        const uint64_t q = c.moduli[j];
        const uint64_t dm = c.delta_mod[j];
        const uint64_t *rj = res + (size_t)j * ell;
        for (int i = 0; i < ell - 1; ++i) {
            uint64_t p = mulmod_u64(rj[i], dm, q);
            uint64_t s = rj[i + 1];
            tmp[i][j] = p >= s ? p - s : p + q - s;
        }
        uint64_t lastj = tmp[0][j];
        for (int i = 1; i < ell - 1; ++i) {
            lastj = mulmod_u64(lastj, dm, q);
            lastj += tmp[i][j];
            if (lastj >= q) lastj -= q;
        }
        last[j] = lastj;
    }

    // reduce mod delta^(l-1): a centered; rust % (sign of dividend); then
    // half-mod centering
    Big a;
    lift_center(a, c, last, 1);
    Big red;
    mag_mod(red, a, c.dpow);
    red.neg = (a.neg && !big_is_zero(red)) ? 1 : 0;
    // if red > half: red -= m; if red < -half: red += m
    if (mag_cmp(red, c.half_dpow) > 0) {
        Big t;
        mag_sub(t, c.dpow, red);
        int flip = red.neg ? 0 : 1;
        red = t;
        red.neg = big_is_zero(red) ? 0 : flip;
    }

    // backward: noise[i] = round-div((noise[i+1] - tmp[i]) centered, delta)
    uint64_t noise[64];     // noise[i+1] as residues mod q_j
    for (int j = 0; j < L; ++j) noise[j] = signed_mod_u64(red, c.moduli[j]);
    Big quot;
    big_zero(quot);
    const uint64_t two_delta_lo = c.delta * 2;  // delta < 2^63 so exact
    for (int i = ell - 2; i >= 0; --i) {
        uint64_t num[64];
        for (int j = 0; j < L; ++j) {
            const uint64_t q = c.moduli[j];
            uint64_t nj = noise[j], tj = tmp[i][j];
            num[j] = nj >= tj ? nj - tj : nj + q - tj;
        }
        Big an;
        lift_center(an, c, num, 1);
        // (2a +/- delta) / (2 delta), truncated toward zero: in magnitude
        // the numerator is always 2|a| + delta and the sign follows a
        Big numr;
        mag_add(numr, an, an);
        Big dconst;
        big_zero(dconst);
        dconst.w[0] = c.delta;
        Big t;
        mag_add(t, numr, dconst);
        mag_div_u64(quot, t, two_delta_lo);
        quot.neg = an.neg && !big_is_zero(quot) ? 1 : 0;
        for (int j = 0; j < L; ++j)
            noise[j] = signed_mod_u64(quot, c.moduli[j]);
    }

    // plaintext = (-zc0 - noise0) mod q, centered, clamped; noise[0] is
    // the final quot (signed)
    uint64_t col0[64];
    for (int j = 0; j < L; ++j) col0[j] = res[(size_t)j * ell];
    Big zc0;
    lift_center(zc0, c, col0, 1);
    Big nz0 = zc0;
    nz0.neg = nz0.neg ? 0 : (big_is_zero(nz0) ? 0 : 1);
    Big pt_signed;
    big_sub(pt_signed, nz0, quot);
    Big val;
    to_residue(val, pt_signed, c.q);
    Big mf = val;
    center_mod_q(mf, c.q, c.half_q);

    if (mf.neg) {
        // |mf| <= 1000 -> 0
        bool small = true;
        for (int i = 1; i < g_na; ++i)
            if (mf.w[i]) small = false;
        if (small && mf.w[0] <= 1000) return 0;
        Big pos;
        mag_sub(pos, c.q, mf);  // (mf + q) with mf negative magnitude
        // fits u64?
        for (int i = 1; i < g_na; ++i)
            if (pos.w[i]) return 0;
        return pos.w[0];
    }
    for (int i = 1; i < g_na; ++i)
        if (mf.w[i]) return 0;
    return mf.w[0];
}

}  // namespace

extern "C" {

// returns 0 on success, nonzero on unsupported configuration
int pvw_decode_batch(const uint64_t *residues, int64_t count, int32_t L,
                     int32_t ell, const uint64_t *moduli,
                     const uint64_t *qhat_inv, const uint64_t *qhat_words,
                     const uint64_t *q_words, const uint64_t *dpow_words,
                     int32_t nw, uint64_t delta, uint64_t *out) {
    if (nw > MAX_NW || ell > 64 || delta >= (1ull << 63) || L > 64)
        return 1;
    DecodeCtx c;
    c.L = L;
    c.ell = ell;
    c.moduli = moduli;
    c.qhat_inv = qhat_inv;
    c.qhat_words = qhat_words;
    c.nw_in = nw;
    big_zero(c.q);
    big_zero(c.dpow);
    for (int i = 0; i < nw; ++i) {
        c.q.w[i] = q_words[i];
        c.dpow.w[i] = dpow_words[i];
    }
    g_na = nw + 2 > MAX_NW + 2 ? MAX_NW + 2 : nw + 2;
    for (int i = 0; i < L; ++i) c.delta_mod[i] = delta % moduli[i];
    c.half_q = c.q;
    mag_shr1(c.half_q);
    c.half_dpow = c.dpow;
    mag_shr1(c.half_dpow);
    c.delta = delta;

#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (count > 1)
#endif
    for (int64_t i = 0; i < count; ++i) {
        out[i] = decode_one(c, residues + (size_t)i * L * ell);
    }
    return 0;
}

// Full host decrypt for latency-sensitive small batches: z = <s, c1> - c2
// (pointwise NTT-domain contraction over k, per limb), inverse NTT (the
// ring plan's [l, l] matrix, 1/l factor included), then the sequential-
// rounding decode — the whole of decryption.rs:249-278 without touching
// the accelerator. Routed to by pvw_tpu.crypto.decryption when the batch
// is below the device-dispatch crossover (BASELINE.md "adaptive decode
// routing"). c1/c2 arrive as the uint32 hi/lo pairs the library stores
// natively, in the NATIVE [k, d, L, ell] / [d, L, ell] layouts — no
// 64-bit join and no axis permutation on the Python side (that
// preprocessing was ~25% of the single-message host-path latency).
int pvw_decrypt_decode_pairs(
    const uint64_t *sk, const uint32_t *c1h, const uint32_t *c1l,
    const uint32_t *c2h, const uint32_t *c2l, int64_t d, int32_t k,
    int32_t L, int32_t ell, const uint64_t *moduli, const uint64_t *ntt_inv,
    const uint64_t *qhat_inv, const uint64_t *qhat_words,
    const uint64_t *q_words, const uint64_t *dpow_words, int32_t nw,
    uint64_t delta, uint64_t *out) {
    if (nw > MAX_NW || ell > 64 || delta >= (1ull << 63) || L > 64)
        return 1;
    for (int i = 0; i < L; ++i)
        if (moduli[i] >= (1ull << 62)) return 1;
    DecodeCtx c;
    c.L = L;
    c.ell = ell;
    c.moduli = moduli;
    c.qhat_inv = qhat_inv;
    c.qhat_words = qhat_words;
    c.nw_in = nw;
    big_zero(c.q);
    big_zero(c.dpow);
    for (int i = 0; i < nw; ++i) {
        c.q.w[i] = q_words[i];
        c.dpow.w[i] = dpow_words[i];
    }
    g_na = nw + 2 > MAX_NW + 2 ? MAX_NW + 2 : nw + 2;
    for (int i = 0; i < L; ++i) c.delta_mod[i] = delta % moduli[i];
    c.half_q = c.q;
    mag_shr1(c.half_q);
    c.half_dpow = c.dpow;
    mag_shr1(c.half_dpow);
    c.delta = delta;

    const size_t Ll = (size_t)L * ell;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (d > 1)
#endif
    for (int64_t dd = 0; dd < d; ++dd) {
        uint64_t z[64 * 64];
        uint64_t pb[64 * 64];
        const uint32_t *c2hd = c2h + (size_t)dd * Ll;
        const uint32_t *c2ld = c2l + (size_t)dd * Ll;
        for (int i = 0; i < L; ++i) {
            const uint64_t q = moduli[i];
            for (int j = 0; j < ell; ++j) {
                const size_t x = (size_t)i * ell + j;
                unsigned __int128 acc = 0;
                for (int kk = 0; kk < k; ++kk) {
                    const size_t ix = ((size_t)kk * d + dd) * Ll + x;
                    const uint64_t v =
                        ((uint64_t)c1h[ix] << 32) | c1l[ix];
                    acc += (unsigned __int128)sk[(size_t)kk * Ll + x] * v;
                    if ((kk & 7) == 7) acc %= q;
                }
                uint64_t zz = (uint64_t)(acc % q);
                const uint64_t c2v =
                    ((uint64_t)c2hd[x] << 32) | c2ld[x];
                z[x] = (zz + q - c2v) % q;
            }
            const uint64_t *inv = ntt_inv + (size_t)i * ell * ell;
            for (int j2 = 0; j2 < ell; ++j2) {
                unsigned __int128 acc = 0;
                for (int j = 0; j < ell; ++j) {
                    acc += (unsigned __int128)inv[(size_t)j2 * ell + j] *
                           z[(size_t)i * ell + j];
                    if ((j & 7) == 7) acc %= q;
                }
                pb[(size_t)i * ell + j2] = (uint64_t)(acc % q);
            }
        }
        out[dd] = decode_one(c, pb);
    }
    return 0;
}

int pvw_decode_version() { return 3; }
}
