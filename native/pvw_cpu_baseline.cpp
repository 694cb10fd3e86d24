// Measured CPU stand-in for the pvw-rs encryption hot path.
//
// The reference (pvw-rs, /root/reference/src/crypto/encryption.rs:105-214)
// publishes no benchmark numbers and cannot be compiled here (no Rust
// toolchain in this image). This program measures the same arithmetic the
// reference performs per `encrypt` call, implemented the way an optimized
// native CPU build would do it, so BASELINE.md can anchor `vs_baseline`
// to a MEASURED number instead of an analytic estimate:
//
//   c1 = A·r + e1   — k×k NTT-domain poly matvec (crs.rs:185-204)
//   c2 = B·r + m·g + e2 — n×k NTT-domain poly matvec (encryption.rs:177-200)
//
// Each poly product is l·L pointwise u64 modular multiplies. Two kernels:
//   barrett — generic u128 Barrett reduction, what fhe-math's zq::mul does
//             for Representation::Ntt operands (the path pvw-rs uses);
//   shoup   — Harvey/Shoup with per-encryption precomputed companions for
//             the shared r (an upper bound: faster than the reference's
//             actual path, so the baseline is generous to the reference).
//
// Sampling/encode/validation costs are EXCLUDED (generous to the
// reference again). OpenMP parallelism over receivers mirrors rayon site
// P5 (encryption.rs:177, SURVEY.md §2.2).
//
// Usage: pvw_cpu_baseline [n k l "q0,q1,..." iters]
// Output: one JSON line with enc/s and ns/modmul for both kernels.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <chrono>
#ifdef _OPENMP
#include <omp.h>
#endif

using u64 = uint64_t;
using u128 = unsigned __int128;

struct Barrett {
  u64 q;
  u64 mu_hi, mu_lo;  // floor(2^128 / q) as two 64-bit words
  explicit Barrett(u64 q_) : q(q_) {
    // 2^128 / q via long division on (hi=2^64-part): since q < 2^63,
    // floor(2^128/q) = ((2^128 - 1) / q) when q does not divide 2^128;
    // compute with u128 arithmetic in two steps.
    u128 hi = (~(u128)0) / q;  // floor((2^128-1)/q) — exact for q not a power of 2
    mu_hi = (u64)(hi >> 64);
    mu_lo = (u64)hi;
  }
  inline u64 mul(u64 a, u64 b) const {
    // fhe.rs-style Barrett: r = ab - floor(ab * mu / 2^128) * q, one
    // conditional subtract. ab < 2^126 for q < 2^63.
    u128 ab = (u128)a * b;
    u64 ab_hi = (u64)(ab >> 64), ab_lo = (u64)ab;
    // t = floor(ab * mu / 2^128): take the top 128 bits of the 256-bit
    // product (ab_hi*2^64 + ab_lo) * (mu_hi*2^64 + mu_lo).
    u128 lo_lo = (u128)ab_lo * mu_lo;
    u128 lo_hi = (u128)ab_lo * mu_hi;
    u128 hi_lo = (u128)ab_hi * mu_lo;
    u128 hi_hi = (u128)ab_hi * mu_hi;
    u128 mid = lo_hi + hi_lo + (lo_lo >> 64);
    u128 t = hi_hi + (mid >> 64);
    u64 r = (u64)(ab - t * q);
    return r >= q ? r - q : r;
  }
};

static inline u64 shoup_mul(u64 a, u64 a_shoup, u64 b, u64 q) {
  u64 t = (u64)(((u128)a_shoup * b) >> 64);
  u64 r = a * b - t * q;
  return r >= q ? r - q : r;
}

struct XorShift {
  u64 s = 0x9E3779B97F4A7C15ull;
  inline u64 next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return s;
  }
};

int main(int argc, char** argv) {
  long n = argc > 1 ? atol(argv[1]) : 4096;
  long k = argc > 2 ? atol(argv[2]) : 256;
  long l = argc > 3 ? atol(argv[3]) : 8;
  std::vector<u64> moduli;
  if (argc > 4) {
    char* tok = strtok(argv[4], ",");
    while (tok) { moduli.push_back(strtoull(tok, nullptr, 0)); tok = strtok(nullptr, ","); }
  } else {
    moduli = {0xFFFFC4001ull, 0x1FFFFE0001ull};
  }
  long iters = argc > 5 ? atol(argv[5]) : 8;
  long L = (long)moduli.size();
  long C = L * l;  // flattened (limb, slot) channels per poly
  if (C > 512) { fprintf(stderr, "C=%ld exceeds acc buffer\n", C); return 1; }

  std::vector<Barrett> br;
  for (u64 q : moduli) br.emplace_back(q);
  std::vector<u64> qs(C);
  for (long c = 0; c < C; ++c) qs[c] = moduli[c / l];

  // Operands: A [k,k,C], B [n,k,C], r [k,C] — uniform residues.
  XorShift rng;
  std::vector<u64> A((size_t)k * k * C), B((size_t)n * k * C), r((size_t)k * C);
  for (auto& v : A) v = rng.next() % moduli[0];
  for (auto& v : B) v = rng.next() % moduli[0];
  for (size_t i = 0; i < r.size(); ++i) r[i] = rng.next() % qs[i % C];
  std::vector<u64> rs(r.size());  // Shoup companions of r
  std::vector<u64> c1((size_t)k * C), c2((size_t)n * C);

  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif

  double best[2] = {0, 0};  // enc/s per kernel
  for (int kern = 0; kern < 2; ++kern) {
    auto t0 = std::chrono::steady_clock::now();
    for (long it = 0; it < iters; ++it) {
      if (kern == 1)  // companion precompute is part of the measured work
        for (size_t i = 0; i < r.size(); ++i)
          rs[i] = (u64)((((u128)r[i]) << 64) / qs[i % C]);
      // c1 = A·r  (k×k poly matvec)
#pragma omp parallel for schedule(static)
      for (long i = 0; i < k; ++i) {
        u64 acc[512] = {0};
        for (long j = 0; j < k; ++j) {
          const u64* a = &A[((size_t)i * k + j) * C];
          const u64* rr = &r[(size_t)j * C];
          const u64* rsh = &rs[(size_t)j * C];
          for (long c = 0; c < C; ++c) {
            u64 p = kern == 0 ? br[c / l].mul(a[c], rr[c])
                              : shoup_mul(rr[c], rsh[c], a[c], qs[c]);
            u64 s = acc[c] + p;
            acc[c] = s >= qs[c] ? s - qs[c] : s;
          }
        }
        memcpy(&c1[(size_t)i * C], acc, C * sizeof(u64));
      }
      // c2 = B·r  (n×k poly matvec — the dominant loop, rayon P5)
#pragma omp parallel for schedule(static)
      for (long i = 0; i < n; ++i) {
        u64 acc[512] = {0};
        for (long j = 0; j < k; ++j) {
          const u64* b = &B[((size_t)i * k + j) * C];
          const u64* rr = &r[(size_t)j * C];
          const u64* rsh = &rs[(size_t)j * C];
          for (long c = 0; c < C; ++c) {
            u64 p = kern == 0 ? br[c / l].mul(b[c], rr[c])
                              : shoup_mul(rr[c], rsh[c], b[c], qs[c]);
            u64 s = acc[c] + p;
            acc[c] = s >= qs[c] ? s - qs[c] : s;
          }
        }
        memcpy(&c2[(size_t)i * C], acc, C * sizeof(u64));
      }
    }
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    best[kern] = iters / dt;
    // keep results observable so the loops cannot be elided
    volatile u64 sink = c1[0] ^ c2[(size_t)(n - 1) * C];
    (void)sink;
  }

  double modmuls = (double)(k * k + (size_t)n * k) * C;
  printf(
      "{\"n\": %ld, \"k\": %ld, \"l\": %ld, \"L\": %ld, \"threads\": %d, "
      "\"modmuls_per_enc\": %.0f, "
      "\"barrett_enc_per_s\": %.3f, \"barrett_ns_per_modmul\": %.3f, "
      "\"shoup_enc_per_s\": %.3f, \"shoup_ns_per_modmul\": %.3f}\n",
      n, k, l, L, threads, modmuls,
      best[0], 1e9 / (best[0] * modmuls) * threads,
      best[1], 1e9 / (best[1] * modmuls) * threads);
  return 0;
}
