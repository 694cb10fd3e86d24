"""Micro-benchmark harness mirroring the reference's criterion groups
one-for-one (``/root/reference/benches/pvw.rs``):

  Parameter Generation  (:8-54)   n=4/8/16, k=256/512/1024, l=8/16/32
  CRS Generation        (:56-88)  k=256 l=8 2-limb; k=512 l=16 3-limb
  Key Generation        (:90-137) secret + public keygen, same configs
  Sampling              (:139-162) Gaussian vec 256; CBD 10k @ var 0.5/1.0
  Validation            (:164-194) CRS / public key / secret key

plus the two groups the reference NEVER benched (SURVEY.md §6):
  Encryption / Decryption.

Run: ``python benchmarks/criterion_parity.py [--quick]``. Prints a table;
each row: group, case, median ms over repeats. Uses whatever JAX backend is
active (TPU under axon, CPU if pinned).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, repeats=5, warmup=1):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small configs only")
    ap.add_argument("--cpu", action="store_true", help="pin the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvw_tpu import (
        GlobalPublicKey, Party, PublicKey, PvwCrs, PvwParameters,
        PvwParametersBuilder, SecretKey, encrypt_batch, decrypt_party_shares,
    )
    from pvw_tpu.sampling import sample_discrete_gaussian_vec, sample_vec_cbd

    MODULI2 = (0xFFFFC4001, 0x1FFFFE0001)
    MODULI3 = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)
    rows: list[tuple[str, str, float]] = []
    key = jax.random.key(0)

    def bench(group, case, fn, **kw):
        ms = timeit(fn, **kw)
        rows.append((group, case, ms))
        print(f"{group:22s} {case:34s} {ms:10.3f} ms", flush=True)

    def build(n, k, l, moduli):
        b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
        return (PvwParametersBuilder().set_parties(n).set_dimension(k)
                .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
                .set_error_bounds_u32(b1, b2).build())

    # --- Parameter Generation (benches/pvw.rs:8-54) ---------------------
    param_cases = [(4, 256, 8), (8, 512, 16)] + ([] if args.quick else [(16, 1024, 32)])
    for n, k, l in param_cases:
        bench("Parameter Generation", f"n={n} k={k} l={l}",
              lambda n=n, k=k, l=l: build(n, k, l, MODULI3))

    # --- CRS Generation (:56-88) ----------------------------------------
    crs_cases = [(256, 8, MODULI2)] + ([] if args.quick else [(512, 16, MODULI3)])
    for k, l, mod in crs_cases:
        p = build(4, k, l, mod)
        bench("CRS Generation", f"k={k} l={l} L={len(mod)}",
              lambda p=p: jax.block_until_ready(
                  PvwCrs.new(p, jax.random.fold_in(key, 1)).matrix.hi))

    # --- Key Generation (:90-137) ---------------------------------------
    for k, l, mod in crs_cases:
        p = build(4, k, l, mod)
        crs = PvwCrs.new(p, jax.random.fold_in(key, 2))
        bench("Key Generation", f"secret k={k} l={l}",
              lambda p=p: SecretKey.random(p, jax.random.fold_in(key, 3)))
        sk = SecretKey.random(p, jax.random.fold_in(key, 4))
        bench("Key Generation", f"public k={k} l={l}",
              lambda sk=sk, crs=crs: jax.block_until_ready(
                  PublicKey.generate(sk, crs, jax.random.fold_in(key, 5))[0]
                  .key_polynomials.hi))

    # --- Sampling (:139-162) --------------------------------------------
    rng = np.random.default_rng(0)
    bench("Sampling", "gaussian vec 256 (bound 2^40)",
          lambda: sample_discrete_gaussian_vec(1 << 40, 256, rng))
    for var in (0.5, 1.0):
        bench("Sampling", f"cbd 10000 var={var}",
              lambda var=var: jax.block_until_ready(
                  sample_vec_cbd(jax.random.fold_in(key, 6), (10000,), var)))

    # --- Validation (:164-194) ------------------------------------------
    p = build(4, 256, 8, MODULI2)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 7))
    sk = SecretKey.random(p, jax.random.fold_in(key, 8))
    pk, _ = PublicKey.generate(sk, crs, jax.random.fold_in(key, 9))
    bench("Validation", "crs k=256", lambda: crs.validate())
    bench("Validation", "public key k=256", lambda: pk.validate())
    bench("Validation", "secret key k=256", lambda: sk.validate())

    # --- Encryption / Decryption (NOT benched by the reference) ---------
    n_enc = 64 if args.quick else 256
    p = build(n_enc, 32, 8, MODULI2)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 10))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, p, jax.random.fold_in(key, 20 + i))
               for i in range(p.n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 11))
    scalars = np.arange(8 * p.n, dtype=np.uint64).reshape(8, p.n)
    bench("Encryption", f"batch-8 n={p.n} k=32",
          lambda: jax.block_until_ready(
              encrypt_batch(scalars, gpk, jax.random.fold_in(key, 12)).c1.hi),
          repeats=3)
    ct = encrypt_batch(
        np.arange(p.n * p.n, dtype=np.uint64).reshape(p.n, p.n) % 1000,
        gpk, jax.random.fold_in(key, 13))
    bench("Decryption", f"party shares d={p.n} k=32",
          lambda: decrypt_party_shares(ct, parties[0].secret_key, 0),
          repeats=3)

    print("\ngroup totals (median ms):")
    for g in dict.fromkeys(r[0] for r in rows):
        tot = sum(ms for gg, _, ms in rows if gg == g)
        print(f"  {g:22s} {tot:10.3f}")


if __name__ == "__main__":
    main()
