"""Multi-party PVW vector encryption demo.

Mirror of ``/root/reference/examples/pvw.rs``: n parties each encrypt a
vector of values (dealer rows), every party decrypts exactly its own
column, and the full n x n share matrix is verified, with timing report.

Run: ``python examples/pvw.py [--cpu]``
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--parties", type=int, default=7)
    ap.add_argument("--dimension", type=int, default=32)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pvw_tpu import (
        GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
        decrypt_party_shares, encrypt_all_party_shares_batched,
    )

    print("=== Multi-Party Vector Encryption Demo ===\n")

    # Configuration (examples/pvw.rs:28-34)
    num_parties = args.parties
    ring_degree = 8
    dimension = args.dimension
    secret_variance = 0.5
    moduli = (0xFFFFC4001, 0x1FFFFE0001)

    b1, b2 = PvwParameters.suggest_error_bounds(
        num_parties, dimension, ring_degree, moduli, secret_variance
    )
    print(f"Suggested bound1: {b1}, Suggested bound2: {b2}, "
          f"Secret variance: {secret_variance}")

    params = (
        PvwParametersBuilder()
        .set_parties(num_parties).set_dimension(dimension)
        .set_l(ring_degree).set_moduli(moduli)
        .set_secret_variance(secret_variance)
        .set_error_bounds_u32(b1, b2)
        .build()
    )

    print("PVW Parameters:")
    print(f"  Parties: {params.n}, Dimension: {params.k}, "
          f"Ring degree: {params.l}")
    print(f"  Delta: {params.delta()}, Modulus bits: "
          f"{params.q_total().bit_length()}")
    print(f"  Correctness condition: "
          f"{'OK' if params.verify_correctness_condition() else 'NOT satisfied'}\n")

    key = jax.random.key(0)

    # Setup: CRS + all party keys (examples/pvw.rs:84-92)
    t0 = time.time()
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(num_parties)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    print(f"Setup (CRS + {num_parties} keys): {time.time() - t0:.3f}s")

    # Share matrix: dealer d encrypts value d*1000 + j for recipient j
    vectors = np.array(
        [[d * 1000 + j + 1 for j in range(num_parties)]
         for d in range(num_parties)], np.uint64
    )
    print("\nShare Distribution Matrix (rows = dealers):")
    for d in range(num_parties):
        print("  " + " ".join(f"{int(v):6d}" for v in vectors[d]))

    # Encrypt all dealers at once (rayon P6 -> ONE batched kernel)
    t0 = time.time()
    ct = encrypt_all_party_shares_batched(vectors, gpk, jax.random.fold_in(key, 2))
    jax.block_until_ready(ct.c1.hi)
    enc_time = time.time() - t0
    print(f"\nEncryption ({num_parties} dealers x {num_parties} receivers): "
          f"{enc_time:.3f}s")

    # Each party decrypts its column from every dealer
    t0 = time.time()
    ok = 0
    total = 0
    for pi, party in enumerate(parties):
        shares = decrypt_party_shares(ct, party.secret_key, pi)
        for d in range(num_parties):
            total += 1
            if shares[d] == int(vectors[d][pi]):
                ok += 1
    dec_time = time.time() - t0
    print(f"Decryption ({total} values): {dec_time:.3f}s")
    print(f"\nVerification: {ok}/{total} correct "
          f"({100.0 * ok / total:.1f}%)")
    if ok != total:
        sys.exit(1)
    print("All shares recovered correctly.")


if __name__ == "__main__":
    main()
