"""Threshold-decrypt benchmark (VERDICT r2 item 4).

Times ``decrypt_valid_shares`` on a 512-of-1024-dealer subset against the
plain batched ``decrypt_party_shares`` over all 1024 dealers, per share —
the round-1 "done" criterion is subset decrypt within 1.2x of the plain
batched path per message (the subset gather must not destroy the batched
decode's economics). Config: n=1024 receivers, k=256, l=8, the headline
2-limb modulus family (examples/pvw.rs chain at scale).

Usage: python benchmarks/time_threshold.py [iters] [n] [k]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ELL = 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def main():
    from pvw_tpu import GlobalPublicKey, PvwCrs
    from pvw_tpu.crypto.decryption import decrypt_party_shares
    from pvw_tpu.crypto.encryption import encrypt_all_party_shares_batched
    from pvw_tpu.crypto.threshold import decrypt_valid_shares
    from pvw_tpu.keys.secret_key import SecretKey
    from pvw_tpu.keys.public_key import Party
    from pvw_tpu.sampling.cbd import sample_vec_cbd
    from pvw_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    t0 = time.time()
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    coeffs = sample_vec_cbd(jax.random.fold_in(key, 10_000),
                            (N, K, params.l), params.secret_variance)
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_keys_device(coeffs, jax.random.fold_in(key, 1))
    print(f"setup (CRS + keygen {N}) in {time.time() - t0:.1f}s", flush=True)

    # party 0's secret key from the same device-resident coefficients
    sk0 = SecretKey(params, np.asarray(coeffs[0]))
    _ = Party  # API parity import

    rng = np.random.default_rng(0)
    vectors = rng.integers(0, 1 << 32, size=(N, N), dtype=np.uint64)
    t0 = time.time()
    ct = encrypt_all_party_shares_batched(vectors, gpk,
                                          jax.random.fold_in(key, 5))
    jax.block_until_ready(ct.c2.channel_pair()[0]
                          if ct.c2.is_channel_major else ct.c2.hi)
    print(f"encrypt_all ({N} dealers) in {time.time() - t0:.1f}s", flush=True)

    threshold = N // 2
    valid = sorted(rng.permutation(N)[:threshold].tolist())

    # warm both paths
    t0 = time.time()
    full = decrypt_party_shares(ct, sk0, 0)
    print(f"warm full decrypt in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    sub = decrypt_valid_shares(ct, valid, threshold, sk0, 0)
    print(f"warm subset decrypt in {time.time() - t0:.1f}s", flush=True)
    assert [s for _, s in sub] == [full[i] for i in valid], "subset mismatch"

    t0 = time.time()
    for _ in range(ITERS):
        full = decrypt_party_shares(ct, sk0, 0)
    t_full = (time.time() - t0) / ITERS
    t0 = time.time()
    for _ in range(ITERS):
        sub = decrypt_valid_shares(ct, valid, threshold, sk0, 0)
    t_sub = (time.time() - t0) / ITERS

    per_full = t_full / N * 1e6
    per_sub = t_sub / threshold * 1e6
    print(f"plain batched decrypt: {t_full * 1e3:.2f} ms for {N} shares "
          f"({per_full:.2f} us/share)", flush=True)
    print(f"threshold subset decrypt: {t_sub * 1e3:.2f} ms for {threshold} "
          f"shares ({per_sub:.2f} us/share)", flush=True)
    print(f"ratio (subset/full per share): {per_sub / per_full:.3f}x "
          f"(target <= 1.2x)", flush=True)


if __name__ == "__main__":
    main()
