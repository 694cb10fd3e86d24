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
          f"({per_full:.2f} us/share, synced — includes one host fetch "
          f"round trip per call)", flush=True)
    print(f"threshold subset decrypt: {t_sub * 1e3:.2f} ms for {threshold} "
          f"shares ({per_sub:.2f} us/share, synced)", flush=True)
    print(f"synced ratio (subset/full per share): {per_sub / per_full:.3f}x",
          flush=True)

    # Pipelined (device-side economics): queue the device programs for
    # both paths, one sync at the end — removes the fixed per-call fetch
    # round trip (~25 ms on the axon tunnel) that otherwise dominates and
    # penalizes whichever path amortizes it over fewer shares.
    import jax.numpy as jnp

    from pvw_tpu.crypto.decryption import (
        _decrypt_decode_kernel, _decrypt_decode_kernel_ch,
        _decrypt_decode_subset_kernel, _decrypt_decode_subset_kernel_ch,
    )

    skp = sk0.to_polynomials()
    sel = jnp.asarray(np.asarray(valid, np.int32))
    if ct.c1.is_channel_major and ct.c2.is_channel_major:
        c1h, c1l = ct.c1.channel_pair()
        c2h, c2l = ct.c2[0].channel_pair()
        def run_full():
            return _decrypt_decode_kernel_ch(
                params, skp.hi, skp.lo, c1h, c1l, c2h, c2l)

        def run_sub():
            # the production path: gather fused into the decrypt program
            return _decrypt_decode_subset_kernel_ch(
                params, skp.hi, skp.lo, c1h, c1l, c2h, c2l, sel)
    else:
        def run_full():
            return _decrypt_decode_kernel(
                params, skp.hi, skp.lo, ct.c1.hi, ct.c1.lo,
                ct.c2.hi[0], ct.c2.lo[0])

        def run_sub():
            return _decrypt_decode_subset_kernel(
                params, skp.hi, skp.lo, ct.c1.hi, ct.c1.lo,
                ct.c2.hi[0], ct.c2.lo[0], sel)

    def timed(fn, count):
        out = fn()
        np.asarray(out[(0, 0)])
        t0 = time.perf_counter()
        for _ in range(ITERS * 4):
            out = fn()
        np.asarray(out[(0, 0)])
        return (time.perf_counter() - t0) / (ITERS * 4) / count * 1e6

    pf = timed(run_full, N)
    ps = timed(run_sub, threshold)
    print(f"pipelined: full {pf:.2f} us/share, subset {ps:.2f} us/share "
          f"(incl. the on-device subset gather) -> ratio {ps / pf:.3f}x "
          f"(target <= 1.2x; device-side cost)", flush=True)
    tot_sub, tot_full = ps * threshold / 1e3, pf * N / 1e3
    print(f"total-time framing: subset {tot_sub:.2f} ms vs full batch "
          f"{tot_full:.2f} ms -> {tot_sub / tot_full:.3f}x (a threshold "
          f"decrypt must not cost more than decrypting everything)",
          flush=True)


if __name__ == "__main__":
    main()
