"""Same-session A/B of the value-plane noise MAC (PVW_TPU_NOISE_VALS).

Times the batched encryption kernel at the headline config with the
digit-plane MAC (PVW_TPU_NOISE_VALS=0) and the value-plane MAC (default)
back-to-back in ONE process/tunnel session — the axon tunnel's run-to-run
variance (up to 2.7x, BASELINE.md) makes cross-process A/Bs meaningless.
Also round-trips one encryption through decryption under the vals path to
pin hardware correctness (the interpret-mode twin is
tests/test_modarith.py::test_noise_value_planes_exact).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pvw_tpu import (
        GlobalPublicKey, PvwCrs, PvwParameters, PvwParametersBuilder,
    )
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    n, k, l = 4096, 256, 8
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    batch = int(os.environ.get("AB_BATCH", "1024"))
    reps = int(os.environ.get("AB_REPS", "20"))

    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    params = (
        PvwParametersBuilder()
        .set_parties(n).set_dimension(k).set_l(l)
        .set_moduli(moduli).set_secret_variance(0.5)
        .set_error_bounds_u32(b1, b2).build()
    )
    print(f"bounds: b1={params.error_bound_1} b2={params.error_bound_2}",
          file=sys.stderr)
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    coeffs = sample_vec_cbd(
        jax.random.fold_in(key, 10_000), (n, k, l), params.secret_variance
    )
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_keys_device(coeffs, jax.random.fold_in(key, 1))

    rng = np.random.default_rng(0)
    scalars = rng.integers(0, 1 << 32, size=(batch, n), dtype=np.uint64)
    sc_hi, sc_lo = _scalars_to_pairs(scalars)
    a_dig, b_dig = gpk.encrypt_operands()

    def run(tag):
        jax.clear_caches()

        def step(i):
            from pvw_tpu.config import settings

            return _encrypt_kernel(
                params, a_dig, b_dig, sc_hi, sc_lo,
                jax.random.fold_in(key, 777 + i), True,
                None, None, settings.kernel_noise_stream(),
            )

        out0 = step(0)
        _ = np.asarray(out0[0][(0,) * out0[0].ndim])     # true device sync
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(i + 1)
        _ = np.asarray(out[0][(0,) * out[0].ndim])
        dt = time.perf_counter() - t0
        rate = reps * batch / dt
        print(f"{tag}: {reps} x batch-{batch} in {dt:.3f}s -> "
              f"{rate:.1f} enc/s", file=sys.stderr)
        return rate

    os.environ["PVW_TPU_NOISE_VALS"] = "0"
    rate_dig = run("digit-plane MAC")
    del os.environ["PVW_TPU_NOISE_VALS"]
    rate_val = run("value-plane MAC")
    print(f"speedup vals/digits: {rate_val / rate_dig:.3f}x", file=sys.stderr)

    # correctness on hardware: one encryption via the vals path, decrypt
    # a few parties' values
    from pvw_tpu.crypto.decryption import decrypt_party_value
    from pvw_tpu.crypto.encryption import encrypt
    from pvw_tpu.keys.secret_key import SecretKey

    ct = encrypt(scalars[0], gpk, jax.random.fold_in(key, 55))
    ok = True
    for pi in (0, 17, n - 1):
        sk = SecretKey.from_coefficients(params, np.asarray(coeffs[pi]))
        got = decrypt_party_value(ct, sk, pi)
        ok = ok and (got == int(scalars[0, pi]))
    print(f"round-trip: {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
