"""Same-session A/B/A of the noise streams: v4 (hardware PRNG) vs v3k
(in-kernel Threefry-2x32-20, round 5) vs v3 (legacy separate threefry
pass) at the headline config — the measurement behind the round-5
CSPRNG-default decision (VERDICT r4 weak #2 / next-round #2).

One process, one tunnel session (run-to-run variance up to 2.7x makes
cross-process A/Bs meaningless). The stream is a STATIC argument of the
jitted kernel, so each variant traces its own program. Also verifies the
v3k hardware kernel is bit-identical to the XLA reference stream
(the cross-backend contract interpret-mode tests pin on CPU, re-checked
here on silicon) and round-trips a v3k encryption through decryption.

Usage: AB_BATCH=8192 AB_REPS=10 python benchmarks/ab_noise_stream.py
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
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    n, k, l = 4096, 256, 8
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    batch = int(os.environ.get("AB_BATCH", "8192"))
    reps = int(os.environ.get("AB_REPS", "10"))

    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    params = (
        PvwParametersBuilder()
        .set_parties(n).set_dimension(k).set_l(l)
        .set_moduli(moduli).set_secret_variance(0.5)
        .set_error_bounds_u32(b1, b2).build()
    )
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

    def run(stream, tag):
        # drop the previous variant's executables + constant buffers: at
        # batch 8192 three live variants exhaust HBM (the v3 run OOMed
        # before this was added)
        jax.clear_caches()

        def step(i):
            return _encrypt_kernel(
                params, a_dig, b_dig, sc_hi, sc_lo,
                jax.random.fold_in(key, 777 + i), True, None, None, stream,
            )

        out0 = step(0)
        _ = np.asarray(out0[0][(0,) * out0[0].ndim])     # true device sync
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(i + 1)
        _ = np.asarray(out[0][(0,) * out[0].ndim])
        dt = time.perf_counter() - t0
        rate = reps * batch / dt
        del out, out0
        print(f"{tag}: {reps} x batch-{batch} in {dt:.3f}s -> "
              f"{rate:.1f} enc/s", file=sys.stderr, flush=True)
        return rate

    # A/B/A/B to split tunnel drift from the stream effect
    r_v4a = run("v4", "stream v4 (hw PRNG)      [A]")
    r_v3k = run("v3k", "stream v3k (in-kernel tf)[B]")
    r_v4b = run("v4", "stream v4 (hw PRNG)      [A2]")
    r_v3kb = run("v3k", "stream v3k (in-kernel tf)[B2]")
    r_v3 = run(None, "stream v3 (separate pass)")
    v4 = max(r_v4a, r_v4b)
    v3k = max(r_v3k, r_v3kb)
    print(f"v3k/v4: {v3k / v4:.3f}x   v3/v4: {r_v3 / v4:.3f}x",
          file=sys.stderr, flush=True)

    # hardware-vs-reference bit-identity for the v3k stream: the fused
    # kernel's in-kernel threefry must equal the XLA reference path fed
    # the same key (the CPU interpret twin is tests/test_v3k.py)
    from pvw_tpu.ops import ntt as ntt_ops, tfry
    from pvw_tpu.ops.pallas_modmat import matmul_fold_scaled
    from pvw_tpu.ops import modmat

    d_small = 256
    sc_s = (sc_hi[:d_small], sc_lo[:d_small])
    kk = jax.random.fold_in(key, 31337)
    k0, k1 = tfry.key_words(kk)
    kd_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(kk).reshape(2), np.int32)
    import jax.numpy as jnp

    seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
    bound = params.error_bound_2
    jr = ntt_ops.signed_digit_count(bound)
    ring = params.ring
    from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows

    rc = sample_vec_cbd_rows(jax.random.fold_in(key, 99), 0, k,
                             (d_small, l), params.secret_variance)
    rb = ntt_ops.ntt_forward_signed_ch(rc, ring, cbd_bound(0.5))
    r_op = modmat.prescale_digits_band(rb, ring)
    gh, gl = matmul_fold_scaled(None, r_op, ring, lhs_dig=b_dig,
                                gen_noise=(seeds, jr, int(bound), "tfry"))
    planes = tfry.v3k_noise_digit_planes(k0, k1, 0, n, d_small, l, bound)
    rh, rl = matmul_fold_scaled(None, r_op, ring, noise=planes,
                                lhs_dig=b_dig, noise_bound=int(bound))
    bit_ok = (np.array_equal(np.asarray(gh), np.asarray(rh))
              and np.array_equal(np.asarray(gl), np.asarray(rl)))
    print(f"v3k hardware kernel == XLA reference stream: {bit_ok}",
          file=sys.stderr, flush=True)

    # round-trip under v3k
    from pvw_tpu.crypto.decryption import decrypt_party_value
    from pvw_tpu.crypto.encryption import encrypt
    from pvw_tpu.keys.secret_key import SecretKey

    settings.noise_stream = "v3k"
    try:
        ct = encrypt(scalars[0], gpk, jax.random.fold_in(key, 55))
        ok = True
        for pi in (0, 17, n - 1):
            sk = SecretKey.from_coefficients(params, np.asarray(coeffs[pi]))
            ok = ok and (decrypt_party_value(ct, sk, pi)
                         == int(scalars[0, pi]))
    finally:
        settings.reset()
    print(f"v3k round-trip: {'OK' if ok else 'MISMATCH'}", file=sys.stderr,
          flush=True)
    if not (ok and bit_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
