"""Hardware validation of the in-kernel PRNG noise path ("stream v4").

Runs ONLY on a real TPU (the Pallas interpreter's PRNG ignores seeds, so
CPU can't validate seeding semantics). Checks:
1. round-trip: encrypt (v4 noise) -> device decode recovers every scalar;
2. determinism: same key => bit-identical ciphertexts, twice;
3. key sensitivity: different key => different ciphertexts;
4. noise extraction (zero lhs, no encode): inverse NTT of the kernel
   output recovers raw noise values — all within [-bound, bound], mean
   near 0, non-degenerate across tiles (distinct per-tile seeds).
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import kernel_noise_available, matmul_fold_scaled
from pvw_tpu.params.ring import get_ring


DEFAULT_CONFIG = {
    "moduli": [0xFFFFC4001, 0x1FFFFE0001],
    "l": 8, "k": 256, "d": 1024, "rows": 1024,
    "bound": 200, "seed": 7,
    # The v4 stream is a function of (key, TILE GEOMETRY, backend): the
    # golden pins its tiles explicitly so a change to the production
    # tile-selection policy does not silently invalidate the digest.
    "tile_m": 512, "tile_n": 128,
}


def compute_golden(config) -> str:
    """Extract the raw stream-v4 noise values for ``config`` (zero-lhs
    kernel run -> inverse NTT -> centered limb-0 values) and return a
    stable digest. Committed as tests/data/noise_v4_golden.json and
    re-checked by tests/test_noise_v4.py::test_v4_golden whenever a TPU
    backend is present — the hardware-PRNG pin the CPU contract tests
    cannot provide."""
    import hashlib

    from pvw_tpu.ops.ntt import signed_digit_count

    moduli = tuple(config["moduli"])
    l, k, d, rows = (config[x] for x in ("l", "k", "d", "rows"))
    bound = config["bound"]
    ring = get_ring(moduli, l)
    assert kernel_noise_available(ring, rows, d, k, bound, False, False)
    from pvw_tpu.config import settings

    prev = (settings.tile_m, settings.tile_n)
    if config.get("tile_m"):
        settings.tile_m = int(config["tile_m"])
        settings.tile_n = int(config["tile_n"])
    try:
        L = ring.num_limbs
        zero_dig = jnp.zeros((L, l, rows, k * ring.num_digits), jnp.int8)
        rs = jnp.zeros((L, l, k, d, ring.num_digits, ring.num_digits),
                       jnp.int8)
        key = jax.random.key(config["seed"])
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(key).reshape(2), jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        jr = signed_digit_count(bound)
        oh, ol = matmul_fold_scaled(None, rs, ring, lhs_dig=zero_dig,
                                    gen_noise=(seeds, jr, bound))
    finally:
        settings.tile_m, settings.tile_n = prev
    zh = jnp.transpose(oh, (2, 3, 0, 1))
    zl = jnp.transpose(ol, (2, 3, 0, 1))
    nh, nl = ntt_ops.ntt_inverse((zh, zl), ring)
    res = u64op.join_u64_np(np.asarray(nh), np.asarray(nl))
    q0 = moduli[0]
    v0 = res[..., 0, :].astype(np.int64)
    centered = np.where(v0 > q0 // 2, v0 - q0, v0).astype(np.int32)
    return hashlib.sha256(centered.tobytes()).hexdigest()


def emit_golden(path: str) -> None:
    import json

    digest = compute_golden(DEFAULT_CONFIG)
    with open(path, "w") as f:
        json.dump({"config": DEFAULT_CONFIG, "digest": digest}, f, indent=1)
    print(f"golden written to {path}: {digest}", flush=True)


def main():
    assert jax.default_backend() == "tpu", "v4 probe needs real TPU"
    if "--emit-golden" in sys.argv:
        import os

        emit_golden(os.path.join(
            __file__.rsplit("/", 2)[0], "tests", "data",
            "noise_v4_golden.json"))
        return
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    l, k, d, rows = 8, 32, 256, 1024
    bound = 200
    ring = get_ring(moduli, l)
    assert kernel_noise_available(ring, rows, d, k, bound, False, False)

    # 4. noise extraction via zero lhs
    L = ring.num_limbs
    zero_dig = jnp.zeros((L, l, rows, k * ring.num_digits), jnp.int8)
    rs = jnp.zeros((L, l, k, d, ring.num_digits, ring.num_digits), jnp.int8)
    key = jax.random.key(7)
    kd_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(2), jnp.int32)
    seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
    from pvw_tpu.ops.ntt import signed_digit_count

    jr = signed_digit_count(bound)
    oh, ol = matmul_fold_scaled(None, rs, ring, lhs_dig=zero_dig,
                                gen_noise=(seeds, jr, bound))
    oh2, ol2 = matmul_fold_scaled(None, rs, ring, lhs_dig=zero_dig,
                                  gen_noise=(seeds, jr, bound))
    ohn = np.asarray(oh)
    print("deterministic:", np.array_equal(ohn, np.asarray(oh2)),
          flush=True)
    seeds_b = jnp.concatenate([kd_words + 1, jnp.zeros(2, jnp.int32)])
    oh3, _ = matmul_fold_scaled(None, rs, ring, lhs_dig=zero_dig,
                                gen_noise=(seeds_b, jr, bound))
    print("key-sensitive:", not np.array_equal(ohn, np.asarray(oh3)),
          flush=True)

    # masked variant (round 3, the kdim>1 sharding contract): two
    # half-range masked calls must sum mod q to the unmasked call —
    # identical streams drawn, complementary row masks, noise AND encode
    # each landing exactly once across the partition
    def masked_seeds(lo, hi):
        return jnp.concatenate([
            kd_words, jnp.zeros(1, jnp.int32),
            jnp.asarray([lo], jnp.int32), jnp.asarray([hi], jnp.int32),
            jnp.zeros(1, jnp.int32)])

    oa_h, oa_l = matmul_fold_scaled(
        None, rs, ring, lhs_dig=zero_dig,
        gen_noise=(masked_seeds(0, rows // 2), jr, bound))
    ob_h, ob_l = matmul_fold_scaled(
        None, rs, ring, lhs_dig=zero_dig,
        gen_noise=(masked_seeds(rows // 2, rows), jr, bound))
    qh = jnp.asarray(ring.q_hi).reshape(-1, 1, 1, 1)
    ql = jnp.asarray(ring.q_lo).reshape(-1, 1, 1, 1)
    sh, sl = u64op.addmod(oa_h, oa_l, ob_h, ob_l, qh, ql)
    ok_mask = (np.array_equal(np.asarray(sh), ohn)
               and np.array_equal(np.asarray(sl), np.asarray(ol)))
    print("masked halves sum to unmasked:", ok_mask, flush=True)
    assert ok_mask

    # inverse NTT -> noise coefficients (channel-major [L, l, rows, d])
    zh = jnp.transpose(oh, (2, 3, 0, 1))          # [rows, d, L, l]
    zl = jnp.transpose(ol, (2, 3, 0, 1))
    nh, nl = ntt_ops.ntt_inverse((zh, zl), ring)
    res = u64op.join_u64_np(np.asarray(nh), np.asarray(nl))
    q0 = moduli[0]
    v0 = res[..., 0, :].astype(np.int64)          # limb-0 residues
    centered = np.where(v0 > q0 // 2, v0 - q0, v0)
    print("min/max:", centered.min(), centered.max(),
          "(bound", bound, ")", flush=True)
    print("mean:", float(centered.mean()), "std:", float(centered.std()),
          flush=True)
    assert centered.min() >= -bound and centered.max() <= bound
    # distinct tiles must differ (per-tile seeds): compare two m-tiles
    assert not np.array_equal(centered[:512], centered[512:1024])
    # limb consistency: limb-1 residues encode the SAME signed values
    q1 = moduli[1]
    v1 = res[..., 1, :].astype(np.int64)
    c1 = np.where(v1 > q1 // 2, v1 - q1, v1)
    assert np.array_equal(centered, c1), "limbs disagree on noise values"
    print("noise extraction OK", flush=True)

    # 1-3 full round trip with the production kernel
    from pvw_tpu import (
        GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
        decrypt_party_value, encrypt,
    )

    n_parties = 16
    b1, b2 = PvwParameters.suggest_error_bounds(n_parties, k, l, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n_parties).set_dimension(k)
              .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    sk_key = jax.random.key(1)
    crs = PvwCrs.new(params, jax.random.fold_in(sk_key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, params, jax.random.fold_in(sk_key, 100 + i))
               for i in range(n_parties)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(sk_key, 1))
    scalars = [7 * i + 1 for i in range(n_parties)]
    ct = encrypt(scalars, gpk, jax.random.fold_in(sk_key, 2))
    vals = [decrypt_party_value(ct, parties[i].secret_key, i)
            for i in range(n_parties)]
    print("round-trip:", vals == scalars, flush=True)
    assert vals == scalars


if __name__ == "__main__":
    main()
