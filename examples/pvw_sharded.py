"""Sharded PVW deployment demo: the same PVSS flow as ``examples/pvw.py``
run over a multi-device mesh, with all three scaling backends shown:

1. the (recv, kdim) mesh — B/c2 row-sharded over receivers, the k
   contraction split over kdim with all_gather + modular-reduce
   collectives (``encrypt_batch_sharded``);
2. RNS limb-parallel — per-shard limb-restricted programs, zero
   collectives (``encrypt_batch_limb_parallel``);
3. the 3-axis GRID composing both (``encrypt_batch_grid``).

Every backend is BIT-IDENTICAL to the single-device kernel under the
same key (counter-based randomness — the reference's rayon/thread_rng
parallelism cannot even express this property; SURVEY.md §2.2), which
the demo verifies, then decrypts through the shard-local device decode.

Run: ``python examples/pvw_sharded.py [--devices 8]``
(CPU: spawns virtual devices; on a TPU pod the same code rides ICI.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--parties", type=int, default=64)
    ap.add_argument("--dimension", type=int, default=64)
    ap.add_argument("--dealers", type=int, default=16)
    args = ap.parse_args()

    # virtual CPU mesh unless a real multi-chip platform is present
    if os.environ.get("JAX_PLATFORMS") != "tpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from pvw_tpu import (
        GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    )
    from pvw_tpu.crypto.encryption import encrypt_batch
    from pvw_tpu.parallel import (
        decrypt_party_shares_grid, decrypt_party_shares_limb_parallel,
        decrypt_party_shares_sharded, encrypt_batch_grid,
        encrypt_batch_limb_parallel, encrypt_batch_sharded, make_mesh,
    )

    devices = jax.devices()[: args.devices]
    print(f"devices: {len(devices)} x {devices[0].platform}")

    # 4x55-bit chain (the reference's 128-bit-security example,
    # examples/pvw_valid_dec.rs:40-45)
    moduli = (0x80000000080001, 0x80000000130001,
              0x80000000190001, 0x800000001D0001)
    n, k, d = args.parties, args.dimension, args.dealers
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, 8, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
              .set_l(8).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))

    vectors = np.array([[dd * 10 + r + 1 for r in range(n)]
                        for dd in range(d)], np.uint64)
    enc_key = jax.random.fold_in(key, 5)
    ct_ref = encrypt_batch(vectors, gpk, enc_key)  # single-device reference

    def check(tag, ct_like, decrypt_fn, party):
        same = (np.array_equal(np.asarray(ct_like.c1.hi),
                               np.asarray(ct_ref.c1.hi))
                and np.array_equal(np.asarray(ct_like.c2.lo),
                                   np.asarray(ct_ref.c2.lo)))
        vals = decrypt_fn(party)
        ok = vals == [int(vectors[dd][party]) for dd in range(d)]
        print(f"  {tag}: bit-identical={same}, decrypt ok={ok}")
        assert same and ok

    # 1. (recv, kdim) mesh
    mesh = make_mesh(devices)
    t0 = time.time()
    ct = encrypt_batch_sharded(vectors, gpk, enc_key, mesh)
    print(f"(recv={mesh.shape['recv']}, kdim={mesh.shape['kdim']}) mesh "
          f"encrypt in {time.time() - t0:.2f}s")
    check("mesh", ct,
          lambda p: decrypt_party_shares_sharded(
              ct, parties[p].secret_key, p, mesh), 1)

    # 2. limb-parallel (one RNS limb group per device, zero collectives)
    lp_devs = devices[: min(len(devices), params.ring.num_limbs)]
    t0 = time.time()
    ct_lp = encrypt_batch_limb_parallel(vectors, gpk, enc_key, lp_devs)
    print(f"limb-parallel over {len(lp_devs)} devices "
          f"encrypt in {time.time() - t0:.2f}s")
    g = ct_lp.gather()
    check("limb-parallel", g,
          lambda p: decrypt_party_shares_limb_parallel(
              ct_lp, parties[p].secret_key, p), 2)

    # 2b. dealer-batch data-parallel (throughput scaling, zero
    # collectives; bit-identity to the single-device batch holds under
    # the v3k stream — see the module docstring)
    from pvw_tpu.config import settings
    from pvw_tpu.parallel import encrypt_batch_data_parallel

    settings.noise_stream = "v3k"
    try:
        ct_ref_v3k = encrypt_batch(vectors, gpk, enc_key)
        t0 = time.time()
        ct_dp = encrypt_batch_data_parallel(vectors, gpk, enc_key,
                                            devices[:4]).gather()
        print(f"data-parallel over 4 devices encrypt in "
              f"{time.time() - t0:.2f}s")
        same = (np.array_equal(np.asarray(ct_dp.c1.hi),
                               np.asarray(ct_ref_v3k.c1.hi))
                and np.array_equal(np.asarray(ct_dp.c2.lo),
                                   np.asarray(ct_ref_v3k.c2.lo)))
        vals = decrypt_party_shares_sharded(
            ct_dp, parties[4].secret_key, 4, make_mesh(devices[:1], kdim=1))
        ok = vals == [int(vectors[dd][4]) for dd in range(d)]
        print(f"  data-parallel: bit-identical={same}, decrypt ok={ok}")
        assert same and ok
    finally:
        settings.reset()

    # 3. 3-axis GRID: limb groups x (recv, kdim)
    if len(devices) >= 4:
        t0 = time.time()
        ct_g = encrypt_batch_grid(vectors, gpk, enc_key, devices,
                                  limb_groups=2,
                                  kdim=2 if len(devices) >= 8 else 1)
        print(f"3-axis GRID over {len(devices)} devices "
              f"encrypt in {time.time() - t0:.2f}s")
        check("grid", ct_g.gather(),
              lambda p: decrypt_party_shares_grid(
                  ct_g, parties[p].secret_key, p), 3)

    print("sharded deployment demo OK")


if __name__ == "__main__":
    main()
