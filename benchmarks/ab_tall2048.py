"""Deciding A/B for the (2048, 128) headline tile (round 5).

probe_vmem_tiles measured (2048,128) at 1.007x the (1024,128) default —
inside tunnel noise. This harness alternates the two tiles A/B/A/B (each
leg its own compile, timed loop, scalar-fetch sync) several rounds in one
session so drift cancels, and prints per-round ratios plus the pooled
verdict. Adoption requires the pooled ratio to clear 1.005 with every
round >= 1.0 (the +1.4% (1024,128) adoption bar from round 4, tightened
for the smaller effect).

Usage: AB_ROUNDS=3 AB_REPS=20 python benchmarks/ab_tall2048.py
Env: AB_N (receivers, default 4096), AB_BATCH (default 8192), AB_TILE
("2048,128"), so the same deciding harness covers the n=8192 family.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pvw_tpu import GlobalPublicKey, PvwCrs, PvwParameters, \
        PvwParametersBuilder
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    n = int(os.environ.get("AB_N", "4096"))
    k, l = 256, 8
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    batch = int(os.environ.get("AB_BATCH", "8192"))
    reps = int(os.environ.get("AB_REPS", "20"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    cand = tuple(int(x) for x in
                 os.environ.get("AB_TILE", "2048,128").split(","))
    preset = os.environ.get("AB_PRESET")
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731

    if preset:
        from pvw_tpu.params import presets

        params = presets.get_preset(preset)
        n, k, l = params.n, params.k, params.l
    else:
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

    def run(tiles, limit, tag):
        jax.clear_caches()
        if tiles is not None:
            settings.tile_m, settings.tile_n = tiles
        settings.vmem_limit_mb = limit

        def step(i):
            return _encrypt_kernel(
                params, a_dig, b_dig, sc_hi, sc_lo,
                jax.random.fold_in(key, 777 + i), True, None, None, "v4",
            )

        try:
            out0 = step(0)
            _ = np.asarray(out0[0][(0,) * out0[0].ndim])
            t0 = time.perf_counter()
            for i in range(reps):
                out = step(i + 1)
            _ = np.asarray(out[0][(0,) * out[0].ndim])
            dt = time.perf_counter() - t0
            rate = reps * batch / dt
            log(f"  {tag}: {rate:.1f} enc/s ({dt:.3f}s)")
            del out, out0
            return rate
        finally:
            settings.reset()

    ratios = []
    a_rates, b_rates = [], []
    for r in range(rounds):
        log(f"--- round {r + 1}/{rounds} (n={n}, batch={batch}) ---")
        ra = run(None, None, "auto-default tiles")
        rb = run(cand, 100, f"{cand} @100MB")
        a_rates.append(ra)
        b_rates.append(rb)
        ratios.append(rb / ra)
        log(f"  round ratio: {rb / ra:.4f}")
    pooled = sum(b_rates) / sum(a_rates)
    log(f"pooled {cand}/default: {pooled:.4f} "
        f"(rounds: {', '.join(f'{x:.4f}' for x in ratios)})")
    log(f"verdict: {'ADOPT-candidate' if pooled >= 1.005 and min(ratios) >= 1.0 else 'no adoption'}")


if __name__ == "__main__":
    main()
