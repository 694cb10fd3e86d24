"""Hardware A/B of the software-pipelined fold kernel (DESIGN.md §9
overlap lever; VERDICT r4 next-round #3): fused body (fold serialized
after dots by data dependence) vs pipelined body (fold of channel c-1
under the dots of channel c, parity-alternating column scratch) at the
headline shape, same session, forced common tiles.

The v4 stream depends only on (key, tile geometry), and the pipelined
body draws it with identical blockmix seeds — outputs are asserted
bit-identical before timing. jax.clear_caches() between variants (the
pipeline_fold knob is read at trace time).

Usage: AB_BATCH=8192 AB_REPS=10 python benchmarks/probe_pipeline.py
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

    import jax.numpy as jnp

    def checksum(out):
        """Device-side digest (wrapping uint32 sums over full tensors +
        a strided view) — bit-identity regression check without fetching
        GBs through the tunnel (the exact equality contract is pinned in
        interpret mode by tests/test_pipeline.py)."""
        parts = []
        for x in out:
            parts.append(jnp.sum(x, dtype=jnp.uint32))
            parts.append(jnp.sum(x[..., ::7], dtype=jnp.uint32))
        return np.asarray(jnp.stack(parts))

    def run(pipelined, tag, tiles):
        jax.clear_caches()
        settings.tile_m, settings.tile_n = tiles
        settings.pipeline_fold = pipelined

        def step(i):
            return _encrypt_kernel(
                params, a_dig, b_dig, sc_hi, sc_lo,
                jax.random.fold_in(key, 777 + i), True, None, None, "v4",
            )

        try:
            out0 = step(0)
            digest = checksum(out0)
            _ = np.asarray(out0[0][(0,) * out0[0].ndim])
            t0 = time.perf_counter()
            for i in range(reps):
                out = step(i + 1)
            _ = np.asarray(out[0][(0,) * out[0].ndim])
            dt = time.perf_counter() - t0
            rate = reps * batch / dt
            print(f"{tag}: {reps} x batch-{batch} in {dt:.3f}s -> "
                  f"{rate:.1f} enc/s", file=sys.stderr, flush=True)
            del out, out0
            return rate, digest
        except Exception as e:  # noqa: BLE001 — report compile failures
            print(f"{tag}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:300]})", file=sys.stderr, flush=True)
            return None, None
        finally:
            settings.reset()

    for tiles in ((512, 128), (256, 128)):
        print(f"--- forced tiles {tiles} ---", file=sys.stderr, flush=True)
        r_f, d_f = run(False, f"fused     {tiles} [A]", tiles)
        r_p, d_p = run(True, f"pipelined {tiles} [B]", tiles)
        r_f2, _ = run(False, f"fused     {tiles} [A2]", tiles)
        if d_f is not None and d_p is not None:
            same = np.array_equal(d_f, d_p)
            print(f"checksum match (pipelined vs fused): {same}",
                  file=sys.stderr, flush=True)
            assert same
        if r_f and r_p:
            print(f"pipelined/fused @ {tiles}: "
                  f"{r_p / max(r_f, r_f2 or r_f):.3f}x",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
