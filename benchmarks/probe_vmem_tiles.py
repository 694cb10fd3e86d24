"""Hardware probe: tiles beyond the 16 MiB scoped-VMEM ceiling (round 5).

Every tile envelope in this repo was shaped by Mosaic's default scoped-VMEM
ceiling (~16 MiB): the tall (1024, 128) tile sat "right at the 16M ceiling"
and every larger neighbor was rejected (DESIGN.md §9, _VMEM_LIMIT_* gates).
But that ceiling is a compiler soft limit, not the hardware — v5e physically
carries ~128 MiB of VMEM, and a 96 MiB working set (32 MiB scratch + double-
buffered 32 MiB in/out blocks) compiles AND runs with
``CompilerParams(vmem_limit_bytes=100 MiB)`` (measured this session). This
probe measures whether the bigger tiles that limit admits actually win.

Method (same discipline as probe_pipeline.py):
- identity leg: one encrypt per tile under the v3k stream (geometry-
  independent by construction — global counters) must produce device
  checksums bit-identical to the default-tile run;
- throughput leg: timed v4 production loop per tile, same session,
  default tiles first and last (A/B/A) to bracket tunnel drift.

Usage:
  AB_BATCH=8192 AB_REPS=10 PVW_VMEM_MB=100 python benchmarks/probe_vmem_tiles.py
  PROBE_SHAPE=config3|config4|headline selects the measured family.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SHAPES = {
    # name: (n, k, l, moduli, batch, candidate tiles)
    "headline": (4096, 256, 8, (0xFFFFC4001, 0x1FFFFE0001), 8192,
                 [(2048, 128), (4096, 128), (1024, 256), (2048, 256),
                  (1024, 512)]),
    # pvss_8192 (m=8192 receivers): the tall tiles were never testable
    # here — Mosaic rejected m=8192 at the default ceiling (16.13M,
    # DESIGN.md §9 r4) — the raised limit makes them probeable
    "pvss8192": (8192, 256, 8, (0xFFFFC4001, 0x1FFFFE0001), 2048,
                 [(1024, 128), (2048, 128), (4096, 128)]),
    # shares_n1024 family (4 x 55-bit limbs, nd=5): kd = 1280
    "config3": (1024, 256, 8,
                (0x80000000080001, 0x80000000130001,
                 0x800000001D0001, 0x80000000440001), 1024,
                [(1024, 128), (1024, 256), (512, 256), (512, 512)]),
    # threshold_256bit family (17 x 61-bit limbs, nd=8): kd = 4096
    "config4": (1024, 512, 16,
                None, 256,   # moduli from the preset
                [(512, 128), (1024, 128), (512, 256), (256, 256)]),
}


def main():
    import jax
    import jax.numpy as jnp

    from pvw_tpu import (
        GlobalPublicKey, PvwCrs, PvwParameters, PvwParametersBuilder,
    )
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    shape = os.environ.get("PROBE_SHAPE", "headline")
    n, k, l, moduli, batch, candidates = SHAPES[shape]
    batch = int(os.environ.get("AB_BATCH", str(batch)))
    reps = int(os.environ.get("AB_REPS", "10"))
    vmem_mb = int(os.environ.get("PVW_VMEM_MB", "100"))

    if moduli is None:
        from pvw_tpu.params import presets

        params = presets.get_preset("threshold_256bit")
        n, k, l = params.n, params.k, params.l
    else:
        b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
        params = (
            PvwParametersBuilder()
            .set_parties(n).set_dimension(k).set_l(l)
            .set_moduli(moduli).set_secret_variance(0.5)
            .set_error_bounds_u32(b1, b2).build()
        )
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log(f"shape {shape}: n={n} k={k} l={l} L={params.ring.num_limbs} "
        f"nd={params.ring.num_digits} batch={batch} vmem={vmem_mb}MB")

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

    def checksum(out):
        parts = []
        for x in out:
            parts.append(jnp.sum(x, dtype=jnp.uint32))
            parts.append(jnp.sum(x[..., ::7], dtype=jnp.uint32))
        return np.asarray(jnp.stack(parts))

    def run(tiles, stream, tag, timed=True, limit=None):
        jax.clear_caches()
        if tiles is not None:
            settings.tile_m, settings.tile_n = tiles
        settings.vmem_limit_mb = limit

        def step(i):
            return _encrypt_kernel(
                params, a_dig, b_dig, sc_hi, sc_lo,
                jax.random.fold_in(key, 777 + i), True, None, None, stream,
            )

        try:
            out0 = step(0)
            digest = checksum(out0)
            _ = np.asarray(out0[0][(0,) * out0[0].ndim])
            if not timed:
                del out0
                return None, digest
            t0 = time.perf_counter()
            for i in range(reps):
                out = step(i + 1)
            _ = np.asarray(out[0][(0,) * out[0].ndim])
            dt = time.perf_counter() - t0
            rate = reps * batch / dt
            log(f"{tag}: {reps} x batch-{batch} in {dt:.3f}s -> "
                f"{rate:.1f} enc/s")
            del out, out0
            return rate, digest
        except Exception as e:  # noqa: BLE001 — report compile failures
            log(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:300]})")
            return None, None
        finally:
            settings.reset()

    # identity leg (v3k is tile-geometry-independent)
    log("--- identity leg (v3k) ---")
    _, d_ref = run(None, "v3k", "default tiles v3k", timed=False)
    ok_tiles = []
    for tiles in candidates:
        _, d = run(tiles, "v3k", f"{tiles} v3k @ {vmem_mb}MB",
                   timed=False, limit=vmem_mb)
        if d is None:
            continue
        if d_ref is None:
            # reference leg failed (e.g. a transient remote-compile
            # error): candidates that compiled can still be timed, but
            # flag them unverified instead of false-failing the gate
            log(f"  {tiles}: compiled; identity UNVERIFIED "
                "(reference leg failed)")
            ok_tiles.append(tiles)
            continue
        same = np.array_equal(d_ref, d)
        log(f"  {tiles}: checksum match = {same}")
        if same:
            ok_tiles.append(tiles)

    # throughput leg (v4 production stream)
    log("--- throughput leg (v4) ---")
    r_a, _ = run(None, "v4", "default tiles v4 [A]")
    results = {}
    for tiles in ok_tiles:
        r, _ = run(tiles, "v4", f"{tiles} v4 @ {vmem_mb}MB", limit=vmem_mb)
        if r:
            results[tiles] = r
    r_a2, _ = run(None, "v4", "default tiles v4 [A2]")
    base = max(x for x in (r_a, r_a2) if x) if (r_a or r_a2) else None
    if base:
        for tiles, r in sorted(results.items(), key=lambda kv: -kv[1]):
            log(f"{tiles}: {r / base:.3f}x vs default ({r:.0f} vs {base:.0f})")


if __name__ == "__main__":
    main()
