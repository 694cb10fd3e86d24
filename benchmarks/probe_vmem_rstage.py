"""Hardware probe: raised-VMEM r-stage tiles on the deep chains (round 5).

Config 2 (broadcast_128bit) is ~97% r-stage-bound (BASELINE.md round-5
shape attack) and configs 2/4 route the r-stage through the fused
``ntt_prescale_band`` kernel, whose ``_prescale_tile`` search was capped by
the 15 MiB scoped-VMEM budget — at nd=8 the temp model (614 B per (kt*td)
element) forces tiny tiles. With ``settings.vmem_limit_mb`` the search may
use the real VMEM (~128 MiB on v5e, probe_vmem_tiles.py), so this probe
A/Bs END-TO-END encryption on the deep-chain presets:

  leg A  — default (15 MiB prescale budget, default matmul tiles)
  leg B  — PVW_TPU_VMEM_LIMIT_MB=100 (bigger prescale tiles; matmul tiles
           unchanged — the auto pick ignores the knob)
  leg A2 — default again (tunnel-drift bracket)

plus a v3k identity leg (geometry-independent stream) asserting leg B's
ciphertexts are bit-identical to leg A's.

Usage: AB_REPS=10 python benchmarks/probe_vmem_rstage.py [preset ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = {"broadcast_128bit": 256, "threshold_256bit": 256,
         "shares_n1024": 1024}


def main():
    import jax
    import jax.numpy as jnp

    from pvw_tpu import GlobalPublicKey, PvwCrs
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
    from pvw_tpu.ops.pallas_modmat import _prescale_tile
    from pvw_tpu.params import presets
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    reps = int(os.environ.get("AB_REPS", "10"))
    names = sys.argv[1:] or ["broadcast_128bit", "threshold_256bit"]

    for name in names:
        params = presets.get_preset(name)
        n, k, l = params.n, params.k, params.l
        batch = BATCH.get(name, 256)
        log(f"--- {name}: n={n} k={k} l={l} L={params.ring.num_limbs} "
            f"nd={params.ring.num_digits} batch={batch} ---")
        for mb in (None, 100):
            settings.vmem_limit_mb = mb
            log(f"  prescale tile @ vmem={mb}: "
                f"{_prescale_tile(params.ring, k, batch)}")
        settings.reset()

        key = jax.random.key(0)
        crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
        coeffs = sample_vec_cbd(
            jax.random.fold_in(key, 10_000), (n, k, l),
            params.secret_variance)
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

        def run(mb, stream, tag, timed=True):
            jax.clear_caches()
            settings.vmem_limit_mb = mb

            def step(i):
                return _encrypt_kernel(
                    params, a_dig, b_dig, sc_hi, sc_lo,
                    jax.random.fold_in(key, 777 + i), True, None, None,
                    stream)

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
                log(f"  {tag}: {reps} x batch-{batch} in {dt:.3f}s -> "
                    f"{rate:.1f} enc/s")
                del out, out0
                return rate, digest
            except Exception as e:  # noqa: BLE001
                log(f"  {tag}: FAILED ({type(e).__name__}: {str(e)[:300]})")
                return None, None
            finally:
                settings.reset()

        _, d_ref = run(None, "v3k", "default v3k", timed=False)
        _, d_b = run(100, "v3k", "100MB v3k", timed=False)
        if d_ref is not None and d_b is not None:
            same = np.array_equal(d_ref, d_b)
            log(f"  identity (100MB vs default, v3k): {same}")
            if not same:
                continue
        r_a, _ = run(None, "v4", "default v4 [A]")
        r_b, _ = run(100, "v4", "100MB  v4 [B]")
        r_a2, _ = run(None, "v4", "default v4 [A2]")
        base = max(x for x in (r_a, r_a2) if x) if (r_a or r_a2) else None
        if base and r_b:
            log(f"  {name}: 100MB/default = {r_b / base:.3f}x "
                f"({r_b:.0f} vs {base:.0f})")


if __name__ == "__main__":
    main()
