"""Config-2 (broadcast_128bit, n=64) shape attack — VERDICT r4 #4.

The r4 numbers already localize the cost: at 19,368 enc/s a batch-256
encryption takes 13.2 ms while the r-stage ALONE (CBD -> fused
NTT+prescale of r) measures 12.9 ms (probe_rstage_cfg4) — config 2 is
~97% r-stage-bound, so the VERDICT's c1+c2 m-stacking hypothesis (MXU
m-tile occupancy) cannot move the number: the matmuls are not where the
time is. The lever that CAN is the swapped-operand kernel (DESIGN.md
§5f): the Shoup scales live on the CACHED lhs planes, so the
per-encryption r-stage drops from NTT+prescale-band (the 12.9 ms) to a
plain digit decomposition. It measured 5% SLOWER at the headline (where
the prescale is only ~30% of cost and the wider n-tiles hurt the
epilogue); this probe measures it where prescale dominates.

Same-session A/B at broadcast_128bit across batches, production banded
vs swapped (and the round-5 pipelined variant for completeness), via the
public encrypt_batch (operand caches differ per variant so there is no
stale-jit hazard; pipeline_fold needs clear_caches).

Usage: python benchmarks/probe_cfg2.py [preset]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

PRESET = sys.argv[1] if len(sys.argv) > 1 else "broadcast_128bit"


def main():
    from pvw_tpu import GlobalPublicKey, PvwCrs
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.encryption import encrypt_batch
    from pvw_tpu.params import presets
    from pvw_tpu.sampling.cbd import sample_vec_cbd

    params = presets.get_preset(PRESET)
    n, k, l = params.n, params.k, params.l
    ring = params.ring
    print(f"{PRESET}: n={n} k={k} l={l} L={ring.num_limbs} "
          f"nd={ring.num_digits}", file=sys.stderr, flush=True)
    key = jax.random.key(0)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    coeffs = sample_vec_cbd(jax.random.fold_in(key, 10_000), (n, k, l),
                            params.secret_variance)
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_keys_device(coeffs, jax.random.fold_in(key, 1))

    rng = np.random.default_rng(0)

    def run(tag, batch, reps, swapped=False, pipelined=False):
        jax.clear_caches()
        settings.swapped_form = swapped
        settings.pipeline_fold = pipelined
        scalars = rng.integers(0, 1 << 32, size=(batch, n), dtype=np.uint64)
        try:
            ct0 = encrypt_batch(scalars, gpk, jax.random.fold_in(key, 7))
            h0, _ = ct0.c1.channel_pair()
            _ = np.asarray(h0[(0,) * h0.ndim])       # sync
            t0 = time.perf_counter()
            for i in range(reps):
                ct = encrypt_batch(scalars, gpk,
                                   jax.random.fold_in(key, 100 + i))
            h, _ = ct.c1.channel_pair()
            _ = np.asarray(h[(0,) * h.ndim])
            dt = time.perf_counter() - t0
            rate = reps * batch / dt
            print(f"{tag}: {reps} x batch-{batch} -> {rate:.1f} enc/s",
                  file=sys.stderr, flush=True)
            return rate
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED ({type(e).__name__}: {str(e)[:200]})",
                  file=sys.stderr, flush=True)
            return None
        finally:
            settings.reset()

    for batch in (256, 512):
        reps = max(4, 2048 // batch)
        print(f"--- batch {batch} ---", file=sys.stderr, flush=True)
        r_a = run(f"banded    [A]", batch, reps)
        r_s = run(f"swapped   [B]", batch, reps, swapped=True)
        r_p = run(f"pipelined [C]", batch, reps, pipelined=True)
        r_a2 = run(f"banded    [A2]", batch, reps)
        base = max(x for x in (r_a, r_a2) if x)
        for name, r in (("swapped", r_s), ("pipelined", r_p)):
            if r:
                print(f"{name}/banded @ batch {batch}: {r / base:.3f}x",
                      file=sys.stderr, flush=True)

    # round-trip correctness for the candidate variant (swapped)
    from pvw_tpu.crypto.decryption import decrypt_party_shares
    from pvw_tpu.keys.secret_key import SecretKey

    jax.clear_caches()
    settings.swapped_form = True
    try:
        sc = rng.integers(0, 1 << 32, size=(n, n), dtype=np.uint64)
        ct = encrypt_batch(sc, gpk, jax.random.fold_in(key, 55))
        ok = True
        for pi in (0, n - 1):
            sk = SecretKey.from_coefficients(params, np.asarray(coeffs[pi]))
            vals = decrypt_party_shares(ct, sk, pi)
            ok = ok and vals == [int(sc[d, pi]) for d in range(n)]
        print(f"swapped round-trip: {'OK' if ok else 'MISMATCH'}",
              file=sys.stderr, flush=True)
        if not ok:
            sys.exit(1)
    finally:
        settings.reset()


if __name__ == "__main__":
    main()
