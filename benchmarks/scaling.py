"""Sharded-path mechanics/scaling harness over a virtual device mesh.

Only one physical TPU chip is reachable in this environment, so true
multi-chip scaling efficiency cannot be measured here; this harness runs
the REAL sharded kernels (shard_map + all_gather + modular reduction) over
1/2/4/8 virtual CPU devices to (a) validate the mechanics at growing mesh
shapes and (b) quantify the collective/overhead structure. Hardware
scaling numbers must come from a real pod (round-2+; see BASELINE.md).

Run: ``JAX_PLATFORMS=cpu python benchmarks/scaling.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

from pvw_tpu import (  # noqa: E402
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
)
from pvw_tpu.parallel import encrypt_batch_sharded, make_mesh  # noqa: E402


def main() -> None:
    n, k, l, d = 64, 32, 8, 8
    moduli = (0xFFFFC4001, 0x1FFFFE0001)
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    p = (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
         .set_moduli(moduli).set_secret_variance(0.5)
         .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, p, jax.random.fold_in(key, i)) for i in range(n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 99))
    scalars = np.arange(d * n, dtype=np.uint64).reshape(d, n)

    results = {}
    baseline_ct = None
    for ndev, kdim in ((1, 1), (2, 1), (4, 2), (8, 2)):
        mesh = make_mesh(jax.devices()[:ndev], kdim=kdim)
        fn = lambda: encrypt_batch_sharded(  # noqa: E731
            scalars, gpk, jax.random.fold_in(key, 7), mesh)
        ct = fn()
        np.asarray(ct.c1.hi[0, 0, 0, 0])  # compile+sync
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            ct = fn()
        np.asarray(ct.c1.hi[0, 0, 0, 0])
        dt = (time.time() - t0) / iters
        results[f"mesh_{ndev}dev_recv{ndev // kdim}_kdim{kdim}"] = dt * 1000
        print(f"mesh {ndev} devices (recv={ndev // kdim}, kdim={kdim}): "
              f"{dt * 1000:.2f} ms/step", flush=True)
        if baseline_ct is None:
            baseline_ct = ct
        else:
            assert np.array_equal(
                np.asarray(baseline_ct.c2.hi), np.asarray(ct.c2.hi)
            ), "mesh shape changed the ciphertext!"
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    print("bit-identity across all mesh shapes: OK")


if __name__ == "__main__":
    main()
