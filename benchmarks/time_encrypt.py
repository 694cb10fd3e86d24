"""Steady-state timing of the production encryption kernel on TPU.

Usage: python benchmarks/time_encrypt.py [batch] [n] [k]
All operands are made device-resident FIRST (numpy args would re-upload
the key matrix through the axon tunnel on every call — ~1.1 s/call
measured for the 134 MB B at n=4096).
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.crypto.encryption import _encrypt_kernel, _scalars_to_pairs
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ELL = 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def main():
    import os

    if not os.environ.get("PVW_NO_CACHE"):
        from pvw_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    a = rng.integers(0, 1 << 36, (len(MODULI), 1, K, K), np.uint64) % qs
    b = rng.integers(0, 1 << 36, (len(MODULI), 1, N, K), np.uint64) % qs
    a = np.broadcast_to(np.moveaxis(a, (0, 1), (2, 3)),
                        (K, K, len(MODULI), ELL)).copy()
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)),
                        (N, K, len(MODULI), ELL)).copy()
    from pvw_tpu.ops import modmat

    ah, al = map(jnp.asarray, u64op.split_u64_np(a))
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    a_dig = modmat.lhs_digit_planes(ah, al, params.ring)
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    sc = rng.integers(0, 1 << 32, (D, N), np.uint64)
    sch, scl = _scalars_to_pairs(sc)
    key = jax.random.key(0)

    def run(i):
        # scalars are < 2^32 here, matching encrypt_batch's auto-detection
        from pvw_tpu.config import settings

        return _encrypt_kernel(params, a_dig, b_dig, sch, scl,
                               jax.random.fold_in(key, i), True,
                               None, None, settings.kernel_noise_stream())

    t0 = time.time()
    out = run(0)
    chk = np.asarray(out[3]).astype(np.uint64).sum()
    print(f"warm {time.time() - t0:.1f}s  c2_lo checksum {int(chk)}",
          flush=True)
    for trial in range(3):
        t0 = time.time()
        for i in range(1, 11):
            out = run(i)
        np.asarray(out[0][(0,) * out[0].ndim])
        dt = (time.time() - t0) / 10
        print(f"trial {trial}: {dt * 1000:.2f} ms/batch-{D} "
              f"({D / dt:.0f} enc/s)", flush=True)


if __name__ == "__main__":
    main()
