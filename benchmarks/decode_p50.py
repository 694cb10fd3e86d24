"""Single-message decode latency p50 (VERDICT r1 item 1 sub-metric).

Times the FULL single-message device path — ⟨s, c1⟩ contraction +
inverse NTT + multiword sequential-rounding decode, one [k, 1]
ciphertext — the way ``decrypt_party_value`` dispatches it. Reports:

- per-call p50 WITH a host sync each call (what a caller blocking on one
  message sees; on the axon tunnel this is dominated by the ~3-25 ms
  round trip, not device time);
- pipelined per-call time over a stream of single-message dispatches
  (the device-side cost; what a production host-adjacent deployment
  without the tunnel would see).

Usage: python benchmarks/decode_p50.py [iters] [n] [k]
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.crypto.decryption import _decrypt_decode_kernel
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ELL = 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def main():
    from pvw_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L = ring.num_limbs
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(1, 1, L, 1)

    sk = (rng.integers(0, 1 << 36, (K, L, ELL), np.uint64)
          % qs[0]).astype(np.uint64)
    c1 = (rng.integers(0, 1 << 36, (K, 1, L, ELL), np.uint64)
          % qs).astype(np.uint64)
    c2 = (rng.integers(0, 1 << 36, (1, L, ELL), np.uint64)
          % qs[0]).astype(np.uint64)
    skh, skl = map(jnp.asarray, u64op.split_u64_np(sk))
    c1h, c1l = map(jnp.asarray, u64op.split_u64_np(c1))
    c2h, c2l = map(jnp.asarray, u64op.split_u64_np(c2))

    def call():
        return _decrypt_decode_kernel(params, skh, skl, c1h, c1l, c2h, c2l)

    t0 = time.time()
    out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"warm (compile+run) {time.time() - t0:.1f}s", flush=True)

    # synced: one full dispatch + fetch per message
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = call()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        lat.append(time.perf_counter() - t0)
    lat.sort()
    p50 = statistics.median(lat) * 1e6
    p90 = lat[int(0.9 * len(lat))] * 1e6
    print(f"synced single-message decode: p50 {p50:.1f} us, p90 {p90:.1f} us "
          f"(includes tunnel round trip)", flush=True)

    # pipelined: stream of single-message dispatches, one sync at the end
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    per = (time.perf_counter() - t0) / ITERS * 1e6
    print(f"pipelined single-message decode: {per:.1f} us/msg "
          f"(device-side cost)", flush=True)


if __name__ == "__main__":
    main()
