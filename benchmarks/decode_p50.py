"""Single-message decode latency p50 (VERDICT r1 item 1 sub-metric).

Times the single-message decrypt path three ways:

- DEFAULT routing (``_decode_mode`` auto): batches below the crossover
  run entirely on the host — native C++ contraction + inverse NTT +
  sequential-rounding decode, no accelerator dispatch (the adaptive
  decode routing, BASELINE.md);
- the DEVICE path (one fused d=1 program — ⟨s, c1⟩ contraction + inverse
  NTT + multiword decode), the way large batches dispatch; on the axon
  tunnel the synced number is dominated by the ~3-25 ms round trip;
- pipelined device dispatches (the device-side cost a host-adjacent
  deployment would see).

Usage: python benchmarks/decode_p50.py [iters] [n] [k] [--sweep]
``--sweep`` additionally times host vs device across batch sizes to
locate the routing crossover.
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from pvw_tpu.crypto.decryption import (
    _decode_mode, _decrypt_decode_kernel, _host_decrypt,
)
from pvw_tpu.keys.secret_key import SecretKey
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SWEEP = "--sweep" in sys.argv
ITERS = int(args[0]) if len(args) > 0 else 100
N = int(args[1]) if len(args) > 1 else 4096
K = int(args[2]) if len(args) > 2 else 256
ELL = 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _p50_p90(lat):
    return (statistics.median(lat) * 1e6,
            float(np.percentile(lat, 90)) * 1e6)


def _rand_ct(rng, qs, d):
    """Random (c1, c2) residues for a d-message batch, host-side."""
    L = qs.shape[2]
    c1 = (rng.integers(0, 1 << 36, (K, d, L, ELL), np.uint64)
          % qs).astype(np.uint64)
    c2 = (rng.integers(0, 1 << 36, (d, L, ELL), np.uint64)
          % qs[0]).astype(np.uint64)
    return c1, c2


def main():
    from pvw_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    L = params.ring.num_limbs
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(1, 1, L, 1)
    sk = SecretKey.random(params, jax.random.key(7))

    c1, c2 = _rand_ct(rng, qs, 1)
    c1h, c1l = u64op.split_u64_np(c1)
    c2h, c2l = u64op.split_u64_np(c2)

    # ---- DEFAULT path (adaptive routing) -----------------------------
    mode = _decode_mode(params, d=1)
    print(f"default route at d=1: {mode}", flush=True)
    if mode == "host":
        _ = sk.host_ntt_residues()  # warm the cached sk NTT
        _host_decrypt(params, sk, c1h, c1l, c2h, c2l)
        lat = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            _host_decrypt(params, sk, c1h, c1l, c2h, c2l)
            lat.append(time.perf_counter() - t0)
        p50, p90 = _p50_p90(lat)
        print(f"DEFAULT single-message decrypt (host): p50 {p50:.1f} us, "
              f"p90 {p90:.1f} us", flush=True)

    # ---- DEVICE path -------------------------------------------------
    import jax.numpy as jnp

    skp = sk.to_polynomials()
    skh, skl = skp.hi, skp.lo
    jc1h, jc1l, jc2h, jc2l = map(jnp.asarray, (c1h, c1l, c2h, c2l))

    def call():
        return _decrypt_decode_kernel(params, skh, skl, jc1h, jc1l,
                                      jc2h, jc2l)

    t0 = time.time()
    out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    print(f"device warm (compile+run) {time.time() - t0:.1f}s", flush=True)

    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = call()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        lat.append(time.perf_counter() - t0)
    p50, p90 = _p50_p90(lat)
    print(f"device single-message decode: p50 {p50:.1f} us, p90 {p90:.1f} us "
          f"(includes tunnel round trip)", flush=True)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    per = (time.perf_counter() - t0) / ITERS * 1e6
    print(f"pipelined device single-message decode: {per:.1f} us/msg "
          f"(device-side cost)", flush=True)

    # ---- crossover sweep ---------------------------------------------
    if SWEEP:
        print("\nbatch  host us/msg   device us/msg (synced)", flush=True)
        for d in (1, 4, 16, 32, 64, 128, 256):
            c1, c2 = _rand_ct(rng, qs, d)
            c1h, c1l = u64op.split_u64_np(c1)
            c2h, c2l = u64op.split_u64_np(c2)
            _host_decrypt(params, sk, c1h, c1l, c2h, c2l)
            it = max(3, min(ITERS, 2048 // d))
            t0 = time.perf_counter()
            for _ in range(it):
                _host_decrypt(params, sk, c1h, c1l, c2h, c2l)
            t_host = (time.perf_counter() - t0) / it / d * 1e6
            jc = tuple(map(jnp.asarray, (c1h, c1l, c2h, c2l)))
            out = _decrypt_decode_kernel(params, skh, skl, *jc)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            for _ in range(it):
                out = _decrypt_decode_kernel(params, skh, skl, *jc)
                np.asarray(jax.tree_util.tree_leaves(out)[0])
            t_dev = (time.perf_counter() - t0) / it / d * 1e6
            print(f"{d:5d}  {t_host:10.1f}   {t_dev:10.1f}", flush=True)


if __name__ == "__main__":
    main()
