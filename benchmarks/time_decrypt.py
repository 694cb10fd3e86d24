"""End-to-end decryption throughput at the headline config.

Measures the full decrypt_party_shares path for one party across d dealer
ciphertexts: device stage (z = <s, c1> - c2[i] contraction + inverse NTT)
plus the host decode (native C++ engine, OpenMP). Also reports the two
stages separately.

Usage: python benchmarks/time_decrypt.py [d] [n] [k]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.crypto.decryption import (
    _decode_batch, _decrypt_decode_kernel, _noisy_message_kernel,
)
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

D = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
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

    # synthetic NTT-domain operands with the right shapes (throughput is
    # value-independent); correctness of the path is pinned by tests
    sk = (rng.integers(0, 1 << 36, (K, L, ELL), np.uint64)
          % qs[0]).astype(np.uint64)
    c1 = (rng.integers(0, 1 << 36, (K, D, L, ELL), np.uint64)
          % qs).astype(np.uint64)
    c2 = (rng.integers(0, 1 << 36, (D, L, ELL), np.uint64)
          % qs[0]).astype(np.uint64)
    skh, skl = map(jnp.asarray, u64op.split_u64_np(sk))
    c1h, c1l = map(jnp.asarray, u64op.split_u64_np(c1))
    c2h, c2l = map(jnp.asarray, u64op.split_u64_np(c2))

    def device_stage():
        return _noisy_message_kernel(params, skh, skl, c1h, c1l, c2h, c2l)

    t0 = time.time()
    z = device_stage()
    np.asarray(z[:1, :1])
    print(f"warm (compile+run) {time.time() - t0:.1f}s", flush=True)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        z = device_stage()
    np.asarray(z[:1, :1])
    dev_dt = (time.time() - t0) / iters
    print(f"device stage: {dev_dt * 1000:.2f} ms / {D} msgs "
          f"({D / dev_dt:.0f} msg/s)", flush=True)

    zn = np.asarray(z)
    residues = u64op.join_u64_np(zn[0], zn[1])
    t0 = time.time()
    out = _decode_batch(residues, params)
    dec_dt = time.time() - t0
    assert len(out) == D
    print(f"host decode (native): {dec_dt * 1000:.2f} ms / {D} msgs "
          f"({dec_dt / D * 1e6:.2f} us/msg)", flush=True)

    # end-to-end: device + single stacked fetch + decode
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        zn = np.asarray(device_stage())
        residues = u64op.join_u64_np(zn[0], zn[1])
        out = _decode_batch(residues, params)
    e2e = (time.time() - t0) / iters
    print(f"end-to-end (host decode): {e2e * 1000:.2f} ms / {D} msgs "
          f"({D / e2e:.0f} msg/s, {e2e / D * 1e6:.2f} us/msg)", flush=True)

    # fused on-device decode (the default path): contraction + inverse NTT
    # + full sequential-rounding decode in ONE program; the only fetch is
    # the [2, d] u32 message buffer (8 bytes/msg).
    def fused():
        return _decrypt_decode_kernel(params, skh, skl, c1h, c1l, c2h, c2l)

    t0 = time.time()
    np.asarray(fused())
    print(f"fused warm (compile+run) {time.time() - t0:.1f}s", flush=True)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = np.asarray(fused())
    fused_dt = (time.time() - t0) / iters
    assert out.shape == (2, D)
    print(f"end-to-end (DEVICE decode, sync/batch): "
          f"{fused_dt * 1000:.2f} ms / {D} msgs "
          f"({D / fused_dt:.0f} msg/s, {fused_dt / D * 1e6:.2f} us/msg)",
          flush=True)

    # pipelined: dispatch iters batches, fetch the last — amortizes the
    # fixed per-call host sync (~25 ms over the axon tunnel; ~us on a
    # local chip). This is the streaming-consumer number.
    t0 = time.time()
    outs = [fused() for _ in range(iters)]
    np.asarray(outs[-1])
    pipe_dt = (time.time() - t0) / iters
    print(f"end-to-end (DEVICE decode, pipelined): "
          f"{pipe_dt * 1000:.2f} ms / {D} msgs "
          f"({D / pipe_dt:.0f} msg/s, {pipe_dt / D * 1e6:.2f} us/msg)",
          flush=True)


if __name__ == "__main__":
    main()
