"""Per-kernel rooflines: NTT limb-ops/sec, modular matmul MAC rate, and
decode latency percentiles (BASELINE.json headline metrics).

"NTT limb-op" = one butterfly-equivalent modular multiply-accumulate:
the dense l x l NTT does l^2 modmuls per (poly, limb), i.e.
l^2 * L * batch per call. Speed-of-light context printed alongside:
v5e MXU peak ~394 TOPS int8; each modmul costs nd*(2nd-1) int8 MACs in
the banded formulation (nd = ring.num_digits, adaptive per prime chain:
5 for the 37-bit headline moduli, 8 for 55-bit+), so both the achieved
modmul rate and the implied raw int8 MAC rate are printed.

Run on TPU: ``python benchmarks/roofline.py``
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u
from pvw_tpu.params.ring import RingPlan

MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _sync(out):
    """Force completion: fetch one scalar to the host. (On the axon tunnel
    backend ``jax.block_until_ready`` returns early; a host read of the
    last queued buffer is the only reliable barrier.)"""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def pipeline_time(fn, iters=20):
    _sync(fn())
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.time() - t0) / iters


def main() -> None:
    ring = RingPlan(MODULI, 8)
    L, l = ring.num_limbs, ring.degree
    rng = np.random.default_rng(0)
    results = {}

    # --- NTT throughput -------------------------------------------------
    batch = 1 << 15  # 32768 polys
    qs = np.array(MODULI, np.uint64).reshape(1, L, 1)
    x = rng.integers(0, 1 << 62, (batch, L, l), dtype=np.uint64) % qs
    xp = tuple(map(jnp.asarray, u.split_u64_np(x)))
    fwd = jax.jit(partial(ntt_ops.ntt_forward, ring=ring))
    dt = pipeline_time(lambda: fwd(xp))
    limb_ops = batch * L * l * l / dt
    results["ntt_limb_ops_per_s"] = limb_ops
    print(f"NTT: batch={batch} polys x {L} limbs, l={l}: {dt*1e3:.3f} ms "
          f"-> {limb_ops/1e9:.2f} G limb-ops/s", flush=True)

    # --- modular matmul MAC rate (production fused kernel, B·r shape) ---
    from pvw_tpu.ops.pallas_modmat import matmul_fold_scaled

    N, K, D = 4096, 256, 1024
    qs4 = np.array(MODULI, np.uint64).reshape(L, 1, 1, 1)
    b = rng.integers(0, 1 << 62, (L, l, N, K), dtype=np.uint64) % qs4
    r = rng.integers(0, 1 << 62, (L, l, K, D), dtype=np.uint64) % qs4
    bp = tuple(map(jnp.asarray, u.split_u64_np(b)))
    rp = tuple(map(jnp.asarray, u.split_u64_np(r)))
    nd, C = ring.num_digits, ring.num_columns
    prescale = jax.jit(partial(modmat.prescale_digits, ring=ring))
    rs = prescale(rp)
    _sync(rs)
    mm = jax.jit(partial(matmul_fold_scaled, ring=ring))
    dt = pipeline_time(lambda: mm(bp, rs))
    modmuls = L * l * N * K * D / dt
    macs = modmuls * nd * nd  # scaled form: nd^2 int8 MACs per modmul
    results["matmul_modmul_per_s"] = modmuls
    results["matmul_int8_macs_per_s"] = macs
    print(f"matmul [{N}x{K}]x[{K}x{D}] x {L*l} channels (scaled, nd={nd}): "
          f"{dt*1e3:.3f} ms -> {modmuls/1e9:.2f} G modmul/s "
          f"({macs/1e12:.2f} T int8 MAC/s vs ~394 T peak)", flush=True)

    # --- decode latency -------------------------------------------------
    from pvw_tpu import PvwParameters, PvwParametersBuilder
    from pvw_tpu.crypto.decryption import _decode_batch

    b1, b2 = PvwParameters.suggest_error_bounds(64, 32, 8, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(64).set_dimension(32)
              .set_l(8).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    d = 4096
    res = (rng.integers(0, 1 << 62, (d, L, l), dtype=np.uint64)
           % np.array(MODULI, np.uint64).reshape(1, L, 1))
    t0 = time.time()
    _decode_batch(res, params)
    total = time.time() - t0
    per = total / d
    results["decode_p50_us"] = per * 1e6
    print(f"decode: {d} messages in {total*1e3:.1f} ms -> "
          f"{per*1e6:.2f} us/message (native batch, amortized)", flush=True)
    # single-message latency (p50 over 100 calls)
    lats = []
    for i in range(100):
        t0 = time.time()
        _decode_batch(res[i : i + 1], params)
        lats.append(time.time() - t0)
    p50 = float(np.median(lats)) * 1e6
    results["decode_single_p50_us"] = p50
    print(f"decode single-message p50: {p50:.1f} us", flush=True)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
