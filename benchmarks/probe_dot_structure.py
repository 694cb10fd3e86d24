"""Isolate the fused kernel's MXU cost: the same 5-dot structure as the
production kernel but with a trivial epilogue (sum columns, no fold).

Compares, same-session:
  1. XLA one-dot floor [CH, m, kd] x [CH, kd, nd*D]
  2. Pallas: nd separate dots per (i, j, ch) step, trivial combine
  3. the production c2 kernel (fold + gen-noise + encode)
The gap 2-1 is Mosaic dot/pipeline inefficiency; 3-2 is the true VPU
epilogue cost. Run: python benchmarks/probe_dot_structure.py [batch]."""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import encode_tab, matmul_fold_scaled
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

N, K, ELL = 4096, 256, 8
D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
TM = int(sys.argv[2]) if len(sys.argv) > 2 else 512   # m-tile (r4: try 1024)
TN = int(sys.argv[3]) if len(sys.argv) > 3 else 128
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def bench(name, fn, *args, iters=10):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    CH, kd = L * l, K * nd
    rng = np.random.default_rng(0)
    ld = jnp.asarray(rng.integers(-64, 64, (CH, N, kd), np.int64), jnp.int8)
    band = jnp.asarray(rng.integers(-64, 64, (CH, nd, kd, D), np.int64),
                       jnp.int8)
    print(f"tiles ({TM}, {TN})", flush=True)

    # 1. XLA one-dot floor
    r2_flat = jnp.transpose(band, (0, 2, 1, 3)).reshape(CH, kd, nd * D)
    r2_flat = _sync(jax.jit(lambda x: x + 0)(r2_flat))

    @jax.jit
    def xla_dot(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    # 2. Pallas 5-dot structure, trivial epilogue
    def body(lhs_ref, band_ref, out_ref):
        lhs = lhs_ref[0]
        acc = None
        for c in range(nd):
            p = jax.lax.dot_general(
                lhs, band_ref[0, c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + (p >> (c + 1))
        out_ref[0] = acc

    @jax.jit
    def pallas_dots(a, b):
        return pl.pallas_call(
            body,
            grid=(N // TM, D // TN, CH),
            in_specs=[
                pl.BlockSpec((1, TM, kd), lambda i, j, c: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nd, kd, TN), lambda i, j, c: (c, 0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TM, TN), lambda i, j, c: (c, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CH, N, D), jnp.int32),
        )(a, b)

    # 2b. Pallas ONE-dot per step: band pre-merged on the lane axis
    band_m = jnp.transpose(band, (0, 2, 1, 3)).reshape(CH, kd, nd, D)

    def body1(lhs_ref, band_ref, out_ref):
        lhs = lhs_ref[0]
        p = jax.lax.dot_general(
            lhs, band_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [TM, nd, TN]
        acc = None
        for c in range(nd):
            pc = p[:, c, :]
            acc = pc if acc is None else acc + (pc >> (c + 1))
        out_ref[0] = acc

    @jax.jit
    def pallas_one_dot(a, b):
        return pl.pallas_call(
            body1,
            grid=(N // TM, D // TN, CH),
            in_specs=[
                pl.BlockSpec((1, TM, kd), lambda i, j, c: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kd, nd, TN), lambda i, j, c: (c, 0, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TM, TN), lambda i, j, c: (c, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CH, N, D), jnp.int32),
        )(a, b)

    # 2c. Pallas wide-dot: rhs pre-interleaved so each grid step loads ONE
    # contiguous [kd, nd*TN] tile and runs a single 2D dot — the same dot
    # shape XLA's floor uses — with lane-aligned TN-slices in the epilogue.
    # (Distinct from 2b: no 3D rhs block, no lane-axis gather; the nd
    # digit columns for one output tile are adjacent TN-wide blocks.)
    band_w = (
        band.reshape(CH, nd, kd, D // TN, TN)
        .transpose(0, 2, 3, 1, 4)
        .reshape(CH, kd, (D // TN) * nd * TN)
    )
    band_w = _sync(jax.jit(lambda x: x + 0)(band_w))

    def body_wide(lhs_ref, band_ref, out_ref):
        p = jax.lax.dot_general(
            lhs_ref[0], band_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)          # [TM, nd*TN]
        acc = None
        for c in range(nd):
            pc = p[:, c * TN:(c + 1) * TN]
            acc = pc if acc is None else acc + (pc >> (c + 1))
        out_ref[0] = acc

    @jax.jit
    def pallas_wide_dot(a, b):
        return pl.pallas_call(
            body_wide,
            grid=(N // TM, D // TN, CH),
            in_specs=[
                pl.BlockSpec((1, TM, kd), lambda i, j, c: (c, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kd, nd * TN), lambda i, j, c: (c, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TM, TN), lambda i, j, c: (c, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((CH, N, D), jnp.int32),
        )(a, b)

    macs = CH * N * kd * nd * D
    t1 = bench("XLA one-dot floor", xla_dot, ld, r2_flat)
    print(f"    -> {macs / t1 / 1e12:.1f} T MAC/s", flush=True)
    t2 = bench("Pallas 5-dot + trivial epilogue", pallas_dots, ld, band)
    print(f"    -> {macs / t2 / 1e12:.1f} T MAC/s", flush=True)
    try:
        t2b = bench("Pallas one-dot + lane-slice epilogue", pallas_one_dot,
                    ld, band_m)
        print(f"    -> {macs / t2b / 1e12:.1f} T MAC/s", flush=True)
    except Exception as e:
        print(f"one-dot variant failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    try:
        t2c = bench("Pallas wide-dot + TN-slice epilogue", pallas_wide_dot,
                    ld, band_w)
        print(f"    -> {macs / t2c / 1e12:.1f} T MAC/s", flush=True)
    except Exception as e:
        print(f"wide-dot variant failed: {type(e).__name__}: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
