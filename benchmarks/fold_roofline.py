"""Fold roofline: is the fused encryption kernel at the VPU wall?

Measures, in ONE tunnel session at the headline shape (n=4096, k=256,
l=8, 2 limbs, batch D):

1. the production c2 kernel (gen_noise stream v4 + in-kernel encode32),
2. the same contraction WITHOUT noise/encode (pure scaled matmul+fold),
3. the MXU floor: the identical int8 contraction as one XLA batch matmul
   (no fold at all) — what the MXU alone needs for the digit products,
4. the VPU int32 peak: a Pallas kernel streaming multiply-adds over a
   VMEM-resident tile, sized to the kernel's working set,

then prints the per-element VPU op counts the DESIGN.md §9 roofline
argument uses. Run: python benchmarks/fold_roofline.py [batch].
"""

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
from pvw_tpu.ops.pallas_modmat import (
    encode_tab, kernel_noise_available, matmul_fold_scaled,
)
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows

N, K, ELL = 4096, 256, 8
D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
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


def vpu_peak_kernel(iters_inner: int, lanes: int = 8):
    """Pallas kernel: iters_inner int32 multiply-adds per element of a
    (512, 1024) VMEM tile, split over ``lanes`` independent accumulator
    chains (a single chain is latency-bound, not throughput-bound)
    -> measured VPU int32 op/s (2 ops per m-a)."""

    def body(x_ref, o_ref):
        v = x_ref[...]
        accs = [v + jnp.int32(i) for i in range(lanes)]
        for i in range(iters_inner // lanes):
            for a in range(lanes):
                accs[a] = accs[a] + v * jnp.int32(2 * (i * lanes + a) + 1)
        out = accs[0]
        for a in range(1, lanes):
            out = out + accs[a]
        o_ref[...] = out

    @jax.jit
    def run(x):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return run


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    print(f"n={N} k={K} l={ELL} L={L} nd={nd} b1={b1} b2={b2} batch={D}",
          flush=True)
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    b = rng.integers(0, 1 << 36, (L, 1, N, K), dtype=np.uint64) % qs
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)),
                        (N, K, L, ELL)).copy()
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    sc = rng.integers(0, 1 << 32, (D, N), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u64op.split_u64_np(sc))
    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli))
    key = jax.random.key(3)
    assert kernel_noise_available(ring, N, D, K, b2, False, True)

    @jax.jit
    def r_stage(kk):
        r_coeffs = sample_vec_cbd_rows(kk, 0, K, (D, l),
                                       params.secret_variance)
        r_ntt = ntt_ops.ntt_forward_signed(
            r_coeffs, ring, cbd_bound(params.secret_variance))
        r_ch = (jnp.transpose(r_ntt[0], (2, 3, 0, 1)),
                jnp.transpose(r_ntt[1], (2, 3, 0, 1)))
        return modmat.prescale_digits(r_ch, ring)

    r_scaled = _sync(r_stage(key))

    def gen(kk):
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(kk).reshape(2), jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        return (seeds, ntt_ops.signed_digit_count(b2), int(b2))

    @jax.jit
    def c2_full(rs, kk):
        enc = (jnp.transpose(sch), jnp.transpose(scl), etab)
        return matmul_fold_scaled(
            None, rs, ring, gen_noise=gen(kk), encode=enc, lhs_dig=b_dig,
            encode32=True)

    @jax.jit
    def c2_no_encode(rs, kk):
        return matmul_fold_scaled(
            None, rs, ring, gen_noise=gen(kk), lhs_dig=b_dig)

    @jax.jit
    def c2_no_noise_no_encode(rs):
        return matmul_fold_scaled(None, rs, ring, lhs_dig=b_dig)

    # identical digit contraction as ONE int8 XLA batch matmul:
    # [CH, m, kd] x [CH, kd, nd*D] -> int32 (no fold, no bias). Operands
    # are PRE-laid-out so the timed region is the dot alone.
    ld_flat = jnp.asarray(b_dig.reshape(L * l, N, K * nd))
    _r2 = jnp.transpose(
        jnp.asarray(r_scaled).reshape(L * l, K, D, nd, nd),
        (0, 4, 1, 3, 2)).reshape(L * l, nd, K * nd, D)
    r2_flat = jax.device_put(jnp.transpose(_r2, (0, 2, 1, 3))
                             .reshape(L * l, K * nd, nd * D))
    del _r2

    @jax.jit
    def mxu_floor(ldf, r2f):
        return jax.lax.dot_general(
            ldf, r2f, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    # bf16 rate reference on the identical shape (MXU native rate check)
    ld_bf = jnp.asarray(ld_flat, jnp.bfloat16)
    r2_bf = jnp.asarray(r2_flat, jnp.bfloat16)

    @jax.jit
    def mxu_bf16(ldf, r2f):
        return jax.lax.dot_general(
            ldf, r2f, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    t_r = bench("r CBD+NTT+prescale", r_stage, key)
    t_full = bench("c2 kernel (gen-noise v4 + encode32)", c2_full,
                   r_scaled, key)
    t_ne = bench("c2 kernel (gen-noise v4, no encode)", c2_no_encode,
                 r_scaled, key)
    t_nn = bench("c2 kernel (no noise, no encode)", c2_no_noise_no_encode,
                 r_scaled)
    t_mxu = bench("MXU floor: same contraction, XLA int8 matmul",
                  mxu_floor, ld_flat, r2_flat)
    t_bf = bench("MXU bf16 rate: same shape, bf16 matmul",
                 mxu_bf16, ld_bf, r2_bf)
    macs = (L * l) * N * (K * nd) * (nd * D)
    print(f"  contraction MACs = {macs:.3e}; int8 rate "
          f"{macs / t_mxu / 1e12:.1f} T MAC/s, bf16 rate "
          f"{macs / t_bf / 1e12:.1f} T MAC/s", flush=True)

    # VPU peak: ~64 multiply-adds over a resident (512, 1024) int32 tile
    x = jnp.asarray(rng.integers(0, 100, (512, 1024), np.int64), jnp.int32)
    inner = 512
    run = vpu_peak_kernel(inner)
    t_vpu = bench(f"VPU probe: {inner} int32 m-a on (512,1024)", run, x)
    elems = 512 * 1024
    print(f"VPU int32 throughput: "
          f"{2 * inner * elems / t_vpu / 1e12:.2f} T op/s "
          f"({inner * elems / t_vpu / 1e12:.2f} T mult/s)", flush=True)

    out_elems = L * l * N * D
    print(f"\nper-output-element marginals (out elems = {out_elems:.3e}):",
          flush=True)
    print(f"  noise MAC marginal : {(t_ne - t_nn) * 1e3:.2f} ms -> "
          f"{(t_ne - t_nn) / out_elems * 1e9:.3f} ns/elt", flush=True)
    print(f"  encode marginal    : {(t_full - t_ne) * 1e3:.2f} ms -> "
          f"{(t_full - t_ne) / out_elems * 1e9:.3f} ns/elt", flush=True)
    print(f"  fold+mxu base      : {t_nn * 1e3:.2f} ms -> "
          f"{t_nn / out_elems * 1e9:.3f} ns/elt", flush=True)
    print(f"  mxu floor          : {t_mxu * 1e3:.2f} ms", flush=True)
    modmuls = out_elems * K  # one modmul per (elt, k) in the logical op
    print(f"  logical modmul rate (c2 full): "
          f"{modmuls / t_full / 1e9:.0f} G modmul/s", flush=True)


if __name__ == "__main__":
    main()
