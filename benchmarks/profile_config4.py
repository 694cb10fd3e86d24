"""Config-4 (threshold_256bit: n=1024, k=512, l=16, 17x61-bit limbs)
cost decomposition: where do the 80 ms/batch-256 go?

Times r-stage, c1, c2 (full / no-noise / no-encode), the XLA dot floor
for the c2 contraction, and reports the tile selection. Run:
python benchmarks/profile_config4.py [batch]."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import (
    _gen_noise_extra, _noise_vals_mode, _pick_tiles, encode_tab,
    kernel_noise_available, matmul_fold_scaled,
)
from pvw_tpu.params import presets
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows

D = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def bench(name, fn, *args, iters=6):
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
    params = presets.threshold_256bit()
    ring = params.ring
    L, l, nd, k, n = (ring.num_limbs, ring.degree, ring.num_digits,
                      params.k, params.n)
    kd = k * nd
    b1, b2 = params.error_bound_1, params.error_bound_2
    print(f"n={n} k={k} l={l} L={L} nd={nd} kd={kd} b1={b1} b2={b2} "
          f"batch={D}", flush=True)
    jr = ntt_ops.signed_digit_count(b2)
    vals = _noise_vals_mode(ring, k, jr, b2)
    extra = _gen_noise_extra(l * jr, False, True, l if vals else 0)
    print(f"jr={jr} vals={vals} extra_mn={extra} "
          f"tiles={_pick_tiles(n, D, kd, nd, extra)} "
          f"avail={kernel_noise_available(ring, n, D, k, b2, False, True)}",
          flush=True)

    # generate key-matrix stand-ins ON DEVICE (shipping ~1 GB of host
    # operands through the tunnel takes minutes)
    rng = np.random.default_rng(0)
    qh = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
    ql = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def rand_dig(kk, rows):
        hi = jax.random.bits(kk, (L, l, rows, k), jnp.uint32)
        lo = jax.random.bits(jax.random.fold_in(kk, 1),
                             (L, l, rows, k), jnp.uint32)
        hi = jnp.minimum(hi & jnp.uint32((1 << 28) - 1), qh - 1)
        # lhs_digit_planes takes canonical [m, k, L, l]
        return modmat.lhs_digit_planes(
            jnp.transpose(hi, (2, 3, 0, 1)),
            jnp.transpose(lo, (2, 3, 0, 1)), ring)

    key = jax.random.key(3)
    b_dig = _sync(rand_dig(jax.random.fold_in(key, 10), n))
    a_dig = _sync(rand_dig(jax.random.fold_in(key, 11), k))
    sc = rng.integers(0, 1 << 32, (D, n), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u64op.split_u64_np(sc))
    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli))
    key = jax.random.key(3)

    @jax.jit
    def r_stage(kk):
        r = sample_vec_cbd_rows(kk, 0, k, (D, l), params.secret_variance)
        rch = ntt_ops.ntt_forward_signed_ch(
            r, ring, cbd_bound(params.secret_variance))
        return modmat.prescale_digits_band(rch, ring)

    rs = _sync(r_stage(key))
    print(f"band bytes = {rs.size / 1e9:.2f} GB", flush=True)

    def gen(kk, bound, rows_off, has_enc):
        if not kernel_noise_available(ring, n, D, k, bound, False, has_enc):
            return None
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(kk).reshape(2), jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        return (seeds, ntt_ops.signed_digit_count(bound), int(bound))

    @jax.jit
    def c2_full(r, kk):
        enc = (jnp.transpose(sch), jnp.transpose(scl), etab)
        return matmul_fold_scaled(
            None, r, ring, gen_noise=gen(kk, b2, 0, True), encode=enc,
            lhs_dig=b_dig, encode32=True)

    @jax.jit
    def c2_plain(r):
        return matmul_fold_scaled(None, r, ring, lhs_dig=b_dig)

    @jax.jit
    def c1_full(r, kk):
        return matmul_fold_scaled(
            None, r, ring, gen_noise=gen(kk, b1, 0, False), lhs_dig=a_dig)

    # XLA dot floor for the c2 contraction
    ld_flat = jnp.asarray(b_dig.reshape(L * l, n, kd))
    r2_flat = _sync(jax.jit(
        lambda x: jnp.transpose(x.reshape(L * l, nd, kd, D), (0, 2, 1, 3))
        .reshape(L * l, kd, nd * D))(rs))

    @jax.jit
    def xla_dot(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    t_r = bench("r CBD+NTT+prescale(band)", r_stage, key)
    t_c2 = bench("c2 kernel (gen-noise + encode32)", c2_full, rs, key)
    t_c2p = bench("c2 kernel (no noise, no encode)", c2_plain, rs)
    t_c1 = bench("c1 kernel (gen-noise)", c1_full, rs, key)
    t_dot = bench("XLA dot floor (c2 contraction)", xla_dot, ld_flat,
                  r2_flat)
    macs = (L * l) * n * kd * nd * D
    print(f"  c2 MACs = {macs:.3e}; XLA rate {macs / t_dot / 1e12:.1f} "
          f"T MAC/s", flush=True)
    total = t_r + t_c2 + t_c1
    print(f"  r+c1+c2 = {total * 1e3:.1f} ms -> {D / total:.0f} enc/s "
          f"(device stages only)", flush=True)


if __name__ == "__main__":
    main()
