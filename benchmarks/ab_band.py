"""Same-session A/B: old prescale (+ in-call transpose) vs band prescale.

Times the r-stage and the full c2 kernel under both rhs layouts in one
tunnel session. Run: python benchmarks/ab_band.py [batch]."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import encode_tab, matmul_fold_scaled
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
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    key = jax.random.key(3)
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    b = rng.integers(0, 1 << 36, (L, 1, N, K), dtype=np.uint64) % qs
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)), (N, K, L, ELL)).copy()
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    sc = rng.integers(0, 1 << 32, (D, N), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u64op.split_u64_np(sc))
    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli))

    def r_ch(kk):
        r = sample_vec_cbd_rows(kk, 0, K, (D, l), params.secret_variance)
        h, lo = ntt_ops.ntt_forward_signed(r, ring,
                                           cbd_bound(params.secret_variance))
        return (jnp.transpose(h, (2, 3, 0, 1)),
                jnp.transpose(lo, (2, 3, 0, 1)))

    @jax.jit
    def r_old(kk):
        return modmat.prescale_digits(r_ch(kk), ring)

    @jax.jit
    def r_band(kk):
        return modmat.prescale_digits_band(r_ch(kk), ring)

    def gen(kk):
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(kk).reshape(2), jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        return (seeds, ntt_ops.signed_digit_count(b2), int(b2))

    @jax.jit
    def c2(rs, kk):
        enc = (jnp.transpose(sch), jnp.transpose(scl), etab)
        return matmul_fold_scaled(
            None, rs, ring, gen_noise=gen(kk), encode=enc, lhs_dig=b_dig,
            encode32=True)

    @jax.jit
    def full_old(kk):
        return c2(r_old(kk), kk)

    @jax.jit
    def full_band(kk):
        return c2(r_band(kk), kk)

    t_ro = bench("r-stage OLD (prescale 6D)", r_old, key)
    t_rb = bench("r-stage BAND", r_band, key)
    rs_o = _sync(r_old(key))
    rs_b = _sync(r_band(key))
    t_co = bench("c2 kernel, OLD rhs (in-call transpose)", c2, rs_o, key)
    t_cb = bench("c2 kernel, BAND rhs", c2, rs_b, key)
    t_fo = bench("r + c2 fused jit, OLD", full_old, key)
    t_fb = bench("r + c2 fused jit, BAND", full_band, key)
    print(f"r-stage: {t_ro / t_rb:.2f}x; c2: {t_co / t_cb:.2f}x; "
          f"full: {t_fo / t_fb:.2f}x (OLD/BAND)", flush=True)


if __name__ == "__main__":
    main()
