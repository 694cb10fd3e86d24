"""Same-session A/B of PVW_TPU_DOTS_FIRST (MXU dots issued before the
VPU fold, giving Mosaic's scheduler overlap freedom). Times the c2
production kernel both ways. Run: python benchmarks/ab_dots_first.py
[batch]."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import encode_tab, matmul_fold_scaled
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

N, K, ELL = 4096, 256, 8
D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    b = rng.integers(0, 1 << 36, (L, 1, N, K), dtype=np.uint64) % qs
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)), (N, K, L, ELL)).copy()
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    r = rng.integers(0, 1 << 36, (L, ELL, K, D), dtype=np.uint64) % \
        qs.reshape(-1, 1, 1, 1)
    rh, rl = map(jnp.asarray, u64op.split_u64_np(r))
    rs = _sync(jax.jit(
        lambda h, lo: modmat.prescale_digits_band((h, lo), ring)
    )(rh, rl))
    sc = rng.integers(0, 1 << 32, (D, N), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u64op.split_u64_np(sc))
    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli))
    key = jax.random.key(3)

    def gen(kk):
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(kk).reshape(2), jnp.int32)
        seeds = jnp.concatenate([kd_words, jnp.zeros(2, jnp.int32)])
        return (seeds, ntt_ops.signed_digit_count(b2), int(b2))

    def run(tag, iters=15):
        jax.clear_caches()

        @jax.jit
        def c2(kk):
            enc = (jnp.transpose(sch), jnp.transpose(scl), etab)
            return matmul_fold_scaled(
                None, rs, ring, gen_noise=gen(kk), encode=enc,
                lhs_dig=b_dig, encode32=True)

        out0 = _sync(c2(key))
        t0 = time.perf_counter()
        for i in range(iters):
            out = c2(jax.random.fold_in(key, i))
        _sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt * 1000:.2f} ms", flush=True)
        return dt, np.asarray(out0[0][:, :, :4, :4])

    os.environ["PVW_TPU_DOTS_FIRST"] = "0"
    t0_, s0 = run("c2 interleaved (default)")
    os.environ["PVW_TPU_DOTS_FIRST"] = "1"
    t1_, s1 = run("c2 dots-first")
    os.environ["PVW_TPU_DOTS_FIRST"] = "0"
    same = np.array_equal(s0, s1)
    print(f"dots-first speedup: {t0_ / t1_:.3f}x; outputs equal: {same}",
          flush=True)
    if not same:
        sys.exit(1)


if __name__ == "__main__":
    main()
