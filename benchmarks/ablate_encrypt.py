"""Marginal-cost ablation of the fused encryption kernel: time variants
with one stage removed to get TRUE fused costs (standalone stage timings
overstate what fusion already hides). Mirrors the structure of
``pvw_tpu.crypto.encryption._encrypt_kernel`` (scaled-digit Pallas
matmuls with IN-KERNEL noise NTT + encode addmod). Run on TPU:
``python benchmarks/ablate_encrypt.py [batch]``."""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import matmul_fold_scaled
from pvw_tpu.crypto.encryption import _encode_channel_major
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows
from pvw_tpu.sampling.uniform import sample_uniform_signed_rows

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


def make_kernel(params, *, with_e1=True, with_e2=True, with_encode=True,
                with_transpose=True, with_c1=True, with_c2=True,
                with_sampling=True):
    """Toggleable replica of ``_encrypt_kernel`` (noise-fused form).
    ``with_sampling=False`` feeds zero digit planes (keeps the in-kernel
    contraction); ``with_eX=False`` omits the noise input entirely."""
    ring = params.ring
    k, n, l = params.k, params.n, params.l

    @partial(jax.jit, static_argnums=())
    def kern(a_dig, b_dig, sc_hi, sc_lo, key):
        d = sc_hi.shape[0]
        k_r, k_e1, k_e2 = jax.random.split(key, 3)
        from_ch = lambda x: jnp.transpose(x, (2, 3, 0, 1))

        r_coeffs = sample_vec_cbd_rows(k_r, 0, k, (d, l),
                                       params.secret_variance)
        r_ntt = ntt_ops.ntt_forward_signed(
            r_coeffs, ring, cbd_bound(params.secret_variance))
        r_ch = (jnp.transpose(r_ntt[0], (2, 3, 0, 1)),
                jnp.transpose(r_ntt[1], (2, 3, 0, 1)))
        r_scaled = modmat.prescale_digits(r_ch, ring)

        def noise_planes(kk, rows, bound):
            jr = ntt_ops.signed_digit_count(bound)
            if not jr:
                return None  # residue-path bounds: not mirrored here
            if not with_sampling:
                return jnp.zeros((l * jr, rows, d), jnp.int8)
            return ntt_ops.noise_digit_planes(kk, 0, rows, d, l, bound)

        out = []
        if with_c1:
            n1 = (noise_planes(k_e1, k, params.error_bound_1)
                  if with_e1 else None)
            c1h, c1l = matmul_fold_scaled(
                None, r_scaled, ring, noise=n1, lhs_dig=a_dig)
            if with_transpose:
                out += [from_ch(c1h), from_ch(c1l)]
            else:
                out += [c1h, c1l]
        if with_c2:
            if with_encode:
                from pvw_tpu.ops.pallas_modmat import encode_tab

                etab = jnp.asarray(encode_tab(
                    params.gadget_ntt, params.gadget_ntt_shoup,
                    params.gadget_wrap, ring.moduli))
                enc = (jnp.transpose(sc_hi), jnp.transpose(sc_lo), etab)
            else:
                enc = None
            n2 = (noise_planes(k_e2, n, params.error_bound_2)
                  if with_e2 else None)
            c2h, c2l = matmul_fold_scaled(
                None, r_scaled, ring, noise=n2, encode=enc, lhs_dig=b_dig)
            if with_transpose:
                out += [from_ch(c2h), from_ch(c2l)]
            else:
                out += [c2h, c2l]
        return tuple(out)

    return kern


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(-1, 1, 1, 1)
    a = rng.integers(0, 1 << 36, (len(MODULI), 1, K, K), dtype=np.uint64) % qs
    b = rng.integers(0, 1 << 36, (len(MODULI), 1, N, K), dtype=np.uint64) % qs
    a = np.broadcast_to(np.moveaxis(a, (0, 1), (2, 3)),
                        (K, K, len(MODULI), ELL)).copy()
    b = np.broadcast_to(np.moveaxis(b, (0, 1), (2, 3)),
                        (N, K, len(MODULI), ELL)).copy()
    ah, al = map(jnp.asarray, u64op.split_u64_np(a))
    bh, bl = map(jnp.asarray, u64op.split_u64_np(b))
    a_dig = modmat.lhs_digit_planes(ah, al, params.ring)
    b_dig = modmat.lhs_digit_planes(bh, bl, params.ring)
    sc = rng.integers(0, 1 << 32, (D, N), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u64op.split_u64_np(sc))
    key = jax.random.key(0)
    args = (a_dig, b_dig, sch, scl, key)

    print(f"config: n={N} k={K} l={ELL} batch={D} "
          f"bounds=({params.error_bound_1},{params.error_bound_2})")
    full = bench("full kernel", make_kernel(params), *args)
    for nm, kw in [
        ("no e2 (no noise input)", dict(with_e2=False)),
        ("no e1", dict(with_e1=False)),
        ("zero noise (no threefry, keep kernel)", dict(with_sampling=False)),
        ("no encode", dict(with_encode=False)),
        ("no output transpose", dict(with_transpose=False)),
        ("c2 only (no c1 branch)", dict(with_c1=False)),
        ("c1 only (no c2 branch)", dict(with_c2=False)),
    ]:
        dt = bench(nm, make_kernel(params, **kw), *args)
        print(f"    -> marginal {1000*(full-dt):+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
