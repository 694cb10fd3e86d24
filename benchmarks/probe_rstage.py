"""Breakdown of the encryption r-stage: CBD -> NTT -> prescale ->
band layout. Identifies which step pays for the 105 MB scaled-digit
tensor's awkward transpose. Run on TPU: python benchmarks/probe_rstage.py
[batch]."""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops
from pvw_tpu.ops.pallas_modmat import _build_rhs_scaled
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
    return out


def main():
    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (PvwParametersBuilder().set_parties(N).set_dimension(K)
              .set_l(ELL).set_moduli(MODULI).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    ring = params.ring
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    key = jax.random.key(3)

    @jax.jit
    def cbd(kk):
        return sample_vec_cbd_rows(kk, 0, K, (D, l), params.secret_variance)

    @jax.jit
    def cbd_ntt(kk):
        r = sample_vec_cbd_rows(kk, 0, K, (D, l), params.secret_variance)
        return ntt_ops.ntt_forward_signed(r, ring,
                                          cbd_bound(params.secret_variance))

    @jax.jit
    def to_ch(kk):
        h, lo = cbd_ntt(kk)
        return jnp.transpose(h, (2, 3, 0, 1)), jnp.transpose(lo, (2, 3, 0, 1))

    @jax.jit
    def presc(kk):
        return modmat.prescale_digits(to_ch(kk), ring)

    @jax.jit
    def presc_band(kk):
        rs = presc(kk)
        return _build_rhs_scaled(rs.reshape(L * l, K, D, nd, nd))

    bench("CBD sample", cbd, key)
    bench("CBD + signed NTT", cbd_ntt, key)
    bench("CBD + NTT + ch transpose", to_ch, key)
    bench("CBD + NTT + ch + prescale", presc, key)
    bench("CBD + NTT + ch + prescale + band layout", presc_band, key)


if __name__ == "__main__":
    main()
