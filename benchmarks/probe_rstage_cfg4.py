"""Config-4 (threshold_256bit) r-stage attack: the per-encryption
CBD -> NTT -> prescale-band stage measured 54 ms of the ~88 ms batch-256
total (profile_config4.py) — 61% of the encryption cost at the deep
17x61-bit chain, vs ~30% at the headline shape. Compares the production
XLA path against the fused one-pass Pallas kernel (ntt_prescale_band),
which the headline-shape probe rejected (24.7 vs 20.9 ms there), and
pins bit-identity. Run: python benchmarks/probe_rstage_cfg4.py [batch]
[preset] (default threshold_256bit; any pvw_tpu.params.presets name).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from pvw_tpu.ops import modmat, ntt as ntt_ops
from pvw_tpu.ops.pallas_modmat import (
    _prescale_tile, ntt_prescale_available, ntt_prescale_band,
)
from pvw_tpu.params import presets
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows

D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
PRESET = sys.argv[2] if len(sys.argv) > 2 else "threshold_256bit"


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def bench(name, fn, *args, iters=8):
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
    params = presets.get_preset(PRESET)
    ring = params.ring
    k, l = params.k, params.l
    bound = cbd_bound(params.secret_variance)
    print(f"{PRESET}: k={k} l={l} L={ring.num_limbs} nd={ring.num_digits} "
          f"batch={D} "
          f"tile={_prescale_tile(ring, k, D)} "
          f"avail={ntt_prescale_available(ring, k, D, bound)}", flush=True)
    key = jax.random.key(3)

    @jax.jit
    def cbd(kk):
        return sample_vec_cbd_rows(kk, 0, k, (D, l), params.secret_variance)

    @jax.jit
    def cbd_ntt(kk):
        return ntt_ops.ntt_forward_signed_ch(cbd(kk), ring, bound)

    @jax.jit
    def xla_band(kk):
        return modmat.prescale_digits_band(cbd_ntt(kk), ring)

    @jax.jit
    def fused_band(kk):
        return ntt_prescale_band(cbd(kk), ring, bound)

    # bit-identity of the two pipelines on the same CBD draw
    a = np.asarray(jax.jit(xla_band)(key))
    b = np.asarray(jax.jit(fused_band)(key))
    assert a.shape == b.shape, (a.shape, b.shape)
    assert np.array_equal(a, b), "fused prescale band mismatch at config 4"
    print("bit-identity: OK", flush=True)
    del a, b

    bench("CBD sample", cbd, key)
    bench("CBD + signed NTT (ch)", cbd_ntt, key)
    t_x = bench("XLA: + prescale band (production)", xla_band, key)
    t_f = bench("Pallas fused NTT+prescale band", fused_band, key)
    print(f"fused/xla = {t_f / t_x:.3f}", flush=True)


if __name__ == "__main__":
    main()
