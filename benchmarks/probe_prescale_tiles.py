"""Prescale-kernel tile sweep: can ntt_prescale_band beat the XLA
r-stage at the HEADLINE shape (where it lost 24.7 vs 20.9 ms at the
auto-picked tile)? The auto tile model budgets temps for jr_max=2 and
scales by nd^2, which over-constrains shallow chains the same way the
matmul model over-constrained the tall family. Forces each candidate
(kt, td) by monkeypatching _prescale_tile; Mosaic rejections are caught
and reported. Run: python benchmarks/probe_prescale_tiles.py [batch]
[preset|headline].
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from pvw_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from pvw_tpu.ops import modmat, ntt as ntt_ops
from pvw_tpu.ops import pallas_modmat as pm
from pvw_tpu.params import presets
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows

D = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
PRESET = sys.argv[2] if len(sys.argv) > 2 else "headline"
CANDIDATES = ((64, 512), (128, 512), (256, 512), (64, 256), (128, 256),
              (256, 256), (32, 512))


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
    if PRESET == "headline":
        n, k, l = 4096, 256, 8
        moduli = (0xFFFFC4001, 0x1FFFFE0001)
        b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
        params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
                  .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
                  .set_error_bounds_u32(b1, b2).build())
    else:
        params = presets.get_preset(PRESET)
    ring = params.ring
    k, l = params.k, params.l
    bound = cbd_bound(params.secret_variance)
    auto = pm._prescale_tile(ring, k, D)
    print(f"{PRESET}: k={k} l={l} L={ring.num_limbs} nd={ring.num_digits} "
          f"batch={D} auto_tile={auto}", flush=True)
    key = jax.random.key(3)

    @jax.jit
    def cbd(kk):
        return sample_vec_cbd_rows(kk, 0, k, (D, l), params.secret_variance)

    @jax.jit
    def xla_band(kk):
        rc = ntt_ops.ntt_forward_signed_ch(cbd(kk), ring, bound)
        return modmat.prescale_digits_band(rc, ring)

    t_x = bench("XLA r-stage (production at this shape)", xla_band, key)
    ref = np.asarray(jax.jit(xla_band)(key))

    orig = pm._prescale_tile
    best = (None, t_x)
    for kt, td in CANDIDATES:
        if k % kt or D % td:
            continue
        pm._prescale_tile = lambda r, kk, dd, _t=(kt, td): _t
        try:
            fn = jax.jit(lambda kk: pm.ntt_prescale_band(cbd(kk), ring,
                                                         bound))
            got = np.asarray(fn(key))
            assert np.array_equal(got, ref), f"mismatch at {(kt, td)}"
            del got
            t = bench(f"fused (kt={kt}, td={td})", fn, key)
            if t < best[1]:
                best = ((kt, td), t)
        except Exception as e:  # noqa: BLE001 — Mosaic rejections expected
            print(f"fused (kt={kt}, td={td}): REJECTED "
                  f"({str(e).splitlines()[0][:100]})", flush=True)
        finally:
            pm._prescale_tile = orig
    print(f"best = {best[0]} at {best[1] * 1000:.2f} ms "
          f"(xla {t_x * 1000:.2f}; ratio {best[1] / t_x:.3f})", flush=True)


if __name__ == "__main__":
    main()
