"""nd=6 and nd=7 r-stage probes (VERDICT r4 next-round #9): the fused
one-pass Pallas NTT+prescale kernel vs the XLA pipeline at the MIDDLE
digit widths the round-4 routing decision interpolated over.

Round 4 measured fused/XLA = 0.78-0.89 at nd=8 (all 61-bit presets) and
1.18-1.26 at nd=5 (37-bit headline); `settings.use_fused_prescale`'s
"auto" boundary (nd >= 8) was an extrapolation for nd=6-7. This probe
closes it with data: chains from `generate_ntt_primes` at 45 bits
(nd=6) and 53 bits (nd=7), k=256/512, l=8, same-session XLA-vs-fused
timing + bit-identity, the exact method of probe_rstage_cfg4.py.

Run: python benchmarks/probe_rstage_mid.py [batch]
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
from pvw_tpu.ops.pallas_modmat import (
    ntt_prescale_available, ntt_prescale_band,
)
from pvw_tpu.params.ring import get_ring
from pvw_tpu.sampling.cbd import cbd_bound, sample_vec_cbd_rows
from pvw_tpu.utils.intmath import generate_ntt_primes

D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


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
    print(f"  {name:42s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def probe(bits: int, limbs: int, k: int, l: int = 8):
    moduli = generate_ntt_primes(bits, limbs, l)
    ring = get_ring(moduli, l)
    bound = cbd_bound(0.5)
    print(f"{bits}-bit x{limbs} chain: k={k} l={l} nd={ring.num_digits} "
          f"batch={D} avail={ntt_prescale_available(ring, k, D, bound)}",
          flush=True)
    key = jax.random.key(3)

    @jax.jit
    def cbd(kk):
        return sample_vec_cbd_rows(kk, 0, k, (D, l), 0.5)

    @jax.jit
    def xla_band(kk):
        return modmat.prescale_digits_band(
            ntt_ops.ntt_forward_signed_ch(cbd(kk), ring, bound), ring)

    @jax.jit
    def fused_band(kk):
        return ntt_prescale_band(cbd(kk), ring, bound)

    a = np.asarray(jax.jit(xla_band)(key))
    b = np.asarray(jax.jit(fused_band)(key))
    assert np.array_equal(a, b), f"fused band mismatch at {bits}-bit"
    del a, b
    t_x = bench("XLA NTT + prescale band (production)", xla_band, key)
    t_f = bench("Pallas fused NTT+prescale band", fused_band, key)
    print(f"  fused/xla = {t_f / t_x:.3f}", flush=True)
    return t_f / t_x


def main():
    # nd=6 (45-bit) and nd=7 (53-bit) at the two production k widths
    results = {}
    for bits, limbs, k in ((45, 3, 256), (53, 3, 256), (45, 3, 512),
                           (53, 3, 512)):
        results[(bits, k)] = probe(bits, limbs, k)
    print("summary (fused/xla):", {f"{b}b/k{k}": round(v, 3)
                                   for (b, k), v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
