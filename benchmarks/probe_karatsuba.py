"""Go/no-go probe for a Karatsuba digit contraction on 61-bit chains.

DESIGN.md §9 rejected Karatsuba at the headline nd=5 but flagged nd=8
(the 61-bit limbs of BASELINE configs 2/4) as worth revisiting:
recursive 2-way Karatsuba over 8 digits needs M(8) = 27 products vs the
64 the scaled-digit contraction performs — IF the digit base leaves int8
headroom for the operand sums.

This probe measures only the MXU/HBM side of that trade at the config-4
per-channel shape (n=1024, k=512, nd=8), CH channels batched:

  naive:     [CH, n, k*8] x [CH, k*8, 8*D]      (the production dot)
  karatsuba: [CH*27, n, k] x [CH*27, k, D]      (27 combination-plane
             products as a batched dot; lhs combination planes are 27/8 =
             3.4x the naive lhs bytes, rhs shrinks 64 -> 27 columns)

It does NOT implement the exact reconstruction (extra VPU adds on an
epilogue DESIGN.md §9 shows is already at VPU speed-of-light — that cost
comes on top). If the karatsuba dot is not decisively faster here, the
kernel change is not worth building. All operands are generated on
device (tunnel transfer would dominate otherwise).

Usage: python benchmarks/probe_karatsuba.py [CH] [D]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

CH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
D = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N, K, ND, M_KARA = 1024, 512, 8, 27


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return x


def bench(name, fn, *args, iters=10):
    _sync(jax.block_until_ready(fn(*args)))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    mk = jax.jit(
        lambda k, shape: jax.random.randint(k, shape, -64, 64, jnp.int8),
        static_argnums=(1,),
    )
    t0 = time.time()
    lhs_n = _sync(mk(ks[0], (CH, N, K * ND)))
    rhs_n = _sync(mk(ks[1], (CH, K * ND, ND * D)))
    lhs_k = _sync(mk(ks[2], (CH * M_KARA, N, K)))
    rhs_k = _sync(mk(ks[3], (CH * M_KARA, K, D)))
    print(f"operands generated in {time.time() - t0:.1f}s", flush=True)

    @jax.jit
    def dot_naive(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    @jax.jit
    def dot_kara(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)

    macs_n = CH * N * (K * ND) * (ND * D)
    macs_k = CH * M_KARA * N * K * D
    t1 = bench(f"naive nd=8 dot (CH={CH}, D={D})", dot_naive, lhs_n, rhs_n)
    print(f"    -> {macs_n / t1 / 1e12:.1f} T MAC/s", flush=True)
    t2 = bench(f"karatsuba-27 batched dot", dot_kara, lhs_k, rhs_k)
    print(f"    -> {macs_k / t2 / 1e12:.1f} T MAC/s "
          f"({macs_k / macs_n:.2f}x the MACs)", flush=True)
    print(f"speedup if exact reconstruction were free: {t1 / t2:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
