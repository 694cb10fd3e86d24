"""Component-level timing of the encryption kernel on the active backend.

Isolates: digit decomposition, the int8 dot_general, column sums, the
Shoup fold, NTTs, and sampling — to steer kernel optimization. Run on TPU.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u
from pvw_tpu.params.ring import RingPlan
from pvw_tpu.sampling.cbd import sample_vec_cbd
from pvw_tpu.sampling.uniform import sample_uniform_residues

N, K, ELL, D = 4096, 256, 8, 64
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def bench(name, fn, *args, iters=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"{name:36s} {dt * 1000:9.2f} ms")
    return out


def main():
    ring = RingPlan(MODULI, ELL)
    L, l = ring.num_limbs, ring.degree
    S = l
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(L, 1, 1, 1)
    b_mat = (rng.integers(0, 1 << 62, (L, S, N, K), dtype=np.uint64) % qs)
    r_vec = (rng.integers(0, 1 << 62, (L, S, K, D), dtype=np.uint64) % qs)
    bh, bl = map(jnp.asarray, u.split_u64_np(b_mat))
    rh, rl = map(jnp.asarray, u.split_u64_np(r_vec))

    print(f"config: B[{N},{K}] x r[{K},{D}], L={L}, l={l}")

    # full modular matmul
    mm = jax.jit(partial(modmat.matmul_channels, ring=ring))
    bench("matmul_channels (full)", lambda: mm((bh, bl), (rh, rl)))

    # digits only
    dg = jax.jit(lambda h, lo: modmat.digits(h, lo))
    bench("digits(B)", dg, bh, bl)

    # dot_general only (pre-computed digits)
    bd = jax.block_until_ready(dg(bh, bl))
    rd = jax.block_until_ready(dg(rh, rl))

    @jax.jit
    def dot_only(bd, rd):
        l2 = jnp.transpose(bd, (0, 1, 4, 2, 3)).reshape(L, S, 8 * N, K)
        r2 = jnp.transpose(rd, (0, 1, 2, 4, 3)).reshape(L, S, K, 8 * D)
        return jax.lax.dot_general(
            l2, r2, dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)

    p = bench("dot_general int8 (64 pairs)", dot_only, bd, rd)

    # column sums + fold from precomputed P
    @jax.jit
    def cols_fold(p):
        p6 = p.reshape(L, S, 8, N, 8, D)
        cols = modmat._column_sums(p6)
        return modmat._fold_leading(cols, ring)

    bench("column sums + fold", cols_fold, p)

    @jax.jit
    def cols_only(p):
        return modmat._column_sums(p.reshape(L, S, 8, N, 8, D))

    c = bench("column sums only", cols_only, p)

    @jax.jit
    def fold_only(cols):
        return modmat._fold_leading(cols, ring)

    bench("fold only", fold_only, c)

    # NTT of r-scale batch
    coeffs = jnp.asarray(rng.integers(-1, 2, (D, K, l), dtype=np.int64), jnp.int32)

    @jax.jit
    def ntt_path(c):
        pb = modmat.from_signed_coeffs(c, ring)
        return ntt_ops.ntt_forward(pb, ring)

    bench("from_coeffs + NTT (r)", ntt_path, coeffs)

    # sampling
    key = jax.random.key(0)
    bench("CBD sample r", jax.jit(lambda k: sample_vec_cbd(k, (D, K, l), 0.5)), key)
    bench("uniform e2 [n,d]", jax.jit(
        lambda k: sample_uniform_residues(k, (N, D, l), 200, ring)), key)


if __name__ == "__main__":
    main()
