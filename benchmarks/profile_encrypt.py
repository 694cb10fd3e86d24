"""Component-level timing of the encryption kernel on the active backend.

Isolates the real `_encrypt_kernel` stages at the headline config —
digit decomposition, the banded int8 dot_general, the grouped Shoup
fold, NTT column production, gadget encode, and sampling — to steer
kernel optimization. Run on TPU: `python benchmarks/profile_encrypt.py
[batch]`.
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
from pvw_tpu.sampling.cbd import sample_vec_cbd_rows
from pvw_tpu.sampling.uniform import sample_uniform_residues_rows

N, K, ELL = 4096, 256, 8
D = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _sync(out):
    """Force completion: fetch one scalar to the host (on the axon tunnel
    ``jax.block_until_ready`` can return before device completion)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return out


def bench(name, fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.time()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt * 1000:9.2f} ms", flush=True)
    return out


def main():
    ring = RingPlan(MODULI, ELL)
    L, l = ring.num_limbs, ring.degree
    nd, C = ring.num_digits, ring.num_columns
    S = l
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(L, 1, 1, 1)
    b_mat = rng.integers(0, 1 << 36, (L, S, N, K), dtype=np.uint64) % qs
    r_vec = rng.integers(0, 1 << 36, (L, S, K, D), dtype=np.uint64) % qs
    bh, bl = map(jnp.asarray, u.split_u64_np(b_mat))
    rh, rl = map(jnp.asarray, u.split_u64_np(r_vec))
    key = jax.random.key(0)

    print(f"config: B[{N},{K}] x r[{K},{D}], L={L}, l={l}, nd={nd}, C={C}")

    # the full B·r product as the kernel runs it (banded cols + fold)
    mm = jax.jit(partial(modmat.matmul_channels_banded, ring=ring))
    bench("B·r banded matmul + fold (full)", lambda: mm((bh, bl), (rh, rl)))

    cols = jax.jit(partial(modmat.banded_cols, ring=ring))
    cv = bench("  banded cols only", lambda: cols((bh, bl), (rh, rl)))

    fold = jax.jit(partial(modmat._fold_leading, ring=ring))
    bench("  fold only", fold, cv)

    dg = jax.jit(lambda h, lo: modmat.digits(h, lo, nd))
    bench("  digits(B) only", dg, bh, bl)

    # e2: sample + NTT columns (the c2 noise path)
    @jax.jit
    def e2_cols(k):
        e2 = sample_uniform_residues_rows(k, 0, N, (D, l), 200, ring)
        return ntt_ops.ntt_forward_cols(e2, ring)[0]

    e2c = bench("e2 sample + NTT cols", e2_cols, key)

    # column-space accumulate + fold (the real c2 tail)
    @jax.jit
    def acc_fold(cv, e2c):
        return modmat._fold_leading(cv + e2c.reshape(L, l, N, D, C), ring)

    bench("cols add + fold (c2 tail)", acc_fold, cv, e2c)

    # r: CBD sample + NTT (the small side)
    @jax.jit
    def r_path(k):
        rc = sample_vec_cbd_rows(k, 0, K, (D, l), 0.5)
        pb = modmat.from_signed_coeffs(rc, ring)
        return ntt_ops.ntt_forward(pb, ring)

    bench("r CBD + NTT", r_path, key)

    # gadget encode (scalars path) at full [d, n]
    from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder

    b1, b2 = PvwParameters.suggest_error_bounds(N, K, ELL, MODULI, 0.5)
    params = (
        PvwParametersBuilder().set_parties(N).set_dimension(K).set_l(ELL)
        .set_moduli(MODULI).set_secret_variance(0.5)
        .set_error_bounds_u32(b1, b2).build()
    )
    sc = rng.integers(0, 1 << 32, (D, N), dtype=np.uint64)
    sch, scl = map(jnp.asarray, u.split_u64_np(sc))

    @jax.jit
    def encode(sch, scl):
        return modmat.shoup_scale_table(
            (sch, scl), params.gadget_ntt, params.gadget_ntt_shoup, ring
        )

    bench("gadget encode (Shoup table)", encode, sch, scl)

    # output transpose cost ([L,l,n,d] -> [n,d,L,l] x2)
    o = jax.block_until_ready(mm((bh, bl), (rh, rl)))

    @jax.jit
    def transpose_out(oh, ol):
        return (jnp.transpose(oh, (2, 3, 0, 1)), jnp.transpose(ol, (2, 3, 0, 1)))

    bench("output transpose x2", transpose_out, *o)


if __name__ == "__main__":
    main()
