"""Two-pass variant probe (VERDICT r2 item 5 — close the last kernel
branch EMPIRICALLY).

DESIGN.md §9 rejects the two-pass decomposition analytically: let XLA run
its own int8 dot (the measured 4.8 ms floor for the headline contraction)
emitting the int32 scaled-digit columns to HBM (~1.34 GB at the headline
shape), then fold them to residues with an epilogue-only Pallas kernel.
The open question is whether (XLA dot) + (HBM column round trip) +
(fold-only kernel) beats the fused kernel's 6.98 ms no-noise row — if the
net overhead of the spill stays under ~1.1 ms, the two-pass c2 would put
the headline near ~125k enc/s.

This probe measures all three pieces on hardware, same-session:
  A. fused production kernel (no noise/encode) — the baseline row;
  B. pass 1 alone: XLA scaled-digit dot -> int32 columns in HBM;
  C. pass 1 + pass 2 (epilogue-only Pallas word-fold kernel reading the
     columns from HBM);
and cross-checks C's residues bit-exactly against A.

Usage: python benchmarks/probe_twopass.py [m] [d] [k] [iters]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvw_tpu.ops import modmat, u64 as u
from pvw_tpu.ops.pallas_modmat import _pack_tables, _pick_tiles
from pvw_tpu.params.ring import get_ring

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096     # receivers
D = int(sys.argv[2]) if len(sys.argv) > 2 else 1024     # batch
K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 10
ELL = 8
MODULI = (0xFFFFC4001, 0x1FFFFE0001)


def _fold_only_body(use_words: bool):
    """The production fold epilogue (word-regrouped Shoup) with the MXU
    dots replaced by an HBM column read — arithmetic identical to
    pvw_tpu/ops/pallas_modmat.py _make_fold_body."""

    def body(tables_ref, cols_ref, out_hi_ref, out_lo_ref):
        t = tables_ref
        ch = pl.program_id(2)
        qh, ql = t[ch, 18], t[ch, 19]
        tm = cols_ref.shape[1]
        C = cols_ref.shape[2]
        n = cols_ref.shape[3]
        ng = (C + 3) // 4
        acc_h = jnp.zeros((tm, n), u.U32)
        acc_l = jnp.zeros((tm, n), u.U32)
        gh_acc = jnp.zeros((tm, n), u.U32)
        gl_acc = jnp.zeros((tm, n), u.U32)
        prev_gh = None
        carry = None
        for c in range(C):
            g, r = divmod(c, 4)
            p_c = cols_ref[0, :, c, :]
            uc = (p_c + jnp.int32(-0x80000000)).astype(u.U32)
            if r == 0:
                th, tl = jnp.zeros_like(uc), uc
            else:
                th, tl = uc >> (32 - 8 * r), uc << (8 * r)
            gh_acc, gl_acc = u.add64(gh_acc, gl_acc, th, tl)
            if r == 3 or c == C - 1:
                if not use_words:
                    sh, sl = u.shoup_mul64_arr(
                        gh_acc, gl_acc, t[ch, 0 + g], t[ch, 4 + g],
                        t[ch, 8 + g], t[ch, 12 + g], qh, ql)
                    acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
                elif g == 0:
                    acc_h, acc_l = jnp.zeros((tm, n), u.U32), gl_acc
                    prev_gh = gh_acc
                else:
                    s1 = prev_gh + gl_acc
                    c1 = (s1 < prev_gh).astype(u.U32)
                    if carry is not None:
                        s2 = s1 + carry
                        c1 = c1 + (s2 < s1).astype(u.U32)
                        s1 = s2
                    carry = c1
                    sh, sl = u.shoup_mul32_arr(
                        s1, t[ch, 24 + g - 1], t[ch, 28 + g - 1],
                        t[ch, 32 + g - 1], qh, ql)
                    acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
                    prev_gh = gh_acc
                gh_acc = jnp.zeros((tm, n), u.U32)
                gl_acc = jnp.zeros((tm, n), u.U32)
        if use_words:
            if C % 4 == 1 and carry is not None and ng >= 2:
                th = jnp.where(carry > 0, t[ch, 24 + ng - 1], 0).astype(u.U32)
                tl = jnp.where(carry > 0, t[ch, 28 + ng - 1], 0).astype(u.U32)
                acc_h, acc_l = u.addmod(acc_h, acc_l, th, tl, qh, ql)
            else:
                s1 = prev_gh if carry is None else prev_gh + carry
                sh, sl = u.shoup_mul32_arr(
                    s1, t[ch, 24 + ng - 1], t[ch, 28 + ng - 1],
                    t[ch, 32 + ng - 1], qh, ql)
                acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
        oh, ol = u.submod(acc_h, acc_l, t[ch, 16], t[ch, 17], qh, ql)
        out_hi_ref[0] = oh
        out_lo_ref[0] = ol

    return body


@partial(jax.jit, static_argnums=(2, 3, 4))
def fold_only(cols, tables, tile_m: int, tile_n: int, use_words: bool):
    """cols int32 [CH, m, nd, n]; tables uint32 [CH, 36] -> residue pair."""
    ch, m, nd, n = cols.shape
    grid = (m // tile_m, n // tile_n, ch)
    mn_spec = pl.BlockSpec((1, tile_m, tile_n), lambda i, j, c: (c, i, j),
                           memory_space=pltpu.VMEM)
    oh, ol = pl.pallas_call(
        _fold_only_body(use_words),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_m, nd, tile_n),
                         lambda i, j, c: (c, i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[mn_spec, mn_spec],
        out_shape=[jax.ShapeDtypeStruct((ch, m, n), jnp.uint32)] * 2,
    )(tables, cols)
    return oh, ol


@partial(jax.jit, static_argnums=(2,))
def pass1_dot(lhs_dig, rhs_scaled, ring):
    """XLA's own scaled-digit dot -> int32 columns [L*S, m, nd, n] in HBM
    (modmat.scaled_cols without the final transpose)."""
    L, S, m, kd = lhs_dig.shape
    nd = ring.num_digits
    k = kd // nd
    n = rhs_scaled.shape[3]
    r2 = jnp.transpose(rhs_scaled, (0, 1, 2, 4, 5, 3)).reshape(
        L, S, k * nd, nd * n)
    p = jax.lax.dot_general(
        lhs_dig, r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )
    return p.reshape(L * S, m, nd, n)


@jax.jit
def pass1_dot_pre(lhs_dig, r2):
    """Pass 1 with the rhs ALREADY in dot layout [L, S, kd, nd*n] — the
    dot + column spill alone, no per-call operand transpose."""
    L, S, m, kd = lhs_dig.shape
    n2 = r2.shape[3]
    p = jax.lax.dot_general(
        lhs_dig, r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )
    return p.reshape(L * S, m, -1)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, iters=ITERS):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    assert jax.default_backend() == "tpu", "probe needs real TPU"
    from pvw_tpu.ops.pallas_modmat import matmul_fold_scaled
    from pvw_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    ring = get_ring(MODULI, ELL)
    L, S, nd = ring.num_limbs, ring.degree, ring.num_digits
    CH = L * S
    rng = np.random.default_rng(0)
    qs = np.array(MODULI, np.uint64).reshape(L, 1, 1, 1)

    # random operands: lhs digit planes (B rows) + prescaled rhs (r);
    # lhs_digit_planes takes the canonical poly layout [m, k, L, l]
    lhs = (rng.integers(0, 1 << 36, (M, K, L, S), np.uint64)
           % np.transpose(qs, (1, 2, 0, 3)))
    rhs = (rng.integers(0, 1 << 36, (L, S, K, D), np.uint64) % qs)
    lh, ll = map(jnp.asarray, u.split_u64_np(lhs))
    rh, rl = map(jnp.asarray, u.split_u64_np(rhs))
    lhs_dig = modmat.lhs_digit_planes(lh, ll, ring)           # [L,S,M,K*nd]
    rs6 = modmat.prescale_digits((rh, rl), ring)              # [L,S,K,D,nd,nd]
    rs_band = modmat.prescale_digits_band((rh, rl), ring)     # banded 5D
    jax.block_until_ready(rs6)
    jax.block_until_ready(rs_band)

    gb = CH * M * nd * D * 4 / 1e9
    print(f"shape: CH={CH} m={M} k={K} d={D} nd={nd}; "
          f"column spill = {gb:.2f} GB", flush=True)

    # A. fused production kernel, no noise/encode
    t_fused, out_a = timeit(lambda: matmul_fold_scaled(
        None, rs_band, ring, lhs_dig=lhs_dig))
    print(f"A fused kernel:          {t_fused * 1e3:8.2f} ms", flush=True)

    # B. pass 1 alone (XLA dot -> HBM columns)
    t_dot, cols = timeit(lambda: pass1_dot(lhs_dig, rs6, ring))
    print(f"B XLA dot (pass 1):      {t_dot * 1e3:8.2f} ms", flush=True)

    # B'. the dot + spill with the rhs transpose hoisted out (lower bound
    # on any two-pass pass 1 — prep excluded entirely)
    r2_pre = jnp.transpose(rs6, (0, 1, 2, 4, 5, 3)).reshape(
        L, S, K * nd, nd * D)
    jax.block_until_ready(r2_pre)
    t_dot_pre, _ = timeit(lambda: pass1_dot_pre(lhs_dig, r2_pre))
    print(f"B' dot, pre-laid rhs:    {t_dot_pre * 1e3:8.2f} ms", flush=True)

    # C. two-pass: dot + epilogue-only fold kernel
    tables = jnp.repeat(jnp.asarray(_pack_tables(ring, nd)), S, axis=0)
    tiles = _pick_tiles(M, D, K * nd, nd, 4 * nd)
    tile_m, tile_n = tiles if tiles else (256, 128)
    # the int32 column block is 4*nd B/elt double-buffered; cap the tile
    # to stay inside scoped VMEM (512x128 measured OOM at nd=5)
    tile_m = min(tile_m, M, 256)
    tile_n = min(tile_n, D)
    while M % tile_m:
        tile_m //= 2
    while D % tile_n:
        tile_n //= 2

    def run_twopass():
        c = pass1_dot(lhs_dig, rs6, ring)
        return fold_only(c, tables, tile_m, tile_n, ring.fold_words_ok)

    t_two, out_c = timeit(run_twopass)
    print(f"C two-pass (dot + fold): {t_two * 1e3:8.2f} ms "
          f"(fold tiles {tile_m}x{tile_n})", flush=True)

    # pass-2-only cost for the decomposition table
    cols_dev = pass1_dot(lhs_dig, rs6, ring)
    jax.block_until_ready(cols_dev)
    t_fold, _ = timeit(lambda: fold_only(cols_dev, tables, tile_m, tile_n,
                                         ring.fold_words_ok))
    print(f"   pass 2 alone (fold):  {t_fold * 1e3:8.2f} ms", flush=True)

    # bit-exactness: C == A
    a_hi = np.asarray(out_a[0]).reshape(CH, M, D)
    c_hi = np.asarray(out_c[0])
    ok = np.array_equal(a_hi, c_hi)
    print(f"bit-exact vs fused: {ok}", flush=True)
    assert ok

    verdict = "WINS — restructure c2" if t_two < t_fused else \
        "LOSES — fused kernel stands"
    print(f"two-pass {t_two * 1e3:.2f} ms vs fused {t_fused * 1e3:.2f} ms: "
          f"{verdict}", flush=True)


if __name__ == "__main__":
    main()
