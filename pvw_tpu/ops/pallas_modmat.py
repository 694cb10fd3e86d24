"""Pallas TPU kernel: fused modular matmul (digit matmul + in-VMEM fold).

The XLA path (:mod:`pvw_tpu.ops.modmat`) materializes the int32 digit-
product columns in HBM between the MXU contraction and the VPU fold — for
the n=4096 encryption product that intermediate is ~15-64x the output and
dominates the runtime. This kernel fuses the two stages: each grid program
loads one (channel, m-tile) of the lhs digits and the channel's banded rhs
digits into VMEM, runs 15 int8 MXU contractions (one per convolution
column — Mosaic cannot split the lane axis, so the column index is a
leading array axis rather than an in-kernel reshape), and folds the
columns to residues on the VPU while they are still in VMEM, writing only
the final uint32 hi/lo pair.

HBM traffic: inputs + outputs only — the speed-of-light minimum for this
op. Grid: (channels, m/TILE_M). The fold is the exact word-regrouped
Shoup arithmetic of :func:`pvw_tpu.ops.u64.fold_columns_words` when every
modulus exceeds 2^32 (``ring.fold_words_ok``), else the grouped form of
:func:`pvw_tpu.ops.u64.fold_columns_grouped`; exactness is tested in
interpret mode against the XLA path and on hardware by the encryption
round-trip tests.
"""

from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64 as u
from .modmat import digits

if TYPE_CHECKING:
    from ..params.ring import RingPlan


# --------------------------------------------------------------------------
# stream-v4 contract helpers
#
# The in-kernel hardware-PRNG noise ("stream v4") is defined by three pure
# functions, extracted here so CPU-runnable tests can pin the contract
# (tests/test_noise_v4.py) even though the PRNG primitives themselves only
# exist on the TPU backend (pltpu.prng_* has no interpret-mode lowering):
# a regression in the seed mixing, the 96-bit reduction, or the digit
# split changes these functions and fails the tests.
# --------------------------------------------------------------------------

def v4_blockmix(row0, col0):
    """Per-tile seed perturbation: ``(row0/8) << 17 | col0/128``.

    ``row0``/``col0`` are the tile's GLOBAL first row/column. Mosaic tiles
    are >= (8, 128)-aligned, so the two quotients identify the tile block
    uniquely and the mix is injective for col0 < 2^24 (tile-uniqueness is
    what makes every tile draw an independent stream from the same key —
    tested in tests/test_noise_v4.py)."""
    return ((row0 >> 3) << 17) | (col0 >> 7)


def v4_reduce96(b_hi, b_mid, b_lo, rng32):
    """Exact 96-bit scaled reduction: v = floor(x96 * rng32 / 2^96) for
    x96 = b_hi*2^64 + b_mid*2^32 + b_lo (all uint32) — the
    :func:`pvw_tpu.sampling.uniform.sample_bounded_u64` fast path, so the
    sampled value is uniform in [0, rng32) up to distance rng32/2^96.
    Pure jnp (VPU ops in-kernel; CPU-testable outside)."""
    h0 = u.mulhi32(b_lo, rng32)
    h1, l1 = u.mul32_wide(b_mid, rng32)
    h2, l2 = u.mul32_wide(b_hi, rng32)
    s32 = h0 + l1
    c32 = (s32 < h0).astype(u.U32)
    s64 = h1 + l2
    c64a = (s64 < h1).astype(u.U32)
    s64 = s64 + c32
    c64b = ((s64 == 0).astype(u.U32)) & c32
    return h2 + c64a + c64b


def v4_digit_split(sv):
    """Signed value -> (d0, d1) signed-8-bit digits with sv == d0 + 256*d1
    (the jr=2 noise digit-plane layout)."""
    d0 = ((sv + 128) & 255) - 128
    return d0, (sv - d0) >> 8


def _make_fold_body(ch_axis: int, has_noise: bool, has_post: bool,
                    use_words: bool = False, has_encode: bool = False,
                    encode32: bool = False, gen_noise: tuple | None = None,
                    noise_vals: int = 0, in_jr: int = 0,
                    dots_first: bool = False, masked: bool = False,
                    swapped: bool = False):
    """Factory for the fused matmul+fold kernel bodies.

    All variants bias each int32 column by +2^31 and accumulate groups of
    four columns in a u64 pair. The recombination of the groups comes in
    two exact flavors:

    - grouped fold (``use_words=False``, any modulus): Shoup-multiply each
      u64 group by 2^(32g) mod q (:func:`pvw_tpu.ops.u64.
      fold_columns_grouped`);
    - word fold (``use_words=True``, requires q > 2^32 per limb —
      ``ring.fold_words_ok``): regroup the groups' 32-bit halves by weight
      so each word reduces with ONE 32-bit Shoup multiply — ~half the VPU
      ops (:func:`pvw_tpu.ops.u64.fold_columns_words`).

    Then subtract the bias constant K. Options:

    - ``ch_axis``: grid axis carrying the channel index.
    - ``has_noise``: contract a tile of raw signed noise digit planes
      against the per-channel scaled-twiddle table (the error NTT,
      computed in VMEM — its int32 columns never exist in HBM) and add it
      into the convolution columns pre-fold.
    - ``has_post``: addmod a residue pair (the gadget encode) post-fold.
    - ``has_encode``: compute the gadget encode IN-KERNEL from a u64
      scalar-pair tile and per-channel constants (g, its Shoup companion,
      and the u64->i64 wrap correction (2^64 mod q)*g mod q) and addmod it
      post-fold — the [CH, m, n] encode residues never exist in HBM.
    - ``encode32``: all scalars are < 2^32 (host-checked): the encode is a
      single 32-bit Shoup multiply of the low word and the i64-wrap
      correction is statically dead (~half the encode VPU ops).
    - ``gen_noise``: (ldeg, jr, bound) — generate the bounded-uniform
      noise IN-KERNEL with the TPU hardware PRNG ("stream v4") instead of
      taking digit planes as an input: at the first channel of each
      (i, j) tile the kernel seeds the PRNG with
      (key0 ^ blockmix, key1), where blockmix = (global_row0/8)<<17 |
      col0/128 is unique per tile block, draws 96 bits per (coeff, m, n)
      sample, reduces exactly as :func:`pvw_tpu.sampling.uniform.
      sample_bounded_u64` (distance < range/2^96), and stores the signed
      digit planes in VMEM scratch reused across channels. SECURITY NOTE:
      the TPU hardware PRNG is deterministic per seed but not a specified
      CSPRNG; set PVW_TPU_NOISE=v3 to keep the threefry stream (slower —
      the threefry draw was ~15% of device time).
    - ``masked`` (requires ``gen_noise``): seeds carry a global row range
      [seeds[3], seeds[4]) — the PRNG draws the IDENTICAL per-tile stream
      (same bits, same order — bit-compatible with the unmasked kernel),
      but noise values AND the in-kernel encode are zeroed outside the
      range. This is how a kdim-split mesh shard applies noise/encode to
      exactly its 1/kd row block of the partial sum: the kdim partials
      gather-add to the same residues as the single-shard kernel (modular
      adds commute), for ANY row partition including ragged ones.
    - ``noise_vals``: > 0 switches the noise MAC to VALUE planes: the
      scratch holds ``noise_vals`` (= ring degree) int32 noise VALUES per
      element instead of l*jr int8 digits, contracted against the jr=1
      scaled-twiddle table. Exact because
      sum_c 2^(8c) * sum_j v_j * digit_c(fwd[s,j]) = sum_j v_j*fwd[s,j];
      column magnitude adds l*bound*2^7 (callers guard the int32 headroom
      — DESIGN.md §5a). Cuts the per-column noise MACs from l*jr to l and
      removes every in-loop int8->int32 convert (the converts ran once
      per column before). Bit-identical to the digit-plane MAC.
    - ``in_jr``: with ``noise_vals`` and an INPUT noise ref (gen_noise
      None), the digit count of the incoming int8 planes; the kernel
      composes them into value planes once per (i, j) tile at channel 0.

    Ref order: tables [CH, 36] u32 SMEM; (enc_tab [1, 8] u32 SMEM if
    has_encode); (ntab [1, ljr, C] i32 SMEM if has_noise);
    (seeds [4] i32 SMEM if gen_noise); lhs [1, TM, kd] i8;
    band [1, C, kd, TN] i8; (noise [ljr, TM, TN] i8 if has_noise and not
    gen_noise); (post hi/lo [1, TM, TN] u32 if has_post); (sc hi/lo
    [TM, TN] u32 if has_encode); outputs hi/lo [1, TM, TN] u32;
    (scratch noise [ljr, TM, TN] i8 if gen_noise).
    """

    def body(tables_ref, *refs):
        refs = list(refs)
        enc_tab_ref = refs.pop(0) if has_encode else None
        ntab_ref = refs.pop(0) if has_noise else None
        seed_ref = refs.pop(0) if gen_noise else None
        lhs_ref = refs.pop(0)
        band_ref = refs.pop(0)
        noise_ref = (refs.pop(0) if has_noise and gen_noise is None
                     else None)
        if has_post:
            post_hi_ref, post_lo_ref = refs.pop(0), refs.pop(0)
        if has_encode:
            if encode32:
                sc_lo_ref = refs.pop(0)
            else:
                sc_hi_ref, sc_lo_ref = refs.pop(0), refs.pop(0)
        if gen_noise is not None or (has_noise and noise_vals and in_jr):
            out_hi_ref, out_lo_ref, noise_scr = refs
        else:
            out_hi_ref, out_lo_ref = refs
        # ``swapped``: the SCALES live on the (cached) lhs — lhs block
        # [1, C, TM, kd] of digit_c(A*2^(8i) mod q) planes, band block is
        # the plain rhs digits [1, kd, TN] shared by every column; same
        # columns, same fold, bit-identical residues (DESIGN.md §5f).
        tm = lhs_ref.shape[2] if swapped else lhs_ref.shape[1]
        n = out_hi_ref.shape[2]

        row_ok = None
        if masked:
            rid = (seed_ref[2] + pl.program_id(0) * tm
                   + jax.lax.broadcasted_iota(jnp.int32, (tm, n), 0))
            row_ok = (rid >= seed_ref[3]) & (rid < seed_ref[4])
        if gen_noise is not None:
            ldeg, jr, bound = gen_noise[:3]
            tfry = len(gen_noise) > 3 and bool(gen_noise[3])
            # numpy scalar, not jnp: a trace-time jnp array would be a
            # captured pallas_call constant (rejected off-TPU)
            rng32 = np.uint32(2 * bound + 1)

            def _store(jj, sv):
                if masked:
                    # same bits drawn, rows outside the shard's range
                    # contribute zero (additive identity pre-fold)
                    sv = jnp.where(row_ok, sv, 0)
                if noise_vals:
                    noise_scr[jj] = sv                    # value plane
                elif jr == 1:
                    noise_scr[jj] = sv.astype(jnp.int8)
                else:
                    d0, d1 = v4_digit_split(sv)
                    noise_scr[2 * jj] = d0.astype(jnp.int8)
                    noise_scr[2 * jj + 1] = d1.astype(jnp.int8)

            # program_id reads hoisted OUT of the pl.when closure: the
            # interpret-mode executor only rewrites program_id at the
            # kernel jaxpr's top level, not inside cond sub-jaxprs
            i = pl.program_id(0)
            j = pl.program_id(1)
            # the final seed word is the GLOBAL column offset (round 5:
            # the dealer-batch data-parallel backend — a shard encrypting
            # dealer columns [c0, c0+dl) draws the same streams the full
            # batch would at those columns); 0 for every other caller
            col_off = seed_ref[5] if masked else seed_ref[3]

            @pl.when(pl.program_id(ch_axis) == 0)
            def _generate():
                row0 = seed_ref[2] + i * tm
                if tfry:
                    # stream v3k: Threefry-2x32-20 on GLOBAL (row, col,
                    # coeff-pair) counters — a specified CSPRNG whose
                    # stream is independent of tile geometry and mesh
                    # shape, reproduced bit-identically off-TPU by
                    # ops.tfry.v3k_values (pure VPU int32 ops; no
                    # hardware-PRNG primitives). Both threefry output
                    # words feed the SAME element: 1.5 evals per value,
                    # the same arithmetic as the XLA pass it fuses away.
                    from .tfry import threefry2x32

                    k0 = seed_ref[0].astype(u.U32)
                    k1 = seed_ref[1].astype(u.U32)
                    rows_g = (row0 + jax.lax.broadcasted_iota(
                        jnp.int32, (tm, n), 0)).astype(u.U32)
                    cols_g = (col_off + j * n
                              + jax.lax.broadcasted_iota(
                                  jnp.int32, (tm, n), 1)).astype(u.U32)
                    base = cols_g * np.uint32(ldeg // 2)
                    for jjp in range(ldeg // 2):
                        ws = []
                        for t in range(3):
                            x1c = ((base + np.uint32(jjp)) << 2) \
                                | np.uint32(t)
                            ws.append(threefry2x32(k0, k1, rows_g, x1c))
                        v_e = v4_reduce96(ws[0][0], ws[1][0], ws[2][0],
                                          rng32)
                        v_o = v4_reduce96(ws[0][1], ws[1][1], ws[2][1],
                                          rng32)
                        _store(2 * jjp, v_e.astype(jnp.int32) - bound)
                        _store(2 * jjp + 1, v_o.astype(jnp.int32) - bound)
                else:
                    mix = v4_blockmix(row0, col_off + j * n)
                    pltpu.prng_seed(seed_ref[0] ^ mix, seed_ref[1])
                    for jj in range(ldeg):
                        bits = pltpu.bitcast(
                            pltpu.prng_random_bits((3, tm, n)), u.U32)
                        # v = floor(x96 * range / 2^96): exact 96-bit
                        # scaled reduction (sample_bounded_u64 fast path).
                        v = v4_reduce96(bits[0], bits[1], bits[2], rng32)
                        _store(jj, v.astype(jnp.int32) - bound)
            noise_ref = noise_scr
        elif has_noise and noise_vals and in_jr:
            # input digit planes -> int32 value planes, once per (i, j)
            # tile (reused across the channel grid axis)
            @pl.when(pl.program_id(ch_axis) == 0)
            def _compose():
                for jj in range(noise_vals):
                    if in_jr == 1:
                        noise_scr[jj] = noise_ref[jj].astype(jnp.int32)
                    else:
                        noise_scr[jj] = (
                            noise_ref[2 * jj].astype(jnp.int32)
                            + (noise_ref[2 * jj + 1].astype(jnp.int32) << 8)
                        )
            noise_ref = noise_scr
        C = lhs_ref.shape[1] if swapped else band_ref.shape[1]
        ng = (C + 3) // 4
        ch = pl.program_id(ch_axis)
        t = tables_ref
        qh, ql = t[ch, 18], t[ch, 19]
        lhs = None if swapped else lhs_ref[0]
        rhs_shared = band_ref[0] if swapped else None

        def _dot(c):
            if swapped:
                return jax.lax.dot_general(
                    lhs_ref[0, c], rhs_shared,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            return jax.lax.dot_general(
                lhs, band_ref[0, c],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        acc_h = jnp.zeros((tm, n), u.U32)
        acc_l = jnp.zeros((tm, n), u.U32)
        gh_acc = jnp.zeros((tm, n), u.U32)
        gl_acc = jnp.zeros((tm, n), u.U32)
        prev_gh = None   # word fold: high half of the previous group
        carry = None     # word fold: carry bit of the previous word add
        dots = None
        if dots_first:
            # issue every MXU contraction before any VPU fold work so the
            # scheduler can overlap the fold of column c with the dot of
            # column c+1 (bit-identical: pure reordering)
            dots = [_dot(c) for c in range(C)]
        for c in range(C):
            g, r = divmod(c, 4)
            p_c = dots[c] if dots_first else _dot(c)    # [TM, n]
            if has_noise:
                if noise_vals:
                    # int32 value planes: l MACs/column, no converts
                    for rr in range(noise_vals):
                        p_c = p_c + noise_ref[rr] * ntab_ref[0, rr, c]
                else:
                    # int8->int32 convert inside the loop: hoisting ljr
                    # int32 planes keeps 4*ljr bytes/elt live across the
                    # whole unrolled C loop and overflows scoped VMEM at
                    # deep digit widths (the vals path hoists l planes
                    # instead, guarded by the same VMEM cost model)
                    for rr in range(noise_ref.shape[0]):
                        p_c = p_c + (noise_ref[rr].astype(jnp.int32)
                                     * ntab_ref[0, rr, c])
            uc = (p_c + jnp.int32(-0x80000000)).astype(u.U32)  # bias +2^31
            if r == 0:
                th, tl = jnp.zeros_like(uc), uc
            else:
                th, tl = uc >> (32 - 8 * r), uc << (8 * r)
            gh_acc, gl_acc = u.add64(gh_acc, gl_acc, th, tl)
            if r == 3 or c == C - 1:
                if not use_words:
                    sh, sl = u.shoup_mul64_arr(
                        gh_acc, gl_acc,
                        t[ch, 0 + g], t[ch, 4 + g], t[ch, 8 + g],
                        t[ch, 12 + g],
                        qh, ql,
                    )
                    acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
                elif g == 0:
                    acc_h, acc_l = jnp.zeros((tm, n), u.U32), gl_acc
                    prev_gh = gh_acc
                else:
                    # word W_g = gh_(g-1) + gl_g (+ carry), exact carries
                    s1 = prev_gh + gl_acc
                    c1 = (s1 < prev_gh).astype(u.U32)
                    if carry is not None:
                        s2 = s1 + carry
                        c1 = c1 + (s2 < s1).astype(u.U32)
                        s1 = s2
                    carry = c1
                    sh, sl = u.shoup_mul32_arr(
                        s1, t[ch, 24 + g - 1], t[ch, 28 + g - 1],
                        t[ch, 32 + g - 1], qh, ql,
                    )
                    acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
                    prev_gh = gh_acc
                gh_acc = jnp.zeros((tm, n), u.U32)
                gl_acc = jnp.zeros((tm, n), u.U32)
        if use_words:
            # top word W_ng = gh_(ng-1) + carry (provably < 2^32)
            if C % 4 == 1 and carry is not None and ng >= 2:
                # single-column last group: its gh is provably zero, so the
                # top word is the carry bit alone
                th = jnp.where(carry > 0, t[ch, 24 + ng - 1], 0).astype(u.U32)
                tl = jnp.where(carry > 0, t[ch, 28 + ng - 1], 0).astype(u.U32)
                acc_h, acc_l = u.addmod(acc_h, acc_l, th, tl, qh, ql)
            else:
                s1 = prev_gh if carry is None else prev_gh + carry
                sh, sl = u.shoup_mul32_arr(
                    s1, t[ch, 24 + ng - 1], t[ch, 28 + ng - 1],
                    t[ch, 32 + ng - 1], qh, ql,
                )
                acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
        oh, ol = u.submod(acc_h, acc_l, t[ch, 16], t[ch, 17], qh, ql)
        if has_post:
            oh, ol = u.addmod(oh, ol, post_hi_ref[0], post_lo_ref[0],
                              qh, ql)
        if has_encode:
            et = enc_tab_ref
            if encode32:
                # scalars < 2^32: one 32-bit Shoup (et[6] = g's 32-bit
                # companion), and the i64 wrap cannot trigger
                eh, el = u.shoup_mul32_arr(
                    sc_lo_ref[...], et[0, 0, 0], et[0, 0, 1], et[0, 0, 6],
                    qh, ql,
                )
            else:
                sch, scl = sc_hi_ref[...], sc_lo_ref[...]
                eh, el = u.shoup_mul64_arr(
                    sch, scl, et[0, 0, 0], et[0, 0, 1], et[0, 0, 2],
                    et[0, 0, 3], qh, ql,
                )
                # Rust `as i64` wrap (encryption.rs:195): scalars >= 2^63
                # encode as m - 2^64, i.e. subtract (2^64 mod q)*g mod q
                wh, wl = u.submod(eh, el, et[0, 0, 4], et[0, 0, 5], qh, ql)
                neg = sch >= jnp.uint32(1 << 31)
                eh = jnp.where(neg, wh, eh)
                el = jnp.where(neg, wl, el)
            if masked:
                # the encode, like the noise, lands only on this shard's
                # row range (added exactly once across the kdim partials)
                eh = jnp.where(row_ok, eh, 0)
                el = jnp.where(row_ok, el, 0)
            oh, ol = u.addmod(oh, ol, eh, el, qh, ql)
        out_hi_ref[0] = oh
        out_lo_ref[0] = ol

    return body


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _fused_banded_matmul(lhs_dig, band, tables, tile_m: int, tile_n: int,
                         interpret: bool, use_words: bool = False):
    """lhs_dig int8 [CH, m, 8k]; band int8 [CH, 15, 8k, n];
    tables uint32 [CH, 36] -> (hi, lo) uint32 [CH, m, n].

    2-D (m, n) tiling keeps the band block within VMEM for large dealer
    batches; the lhs tile is reused across the n-tiles of a row."""
    ch, m, kd = lhs_dig.shape
    n = band.shape[3]
    C = band.shape[1]
    grid = (ch, m // tile_m, n // tile_n)
    out_shape = [
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
    ]
    return pl.pallas_call(
        _make_fold_body(0, False, False, use_words),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full table, indexed by ch
            pl.BlockSpec((1, tile_m, kd), lambda c, i, j: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, kd, tile_n), lambda c, i, j: (c, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_m, tile_n), lambda c, i, j: (c, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, tile_n), lambda c, i, j: (c, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(
            interpret, floor_mb=_floor_mb(tile_m, tile_n, kd, C)),
    )(tables, lhs_dig, band)


def _pack_tables(ring: "RingPlan", ncols: int | None = None) -> np.ndarray:
    """Per-limb fold constants -> uint32 [L, 36] rows for SMEM.

    Layout: [0:16] grouped-fold 2^(32g) mod q pairs + 64-bit Shoup halves;
    [16:18] bias K; [18:20] q; [24:36] word-fold 2^(32w) mod q pairs +
    32-bit Shoup companions (w = 1..4). ``ncols`` selects the bias
    constant for folds over fewer columns than the full 2nd-1 (the
    scaled-digit matmul folds only nd)."""
    L = ring.num_limbs
    bias_hi, bias_lo = (
        (ring.bias_hi, ring.bias_lo) if ncols is None
        else ring.bias_pair_for_columns(ncols)
    )
    t = np.zeros((L, 36), np.uint32)
    t[:, 0:4] = ring.grp_hi
    t[:, 4:8] = ring.grp_lo
    t[:, 8:12] = ring.grp_sh
    t[:, 12:16] = ring.grp_sl
    t[:, 16] = bias_hi
    t[:, 17] = bias_lo
    t[:, 18] = ring.q_hi
    t[:, 19] = ring.q_lo
    t[:, 24:28] = ring.wrd_hi
    t[:, 28:32] = ring.wrd_lo
    t[:, 32:36] = ring.wrd_wp32
    return t


def _build_band_cmajor(rd):
    """rhs digits [CH, k, n, nd] int8 -> banded [CH, 2nd-1, nd*k, n] int8
    (column index leading so the kernel slices it without lane reshapes)."""
    chn, k, n, nd = rd.shape
    C = 2 * nd - 1
    rdt = jnp.transpose(rd, (0, 1, 3, 2))            # [CH, k, nd, n]
    band = jnp.zeros((chn, k, nd, C, n), jnp.int8)
    for i in range(nd):
        band = band.at[:, :, i, i : i + nd, :].set(rdt)
    # [CH, k, nd, C, n] -> [CH, C, k*nd, n]
    return jnp.transpose(band, (0, 3, 1, 2, 4)).reshape(chn, C, k * nd, n)


def _build_rhs_scaled(td):
    """Prescaled rhs digits [CH, k, n, nd(i), nd(j)] int8 (from
    :func:`pvw_tpu.ops.modmat.prescale_digits`, channels flattened) ->
    [CH, nd(j), k*nd(i), n] — column index leading, dense (the scaled form
    has no band sparsity)."""
    ch, k, n, ndi, ndj = td.shape
    return jnp.transpose(td, (0, 4, 1, 3, 2)).reshape(ch, ndj, k * ndi, n)


# Scoped-VMEM ceiling for auto tile selection. v5e has 16 MB/core; Mosaic
# rejects programs whose stack exceeds it, so the cost model must count
# what actually lives there: the in/out blocks TWICE (pipeline double
# buffering) plus the kernel's u32 temporaries (4 accumulators + ~4
# transient products per (tile_m, tile_n)).
_VMEM_LIMIT = 15 * 1024 * 1024

# The tall (1024, 128) tile exceeds the conservative limit above but is
# hardware-validated (v5e, round 4) for the kd <= 1280, C <= 9,
# m <= 4096 family (2-limb chains at nd <= 5, k <= 256): Mosaic accepted
# the headline encryption c2 kernel (m=4096, batch 8192) and the
# m=4096 batch-keygen kernel right at the 16M scoped-vmem ceiling
# (~15.99M), while every neighbor lands just OVER it: kd=2048 keygen
# 16.49M, m=8192 encrypt 16.13M — and forced tall tiles crash configs
# 3/4 outright. The cost model cannot discriminate at 1% precision
# across kernel variants (its ordering inverts between the gen-noise and
# input-plane variants), so the gate is the hardware-validated envelope
# itself — every admitted shape is elementwise <= a shape Mosaic took —
# plus the model-cost ceiling of its largest accepted member. Measured
# same-process A/B at the headline: 71.3-71.6 ms/batch-8192 vs 72.4-72.5
# for (512, 128) => +1.4% (BASELINE.md round-4 rows).
_VMEM_LIMIT_TALL = 28_700_000

# Round-4 deep-chain envelopes, same method as the tall gate (the cost
# model over-counts the real Mosaic stack by shape-dependent factors, so
# each gate admits only shapes elementwise <= a shape hardware accepted,
# bounded by the model cost of the largest accepted member):
#
# - MID (512, 128) for kd <= 2048, C <= 8: accepted at the shares_n1024
#   family (encrypt c2 kd=2048/extra 56 -> model 17.83M, keygen — real
#   stack fit 16M; end-to-end 57,238 -> 60,724 enc/s, +6.1%). The
#   (1024, 128) neighbor was REJECTED there (keygen stack 16.49M).
# - DEEP (256, 128) for kd <= 4096, C <= 8: accepted at the
#   threshold_256bit family (c2 kd=4096/extra 72 -> model 17.30M; c1,
#   keygen too; end-to-end 3,257 -> 3,761 enc/s, +15.5%). The (512, 128)
#   neighbor was REJECTED there (encrypt stack 17.00M > 16M).
_VMEM_LIMIT_MID = 17_825_792
_VMEM_LIMIT_DEEP = 17_301_504

# Round-5 XL (2048, 128) envelope — the first tile past the default
# Mosaic ceiling adopted into the auto pick. Hardware-validated at the
# headline family ONLY (m=4096, n(batch) >= 8192, kd <= 1280, C <= 9):
# compiles and runs at a 100 MiB Mosaic limit in BOTH kernel variants
# (v4-vals model cost 53.0M; v3k-threefry 61.4M = this gate's ceiling,
# bit-identical v3k identity leg), and wins the deciding A/B/A/B at
# every round — pooled 1.0068x vs (1024,128), rounds 1.0076/1.0091/
# 1.0037, peak 118,040 enc/s (benchmarks/ab_tall2048.py; every OTHER
# raised-limit tile measured neutral-to-worse, BASELINE.md round-5
# scoped-VMEM table). Call sites must raise the Mosaic limit for it —
# _floor_mb() detects the family by model cost and requests 100 MiB.
_VMEM_LIMIT_XL = 61_407_232


def _floor_mb(tile_m: int, tile_n: int, kd: int, C: int,
              tfry: bool = False) -> int | None:
    """Per-kernel Mosaic-limit floor (MiB) for tile families that need
    more than the ~16 MiB compiler default: the XL family (detected by
    the extra-free model cost — 25.0M at (2048,128)/kd=1280 vs <= 14M
    for every default-ceiling family) needs the 100 MiB limit it was
    validated at; the v3k threefry variant needs 18 MiB at the
    DEEP-envelope tile (real stack 16.06M, measured)."""
    cost0 = (2 * (tile_m * kd + C * kd * tile_n + 8 * tile_m * tile_n)
             + 48 * tile_m * tile_n)
    if cost0 > 20 * 1024 * 1024:
        return 100
    return 18 if tfry else None


def _compiler_params(interpret: bool = False, floor_mb: int | None = None):
    """Mosaic compiler params for the production kernels: when
    ``settings.vmem_limit_mb`` is set, raise the scoped-VMEM ceiling via
    ``CompilerParams.vmem_limit_bytes``. The default ~16 MiB ceiling is a
    compiler soft limit, not the hardware: a 96 MiB VMEM working set
    measured compiling and running on this v5e (round 5,
    benchmarks/probe_vmem_tiles.py). ``floor_mb`` lets a kernel variant
    whose real stack is measured a hair over the default ceiling request
    the headroom it needs (the v3k threefry variant at the DEEP-envelope
    tile: 16.06 MiB stack vs the 16.00 MiB default — 64 KiB over —
    while the v4 variant the envelope was validated on fits; same model
    cost, so the tile search cannot discriminate). Returns None
    (compiler default) when nothing raises the limit or interpreting."""
    if interpret:
        return None
    from ..config import settings

    mb = settings.vmem_limit_mb or 0
    if floor_mb:
        mb = max(int(mb), floor_mb)
    if not mb:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb) * 1024 * 1024)


def _tile_cost(tile_m: int, tile_n: int, kd: int, C: int,
               extra_mn: int = 0) -> int:
    blocks = (tile_m * kd + C * kd * tile_n
              + (8 + extra_mn) * tile_m * tile_n)
    temps = 48 * tile_m * tile_n
    return 2 * blocks + temps


def _pick_tiles(m: int, n: int, kd: int, C: int, extra_mn: int = 0):
    """Largest (tile_m, tile_n) whose double-buffered blocks + kernel
    temporaries fit the scoped-VMEM ceiling. ``extra_mn``: bytes per
    (tile_m x tile_n) element of additional blocks (noise digits, post-add
    residues). None when nothing fits. PVW_TILE_M/PVW_TILE_N override for
    perf experiments (no VMEM check — Mosaic rejects oversize)."""
    from ..config import settings

    fm, fn = settings.tile_m, settings.tile_n
    if fm and fn:
        return fm, fn
    # Preference order measured on v5e (hardware sweep, see BASELINE.md):
    # the tall-skinny (512, 128) tile beats (256, 256) at every tested
    # shape (+5% headline, +13% at the 4-limb config — taller m-tiles
    # amortize the banded rhs block better per output element); the
    # (1024, 128) tile is +1.4% again where its gate admits it (see
    # _VMEM_LIMIT_TALL).
    # n >= 8192 (round 5): the real Mosaic stack varies with the n extent
    # too — (1024, 128) at m=4096/kd=1280 compiled at n=8192..12288 (every
    # r4-validated member) but hit 16.13M > 16M at n=1024 (v4 production
    # kernel, measured this round); below the validated n range the pick
    # falls to (512, 128), the r1-r3 hardware-validated default
    # XL (2048, 128) — round 5, see _VMEM_LIMIT_XL: two validated
    # families, both needing the raised Mosaic limit (call sites request
    # it via _floor_mb): the headline (m <= 4096, batch >= 8192, +0.68%
    # pooled) and the 8192-receiver family (m = 8192, batch >= 2048,
    # +2.48% pooled — benchmarks/ab_tall2048.py AB_N=8192)
    if (((2048 <= m <= 4096 and m % 2048 == 0 and n >= 8192)
         or (m == 8192 and n >= 2048))
            and kd <= 1280 and C <= 9
            and _tile_cost(2048, 128, kd, C, extra_mn) <= _VMEM_LIMIT_XL):
        return 2048, 128
    if (1024 <= m <= 4096 and n >= 8192 and kd <= 1280 and C <= 9
            and _tile_cost(1024, 128, kd, C, extra_mn) <= _VMEM_LIMIT_TALL):
        return 1024, 128
    for tile_m, tile_n in ((512, 128), (256, 256), (256, 128), (128, 256),
                           (128, 128), (64, 256), (64, 128)):
        # the envelope gates require tile_m <= m <= 1024: every accepted
        # member had a full first tile, a taller-than-m tile is pure
        # padding, and the real Mosaic stack varies with m (the tall gate
        # rejected m=8192 at a model cost the envelope admits), so the
        # raised limits only apply up to the largest validated m (1024 at
        # both deep-chain families); larger m falls back to the
        # conservative limit instead of risking a Mosaic compile error
        limit = _VMEM_LIMIT
        if (tile_m, tile_n) == (512, 128) and 512 <= m <= 1024 \
                and kd <= 2048 and C <= 8:
            limit = _VMEM_LIMIT_MID        # hardware-validated envelope
        elif (tile_m, tile_n) == (256, 128) and 256 <= m <= 1024 \
                and kd <= 4096 and C <= 8:
            limit = _VMEM_LIMIT_DEEP       # hardware-validated envelope
        if _tile_cost(tile_m, tile_n, kd, C, extra_mn) <= limit:
            return tile_m, tile_n
    return None


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18))
def _fused_scaled_noise_matmul(lhs_dig, band, tables, ntab, noise, post,
                               encode, tile_m: int, tile_n: int,
                               interpret: bool, use_words: bool = False,
                               encode32: bool = False, seeds=None,
                               gen_noise: tuple | None = None,
                               noise_vals: int = 0, in_jr: int = 0,
                               dots_first: bool = False,
                               masked: bool = False,
                               swapped: bool = False):
    """lhs_dig int8 [CH, m, kd]; band int8 [CH, nd, kd, n]; tables uint32
    [CH, 36]; ntab int32 [CH, ljr, nd] (rows = l with ``noise_vals``);
    noise int8 [ljr, m, n] (or None with ``gen_noise``); post None or
    pair of uint32 [CH, m, n]; encode None or (sc_hi, sc_lo, enc_tab)
    with sc_* uint32 [m, n] and enc_tab uint32 [CH, 8]; seeds int32 [4]
    (key0, key1, row_offset, 0) with ``gen_noise`` = (ldeg, jr, bound)
    for the in-kernel PRNG noise; ``noise_vals`` > 0 selects the
    value-plane noise MAC (int32 scratch of that many planes; ``in_jr``
    = digit count of the incoming planes when ``noise`` is an input)
    -> (hi, lo) uint32 [CH, m, n].

    Grid (m-tiles, n-tiles, CH) with CH innermost so the noise/scalar
    tiles — whose block index ignores the channel — are fetched once per
    (i, j).

    ``swapped``: the scales live on the cached lhs — lhs_dig int8
    [CH, nd, m, kd] (digit_c(A*2^(8i) mod q) planes), band int8
    [CH, kd, n] (plain rhs digits). Same columns, same fold.
    """
    if swapped:
        ch, C, m, kd = lhs_dig.shape
        n = band.shape[2]
    else:
        ch, m, kd = lhs_dig.shape
        n = band.shape[3]
        C = band.shape[1]
    ljr = ntab.shape[1]
    has_post = post is not None
    has_encode = encode is not None
    grid = (m // tile_m, n // tile_n, ch)
    mn_spec = lambda: pl.BlockSpec(
        (1, tile_m, tile_n), lambda i, j, c: (c, i, j),
        memory_space=pltpu.VMEM,
    )
    sc_spec = lambda: pl.BlockSpec(
        (tile_m, tile_n), lambda i, j, c: (i, j),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # fold tables [CH, 36]
    ]
    operands = [tables]
    if has_encode:
        in_specs.append(pl.BlockSpec((1, 1, 8), lambda i, j, c: (c, 0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(encode[2].reshape(ch, 1, 8))
    in_specs += [
        # ntt tab blocked per channel: the full [CH, ljr, nd] table
        # SMEM-pads past the 1 MB scalar memory at deep chains (CH=272)
        pl.BlockSpec((1, ljr, C), lambda i, j, c: (c, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    n_in_planes = noise.shape[0] if noise is not None else 0
    operands += [ntab]
    if gen_noise is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seeds [4]
        operands.append(seeds)
    if swapped:
        in_specs += [
            pl.BlockSpec((1, C, tile_m, kd), lambda i, j, c: (c, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd, tile_n), lambda i, j, c: (c, 0, j),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, tile_m, kd), lambda i, j, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, kd, tile_n), lambda i, j, c: (c, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ]
    operands += [lhs_dig, band]
    if gen_noise is None:
        in_specs.append(
            pl.BlockSpec((n_in_planes, tile_m, tile_n),
                         lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM))
        operands.append(noise)
    if has_post:
        in_specs += [mn_spec(), mn_spec()]
        operands += [post[0], post[1]]
    if has_encode:
        if encode32:
            in_specs += [sc_spec()]
            operands += [encode[1]]          # low words only
        else:
            in_specs += [sc_spec(), sc_spec()]
            operands += [encode[0], encode[1]]
    out_shape = [
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
    ]
    if noise_vals:
        # int32 value planes (generated in-kernel, or composed from the
        # input digit planes at channel 0 of each (i, j) tile)
        scratch = [pltpu.VMEM((noise_vals, tile_m, tile_n), jnp.int32)]
    elif gen_noise is not None:
        scratch = [pltpu.VMEM((gen_noise[0] * gen_noise[1],
                               tile_m, tile_n), jnp.int8)]
    else:
        scratch = []
    oh, ol = pl.pallas_call(
        _make_fold_body(2, True, has_post, use_words, has_encode, encode32,
                        gen_noise, noise_vals, in_jr, dots_first, masked,
                        swapped),
        grid=grid,
        in_specs=in_specs,
        out_specs=[mn_spec(), mn_spec()],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        # _floor_mb: the XL tile family needs the 100 MiB limit it was
        # validated at, and the v3k threefry variant's real stack runs
        # ~64 KiB over the default ceiling at the DEEP-envelope tile
        # (measured: 16.06M at threshold_256bit, hardware-validated
        # compiling AND running bit-identical at an 18 MiB limit); the
        # v4 variant at default tiles keeps the compiler default
        compiler_params=_compiler_params(
            interpret,
            floor_mb=_floor_mb(
                tile_m, tile_n, lhs_dig.shape[2], band.shape[1],
                tfry=(gen_noise is not None and len(gen_noise) > 3
                      and bool(gen_noise[3])))),
    )(*operands)
    return oh, ol


def _make_pipelined_body(CH: int, use_words: bool, has_encode: bool,
                         encode32: bool, gen_noise: tuple | None,
                         noise_vals: int, in_jr: int, C: int):
    """Software-PIPELINED kernel body (round 5, VERDICT r4 #3): the grid
    runs CH+1 channel steps per (i, j) tile; step c issues the MXU dots
    for channel c into a parity-alternating VMEM column scratch and folds
    channel c-1's columns from the other parity — two independent
    instruction DAGs per step, so the scheduler CAN overlap the ~3.3 ms
    VPU epilogue under the MXU (the fused body serializes them by data
    dependence; DESIGN.md §9 names this the last lever). Bit-identical
    to :func:`_make_fold_body`'s arithmetic — same columns, same fold,
    same noise MAC and encode, just one grid step later.

    Supported subset (the production headline path): banded rhs,
    gen_noise (v4/v3k) or input noise planes, encode32/encode64, word or
    grouped fold. NOT supported: swapped, post, masked, dots_first —
    callers route those through the fused body.

    Ref order: tables [CH, 36] u32 SMEM; (enc_tab [1,1,8] SMEM idx c-1);
    ntab [1, ljr|l, C] SMEM idx c-1; (seeds SMEM); lhs [1, TM, kd] idx
    min(c, CH-1); band [1, C, kd, TN] idx min(c, CH-1); (noise planes
    idx (i, j)); (sc tiles idx (i, j)); outs idx c-1 (clamped); scratch:
    col_scr int32 [2, C, TM, TN] (+ noise scratch as in the fused body).
    """

    def body(tables_ref, *refs):
        refs = list(refs)
        enc_tab_ref = refs.pop(0) if has_encode else None
        ntab_ref = refs.pop(0)
        seed_ref = refs.pop(0) if gen_noise else None
        lhs_ref = refs.pop(0)
        band_ref = refs.pop(0)
        noise_ref = refs.pop(0) if gen_noise is None else None
        if has_encode:
            if encode32:
                sc_lo_ref = refs.pop(0)
            else:
                sc_hi_ref, sc_lo_ref = refs.pop(0), refs.pop(0)
        if gen_noise is not None or (noise_vals and in_jr):
            out_hi_ref, out_lo_ref, col_scr, noise_scr = refs
        else:
            out_hi_ref, out_lo_ref, col_scr = refs
        tm = lhs_ref.shape[1]
        n = out_hi_ref.shape[2]
        cg = pl.program_id(2)                  # 0..CH (CH+1 steps)
        i = pl.program_id(0)
        j = pl.program_id(1)

        if gen_noise is not None:
            ldeg, jr, bound = gen_noise[:3]
            tfry = len(gen_noise) > 3 and bool(gen_noise[3])
            rng32 = np.uint32(2 * bound + 1)
            col_off = seed_ref[3]        # global column offset (len-4 seeds)

            def _store(jj, sv):
                if noise_vals:
                    noise_scr[jj] = sv
                elif jr == 1:
                    noise_scr[jj] = sv.astype(jnp.int8)
                else:
                    d0, d1 = v4_digit_split(sv)
                    noise_scr[2 * jj] = d0.astype(jnp.int8)
                    noise_scr[2 * jj + 1] = d1.astype(jnp.int8)

            @pl.when(cg == 0)
            def _generate():
                row0 = seed_ref[2] + i * tm
                if tfry:
                    from .tfry import threefry2x32

                    k0 = seed_ref[0].astype(u.U32)
                    k1 = seed_ref[1].astype(u.U32)
                    rows_g = (row0 + jax.lax.broadcasted_iota(
                        jnp.int32, (tm, n), 0)).astype(u.U32)
                    cols_g = (col_off + j * n
                              + jax.lax.broadcasted_iota(
                                  jnp.int32, (tm, n), 1)).astype(u.U32)
                    base = cols_g * np.uint32(ldeg // 2)
                    for jjp in range(ldeg // 2):
                        ws = []
                        for t3 in range(3):
                            x1c = ((base + np.uint32(jjp)) << 2) \
                                | np.uint32(t3)
                            ws.append(threefry2x32(k0, k1, rows_g, x1c))
                        v_e = v4_reduce96(ws[0][0], ws[1][0], ws[2][0],
                                          rng32)
                        v_o = v4_reduce96(ws[0][1], ws[1][1], ws[2][1],
                                          rng32)
                        _store(2 * jjp, v_e.astype(jnp.int32) - bound)
                        _store(2 * jjp + 1, v_o.astype(jnp.int32) - bound)
                else:
                    mix = v4_blockmix(row0, col_off + j * n)
                    pltpu.prng_seed(seed_ref[0] ^ mix, seed_ref[1])
                    for jj in range(ldeg):
                        bits = pltpu.bitcast(
                            pltpu.prng_random_bits((3, tm, n)), u.U32)
                        v = v4_reduce96(bits[0], bits[1], bits[2], rng32)
                        _store(jj, v.astype(jnp.int32) - bound)
            nsrc = noise_scr
        elif noise_vals and in_jr:
            @pl.when(cg == 0)
            def _compose():
                for jj in range(noise_vals):
                    if in_jr == 1:
                        noise_scr[jj] = noise_ref[jj].astype(jnp.int32)
                    else:
                        noise_scr[jj] = (
                            noise_ref[2 * jj].astype(jnp.int32)
                            + (noise_ref[2 * jj + 1].astype(jnp.int32) << 8))
            nsrc = noise_scr
        else:
            nsrc = noise_ref

        par = jax.lax.rem(cg, 2)

        # -- dots stage: channel cg (skipped at the drain step cg == CH) --
        @pl.when(cg < CH)
        def _dots():
            lhs = lhs_ref[0]
            for c in range(C):
                col_scr[par, c] = jax.lax.dot_general(
                    lhs, band_ref[0, c],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

        # -- fold stage: channel cg - 1 from the other parity ------------
        @pl.when(cg > 0)
        def _fold():
            chf = cg - 1                        # channel being folded
            t = tables_ref
            qh, ql = t[chf, 18], t[chf, 19]
            ng = (C + 3) // 4
            opar = 1 - par
            acc_h = jnp.zeros((tm, n), u.U32)
            acc_l = jnp.zeros((tm, n), u.U32)
            gh_acc = jnp.zeros((tm, n), u.U32)
            gl_acc = jnp.zeros((tm, n), u.U32)
            prev_gh = None
            carry = None
            for c in range(C):
                g, r = divmod(c, 4)
                p_c = col_scr[opar, c]
                if nsrc is not None:
                    if noise_vals:
                        for rr in range(noise_vals):
                            p_c = p_c + nsrc[rr] * ntab_ref[0, rr, c]
                    else:
                        for rr in range(nsrc.shape[0]):
                            p_c = p_c + (nsrc[rr].astype(jnp.int32)
                                         * ntab_ref[0, rr, c])
                uc = (p_c + jnp.int32(-0x80000000)).astype(u.U32)
                if r == 0:
                    th, tl = jnp.zeros_like(uc), uc
                else:
                    th, tl = uc >> (32 - 8 * r), uc << (8 * r)
                gh_acc, gl_acc = u.add64(gh_acc, gl_acc, th, tl)
                if r == 3 or c == C - 1:
                    if not use_words:
                        sh, sl = u.shoup_mul64_arr(
                            gh_acc, gl_acc, t[chf, 0 + g], t[chf, 4 + g],
                            t[chf, 8 + g], t[chf, 12 + g], qh, ql)
                        acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl,
                                                qh, ql)
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
                            s1, t[chf, 24 + g - 1], t[chf, 28 + g - 1],
                            t[chf, 32 + g - 1], qh, ql)
                        acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl,
                                                qh, ql)
                        prev_gh = gh_acc
                    gh_acc = jnp.zeros((tm, n), u.U32)
                    gl_acc = jnp.zeros((tm, n), u.U32)
            if use_words:
                if C % 4 == 1 and carry is not None and ng >= 2:
                    th = jnp.where(carry > 0,
                                   t[chf, 24 + ng - 1], 0).astype(u.U32)
                    tl = jnp.where(carry > 0,
                                   t[chf, 28 + ng - 1], 0).astype(u.U32)
                    acc_h, acc_l = u.addmod(acc_h, acc_l, th, tl, qh, ql)
                else:
                    s1 = prev_gh if carry is None else prev_gh + carry
                    sh, sl = u.shoup_mul32_arr(
                        s1, t[chf, 24 + ng - 1], t[chf, 28 + ng - 1],
                        t[chf, 32 + ng - 1], qh, ql)
                    acc_h, acc_l = u.addmod(acc_h, acc_l, sh, sl, qh, ql)
            oh, ol = u.submod(acc_h, acc_l, t[chf, 16], t[chf, 17], qh, ql)
            if has_encode:
                et = enc_tab_ref
                if encode32:
                    eh, el = u.shoup_mul32_arr(
                        sc_lo_ref[...], et[0, 0, 0], et[0, 0, 1],
                        et[0, 0, 6], qh, ql)
                else:
                    sch, scl = sc_hi_ref[...], sc_lo_ref[...]
                    eh, el = u.shoup_mul64_arr(
                        sch, scl, et[0, 0, 0], et[0, 0, 1], et[0, 0, 2],
                        et[0, 0, 3], qh, ql)
                    wh, wl = u.submod(eh, el, et[0, 0, 4], et[0, 0, 5],
                                      qh, ql)
                    neg = sch >= jnp.uint32(1 << 31)
                    eh = jnp.where(neg, wh, eh)
                    el = jnp.where(neg, wl, el)
                oh, ol = u.addmod(oh, ol, eh, el, qh, ql)
            out_hi_ref[0] = oh
            out_lo_ref[0] = ol

    return body


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 12, 13, 14))
def _fused_pipelined_matmul(lhs_dig, band, tables, ntab, noise, encode,
                            tile_m: int, tile_n: int, interpret: bool,
                            use_words: bool = False,
                            encode32: bool = False, seeds=None,
                            gen_noise: tuple | None = None,
                            noise_vals: int = 0, in_jr: int = 0):
    """Pipelined twin of :func:`_fused_scaled_noise_matmul` (see
    :func:`_make_pipelined_body`): grid (m-tiles, n-tiles, CH+1), output
    block index lagging the channel step by one. Same operands minus the
    unsupported post/swapped/masked options."""
    ch, m, kd = lhs_dig.shape
    n = band.shape[3]
    C = band.shape[1]
    ljr = ntab.shape[1]
    has_encode = encode is not None
    grid = (m // tile_m, n // tile_n, ch + 1)
    chf = lambda c: jnp.maximum(c - 1, 0)
    chd = lambda c: jnp.minimum(c, ch - 1)
    out_spec = pl.BlockSpec((1, tile_m, tile_n),
                            lambda i, j, c: (chf(c), i, j),
                            memory_space=pltpu.VMEM)
    sc_spec = lambda: pl.BlockSpec((tile_m, tile_n),
                                   lambda i, j, c: (i, j),
                                   memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [tables]
    if has_encode:
        in_specs.append(pl.BlockSpec((1, 1, 8),
                                     lambda i, j, c: (chf(c), 0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(encode[2].reshape(ch, 1, 8))
    in_specs.append(pl.BlockSpec((1, ljr, C),
                                 lambda i, j, c: (chf(c), 0, 0),
                                 memory_space=pltpu.SMEM))
    operands.append(ntab)
    if gen_noise is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(seeds)
    in_specs += [
        pl.BlockSpec((1, tile_m, kd), lambda i, j, c: (chd(c), i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C, kd, tile_n), lambda i, j, c: (chd(c), 0, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands += [lhs_dig, band]
    if gen_noise is None:
        in_specs.append(pl.BlockSpec((noise.shape[0], tile_m, tile_n),
                                     lambda i, j, c: (0, i, j),
                                     memory_space=pltpu.VMEM))
        operands.append(noise)
    if has_encode:
        if encode32:
            in_specs += [sc_spec()]
            operands += [encode[1]]
        else:
            in_specs += [sc_spec(), sc_spec()]
            operands += [encode[0], encode[1]]
    out_shape = [
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
        jax.ShapeDtypeStruct((ch, m, n), jnp.uint32),
    ]
    scratch = [pltpu.VMEM((2, C, tile_m, tile_n), jnp.int32)]
    if noise_vals:
        scratch.append(pltpu.VMEM((noise_vals, tile_m, tile_n), jnp.int32))
    elif gen_noise is not None:
        scratch.append(pltpu.VMEM((gen_noise[0] * gen_noise[1],
                                   tile_m, tile_n), jnp.int8))
    oh, ol = pl.pallas_call(
        _make_pipelined_body(ch, use_words, has_encode, encode32,
                             gen_noise, noise_vals, in_jr, C),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=_compiler_params(
            interpret,
            floor_mb=_floor_mb(
                tile_m, tile_n, kd, C,
                tfry=(gen_noise is not None and len(gen_noise) > 3
                      and bool(gen_noise[3])))),
    )(*operands)
    return oh, ol


def _noise_cols_xla(noise, ring: "RingPlan"):
    """XLA fallback of the in-kernel noise NTT: int8 noise digits
    [ljr, m, n] -> int32 scaled-digit columns [L, S, m, n, nd]."""
    ljr = noise.shape[0]
    jr = ljr // ring.degree
    tab = jnp.asarray(ring.ntt_scaled_tab(jr), jnp.int32)   # [L, S, ljr, nd]
    return jnp.einsum(
        "rmn,lsrc->lsmnc", noise.astype(jnp.int32), tab,
        preferred_element_type=jnp.int32,
    )


def _encode_residues_xla(encode, L, S, ring: "RingPlan"):
    """XLA twin of the in-kernel gadget encode: (sc_hi, sc_lo, enc_tab)
    -> residue pair [L, S, m, n] (same arithmetic as the kernel body)."""
    sc_hi, sc_lo, enc_tab = encode
    tab = enc_tab.reshape(L, S, 8)
    pick = lambda c: tab[:, :, c][:, :, None, None]
    qh = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
    ql = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)
    eh, el = u.shoup_mul64_arr(
        sc_hi[None, None], sc_lo[None, None],
        pick(0), pick(1), pick(2), pick(3), qh, ql,
    )
    wh, wl = u.submod(eh, el, pick(4), pick(5), qh, ql)
    neg = (sc_hi >= jnp.uint32(1 << 31))[None, None]
    return jnp.where(neg, wh, eh), jnp.where(neg, wl, el)


def _gen_noise_extra(ljr: int, has_post: bool, has_encode: bool,
                     vals_planes: int = 0, tfry: bool = False) -> int:
    """extra_mn bytes/element for the gen_noise kernel variant: the VMEM
    noise scratch (ljr int8 planes, or ``vals_planes`` int32 value planes
    — both single-buffered, so half their byte count here since the cost
    model doubles every extra_mn byte) + PRNG generation temporaries +
    the optional post/encode blocks. ``tfry``: stream v3k carries more
    generation temporaries (6 threefry word planes + 2 counter planes
    live across the reduce) than the hardware-PRNG path."""
    scr = 2 * vals_planes if vals_planes else ljr
    return (scr + (40 if tfry else 24) + (12 if has_post else 0)
            + (16 if has_encode else 0))


def _noise_vals_mode(ring: "RingPlan", k: int, jr: int,
                     bound: int | None) -> bool:
    """True when the value-plane noise MAC (``noise_vals``) is exact for
    this config: the folded column magnitude k*nd*2^14 (matmul digits)
    plus l*bound*2^7 (int32 noise values contracted against the jr=1
    scaled-twiddle digit table) must stay within int32 (DESIGN.md §5a).
    ``bound`` None (input planes of unknown bound) assumes the largest
    value jr signed-int8 digits can carry. PVW_TPU_NOISE_VALS=0 forces
    the digit-plane MAC (A/B switch)."""
    from ..config import settings

    if not settings.noise_value_mac:
        return False
    if bound is None:
        bound = 128 * ((256 ** jr) - 1) // 255
    nd, l = ring.num_digits, ring.degree
    col = k * nd * (1 << 14) + l * int(bound) * (1 << 7)
    return col < (1 << 31)


def kernel_noise_available(ring: "RingPlan", m: int, n: int, k: int,
                           bound: int, has_post: bool = False,
                           has_encode: bool = True,
                           tfry: bool = False) -> bool:
    """True when :func:`matmul_fold_scaled` can take the fused Pallas path
    with IN-KERNEL noise generation (``gen_noise``) for these shapes: TPU
    backend, bound within the signed-digit range, and tiles that fit
    VMEM. Callers must check this BEFORE choosing the stream-v4 path —
    the XLA fallback cannot reproduce the hardware PRNG. ``tfry``:
    check the stream-v3k (in-kernel threefry) variant instead (its VMEM
    temporaries are larger; its XLA fallback IS bit-identical, but
    callers still route through this check to fuse when possible)."""
    from ..config import settings
    from .ntt import signed_digit_count

    if jax.default_backend() != "tpu" or settings.no_pallas:
        return False
    jr = signed_digit_count(bound)
    if not jr:
        return False
    nd = ring.num_digits
    # availability uses the digit-mode VMEM cost (never larger than the
    # value-plane cost; matmul_fold_scaled falls back to digit mode when
    # value planes would shrink the tile)
    extra = _gen_noise_extra(ring.degree * jr, has_post, has_encode,
                             tfry=tfry)
    tiles = _pick_tiles(m, n, k * nd, nd, extra)
    if tiles is None:
        return False
    tile_m, tile_n = tiles
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    if (tile_m % 8 and tile_m != m) or (tile_n % 128 and tile_n != n):
        return False
    return True


def matmul_fold_scaled(lhs, rhs_scaled, ring: "RingPlan", noise=None,
                       post=None, encode=None, lhs_dig=None,
                       encode32: bool = False, gen_noise=None,
                       noise_bound=None):
    """Fused modular matmul against a PRESCALED rhs (scaled-digit form).

    lhs: pair [L, S, m, k]; rhs_scaled: int8 [L, S, k, n, nd, nd] from
    :func:`pvw_tpu.ops.modmat.prescale_digits` -> pair [L, S, m, n].
    Prescaling once and reusing across several lhs (A·r and B·r share r)
    amortizes the Shoup prescale. Pallas on TPU; XLA fold elsewhere.

    ``noise``: optional int8 signed-digit planes [l*jr, m, n] (layout
    row j*jr+dd for coefficient j, digit dd — from the encryption error
    sample). Requires S == ring.degree (channel s is the NTT point). The
    kernel computes the noise NTT in VMEM via ``ring.ntt_scaled_tab`` and
    adds it pre-fold: the result equals matmul + NTT(noise) mod q,
    bit-identical to the separate NTT-then-addmod path, without the int32
    column tensor ever touching HBM. Headroom: |matmul cols| <=
    k*nd*2^14 and |noise cols| <= l*jr*2^14, both < 2^26 for every
    supported config (DESIGN.md).

    ``post``: optional residue pair [L, S, m, n] addmodded after the fold
    (the gadget encode term of c2).

    ``encode``: optional (sc_hi, sc_lo, enc_tab) — the gadget encode
    computed IN-KERNEL from the u64 scalar pair [m, n] and the per-channel
    constant row enc_tab uint32 [L*S, 8] (g, Shoup(g), (2^64 mod q)*g;
    see :func:`encode_tab`). Replaces materializing the [L, S, m, n]
    encode residues through HBM. Addmodded after ``post``.

    ``lhs_dig``: optional pre-decomposed lhs digit planes int8
    [L, S, m, k*nd] (:func:`pvw_tpu.ops.modmat.lhs_digit_planes`) —
    cache these for encryption-invariant operands (key matrices);
    ``lhs`` is ignored when given.

    ``gen_noise``: (seeds int32[4] = (key0, key1, row_offset, 0), jr,
    bound) — generate the noise IN-KERNEL ("stream v4", TPU hardware
    PRNG; see :func:`_make_fold_body`). Mutually exclusive with
    ``noise``. Callers MUST have checked :func:`kernel_noise_available`;
    this function raises if the Pallas path is unavailable, because the
    XLA fallback cannot reproduce the hardware PRNG stream. Seeds of
    length 6 = (key0, key1, row_offset, mask_lo, mask_hi, 0) select the
    MASKED variant: identical per-tile streams, but noise and the
    in-kernel encode land only on global rows in [mask_lo, mask_hi) —
    the kdim-sharded encryption path's row-partition contract.

    ``noise_bound``: the true magnitude bound of the noise VALUES behind
    ``noise`` digit planes; enables the exact value-plane MAC
    (``noise_vals``, DESIGN.md §5a) when the int32 column headroom
    allows — bit-identical to the digit-plane MAC, fewer VPU ops.
    ``gen_noise`` carries its own bound.
    """
    from ..config import settings
    from . import modmat

    nd = ring.num_digits
    if lhs_dig is not None:
        L, S, m, kd = lhs_dig.shape
        k = kd // nd
    else:
        lh, ll = lhs
        L, S, m, k = lh.shape
        kd = k * nd
    # rhs layouts: 6D [L, S, k, n, nd(i), nd(j)] from prescale_digits, or
    # 5D band [L, S, nd(j), k*nd(i), n] from prescale_digits_band (the
    # kernel's native layout — no transpose on the hot path)
    is_band = rhs_scaled.ndim == 5
    n = rhs_scaled.shape[4] if is_band else rhs_scaled.shape[3]
    if gen_noise is not None and noise is not None:
        raise ValueError("gen_noise and noise are mutually exclusive")
    if (noise is not None or gen_noise is not None) and S != ring.degree:
        raise ValueError("noise fusion requires the channel minor axis "
                         "to be the NTT point axis (S == ring.degree)")

    def _xla():
        if is_band:
            rs6 = jnp.transpose(
                rhs_scaled.reshape(L, S, nd, k, nd, n),
                (0, 1, 3, 5, 4, 2),
            )                                    # [L, S, k, n, nd(i), nd(j)]
        else:
            rs6 = rhs_scaled
        cols = modmat.scaled_cols(lhs, rs6, ring, lhs_dig=lhs_dig)
        if noise is not None:
            cols = cols + _noise_cols_xla(noise, ring)
        oh, ol = modmat._fold_leading(cols, ring)
        qh = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
        ql = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)
        if post is not None:
            oh, ol = u.addmod(oh, ol, post[0], post[1], qh, ql)
        if encode is not None:
            eh, el = _encode_residues_xla(encode, L, S, ring)
            oh, ol = u.addmod(oh, ol, eh, el, qh, ql)
        return oh, ol

    # gen_noise: (seeds, jr, bound) for stream v4 (hardware PRNG) or
    # (seeds, jr, bound, "tfry") for stream v3k (in-kernel threefry)
    gen_tfry = gen_noise is not None and len(gen_noise) > 3 \
        and gen_noise[3] == "tfry"
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or settings.no_pallas:
        if gen_noise is not None:
            raise RuntimeError("gen_noise requires the TPU Pallas path "
                               "(check kernel_noise_available first)")
        return _xla()
    # value-plane mode (exact, fewer VPU ops) when the column headroom
    # allows — see _noise_vals_mode; the scratch/temp VMEM cost differs
    # so the mode is decided before tile selection
    if gen_noise is not None:
        vals = _noise_vals_mode(ring, k, gen_noise[1], gen_noise[2])
    elif noise is not None and noise.shape[0] >= ring.degree:
        vals = _noise_vals_mode(ring, k, noise.shape[0] // ring.degree,
                                noise_bound)
    else:
        vals = False

    # extra blocks: noise digits (int8/plane, double-buffered via blocks
    # term) + post pair + encode scalar pair; plus per-plane kernel
    # temporaries (2B/elt each, measured against Mosaic's scoped-vmem
    # accounting). Value-plane mode swaps the int8 scratch for l int32
    # planes (single-buffered: 2B/elt here, doubled by the cost model).
    def _extra(v: bool) -> int:
        if gen_noise is not None:
            return _gen_noise_extra(ring.degree * gen_noise[1],
                                    post is not None, encode is not None,
                                    ring.degree if v else 0,
                                    tfry=gen_tfry)
        return (0 if noise is None else
                (noise.shape[0] + 4 * ring.degree if v
                 else 3 * noise.shape[0])) \
            + (0 if post is None else 12) \
            + (0 if encode is None else 16)

    if vals:
        # never let the larger int32 scratch shrink the tile: the MAC
        # saving (biggest at jr=2) cannot pay for worse operand reuse
        tv, td = _pick_tiles(m, n, kd, nd, _extra(True)), \
            _pick_tiles(m, n, kd, nd, _extra(False))
        if tv is None or (td is not None
                          and tv[0] * tv[1] < td[0] * td[1]):
            vals = False
    extra_mn = _extra(vals)
    tiles = _pick_tiles(m, n, kd, nd, extra_mn)
    if tiles is None:
        if gen_noise is not None:
            raise RuntimeError("gen_noise tiles do not fit VMEM "
                               "(check kernel_noise_available first)")
        return _xla()
    tile_m, tile_n = tiles
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    # Mosaic requires the last-two block dims divisible by (8, 128) or
    # equal to the array dims; awkward m/n (e.g. a 308-party keygen
    # chunk) can floor the tile into an illegal size — use XLA instead.
    if (tile_m % 8 and tile_m != m) or (tile_n % 128 and tile_n != n):
        if gen_noise is not None:
            raise RuntimeError("gen_noise tile shape Mosaic-illegal "
                               "(check kernel_noise_available first)")
        return _xla()
    ld = (lhs_dig.reshape(L * S, m, kd) if lhs_dig is not None
          else modmat.digits(lh, ll, nd).reshape(L * S, m, kd))
    r2 = (rhs_scaled.reshape(L * S, nd, kd, n) if is_band
          else _build_rhs_scaled(rhs_scaled.reshape(L * S, k, n, nd, nd)))
    tables = jnp.repeat(jnp.asarray(_pack_tables(ring, nd)), S, axis=0)
    if noise is None and gen_noise is None and post is None and encode is None:
        oh, ol = _fused_banded_matmul(ld, r2, tables, tile_m, tile_n, False,
                                      ring.fold_words_ok)
        return oh.reshape(L, S, m, n), ol.reshape(L, S, m, n)
    seeds = None
    gen_static = None
    n_vals = S if vals else 0
    in_jr = 0
    if gen_noise is not None:
        seeds, jr, bound = gen_noise[:3]
        gen_static = (ring.degree, int(jr), int(bound), gen_tfry)
        ntab = jnp.asarray(
            ring.ntt_scaled_tab(1 if vals else jr), jnp.int32
        ).reshape(L * S, S * (1 if vals else jr), nd)
    elif noise is None:
        # post without noise: a zero one-plane noise input (cost ~0)
        noise = jnp.zeros((1, m, n), jnp.int8)
        ntab = jnp.zeros((L * S, 1, nd), jnp.int32)
    else:
        jr = noise.shape[0] // ring.degree
        if noise.shape[0] != S * jr:
            raise ValueError("noise digit planes must have l*jr rows")
        in_jr = jr if vals else 0
        ntab = jnp.asarray(
            ring.ntt_scaled_tab(1 if vals else jr), jnp.int32
        ).reshape(L * S, S * (1 if vals else jr), nd)
    post_ch = None
    if post is not None:
        post_ch = (post[0].reshape(L * S, m, n), post[1].reshape(L * S, m, n))
    dots_first = settings.dots_first
    # seeds of length >= 6 carry a [lo, hi) global row mask (see
    # _make_fold_body ``masked``): the kdim-split mesh shards use it to
    # apply noise/encode to exactly their row block of the partial sum
    masked = seeds is not None and seeds.shape[0] >= 6
    if (settings.pipeline_fold and not masked
            and not dots_first and post is None):
        # software-pipelined variant (round 5, DESIGN.md §9 overlap
        # lever): fold of channel c-1 under the dots of channel c.
        # Bit-identical (tests/test_pipeline.py); opt-in (measured 0.67-
        # 0.72x the fused kernel, BASELINE.md). The [2, C, TM, TN] int32
        # column scratch is NOT in the fused cost model, so re-pick the
        # tiles with it accounted (8*nd bytes/elt, deliberately over-
        # counted — the raised VMEM envelopes were hardware-validated
        # for the fused kernel only); if nothing fits, run the fused
        # kernel rather than risking a Mosaic stack overflow.
        ptiles = _pick_tiles(m, n, kd, nd, extra_mn + 8 * nd)
        if ptiles is not None:
            ptm, ptn = ptiles
            ptm = min(ptm, m)
            while m % ptm:
                ptm //= 2
            ptn = min(ptn, n)
            while n % ptn:
                ptn //= 2
            if not ((ptm % 8 and ptm != m) or (ptn % 128 and ptn != n)):
                oh, ol = _fused_pipelined_matmul(
                    ld, r2, tables, ntab, noise, encode, ptm, ptn, False,
                    ring.fold_words_ok, encode32, seeds, gen_static,
                    n_vals, in_jr,
                )
                return oh.reshape(L, S, m, n), ol.reshape(L, S, m, n)
    oh, ol = _fused_scaled_noise_matmul(
        ld, r2, tables, ntab, noise, post_ch, encode, tile_m, tile_n, False,
        ring.fold_words_ok, encode32, seeds, gen_static, n_vals, in_jr,
        dots_first, masked,
    )
    return oh.reshape(L, S, m, n), ol.reshape(L, S, m, n)


def encode_tab(gadget_ntt: np.ndarray, gadget_ntt_shoup: np.ndarray,
               gadget_wrap: np.ndarray,
               moduli: tuple[int, ...]) -> np.ndarray:
    """Pack the per-channel gadget-encode constants for ``encode=``:
    uint32 [L*l, 8] rows (g_hi, g_lo, gs_hi, gs_lo, wrap_hi, wrap_lo,
    gs32, 0) from the [L, l] uint64 tables on :class:`PvwParameters`;
    gs32 = floor(g << 32 / q) is the 32-bit Shoup companion used by the
    small-scalar encode fast path."""
    gh, gl = u.split_u64_np(gadget_ntt)
    sh, sl = u.split_u64_np(gadget_ntt_shoup)
    wh, wl = u.split_u64_np(gadget_wrap)
    L, l = gadget_ntt.shape
    gs32 = np.zeros((L, l), np.uint32)
    for i, q in enumerate(moduli):
        for s in range(l):
            gs32[i, s] = (int(gadget_ntt[i, s]) << 32) // q
    out = np.zeros((gadget_ntt.size, 8), np.uint32)
    for i, arr in enumerate((gh, gl, sh, sl, wh, wl, gs32)):
        out[:, i] = arr.reshape(-1)
    return out


def matmul_fold_auto(lhs, rhs, ring: "RingPlan"):
    """Fused modular matmul: Pallas kernel on TPU, XLA banded elsewhere.

    Measured on v5e at the headline shapes ([16ch, 4096x256]x[256x1024],
    nd=5): Pallas 15.3 ms vs XLA banded 27.0 ms — the in-VMEM fold halves
    the HBM traffic of the int32 column intermediate. (An earlier fixed
    8-digit measurement had Pallas 2.7x SLOWER; the adaptive digit width
    flipped the verdict.) Off-TPU (tests) the XLA path avoids the
    interpreter; PVW_NO_PALLAS=1 forces XLA everywhere.
    """
    from ..config import settings
    from . import modmat

    (lh, ll), _ = lhs, rhs
    L, S, m, k = lh.shape
    n = rhs[0].shape[-1]
    nd, C = ring.num_digits, ring.num_columns
    kd = k * nd
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or settings.no_pallas:
        return modmat.matmul_channels_banded(lhs, rhs, ring)
    tiles = _pick_tiles(m, n, kd, C)
    if tiles is None:
        return modmat.matmul_channels_banded(lhs, rhs, ring)  # band too wide
    return matmul_channels_pallas(lhs, rhs, ring, tile_m=tiles[0],
                                  tile_n=tiles[1], interpret=False)


def matmul_channels_pallas(lhs, rhs, ring: "RingPlan", tile_m: int = 256,
                           tile_n: int = 128,
                           interpret: bool | None = None):
    """Drop-in fused twin of :func:`pvw_tpu.ops.modmat.matmul_channels`.

    lhs: pair [L, S, m, k]; rhs: pair [L, S, k, n] -> pair [L, S, m, n].
    ``interpret=None`` auto-selects interpret mode off-TPU (for tests).
    """
    (lh, ll), (rh, rl) = lhs, rhs
    L, S, m, k = lh.shape
    n = rh.shape[-1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    if not interpret and ((tile_m % 8 and tile_m != m)
                          or (tile_n % 128 and tile_n != n)):
        # Mosaic-illegal degenerate tile (see matmul_fold_scaled)
        from . import modmat as _mm

        return _mm.matmul_channels_banded(lhs, rhs, ring)
    nd = ring.num_digits
    ld = digits(lh, ll, nd).reshape(L * S, m, k * nd)
    rd = digits(rh, rl, nd).reshape(L * S, k, n, nd)
    band = _build_band_cmajor(rd)
    tables = jnp.repeat(jnp.asarray(_pack_tables(ring)), S, axis=0)  # [L*S, 36]
    oh, ol = _fused_banded_matmul(ld, band, tables, tile_m, tile_n, interpret,
                                  ring.fold_words_ok)
    return oh.reshape(L, S, m, n), ol.reshape(L, S, m, n)


# --------------------------------------------------------------------------
# fused r-stage: signed-coefficient NTT + scaled-digit band, one kernel
# --------------------------------------------------------------------------
#
# The per-encryption rhs preparation (CBD coefficients -> NTT residues ->
# prescaled digit band) was the third-largest device cost of a batch:
# measured at the headline shape, batch 8192, the XLA pipeline spends
# ~10.8 ms in ntt_forward_signed_ch and ~17.4 ms in prescale_digits_band
# (mostly relayouts: the band tensor is 838 MB and every stack/transpose
# materializes). This kernel computes the SAME values in one pass per
# (channel, d-tile): NTT columns as l*jr scalar MACs against the fwd band
# table, the exact grouped fold, nd Shoup scales, balanced digit
# extraction, and the band assembly entirely in VMEM — bit-identical to
# prescale_digits_band(ntt_forward_signed_ch(...)) (tested in interpret
# mode and by the encryption round-trip on hardware).

def _prescale_tabs(ring: "RingPlan", C1: int) -> np.ndarray:
    """Per-channel u32 constant table [CH, W] for _ntt_prescale_body:
    [qh, ql, bias_h, bias_l, (grp wh/wl/sh/sl) x G, (pow hi/lo/s64hi/
    s64lo) x (nd-1)]."""
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    G = (C1 + 3) // 4
    bias_h, bias_l = ring.bias_pair_for_columns(C1)
    W = 4 + 4 * G + 4 * (nd - 1)
    out = np.zeros((L, W), np.uint32)
    out[:, 0], out[:, 1] = ring.q_hi, ring.q_lo
    out[:, 2], out[:, 3] = bias_h, bias_l
    for g in range(G):
        out[:, 4 + 4 * g + 0] = ring.grp_hi[:, g]
        out[:, 4 + 4 * g + 1] = ring.grp_lo[:, g]
        out[:, 4 + 4 * g + 2] = ring.grp_sh[:, g]
        out[:, 4 + 4 * g + 3] = ring.grp_sl[:, g]
    o = 4 + 4 * G
    for i in range(1, nd):
        out[:, o + 4 * (i - 1) + 0] = ring.pow_hi[:, i]
        out[:, o + 4 * (i - 1) + 1] = ring.pow_lo[:, i]
        out[:, o + 4 * (i - 1) + 2] = ring.pow_s64_hi[:, i]
        out[:, o + 4 * (i - 1) + 3] = ring.pow_s64_lo[:, i]
    return np.repeat(out, l, axis=0)                       # [CH, W]


def _ntt_prescale_body(C1: int, ljr: int, nd: int, G: int):
    """Kernel body factory. Refs: tabs [CH, W] u32 SMEM; ntab [1, C1,
    ljr] i32 SMEM (blocked per grid channel); xd [ljr, k, TD] i8;
    out [1, nd, k*nd, TD] i8."""

    def body(tabs_ref, ntab_ref, xd_ref, out_ref):
        # ntab is blocked per grid channel (the full [CH, C1, ljr] table
        # SMEM-pads past the 1 MB scalar memory at deep chains, CH=272 —
        # same fix as the noise kernel's twiddle table); tabs [CH, W]
        # stays whole (W <= 40 pads to ~140 KB at CH=272)
        ch = pl.program_id(2)
        t = tabs_ref
        qh, ql = t[ch, 0], t[ch, 1]
        xs = [xd_ref[r].astype(jnp.int32) for r in range(ljr)]

        # NTT columns: cols[c] = sum_r xd[r] * band[ch, c, r]
        # (identical products/sums to ntt_forward_cols_signed's int8 dot)
        zeros = jnp.zeros_like(xs[0])
        acc_h = jnp.zeros(xs[0].shape, u.U32)
        acc_l = jnp.zeros(xs[0].shape, u.U32)
        for g in range(G):
            gh = jnp.zeros(xs[0].shape, u.U32)
            gl = jnp.zeros(xs[0].shape, u.U32)
            for r4 in range(4):
                c = 4 * g + r4
                if c >= C1:
                    break
                col = zeros
                for r in range(ljr):
                    col = col + xs[r] * ntab_ref[0, c, r]
                uc = (col + jnp.int32(-0x80000000)).astype(u.U32)
                if r4 == 0:
                    th, tl = jnp.zeros_like(uc), uc
                else:
                    th, tl = uc >> (32 - 8 * r4), uc << (8 * r4)
                gh, gl = u.add64(gh, gl, th, tl)
            th, tl = u.shoup_mul64_arr(
                gh, gl, t[ch, 4 + 4 * g], t[ch, 5 + 4 * g],
                t[ch, 6 + 4 * g], t[ch, 7 + 4 * g], qh, ql)
            acc_h, acc_l = u.addmod(acc_h, acc_l, th, tl, qh, ql)
        vh, vl = u.submod(acc_h, acc_l, t[ch, 2], t[ch, 3], qh, ql)

        # nd Shoup scales + balanced digits (prescale_digits_band math)
        o = 4 + 4 * G
        digs = []                                  # digs[i][j] int8 planes
        for i in range(nd):
            if i == 0:
                sh_, sl_ = vh, vl
            else:
                sh_, sl_ = u.shoup_mul64_arr(
                    vh, vl,
                    t[ch, o + 4 * (i - 1)], t[ch, o + 4 * (i - 1) + 1],
                    t[ch, o + 4 * (i - 1) + 2], t[ch, o + 4 * (i - 1) + 3],
                    qh, ql)
            digs.append(u.to_signed_digit_list(sh_, sl_, nd))
        for j in range(nd):
            per_j = jnp.stack([digs[i][j] for i in range(nd)], axis=1)
            out_ref[0, j] = per_j.reshape(-1, per_j.shape[-1])
        return

    return body


def ntt_prescale_available(ring: "RingPlan", k: int, d: int,
                           max_abs: int) -> bool:
    """True when :func:`ntt_prescale_band` can run (TPU, bound in the
    signed-digit range, a d-tile that divides d and fits VMEM)."""
    from ..config import settings
    from .ntt import signed_digit_count

    if jax.default_backend() != "tpu" or settings.no_pallas:
        return False
    if not signed_digit_count(max_abs):
        return False
    return _prescale_tile(ring, k, d) is not None


def _prescale_tile(ring: "RingPlan", k: int, d: int):
    """(k-tile, d-tile) whose blocks + temporaries fit scoped VMEM —
    widest d-tile first (lane utilization), then the largest k-tile.
    Temporaries calibrated against a measured Mosaic stack (19.07M total
    at k=256, td=256, nd=5, jr=1 => ~226 B per (k*td) element), scaled by
    nd^2 (the live digit-plane set dominates)."""
    from ..config import settings

    nd, l = ring.num_digits, ring.degree
    jr_max = 2
    # settings.vmem_limit_mb raises the Mosaic ceiling per kernel
    # (_compiler_params), so the tile search may use it too (with a 1/16
    # headroom margin); unset keeps the long-validated 15 MiB budget
    mb = settings.vmem_limit_mb
    limit = (int(mb) * 15 // 16) * 1024 * 1024 if mb else 15 * 1024 * 1024
    for td in (512, 256, 128):
        if d % td:
            continue
        kt = k
        while kt >= 8:
            blocks = 2 * (l * jr_max * kt * td + nd * kt * nd * td)
            temps = 240 * kt * td * nd * nd // 25
            if k % kt == 0 and blocks + temps <= limit:
                return kt, td
            kt //= 2
    return None


def ntt_prescale_band(coeffs, ring: "RingPlan", max_abs: int,
                      interpret: bool = False):
    """Signed coefficients int32 [k, d, l] (|c| <= max_abs) -> scaled
    digit band int8 [L, S, nd, k*nd, d] in ONE Pallas pass — bit-identical
    to ``prescale_digits_band(ntt_forward_signed_ch(coeffs, ...))``.
    Callers must check :func:`ntt_prescale_available` first."""
    from .ntt import _signed_digits, signed_digit_count

    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    jr = signed_digit_count(max_abs)
    k, d = coeffs.shape[0], coeffs.shape[1]
    kt, td = (k, min(d, 128)) if interpret else _prescale_tile(ring, k, d)
    C1 = nd + jr - 1
    G = (C1 + 3) // 4
    ljr = l * jr
    CH = L * l

    xd = _signed_digits(coeffs, jr)                       # [k, d, l, jr]
    xd = jnp.transpose(xd, (2, 3, 0, 1)).reshape(ljr, k, d)

    band = ring.ntt_band_jr("fwd", jr)                    # [L, C1*l, ljr]
    ntab = np.transpose(
        band.reshape(L, C1, l, ljr), (0, 2, 1, 3)
    ).reshape(CH, C1, ljr).astype(np.int32)
    tabs = _prescale_tabs(ring, C1)

    out = pl.pallas_call(
        _ntt_prescale_body(C1, ljr, nd, G),
        grid=(d // td, k // kt, CH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # tabs
            pl.BlockSpec((1, C1, ljr), lambda j, ik, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),        # ntab (per-ch)
            pl.BlockSpec((ljr, kt, td), lambda j, ik, c: (0, ik, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nd, kt * nd, td),
                               lambda j, ik, c: (c, 0, ik, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CH, nd, k * nd, d), jnp.int8),
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray(tabs), jnp.asarray(ntab), xd)
    return out.reshape(L, l, nd, k * nd, d)


# --------------------------------------------------------------------------
# swapped-operand fused matmul (scales on the cached lhs — DESIGN.md §5f)
# --------------------------------------------------------------------------

def _pick_tiles_swapped(m: int, n: int, kd: int, C: int, extra_mn: int = 0):
    """Tile choice for the swapped kernel: the lhs block is C planes of
    [tile_m, kd] and the rhs block [kd, tile_n] is shared by every
    column, so the economics prefer a WIDER n-tile than the banded form
    (measured: (256, 512) runs the headline dots at the banded
    (1024, 128) rate — probe_swap r4). Model cost as in _tile_cost with
    the swapped block set; the ceiling is calibrated on hardware."""
    from ..config import settings

    fm, fn = settings.tile_m, settings.tile_n
    if fm and fn:
        return fm, fn
    for tile_m, tile_n in ((256, 512), (512, 256), (256, 256), (128, 512),
                           (128, 256), (128, 128), (64, 128)):
        blocks = (C * tile_m * kd + kd * tile_n
                  + (8 + extra_mn) * tile_m * tile_n)
        temps = 48 * tile_m * tile_n
        if 2 * blocks + temps <= _VMEM_LIMIT_SWAPPED:
            return tile_m, tile_n
    return None


# Hardware-validated ceiling for the swapped tile model (v5e, round 4):
# the headline c2 kernel (kd=1280, C=5, gen-noise + encode32 at
# (256, 512)) compiles and runs; see _VMEM_LIMIT_TALL for why these
# ceilings are empirical envelopes rather than true VMEM arithmetic.
_VMEM_LIMIT_SWAPPED = 28_000_000


def swapped_available(ring: "RingPlan", m: int, n: int, k: int,
                      bound: int, has_encode: bool = True) -> bool:
    """True when :func:`matmul_fold_swapped` can run with in-kernel
    (stream v4) noise for these shapes."""
    from ..config import settings
    from .ntt import signed_digit_count

    if jax.default_backend() != "tpu" or settings.no_pallas:
        return False
    jr = signed_digit_count(bound)
    if not jr:
        return False
    nd = ring.num_digits
    # round-5 hardware bound: at deep chains the real Mosaic stack
    # exceeds the model at wide batches — broadcast_128bit (nd=8) failed
    # compile at n=512 while n=256 ran (BASELINE.md config-2 attack);
    # cap the swapped opt-in to the validated batch range there
    if nd >= 8 and n > 256:
        return False
    extra = _gen_noise_extra(ring.degree * jr, False, has_encode)
    tiles = _pick_tiles_swapped(m, n, k * nd, nd, extra)
    if tiles is None:
        return False
    tile_m, tile_n = tiles
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    if (tile_m % 8 and tile_m != m) or (tile_n % 128 and tile_n != n):
        return False
    return True


def matmul_fold_swapped(lhs_planes, rhs_dig, ring: "RingPlan", noise=None,
                        encode=None, encode32: bool = False, gen_noise=None,
                        noise_bound=None, interpret: bool = False,
                        tiles=None):
    """Fused modular matmul with the Shoup scales on the CACHED lhs.

    lhs_planes: int8 [L, S, nd(c), m, k*nd(i)] from
    :func:`pvw_tpu.ops.modmat.lhs_scaled_planes` (encryption-invariant —
    the prescale cost amortizes to zero across encryptions);
    rhs_dig: int8 [L, S, k*nd(i), n] from
    :func:`pvw_tpu.ops.modmat.rhs_digit_cols` (PLAIN digits — the
    per-encryption rhs preparation is nd digit extractions, no Shoup
    scales, no band duplication). Column c of the fold is
    sum_{k,i} digit_c(A*2^(8i) mod q) * digit_i(r) — identical columns,
    fold, and residues to :func:`matmul_fold_scaled` (bit-identity tested
    in interpret mode and by the encryption round trip on hardware).
    ``noise``/``encode``/``gen_noise``/``noise_bound``: exactly as in
    :func:`matmul_fold_scaled`. TPU Pallas only — callers route to the
    banded form elsewhere (this function has no XLA fallback)."""
    from ..config import settings

    nd = ring.num_digits
    L, S, C, m, kd = lhs_planes.shape
    k = kd // nd
    n = rhs_dig.shape[3]
    if gen_noise is not None and noise is not None:
        raise ValueError("gen_noise and noise are mutually exclusive")
    if not interpret and (jax.default_backend() != "tpu"
                          or settings.no_pallas):
        raise RuntimeError("matmul_fold_swapped requires the TPU Pallas "
                           "path (route via swapped_available)")

    if gen_noise is not None:
        vals = _noise_vals_mode(ring, k, gen_noise[1], gen_noise[2])
    elif noise is not None and noise.shape[0] >= ring.degree:
        vals = _noise_vals_mode(ring, k, noise.shape[0] // ring.degree,
                                noise_bound)
    else:
        vals = False

    def _extra(v: bool) -> int:
        if gen_noise is not None:
            return _gen_noise_extra(ring.degree * gen_noise[1],
                                    False, encode is not None,
                                    ring.degree if v else 0)
        return (0 if noise is None else
                (noise.shape[0] + 4 * ring.degree if v
                 else 3 * noise.shape[0])) \
            + (0 if encode is None else 16)

    if vals:
        tv, td = _pick_tiles_swapped(m, n, kd, nd, _extra(True)), \
            _pick_tiles_swapped(m, n, kd, nd, _extra(False))
        if tv is None or (td is not None
                          and tv[0] * tv[1] < td[0] * td[1]):
            vals = False
    if tiles is None:
        tiles = _pick_tiles_swapped(m, n, kd, nd, _extra(vals))
    if tiles is None:
        raise RuntimeError("swapped tiles do not fit VMEM "
                           "(check swapped_available first)")
    tile_m, tile_n = tiles
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    if not interpret and ((tile_m % 8 and tile_m != m)
                          or (tile_n % 128 and tile_n != n)):
        raise RuntimeError("swapped tile shape Mosaic-illegal "
                           "(check swapped_available first)")

    ld = lhs_planes.reshape(L * S, C, m, kd)
    r2 = rhs_dig.reshape(L * S, kd, n)
    tables = jnp.repeat(jnp.asarray(_pack_tables(ring, nd)), S, axis=0)
    seeds = None
    gen_static = None
    n_vals = S if vals else 0
    in_jr = 0
    if gen_noise is not None:
        seeds, jr, bound = gen_noise
        gen_static = (ring.degree, int(jr), int(bound))
        ntab = jnp.asarray(
            ring.ntt_scaled_tab(1 if vals else jr), jnp.int32
        ).reshape(L * S, S * (1 if vals else jr), nd)
    elif noise is None:
        noise = jnp.zeros((1, m, n), jnp.int8)
        ntab = jnp.zeros((L * S, 1, nd), jnp.int32)
    else:
        jr = noise.shape[0] // ring.degree
        if noise.shape[0] != S * jr:
            raise ValueError("noise digit planes must have l*jr rows")
        in_jr = jr if vals else 0
        ntab = jnp.asarray(
            ring.ntt_scaled_tab(1 if vals else jr), jnp.int32
        ).reshape(L * S, S * (1 if vals else jr), nd)
    masked = seeds is not None and seeds.shape[0] >= 6
    oh, ol = _fused_scaled_noise_matmul(
        ld, r2, tables, ntab, noise, None, encode, tile_m, tile_n,
        interpret, ring.fold_words_ok, encode32, seeds, gen_static, n_vals,
        in_jr, settings.dots_first, masked, True,
    )
    return oh.reshape(L, S, m, n), ol.reshape(L, S, m, n)
