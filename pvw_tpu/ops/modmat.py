"""Batched modular linear algebra over R_q via int8 digit matmuls.

THE core TPU trick of this framework. Every hot operation of the PVW scheme
— the NTT (degree <= 32, so it's a dense matmul), the key-generation product
``s^T A`` (``crs.rs:138-171``), the encryption products ``A·r`` and ``B·r``
(``crs.rs:177-205``, ``encryption.rs:177-192``), and the decryption inner
product ``<s, c1>`` (``decryption.rs:257-271``) — is a matrix contraction
whose scalars are residues mod a 62-bit prime.

TPUs do not multiply 64-bit integers, but the MXU multiplies int8 at
hundreds of TOPS. So residues are decomposed into ``nd`` balanced signed
8-bit digits (exact; nd = ring.num_digits, the minimal width for the
prime chain — 5 for 37-bit primes, 8 for 55-bit+; see
:func:`pvw_tpu.ops.u64.to_signed_digits`), the contraction runs as a
single int8->int32 ``dot_general`` over the stacked digit axes, the
nd x nd digit products are summed into 2nd-1 convolution columns
(|column| < 2^31 for contraction length <= 8192), and the columns are
folded back into residues with per-limb Shoup constant multiplications
by 2^(8c) mod q.

This is NOT how the reference computes — it does per-element u64
Barrett/NTT products on CPU (fhe-math ``zq``); a faithful port would leave
the MXU idle. The digit-matmul formulation keeps >95% of the arithmetic on
the systolic array.
"""

from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from . import u64 as u
from .u64 import MAX_CONTRACTION

if TYPE_CHECKING:  # params.ring imports ops; avoid a runtime cycle
    from ..params.ring import RingPlan

D = u.NUM_DIGITS          # 8 (maximum; rings carry their own num_digits)
C = u.NUM_COLUMNS         # 15


# --------------------------------------------------------------------------
# digit helpers
# --------------------------------------------------------------------------

def digits(hi, lo, nd: int = D):
    """Pair [...]-shaped residues -> int8 digits [..., nd]."""
    return u.to_signed_digits(hi, lo, nd)


def _column_sums(p6, nd: int = D):
    """P [..., nd(i), m, nd(j), n] int32 -> columns [..., m, n, 2nd-1] int32.

    cols[c] = sum_{i+j=c} P[i, :, j, :].
    """
    outs = []
    for c in range(2 * nd - 1):
        lo_i = max(0, c - (nd - 1))
        hi_i = min(nd - 1, c)
        acc = None
        for i in range(lo_i, hi_i + 1):
            term = p6[..., i, :, c - i, :]
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def _fold_leading(cols, ring: "RingPlan"):
    """Fold columns shaped [L, ..., ncols] (limb axis leading) — grouped
    fold (see :func:`pvw_tpu.ops.u64.fold_columns_grouped`). The bias is
    looked up for the ACTUAL column count, so narrow column tensors from
    the small-coefficient NTT path fold exactly too."""
    nmid = cols.ndim - 2  # dims between the leading L axis and the col axis
    shp = (ring.num_limbs,) + (1,) * nmid + (4,)
    qshp = (ring.num_limbs,) + (1,) * nmid
    bias_hi, bias_lo = ring.bias_pair_for_columns(cols.shape[-1])
    gh = jnp.asarray(ring.grp_hi).reshape(shp)
    gl = jnp.asarray(ring.grp_lo).reshape(shp)
    sh = jnp.asarray(ring.grp_sh).reshape(shp)
    sl = jnp.asarray(ring.grp_sl).reshape(shp)
    bh = jnp.asarray(bias_hi).reshape(qshp)
    bl = jnp.asarray(bias_lo).reshape(qshp)
    qh = jnp.asarray(ring.q_hi).reshape(qshp)
    ql = jnp.asarray(ring.q_lo).reshape(qshp)
    return u.fold_columns_grouped(cols, gh, gl, sh, sl, bh, bl, qh, ql)


def _fold_trailing(cols, ring: "RingPlan"):
    """Fold columns shaped [..., L, l, ncols] (limb axis next-to-last-but-one)."""
    bias_hi, bias_lo = ring.bias_pair_for_columns(cols.shape[-1])
    gh = jnp.asarray(ring.grp_hi)[:, None, :]
    gl = jnp.asarray(ring.grp_lo)[:, None, :]
    sh = jnp.asarray(ring.grp_sh)[:, None, :]
    sl = jnp.asarray(ring.grp_sl)[:, None, :]
    bh = jnp.asarray(bias_hi)[:, None]
    bl = jnp.asarray(bias_lo)[:, None]
    qh = jnp.asarray(ring.q_hi)[:, None]
    ql = jnp.asarray(ring.q_lo)[:, None]
    return u.fold_columns_grouped(cols, gh, gl, sh, sl, bh, bl, qh, ql)


# --------------------------------------------------------------------------
# the channel-batched matmul
# --------------------------------------------------------------------------

def matmul_channels(lhs, rhs, ring: "RingPlan"):
    """Modular matmul over per-(limb, slot) channels.

    lhs: pair of uint32 [L, S, m, k]; rhs: pair of uint32 [L, S, k, n]
    -> pair of uint32 [L, S, m, n] with every entry reduced mod q_limb.

    S is any flattened channel batch sharing the limb axis (usually the l
    NTT slots, possibly fused with extra user batches).
    """
    (lh, ll), (rh, rl) = lhs, rhs
    L, S, m, k = lh.shape
    n = rh.shape[-1]
    nd = ring.num_digits
    if k > MAX_CONTRACTION:
        raise ValueError(f"contraction {k} exceeds int32 headroom {MAX_CONTRACTION}")
    ld = digits(lh, ll, nd)                   # [L, S, m, k, nd]
    rd = digits(rh, rl, nd)                   # [L, S, k, n, nd]
    l2 = jnp.transpose(ld, (0, 1, 4, 2, 3)).reshape(L, S, nd * m, k)
    r2 = jnp.transpose(rd, (0, 1, 2, 4, 3)).reshape(L, S, k, nd * n)
    p = jax.lax.dot_general(
        l2,
        r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )                                          # [L, S, nd*m, nd*n]
    p6 = p.reshape(L, S, nd, m, nd, n)
    cols = _column_sums(p6, nd)                # [L, S, m, n, 2nd-1]
    return _fold_leading(cols, ring)           # pair [L, S, m, n]


def banded_cols(lhs, rhs, ring: "RingPlan"):
    """Band-structured digit matmul returning the UNFOLDED convolution
    columns int32 [L, S, m, n, 15].

    Folding is linear, so callers accumulating several mod-q terms (e.g.
    c2 = B·r + encode(m) + NTT(e2)) can sum column tensors and fold once —
    provided the summed columns stay within int32 (each matmul contributes
    <= contraction * 2^17; see MAX_CONTRACTION headroom).
    """
    (lh, ll), (rh, rl) = lhs, rhs
    L, S, m, k = lh.shape
    n = rh.shape[-1]
    nd, nc = ring.num_digits, ring.num_columns
    if k > MAX_CONTRACTION:
        raise ValueError(f"contraction {k} exceeds int32 headroom {MAX_CONTRACTION}")
    ld = digits(lh, ll, nd)                   # [L, S, m, k, nd]
    rd = digits(rh, rl, nd)                   # [L, S, k, n, nd]
    l2 = ld.reshape(L, S, m, k * nd)          # (k-major, digit-minor)
    band = jnp.zeros((L, S, k, nd, nc, n), jnp.int8)
    rdt = jnp.transpose(rd, (0, 1, 2, 4, 3))  # [L, S, k, nd(j), n]
    for i in range(nd):
        band = band.at[:, :, :, i, i : i + nd, :].set(rdt)
    r2 = band.reshape(L, S, k * nd, nc * n)
    p = jax.lax.dot_general(
        l2, r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )                                          # [L, S, m, nc*n]
    return jnp.transpose(p.reshape(L, S, m, nc, n), (0, 1, 2, 4, 3))


def standard_cols(lhs, rhs, ring: "RingPlan"):
    """Unfolded convolution columns via the 8x8 digit-product form:
    int32 [L, S, m, n, 15]. Same output as :func:`banded_cols`; the
    intermediate is 64x the output instead of a 15x-blown rhs band — the
    right trade when the rhs is LARGE (e.g. the k x k CRS in keygen,
    where the band alone can exceed HBM)."""
    (lh, ll), (rh, rl) = lhs, rhs
    L, S, m, k = lh.shape
    n = rh.shape[-1]
    nd = ring.num_digits
    if k > MAX_CONTRACTION:
        raise ValueError(f"contraction {k} exceeds int32 headroom {MAX_CONTRACTION}")
    ld = digits(lh, ll, nd)
    rd = digits(rh, rl, nd)
    l2 = jnp.transpose(ld, (0, 1, 4, 2, 3)).reshape(L, S, nd * m, k)
    r2 = jnp.transpose(rd, (0, 1, 2, 4, 3)).reshape(L, S, k, nd * n)
    p = jax.lax.dot_general(
        l2, r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )
    return _column_sums(p.reshape(L, S, nd, m, nd, n), nd)


# HBM budget for a single intermediate tensor in the auto column path.
COLS_BYTES_BUDGET = 2 * 1024**3


def matmul_cols(lhs, rhs, ring: "RingPlan"):
    """Memory-aware column producer: banded when the 15x rhs band fits the
    budget, otherwise the standard 64-product form (whose [8m, 8n] int32
    intermediate the caller should keep bounded by chunking m)."""
    L, S, m, k = lhs[0].shape
    n = rhs[0].shape[-1]
    band_bytes = L * S * k * ring.num_digits * ring.num_columns * n  # int8 band
    if band_bytes <= COLS_BYTES_BUDGET:
        return banded_cols(lhs, rhs, ring)
    return standard_cols(lhs, rhs, ring)


def prescale_digits(rhs, ring: "RingPlan"):
    """Scaled-digit decomposition of the small matmul operand.

    For residues b < q and each lhs-digit index i, precompute
    ``t_i = b * 2^(8i) mod q`` (one Shoup multiply per i on the SMALL
    operand) and decompose it into nd signed digits. Then

        sum_k a[m,k] * b[k,n]
      = sum_k sum_i ad_i[m,k] * 2^(8i) * b[k,n]
      ≡ sum_j 2^(8j) * ( sum_{k,i} ad_i[m,k] * td_{i,j}[k,n] )   (mod q)

    so the digit contraction runs over (k, i) and emits only ``nd``
    convolution columns instead of 2nd-1: 1.8x fewer MXU MACs, 1.8x less
    column traffic, and a fold with one fewer Shoup group. The prescale
    cost is O(k*n) — amortized over the m output rows.

    rhs: pair of uint32 [L, S, k, n] -> int8 [L, S, k, n, nd(i), nd(j)].
    """
    rh, rl = rhs
    L = rh.shape[0]
    nd = ring.num_digits
    sh = lambda a: a.reshape((L,) + (1,) * (rh.ndim - 1))
    qh, ql = sh(jnp.asarray(ring.q_hi)), sh(jnp.asarray(ring.q_lo))
    outs = []
    for i in range(nd):
        if i == 0:
            th, tl = rh, rl
        else:
            th, tl = u.shoup_mul64_arr(
                rh, rl,
                sh(jnp.asarray(ring.pow_hi[:, i])),
                sh(jnp.asarray(ring.pow_lo[:, i])),
                sh(jnp.asarray(ring.pow_s64_hi[:, i])),
                sh(jnp.asarray(ring.pow_s64_lo[:, i])),
                qh, ql,
            )
        outs.append(digits(th, tl, nd))          # [L, S, k, n, nd(j)]
    return jnp.stack(outs, axis=-2)              # [L, S, k, n, nd(i), nd(j)]


def prescale_digits_band(rhs, ring: "RingPlan"):
    """:func:`prescale_digits` emitted directly in the fused kernel's
    band layout: int8 [L, S, nd(j), k*nd(i), n].

    Same values as ``_build_rhs_scaled(prescale_digits(rhs))`` (tested),
    but every axis insertion happens ABOVE the minor n axis, so no
    lane-crossing transpose of the ~100 MB digit tensor is ever
    materialized — on TPU that transpose was the dominant cost of the
    per-encryption r-stage (benchmarks/probe_rstage.py).
    """
    rh, rl = rhs
    L = rh.shape[0]
    nd = ring.num_digits
    sh = lambda a: a.reshape((L,) + (1,) * (rh.ndim - 1))
    qh, ql = sh(jnp.asarray(ring.q_hi)), sh(jnp.asarray(ring.q_lo))
    # digs[i][j]: digit j of b * 2^(8i) mod q, each [L, S, k, n]
    digs = []
    for i in range(nd):
        if i == 0:
            th, tl = rh, rl
        else:
            th, tl = u.shoup_mul64_arr(
                rh, rl,
                sh(jnp.asarray(ring.pow_hi[:, i])),
                sh(jnp.asarray(ring.pow_lo[:, i])),
                sh(jnp.asarray(ring.pow_s64_hi[:, i])),
                sh(jnp.asarray(ring.pow_s64_lo[:, i])),
                qh, ql,
            )
        digs.append(u.to_signed_digit_list(th, tl, nd))
    # [L, S, k, nd(i), n] per j, then stack j ABOVE k
    per_j = [
        jnp.stack([digs[i][j] for i in range(nd)], axis=-2)
        for j in range(nd)
    ]
    band = jnp.stack(per_j, axis=2)              # [L, S, nd(j), k, nd(i), n]
    Ld, S, _, k, _, n = band.shape
    return band.reshape(Ld, S, nd, k * nd, n)


@partial(jax.jit, static_argnums=(2,))
def lhs_digit_planes(hi, lo, ring: "RingPlan"):
    """Canonical poly-layout pair [m, k, L, l] -> channel-major int8 digit
    planes [L, l, m, k*nd] (k-major, digit-minor) — the encryption-
    invariant lhs operand of the fused scaled matmul. Key matrices are
    encrypted against many times; caching these planes replaces the
    per-call transpose + digit decomposition of the u32 pair (and reads
    nd bytes per residue instead of 8)."""
    m, k, L, l = hi.shape
    nd = ring.num_digits
    hc = jnp.transpose(hi, (2, 3, 0, 1))
    lc = jnp.transpose(lo, (2, 3, 0, 1))
    return digits(hc, lc, nd).reshape(L, l, m, k * nd)


@partial(jax.jit, static_argnums=(2,))
def lhs_scaled_planes(hi, lo, ring: "RingPlan"):
    """Canonical poly-layout pair [m, k, L, l] -> SCALED channel-major
    digit planes int8 [L, l, nd(c), m, k*nd(i)], entry
    (c, mm, kk*nd + i) = digit_c(A[mm, kk] * 2^(8i) mod q) — the cached
    lhs operand of the SWAPPED fused matmul (DESIGN.md §5f): with the
    Shoup scales on the encryption-invariant side, the per-encryption rhs
    needs only the plain digits of r (no per-call prescale). nd x the
    plain-plane footprint; built once per key set."""
    m, k, L, l = hi.shape
    nd = ring.num_digits
    hc = jnp.transpose(hi, (2, 3, 0, 1))           # [L, l, m, k]
    lc = jnp.transpose(lo, (2, 3, 0, 1))
    sh = lambda a: jnp.asarray(a).reshape(L, 1, 1, 1)
    qh, ql = sh(ring.q_hi), sh(ring.q_lo)
    digs = []                                      # digs[i] = nd c-planes
    for i in range(nd):
        if i == 0:
            th, tl = hc, lc
        else:
            th, tl = u.shoup_mul64_arr(
                hc, lc,
                sh(ring.pow_hi[:, i]), sh(ring.pow_lo[:, i]),
                sh(ring.pow_s64_hi[:, i]), sh(ring.pow_s64_lo[:, i]),
                qh, ql,
            )
        digs.append(u.to_signed_digit_list(th, tl, nd))
    per_c = [
        jnp.stack([digs[i][c] for i in range(nd)], axis=-1)   # [L,l,m,k,nd]
        .reshape(L, l, m, k * nd)
        for c in range(nd)
    ]
    return jnp.stack(per_c, axis=2)                # [L, l, nd, m, k*nd]


def rhs_digit_cols(rhs_ch, ring: "RingPlan"):
    """Channel-major residue pair [L, l, k, n] -> PLAIN digit rows int8
    [L, l, k*nd(i), n] (k-major, digit-minor — matching the swapped lhs
    plane column order). The swapped-form per-encryption rhs: nd digit
    extractions, no Shoup scales, no band duplication."""
    rh, rl = rhs_ch
    L, l, k, n = rh.shape
    nd = ring.num_digits
    digs = u.to_signed_digit_list(rh, rl, nd)      # nd x [L, l, k, n]
    return jnp.stack(digs, axis=3).reshape(L, l, k * nd, n)


def scaled_cols(lhs, rhs_scaled, ring: "RingPlan", lhs_dig=None):
    """Digit matmul against a prescaled rhs: nd narrow columns.

    lhs: pair [L, S, m, k]; rhs_scaled: int8 [L, S, k, n, nd, nd]
    (from :func:`prescale_digits`) -> int32 columns [L, S, m, n, nd].
    Column magnitude <= k * nd * 2^14 (int32-safe for k <= MAX_CONTRACTION).
    ``lhs_dig``: optional pre-decomposed lhs digit planes [L, S, m, k*nd]
    (see :func:`lhs_digit_planes`); ``lhs`` is ignored when given.
    """
    nd = ring.num_digits
    if lhs_dig is not None:
        L, S, m, kd = lhs_dig.shape
        k = kd // nd
        l2 = lhs_dig
    else:
        lh, ll = lhs
        L, S, m, k = lh.shape
    n = rhs_scaled.shape[3]
    if k > MAX_CONTRACTION:
        raise ValueError(f"contraction {k} exceeds int32 headroom {MAX_CONTRACTION}")
    if lhs_dig is None:
        ld = digits(lh, ll, nd)                  # [L, S, m, k, nd(i)]
        l2 = ld.reshape(L, S, m, k * nd)         # k-major, i-minor
    r2 = jnp.transpose(rhs_scaled, (0, 1, 2, 4, 5, 3)).reshape(
        L, S, k * nd, nd * n
    )                                            # (k,i) x (j,n)
    p = jax.lax.dot_general(
        l2, r2,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )                                            # [L, S, m, nd*n]
    return jnp.transpose(p.reshape(L, S, m, nd, n), (0, 1, 2, 4, 3))


def matmul_channels_scaled(lhs, rhs, ring: "RingPlan"):
    """Scaled-digit variant of :func:`matmul_channels` — same exact
    residues, ~1.8x fewer MACs and narrower columns than the banded form."""
    return _fold_leading(scaled_cols(lhs, prescale_digits(rhs, ring), ring),
                         ring)


def matmul_channels_banded(lhs, rhs, ring: "RingPlan"):
    """Band-structured variant of :func:`matmul_channels`.

    Instead of materializing all 64 digit-pair products ([L, S, 8m, 8n]
    int32 — 64x the output size in HBM traffic), the rhs digits are
    arranged into a banded matrix over (digit, column) so ONE matmul
    produces the 15 convolution columns directly:

        rhs_band[(k, i), (c, n)] = rhs_digit[k, n, c - i]  (0 <= c-i < 8)
        P[m, (c, n)] = sum_{k,i} lhs_digit[m, k, i] * rhs_band[(k,i),(c,n)]
                     = cols[c][m, n]

    The intermediate is 15x the output (4.3x smaller), at the cost of
    1.9x MXU MACs (15/8 vs 64/8 effective width) — a good trade since the
    MXU is far from the bottleneck. Used when n is the small side (the
    r / dealer-batch operand in every PVW product).
    """
    (lh, ll), (rh, rl) = lhs, rhs
    L, S, m, k = lh.shape
    n = rh.shape[-1]
    if k > MAX_CONTRACTION:
        raise ValueError(f"contraction {k} exceeds int32 headroom {MAX_CONTRACTION}")
    return _fold_leading(banded_cols(lhs, rhs, ring), ring)


def poly_matmul(a, b, ring: "RingPlan"):
    """R_q matrix product with the canonical poly layout.

    a: pair [m, k, L, l]; b: pair [k, n, L, l] -> pair [m, n, L, l].
    Both operands must be in NTT representation (pointwise channel algebra);
    this is the TPU shape of ``crs.rs:152-168`` / ``encryption.rs:185-192``.
    """
    (ah, al), (bh, bl) = a, b
    m, k, L, l = ah.shape
    n = bh.shape[1]
    at = lambda x: jnp.transpose(x, (2, 3, 0, 1))   # [L, l, m, k]
    bt = lambda x: jnp.transpose(x, (2, 3, 0, 1))   # [L, l, k, n]
    # Shape heuristic: the rhs-banded form trades 1.9x MXU MACs for a 4.3x
    # smaller int32 intermediate — a win whenever the output (m) side is at
    # least as large as the contraction (A·r, B·r, s^T A). The standard
    # form only wins for skinny outputs (the m=1 decryption inner product,
    # where the 64x intermediate is tiny anyway).
    fn = matmul_channels_banded if m >= k else matmul_channels
    oh, ol = fn((at(ah), at(al)), (bt(bh), bt(bl)), ring)
    back = lambda x: jnp.transpose(x, (2, 3, 0, 1))  # -> [m, n, L, l]
    return (back(oh), back(ol))


# --------------------------------------------------------------------------
# pointwise ring ops on the canonical [..., L, l] layout
# --------------------------------------------------------------------------

def _q_pair(ring: "RingPlan"):
    return jnp.asarray(ring.q_hi)[:, None], jnp.asarray(ring.q_lo)[:, None]


def poly_add(a, b, ring: "RingPlan"):
    """(a + b) mod q on [..., L, l] pairs (``&p + &q`` in the reference)."""
    qh, ql = _q_pair(ring)
    return u.addmod(a[0], a[1], b[0], b[1], qh, ql)


def poly_sub(a, b, ring: "RingPlan"):
    qh, ql = _q_pair(ring)
    return u.submod(a[0], a[1], b[0], b[1], qh, ql)


def poly_neg(a, ring: "RingPlan"):
    qh, ql = _q_pair(ring)
    return u.negmod(a[0], a[1], qh, ql)


def poly_pointwise_mul(a, b, ring: "RingPlan"):
    """Elementwise a*b mod q on [..., L, l] pairs (NTT-domain ring product).

    Digit outer products (64 int32 mults) + fold; used for the public
    ``Poly * Poly`` API op where no contraction amortizes the digits.
    """
    nd = ring.num_digits
    da = digits(*a, nd).astype(jnp.int32)      # [..., L, l, nd]
    db = digits(*b, nd).astype(jnp.int32)
    p = da[..., :, None] * db[..., None, :]    # [..., L, l, nd, nd]
    outs = []
    for c in range(ring.num_columns):
        lo_i = max(0, c - (nd - 1))
        hi_i = min(nd - 1, c)
        acc = None
        for i in range(lo_i, hi_i + 1):
            term = p[..., i, c - i]
            acc = term if acc is None else acc + term
        outs.append(acc)
    cols = jnp.stack(outs, axis=-1)            # [..., L, l, 2nd-1]
    return _fold_trailing(cols, ring)


def shoup_scale_table(x, table_w, table_shoup, ring: "RingPlan"):
    """w[L, l] * x[...] mod q -> [..., L, l]: scale a per-slot constant table
    by a batch of u64 scalars (the gadget encode ``m * g`` inner op).

    ``x``: pair of uint32 [...] (values < 2^64); tables: numpy uint64 [L, l]
    of constants < q and their 64-bit Shoup companions.
    """
    wh, wl = u.split_u64_np(table_w)
    sh, sl = u.split_u64_np(table_shoup)
    xh = x[0][..., None, None]
    xl = x[1][..., None, None]
    qh = jnp.asarray(ring.q_hi)[:, None]
    ql = jnp.asarray(ring.q_lo)[:, None]
    return u.shoup_mul64_arr(
        xh, xl, jnp.asarray(wh), jnp.asarray(wl), jnp.asarray(sh), jnp.asarray(sl),
        qh, ql,
    )


def from_signed_coeffs(coeffs, ring: "RingPlan"):
    """Signed integer coefficients [..., l] (int32) -> residue pairs
    [..., L, l] in PowerBasis (``Poly::from_coefficients`` semantics:
    negatives wrap per modulus, ``secret_key.rs:76``).

    Exact for the full int32 range: limbs with q <= 2^31 reduce with an
    int32 floored remainder first; larger limbs embed |c| < 2^31 < q
    directly (one conditional q - |c|)."""
    c = jnp.asarray(coeffs, jnp.int32)                  # [..., l]
    his, los = [], []
    for i, q in enumerate(ring.moduli):
        if q <= 0x7FFFFFFF:  # q fits int32; primes are odd so q != 2^31
            # jnp.remainder is floored: result in [0, q) for any int32 c
            r = jnp.remainder(c, jnp.int32(q)).astype(u.U32)
            his.append(jnp.zeros_like(r))
            los.append(r)
        else:
            neg = c < 0
            mag = jnp.where(neg, -c, c).astype(u.U32)
            qh, ql = u.const_pair(q)
            nh, nl = u.sub64(jnp.full_like(mag, qh), jnp.full_like(mag, ql),
                             jnp.zeros_like(mag), mag)
            zero = mag == 0
            his.append(jnp.where(neg & ~zero, nh, jnp.zeros_like(mag)))
            los.append(jnp.where(neg & ~zero, nl, jnp.where(neg, 0, mag))
                       .astype(u.U32))
    hi = jnp.stack(his, axis=-2)                        # [..., L, l]
    lo = jnp.stack(los, axis=-2)
    return hi.astype(u.U32), lo.astype(u.U32)
