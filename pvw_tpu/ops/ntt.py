"""Negacyclic NTT for tiny ring degrees, as dense modular matmuls.

The PVW redundancy parameter l is 8..32 (``parameters.rs:140-144``), so the
"NTT" here is NOT a butterfly network: a full l x l twiddle matrix multiply
is both exact and faster on TPU (it rides the same int8 digit-matmul path as
everything else, see :mod:`pvw_tpu.ops.modmat`). The matrices are built on
the host by :class:`pvw_tpu.params.ring.RingPlan`.

Convention (documented; the reference delegates to fhe-math's
``Representation::{PowerBasis, Ntt}`` whose internal ordering is not
observable from the pvw-rs sources mounted here):

    forward:  y[j] = sum_i x[i] * psi^(i*(2j+1))   (evaluation at odd powers
                                                    of the 2l-th root psi)
    inverse:  x[i] = l^{-1} * sum_j y[j] * psi^(-i*(2j+1))

Pointwise products in the forward domain realize negacyclic convolution mod
X^l + 1, which is the only property the PVW algebra relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from typing import TYPE_CHECKING

from . import u64 as u
from .modmat import _fold_leading, digits

if TYPE_CHECKING:  # avoid runtime import cycle with params.ring
    from ..params.ring import RingPlan


def _matrix_cols(x, band, ring: "RingPlan"):
    """x: pair [..., L, l]; band: int8 numpy [L, C*l, nd*l] (lhs-banded
    twiddles, see RingPlan) -> unfolded columns int32 [L, l, B, C] plus
    the original batch shape (C = ring.num_columns).

    One int8 matmul per limb yields the C digit-convolution columns
    directly; column magnitude <= nd*l * 2^14 <= 2^22.
    """
    xh, xl = x
    batch_shape = xh.shape[:-2]
    L, l = ring.num_limbs, ring.degree
    nd, C = ring.num_digits, ring.num_columns
    b = 1
    for s in batch_shape:
        b *= s
    # [..., L, l] -> [L, l(i), B]
    xh2 = jnp.moveaxis(xh.reshape(b, L, l), 0, -1)
    xl2 = jnp.moveaxis(xl.reshape(b, L, l), 0, -1)
    xd = digits(xh2, xl2, nd)                              # [L, l(i), B, nd]
    rhs = jnp.transpose(xd, (0, 1, 3, 2)).reshape(L, l * nd, b)
    p = jax.lax.dot_general(
        jnp.asarray(band),
        rhs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                      # [L, C*l, B]
    cols = jnp.transpose(p.reshape(L, C, l, b), (0, 2, 3, 1))  # [L, l, B, C]
    return cols, batch_shape


def ntt_forward_cols(x, ring: "RingPlan"):
    """Forward NTT as unfolded columns (for column-space accumulation in
    the encryption kernel): returns (cols [L, l, B, C], batch_shape)."""
    return _matrix_cols(x, ring.ntt_fwd_band, ring)


def _apply_matrix(x, band, ring: "RingPlan"):
    cols, batch_shape = _matrix_cols(x, band, ring)
    L, l = ring.num_limbs, ring.degree
    oh, ol = _fold_leading(cols, ring)                     # [L, l, B]
    oh = jnp.moveaxis(oh, -1, 0).reshape(batch_shape + (L, l))
    ol = jnp.moveaxis(ol, -1, 0).reshape(batch_shape + (L, l))
    return oh, ol


def ntt_forward(x, ring: "RingPlan"):
    """PowerBasis -> Ntt on [..., L, l] pairs."""
    return _apply_matrix(x, ring.ntt_fwd_band, ring)


def ntt_inverse(x, ring: "RingPlan"):
    """Ntt -> PowerBasis on [..., L, l] pairs."""
    return _apply_matrix(x, ring.ntt_inv_band, ring)


# --------------------------------------------------------------------------
# small-coefficient path: NTT straight from signed integer coefficients
# --------------------------------------------------------------------------
#
# CBD secrets/randomness (|c| <= 32) and bounded errors (|c| <= a few
# thousand) fit 1-2 signed 8-bit digits — far fewer than the nd digits of a
# full residue. Feeding them to the banded twiddle matmul directly skips
# the residue embedding AND shrinks the column tensor from 2nd-1 to
# nd+jr-1 columns (e.g. 9 -> 6 at nd=5), which is the dominant HBM traffic
# of the noise path in encryption. Exact: the digit convolution computes
# sum_i W[j,i]*c[i] as integers; folding mod q yields the identical
# residues the residue path produces (bit-identical ciphertexts).

def signed_digit_count(max_abs: int) -> int:
    """Digits needed for signed values with |v| <= max_abs (None-able)."""
    if max_abs <= 127:
        return 1
    if max_abs <= 32639:  # 127*256 + 127
        return 2
    return 0  # does not fit the small path; use residues


def _signed_digits(c, jr: int):
    """int32 [..., l] signed values -> int8 digits [..., l, jr] (balanced;
    exact for |v| <= 127 (jr=1) / 32639 (jr=2))."""
    c = c.astype(jnp.int32)
    if jr == 1:
        return c.astype(jnp.int8)[..., None]
    d0 = ((c + 128) & 255) - 128
    d1 = (c - d0) >> 8
    return jnp.stack([d0.astype(jnp.int8), d1.astype(jnp.int8)], axis=-1)


def noise_digit_planes(key, row_offset, num_rows: int, cols: int, l: int,
                       bound: int):
    """Row-keyed bounded-uniform noise as int8 signed digit planes
    [l*jr, num_rows, cols] — the layout contract of the in-kernel noise
    NTT (row j*jr+dd for coefficient j, digit dd; must match
    ``RingPlan.ntt_scaled_tab``). Returns None when the bound exceeds the
    signed-digit range (callers fall back to the residue path). Shared by
    the encryption kernel, batch keygen, and the sharded kernel."""
    import jax.numpy as _jnp

    from ..sampling.uniform import sample_uniform_signed_rows

    jr = signed_digit_count(bound)
    if not jr:
        return None
    ec = sample_uniform_signed_rows(key, row_offset, num_rows, (cols, l),
                                    bound)
    dig = _signed_digits(ec, jr)                   # [rows, cols, l, jr]
    return _jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, num_rows, cols)


def ntt_forward_cols_signed(coeffs, ring: "RingPlan", max_abs: int):
    """Forward NTT of small signed coefficients as unfolded columns.

    coeffs: int32 [..., l] with |c| <= max_abs (static bound; must satisfy
    signed_digit_count(max_abs) > 0). Returns (cols [L, l, B, nd+jr-1],
    batch_shape). Pad the column axis to ring.num_columns with zeros to
    accumulate against full-width matmul columns.
    """
    jr = signed_digit_count(max_abs)
    if jr == 0:
        raise ValueError(f"coefficients up to {max_abs} need the residue path")
    band = ring.ntt_band_jr("fwd", jr)
    batch_shape = coeffs.shape[:-1]
    L, l = ring.num_limbs, ring.degree
    nd = ring.num_digits
    C = nd + jr - 1
    b = 1
    for s in batch_shape:
        b *= s
    xd = _signed_digits(coeffs.reshape(b, l), jr)          # [B, l, jr]
    rhs = jnp.transpose(xd, (1, 2, 0)).reshape(l * jr, b)  # [(l, j), B]
    p = jax.lax.dot_general(
        jnp.asarray(band),
        jnp.broadcast_to(rhs[None], (L,) + rhs.shape),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                      # [L, C*l, B]
    cols = jnp.transpose(p.reshape(L, C, l, b), (0, 2, 3, 1))  # [L, l, B, C]
    return cols, batch_shape


def ntt_forward_signed(coeffs, ring: "RingPlan", max_abs: int):
    """PowerBasis signed coefficients [..., l] -> Ntt residue pairs
    [..., L, l]. Drop-in for from_signed_coeffs + ntt_forward when
    |c| <= 32639 — same values, less work."""
    cols, batch_shape = ntt_forward_cols_signed(coeffs, ring, max_abs)
    L, l = ring.num_limbs, ring.degree
    oh, ol = _fold_leading(cols, ring)                     # [L, l, B]
    oh = jnp.moveaxis(oh, -1, 0).reshape(batch_shape + (L, l))
    ol = jnp.moveaxis(ol, -1, 0).reshape(batch_shape + (L, l))
    return oh, ol


def ntt_forward_signed_ch(coeffs, ring: "RingPlan", max_abs: int):
    """:func:`ntt_forward_signed` emitted CHANNEL-MAJOR: signed
    coefficients [..., l] -> Ntt residue pairs [L, l, ...]. The fold
    output is already [L, l, B]; this skips the moveaxis to batch-major
    that callers on the kernel path (whose operands are channel-major,
    DESIGN.md §5d) would immediately transpose back. Bit-identical
    values to ``transpose(ntt_forward_signed(...))`` (tested)."""
    cols, batch_shape = ntt_forward_cols_signed(coeffs, ring, max_abs)
    L, l = ring.num_limbs, ring.degree
    oh, ol = _fold_leading(cols, ring)                     # [L, l, B]
    return (oh.reshape((L, l) + batch_shape),
            ol.reshape((L, l) + batch_shape))
