"""Bounded-uniform error sampling, on device.

Rebuild of ``sample_uniform_coefficients`` (``uniform.rs:5-22``): uniform
integers in the closed interval [-bound, bound]. The reference draws BigInts
with rejection sampling (``gen_bigint_range``); on TPU we draw W random
bits per sample and take ``floor(X * range / 2^W)`` — statistical distance
from uniform is < range/2^W, kept below 2^-66 for every supported bound
(negligible at the 128-bit security level; documented divergence: not
bit-identical to rand's rejection loop, which is unreachable anyway because
the reference only ever calls it through unseeded ``thread_rng``).

W adapts to the range ("stream v3"): W=96 for range < 2^30 (the error
bounds of every practical config — 25% fewer threefry words and a ~3x
cheaper reduction than the 128-bit form), W=128 otherwise (range up to
2^62, distance < 2^-66 still). Stream history: v3 changed the drawn
values for small bounds (golden pins updated); v2 introduced row-keyed
draws; v1 was whole-array 128-bit draws.

Samples are returned directly as centered RNS residues [..., L, l], skipping
the reference's BigInt -> ``bigints_to_poly`` detour (``parameters.rs:266``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import SamplingError
from ..ops import u64 as u
from ..params.ring import RingPlan


def sample_bounded_u64(key: jax.Array, shape: tuple[int, ...], range_size: int):
    """Uniform integers in [0, range_size) as uint32 pairs.

    range < 2^30: 96-bit draw, distance < 2^-66 (the fast path — every
    practical error bound); range < 2^63: 128-bit draw, distance < 2^-66
    for range < 2^62."""
    if not 1 <= range_size < 1 << 63:
        raise SamplingError(f"range {range_size} out of supported bounds")
    if range_size < 1 << 30:
        # v = floor((x2*2^64 + x1*2^32 + x0) * range / 2^96): sum the
        # 32x32 partial products by weight; v = word 3 of the 128-bit sum.
        bits = jax.random.bits(key, shape + (3,), dtype=jnp.uint32)
        r = jnp.uint32(range_size)
        h0, _l0 = u.mul32_wide(bits[..., 2], r)        # weight 2^0
        h1, l1 = u.mul32_wide(bits[..., 1], r)         # weight 2^32
        h2, l2 = u.mul32_wide(bits[..., 0], r)         # weight 2^64
        s32 = h0 + l1
        c32 = (s32 < h0).astype(u.U32)
        s64 = h1 + l2
        c64a = (s64 < h1).astype(u.U32)
        s64 = s64 + c32
        c64b = (s64 == 0).astype(u.U32) & c32
        v = h2 + c64a + c64b                           # < range < 2^30
        return jnp.zeros_like(v), v
    bits = jax.random.bits(key, shape + (4,), dtype=jnp.uint32)
    x_hh, x_hl = bits[..., 0], bits[..., 1]
    x_lh, x_ll = bits[..., 2], bits[..., 3]
    rh, rl = u.const_pair(range_size)
    rh = jnp.broadcast_to(rh, x_hh.shape)
    rl = jnp.broadcast_to(rl, x_hh.shape)
    w3, w2, w1, w0 = u.mul64_wide(x_hh, x_hl, rh, rl)
    h2h, h2l = u.mulhi64(x_lh, x_ll, rh, rl)
    sh, sl = u.add64(w1, w0, h2h, h2l)
    carry = u.lt64(sh, sl, w1, w0)
    vh, vl = u.add64(w3, w2, jnp.zeros_like(w3), carry.astype(u.U32))
    return vh, vl


def sample_uniform_coefficients(bound: int, count: int, rng=None) -> list[int]:
    """Uniform integers in [-bound, bound] as Python ints — direct analogue
    of the reference's public ``sample_uniform_coefficients``
    (``uniform.rs:5-22``). ``rng``: optional ``random.Random``-like object
    with ``randint`` (defaults to a fresh system-seeded instance)."""
    import random as _random

    bound = int(bound)
    if bound < 0:
        raise SamplingError("bound must be non-negative")
    r = rng if rng is not None else _random.SystemRandom()
    return [r.randint(-bound, bound) for _ in range(count)]


def sample_uniform_residues_host(
    key: jax.Array, shape: tuple[int, ...], bound: int, ring: RingPlan
):
    """Host fallback for bounds >= min(q_i): exact Python-int sampling of
    uniform values in [-bound, bound] of ANY magnitude, reduced into RNS
    (the reference's BigInt path supports unbounded bounds; ours must too).
    Deterministic in ``key``. Returns uint32 pairs [..., L, l]."""
    import random as _random

    import numpy as _np

    from ..ops import u64 as _u

    bound = int(bound)
    if bound <= 0:
        raise SamplingError("bound must be positive")
    data = _np.asarray(jax.random.key_data(key)).ravel().tobytes()
    rng = _random.Random(data)
    count = 1
    for s in shape:
        count *= s
    vals = [rng.randint(-bound, bound) for _ in range(count)]
    # shape[-1] is the poly axis (l); reduce each sampled value per limb
    L = ring.num_limbs
    res = _np.zeros((count, L), _np.uint64)
    for i, v in enumerate(vals):
        for j, q in enumerate(ring.moduli):
            res[i, j] = v % q
    res = res.reshape(shape[:-1] + (shape[-1], L))
    res = _np.moveaxis(res, -1, -2)  # [..., L, l]
    hi, lo = _u.split_u64_np(res)
    import jax.numpy as _jnp

    return _jnp.asarray(hi), _jnp.asarray(lo)


def sample_uniform_residues(
    key: jax.Array, shape: tuple[int, ...], bound: int, ring: RingPlan
):
    """Uniform in [-bound, bound], embedded as residues [..., L, l].

    ``shape`` must end with (l,) or be the poly batch shape; the returned
    arrays have shape ``shape[:-1] + (L, l)`` when ``shape[-1] == l``.
    Requires bound < min(q_i) so the signed value embeds in one subtraction.
    """
    bound = int(bound)
    if bound <= 0:
        raise SamplingError("bound must be positive")
    if bound >= min(ring.moduli):
        raise SamplingError(
            f"bound {bound} >= smallest modulus; use host-side sampling"
        )
    vh, vl = sample_bounded_u64(key, shape, 2 * bound + 1)
    return _embed_centered(vh, vl, shape, bound, ring)


def sample_uniform_residues_rows(
    key: jax.Array, row_offset, num_rows: int, shape_tail: tuple[int, ...],
    bound: int, ring: RingPlan,
):
    """Row-keyed variant ("stream v2"): row i of the result is drawn from
    ``fold_in(key, row_offset + i)``, independent of how many rows this
    call produces. A mesh shard holding rows [off, off+cnt) therefore
    samples EXACTLY the same values the full-array call would have placed
    there — no redundant full-stream sampling, bit-identical on any mesh.

    Returns residues [num_rows, *shape_tail[:-1], L, l].
    ``row_offset`` may be a traced scalar (e.g. from ``jax.lax.axis_index``).
    """
    bound = int(bound)
    if bound <= 0:
        raise SamplingError("bound must be positive")
    if bound >= min(ring.moduli):
        raise SamplingError(
            f"bound {bound} >= smallest modulus; use host-side sampling"
        )
    idx = jnp.asarray(row_offset) + jnp.arange(num_rows)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    vh, vl = jax.vmap(
        lambda k: sample_bounded_u64(k, shape_tail, 2 * bound + 1)
    )(keys)
    shape = (num_rows,) + tuple(shape_tail)
    return _embed_centered(vh, vl, shape, bound, ring)


def sample_uniform_signed_rows(
    key: jax.Array, row_offset, num_rows: int, shape_tail: tuple[int, ...],
    bound: int,
):
    """Row-keyed bounded-uniform sampling returning SIGNED int32 values in
    [-bound, bound] instead of embedded residues.

    Draws the IDENTICAL random stream as
    :func:`sample_uniform_residues_rows` (same fold_in keys, same
    adaptive-width 96/128-bit reduction — stream v3 picks the width from
    the range, identically in both functions), so kernels switching to
    the small-coefficient NTT path
    (:func:`pvw_tpu.ops.ntt.ntt_forward_cols_signed`) produce bit-identical
    ciphertexts. Requires bound < 2^30 so v - bound fits int32; the signed
    NTT path further requires bound <= 32639.
    """
    bound = int(bound)
    if not 0 < bound < 1 << 30:
        raise SamplingError(f"bound {bound} out of signed-path range")
    idx = jnp.asarray(row_offset) + jnp.arange(num_rows)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    _, vl = jax.vmap(
        lambda k: sample_bounded_u64(k, tuple(shape_tail), 2 * bound + 1)
    )(keys)
    # v <= 2*bound < 2^31: the low word carries the whole value
    return vl.astype(jnp.int32) - jnp.int32(bound)


def _embed_centered(vh, vl, shape, bound: int, ring: RingPlan):
    """values in [0, 2*bound] (uint32 pairs, shape ``shape``) -> centered
    residues [..., L, l] with the limb axis inserted before the last."""
    bh, bl = u.const_pair(bound)
    # signed value = v - bound; residue_i = (v - bound) mod q_i
    neg = u.lt64(vh, vl, bh, bl)
    ph, pl = u.sub64(vh, vl, bh, bl)              # v - bound   (when v >= bound)
    mh, ml = u.sub64(bh, bl, vh, vl)              # bound - v   (when v < bound)
    # expand limb axis
    qh = jnp.asarray(ring.q_hi).reshape((1,) * len(shape) + (-1,))
    ql = jnp.asarray(ring.q_lo).reshape((1,) * len(shape) + (-1,))
    neg_e = neg[..., None]
    nh, nl = u.sub64(qh, ql, mh[..., None], ml[..., None])
    zero = (mh == 0) & (ml == 0)
    hi = jnp.where(neg_e & ~zero[..., None], nh, jnp.broadcast_to(ph[..., None], nh.shape))
    lo = jnp.where(neg_e & ~zero[..., None], nl, jnp.broadcast_to(pl[..., None], nl.shape))
    # move limb axis before the final poly axis: [..., l, L] -> [..., L, l]
    hi = jnp.moveaxis(hi, -1, -2)
    lo = jnp.moveaxis(lo, -1, -2)
    return hi.astype(u.U32), lo.astype(u.U32)
