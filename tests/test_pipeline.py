"""Pipelined-kernel exactness suite (round 5, DESIGN.md §9 overlap
lever): the software-pipelined body — MXU dots of channel c into a
parity-alternating column scratch, VPU fold of channel c-1 from the
other parity, output block lagging one grid step — must be BIT-IDENTICAL
to the fused production body for every supported option combination.
Interpret mode on CPU (the hardware A/B lives in
benchmarks/probe_pipeline.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pvw_tpu.ops import modmat, ntt as ntt_ops, tfry, u64 as u64op
from pvw_tpu.ops import pallas_modmat as pm
from pvw_tpu.params.ring import RingPlan

MODULI = (0xFFFFC4001, 0x1FFFFE0001)
BIG_MODULI = (0x80000000080001, 0x80000000130001)


def _setup(ring, m, k, n, rng):
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    S = l
    qs = np.array(ring.moduli, np.uint64).reshape(L, 1, 1, 1)
    a = rng.integers(0, 1 << 63, (L, S, m, k), np.uint64) % qs
    b = rng.integers(0, 1 << 63, (L, S, k, n), np.uint64) % qs
    pa = tuple(jnp.asarray(x) for x in u64op.split_u64_np(a))
    pb = tuple(jnp.asarray(x) for x in u64op.split_u64_np(b))
    rs = modmat.prescale_digits(pb, ring)
    ld = modmat.digits(pa[0], pa[1], nd).reshape(L * S, m, k * nd)
    r2 = pm._build_rhs_scaled(np.asarray(rs).reshape(L * S, k, n, nd, nd))
    tables = jnp.repeat(jnp.asarray(pm._pack_tables(ring, nd)), S, axis=0)
    return ld, jnp.asarray(r2), tables


@pytest.mark.parametrize("moduli", [MODULI, BIG_MODULI])
@pytest.mark.parametrize("bound", [100, 2000])
def test_pipelined_noise_planes(moduli, bound):
    """Input noise digit planes + fold (both word/grouped): pipelined ==
    fused, bit for bit."""
    ring = RingPlan(moduli, 8)
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    S = l
    m, k, n = 16, 6, 8
    rng = np.random.default_rng(7)
    ld, r2, tables = _setup(ring, m, k, n, rng)
    jr = ntt_ops.signed_digit_count(bound)
    ev = rng.integers(-bound, bound + 1, (m, n, l)).astype(np.int32)
    dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
    planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
    ntab = jnp.asarray(ring.ntt_scaled_tab(jr), jnp.int32).reshape(
        L * S, l * jr, nd)
    for use_words in {False, ring.fold_words_ok}:
        fh, fl = pm._fused_scaled_noise_matmul(
            ld, r2, tables, ntab, planes, None, None, 8, 8, True,
            use_words)
        ph, pl_ = pm._fused_pipelined_matmul(
            ld, r2, tables, ntab, planes, None, 8, 8, True, use_words)
        np.testing.assert_array_equal(np.asarray(ph), np.asarray(fh))
        np.testing.assert_array_equal(np.asarray(pl_), np.asarray(fl))


def test_pipelined_gen_tfry_encode():
    """In-kernel v3k generation + in-kernel encode (32- and 64-bit
    scalar paths): pipelined == fused."""
    ring = RingPlan(MODULI, 8)
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    S = l
    m, k, n, bound = 16, 6, 8, 100
    rng = np.random.default_rng(8)
    ld, r2, tables = _setup(ring, m, k, n, rng)
    jr = ntt_ops.signed_digit_count(bound)
    ntab = jnp.asarray(ring.ntt_scaled_tab(jr), jnp.int32).reshape(
        L * S, l * jr, nd)
    seeds = jnp.asarray([3, 5, 0, 0], jnp.int32)
    gen = (l, jr, bound, True)

    from pvw_tpu.ops.pallas_modmat import encode_tab

    g = np.arange(1, L * l + 1, dtype=np.uint64).reshape(L, l) * 7
    etab = jnp.asarray(encode_tab(g, g * 3, g * 5, ring.moduli))
    sc = rng.integers(0, 1 << 62, (m, n), np.uint64)
    sc_hi, sc_lo = (jnp.asarray(x) for x in u64op.split_u64_np(sc))
    for encode32 in (False, True):
        enc = (sc_hi, sc_lo, etab)
        fh, fl = pm._fused_scaled_noise_matmul(
            ld, r2, tables, ntab, None, None, enc, 8, 8, True,
            ring.fold_words_ok, encode32, seeds, gen, 0, 0, False, False)
        ph, pl_ = pm._fused_pipelined_matmul(
            ld, r2, tables, ntab, None, enc, 8, 8, True,
            ring.fold_words_ok, encode32, seeds, gen, 0, 0)
        np.testing.assert_array_equal(np.asarray(ph), np.asarray(fh))
        np.testing.assert_array_equal(np.asarray(pl_), np.asarray(fl))


def test_pipelined_routed_end_to_end():
    """settings.pipeline_fold routes the public matmul_fold_scaled path
    on TPU only; on CPU the XLA fallback keeps results identical, so the
    knob round-trips the full encryption unchanged."""
    import jax

    from pvw_tpu import (
        GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    )
    from pvw_tpu.config import settings
    from pvw_tpu.crypto.decryption import decrypt_party_shares
    from pvw_tpu.crypto.encryption import encrypt_batch

    n, k, l = 8, 8, 8
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, MODULI, 0.5)
    p = (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
         .set_moduli(MODULI).set_secret_variance(0.5)
         .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(0)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 0))
    parties = [Party.new(i, p, jax.random.fold_in(key, 100 + i))
               for i in range(n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    vec = np.array([[d * 3 + r + 1 for r in range(n)] for d in range(n)],
                   np.uint64)
    settings.pipeline_fold = True
    try:
        ct = encrypt_batch(vec, gpk, jax.random.fold_in(key, 5))
        out = decrypt_party_shares(ct, parties[1].secret_key, 1)
        assert out == [int(vec[d][1]) for d in range(n)]
    finally:
        settings.reset()


@pytest.mark.parametrize("bound,in_planes", [(100, False), (2000, True),
                                             (100, True)])
def test_pipelined_value_plane_modes(bound, in_planes):
    """The VALUE-PLANE MAC paths — the production-default mode on real
    shapes (noise_vals > 0): in-kernel v3k generation into int32 value
    planes, and the in_jr digit->value compose for input planes — must be
    bit-identical between the pipelined and fused bodies."""
    ring = RingPlan(MODULI, 8)
    L, l, nd = ring.num_limbs, ring.degree, ring.num_digits
    S = l
    m, k, n = 16, 6, 8
    rng = np.random.default_rng(21)
    ld, r2, tables = _setup(ring, m, k, n, rng)
    jr = ntt_ops.signed_digit_count(bound)
    ntab_vals = jnp.asarray(ring.ntt_scaled_tab(1), jnp.int32).reshape(
        L * S, l, nd)
    if in_planes:
        ev = rng.integers(-bound, bound + 1, (m, n, l)).astype(np.int32)
        dig = ntt_ops._signed_digits(jnp.asarray(ev), jr)
        planes = jnp.transpose(dig, (2, 3, 0, 1)).reshape(l * jr, m, n)
        args = dict(noise=planes, seeds=None, gen=None, in_jr=jr)
    else:
        seeds = jnp.asarray([5, 11, 0, 0], jnp.int32)
        args = dict(noise=None, seeds=seeds, gen=(l, jr, bound, True),
                    in_jr=0)
    fh, fl = pm._fused_scaled_noise_matmul(
        ld, r2, tables, ntab_vals, args["noise"], None, None, 8, 8, True,
        ring.fold_words_ok, False, args["seeds"], args["gen"], l,
        args["in_jr"], False, False)
    ph, pl_ = pm._fused_pipelined_matmul(
        ld, r2, tables, ntab_vals, args["noise"], None, 8, 8, True,
        ring.fold_words_ok, False, args["seeds"], args["gen"], l,
        args["in_jr"])
    np.testing.assert_array_equal(np.asarray(ph), np.asarray(fh))
    np.testing.assert_array_equal(np.asarray(pl_), np.asarray(fl))
