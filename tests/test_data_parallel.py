"""Dealer-batch data-parallel backend (round 5): zero-collective
throughput scaling over the batch axis, bit-identical to the
single-device kernel under the v3k stream (whose global (row, column,
coefficient) counters — for BOTH the noise and the cbd-k r stream —
are what make batch splitting exact; v3/v4 streams are batch-shape /
tile-grid dependent by construction)."""

import numpy as np
import jax
import pytest

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
)
from pvw_tpu.config import settings
from pvw_tpu.crypto.decryption import decrypt_party_shares
from pvw_tpu.crypto.encryption import encrypt_batch
from pvw_tpu.errors import InvalidParameters
from pvw_tpu.ops import tfry
from pvw_tpu.parallel import encrypt_batch_data_parallel

MODULI = (0xFFFFEE001, 0xFFFFC4001)


def _system(n=8, k=8, l=8, seed=0, bounds=None):
    if bounds is None:
        b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, MODULI, 0.5)
        builder_bounds = ("u32", b1, b2)
    else:
        builder_bounds = ("big", *bounds)
    b = (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
         .set_moduli(MODULI).set_secret_variance(0.5))
    if builder_bounds[0] == "u32":
        b = b.set_error_bounds_u32(builder_bounds[1], builder_bounds[2])
    else:
        b = b.set_error_bounds(builder_bounds[1], builder_bounds[2])
    p = b.build()
    key = jax.random.key(seed)
    crs = PvwCrs.new(p, jax.random.fold_in(key, 0))
    parties = [Party.new(i, p, jax.random.fold_in(key, 100 + i))
               for i in range(p.n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    return p, gpk, parties, key


class TestCbdK:
    def test_distribution_and_bounds(self):
        for var, bound in ((0.5, 1), (2.0, 4)):
            vals = np.asarray(tfry.v3k_cbd_values(
                np.uint32(3), np.uint32(9), 0, 64, 64, 8, var))
            assert vals.min() >= -bound and vals.max() <= bound
            assert abs(float(vals.mean())) < 0.05
            assert abs(float(vals.var()) - var) < 0.1 * var + 0.05

    def test_global_counters_split_invariance(self):
        """Any (row, column) sub-block of the draw equals the same block
        of the full draw — the property neither jax.random-based stream
        has, and the basis of every sharding bit-identity."""
        full = np.asarray(tfry.v3k_cbd_values(
            np.uint32(1), np.uint32(2), 0, 16, 12, 8, 0.5))
        part = np.asarray(tfry.v3k_cbd_values(
            np.uint32(1), np.uint32(2), 3, 5, 7, 8, 0.5, col_off=4))
        np.testing.assert_array_equal(full[3:8, 4:11], part)

    def test_namespace_disjoint_from_noise(self):
        """cbd-k (t=3 counters) and the v3k noise (t<3) never share a
        counter even under one key: same key, overlapping coordinates,
        different values required."""
        k0, k1 = np.uint32(5), np.uint32(6)
        cbd = np.asarray(tfry.v3k_cbd_values(k0, k1, 0, 8, 8, 8, 0.5))
        noise = np.asarray(tfry.v3k_values(k0, k1, 0, 8, 8, 8, 1))
        # both in {-1, 0, 1}; equality everywhere would mean shared bits
        assert not np.array_equal(cbd, noise)


class TestDataParallel:
    @pytest.mark.parametrize("shards,d", [(2, 8), (4, 8), (3, 10), (8, 8)])
    def test_bit_identical_v3k(self, shards, d):
        settings.noise_stream = "v3k"
        try:
            p, gpk, parties, key = _system()
            vec = np.array([[dd * 3 + r + 1 for r in range(p.n)]
                            for dd in range(d)], np.uint64)
            k5 = jax.random.fold_in(key, 5)
            ct_ref = encrypt_batch(vec, gpk, k5)
            ct = encrypt_batch_data_parallel(
                vec, gpk, k5, jax.devices()[:shards]).gather()
            np.testing.assert_array_equal(np.asarray(ct.c1.hi),
                                          np.asarray(ct_ref.c1.hi))
            np.testing.assert_array_equal(np.asarray(ct.c2.lo),
                                          np.asarray(ct_ref.c2.lo))
        finally:
            settings.reset()

    def test_roundtrip_default_stream(self):
        """Under the default stream the shards draw valid (deterministic,
        shard-layout-dependent) noise; decryption must still recover
        every scalar."""
        p, gpk, parties, key = _system()
        vec = np.array([[dd * 3 + r + 1 for r in range(p.n)]
                        for dd in range(p.n)], np.uint64)
        ct = encrypt_batch_data_parallel(
            vec, gpk, jax.random.fold_in(key, 5), jax.devices()[:4]
        ).gather()
        out = decrypt_party_shares(ct, parties[1].secret_key, 1)
        assert out == [int(vec[dd][1]) for dd in range(p.n)]

    def test_huge_bounds_refused(self):
        B = 1 << 40
        p, gpk, parties, key = _system(bounds=(B, B))
        if not p.verify_correctness_condition():
            pytest.skip("bounds too large for this toy chain")
        vec = np.ones((4, p.n), np.uint64)
        with pytest.raises(InvalidParameters, match="data-parallel"):
            encrypt_batch_data_parallel(vec, gpk,
                                        jax.random.fold_in(key, 5),
                                        jax.devices()[:2])

    def test_no_randomness_reuse_default_stream(self):
        """SECURITY pin (round-5 review finding): under non-v3k streams
        each shard must use an independent key — identical r across
        shards would make c2_a - c2_b = encode(m_a - m_b) + small noise,
        leaking message differences. With per-shard keys, the c1 blocks
        of two shards encrypting at the same LOCAL column must differ."""
        p, gpk, parties, key = _system()
        vec = np.array([[dd * 3 + r + 1 for r in range(p.n)]
                        for dd in range(8)], np.uint64)
        ct = encrypt_batch_data_parallel(
            vec, gpk, jax.random.fold_in(key, 5), jax.devices()[:2])
        s0, s1 = ct.shards[0], ct.shards[1]
        # c1 = A r + e1 per dealer column; same r would make the two
        # shards' c1 differ only by tiny noise — require full difference
        assert not np.array_equal(np.asarray(s0[0]), np.asarray(s1[0]))
        # and r-reuse specifically: c1 diffs should NOT decode as small
        # noise. Compare a residue column pair directly:
        c0 = np.asarray(s0[0])[..., 0].astype(np.int64)
        c1 = np.asarray(s1[0])[..., 0].astype(np.int64)
        q0 = int(p.ring.moduli[0]) >> 32
        # crude: the hi-words should differ in many positions (noise
        # alone could not move the hi word everywhere)
        assert (c0 != c1).mean() > 0.5

    def test_v3k_residue_window_falls_back_safely(self):
        """v3k with a bound outside the signed-digit range (residue
        fallback window): the exact contract cannot hold, so the backend
        must take per-shard keys (no reuse, no silent wrong 'identity')
        and still round-trip."""
        B = 40_000  # > 32639 signed-digit max, < min(q)
        p, gpk, parties, key = _system(bounds=(B, B))
        if not p.verify_correctness_condition():
            pytest.skip("bounds too large for this toy chain")
        settings.noise_stream = "v3k"
        try:
            vec = np.array([[dd + r + 1 for r in range(p.n)]
                            for dd in range(p.n)], np.uint64)
            k5 = jax.random.fold_in(key, 5)
            ct = encrypt_batch_data_parallel(
                vec, gpk, k5, jax.devices()[:2]).gather()
            ct_ref = encrypt_batch(vec, gpk, k5)
            # NOT bit-identical (exact contract out of range) ...
            assert not np.array_equal(np.asarray(ct.c2.lo),
                                      np.asarray(ct_ref.c2.lo))
            # ... but decrypts correctly
            out = decrypt_party_shares(ct, parties[0].secret_key, 0)
            assert out == [int(vec[dd][0]) for dd in range(p.n)]
        finally:
            settings.reset()
