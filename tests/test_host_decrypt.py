"""Differential tests for the native host decrypt path (adaptive routing).

The full host path — C++ contraction + inverse NTT + sequential-rounding
decode (``native/pvw_decode.cpp pvw_decrypt_decode_batch``) — must be
bit-identical to the device stage + Python decode oracle on ARBITRARY
residues, not just well-formed ciphertexts (``decryption.rs:249-278``).
"""

import os

import numpy as np
import jax
import pytest

from pvw_tpu.config import settings
from pvw_tpu.crypto import decryption as dec
from pvw_tpu.keys.secret_key import SecretKey
from pvw_tpu.ops import u64 as u64op
from pvw_tpu.params.parameters import PvwParameters, PvwParametersBuilder
from pvw_tpu.utils import native_decode

pytestmark = pytest.mark.skipif(
    settings.no_native or native_decode._lib() is None,
    reason="native decode engine unavailable",
)


def _params(n, k, l, moduli):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    return (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
            .set_moduli(moduli).set_secret_variance(0.5)
            .set_error_bounds_u32(b1, b2).build())


def _rand_operands(params, d, seed):
    rng = np.random.default_rng(seed)
    L, l, k = params.ring.num_limbs, params.l, params.k
    qs = np.array(params.ring.moduli, np.uint64).reshape(1, 1, L, 1)
    c1 = (rng.integers(0, 1 << 63, (k, d, L, l), np.uint64) % qs)
    c2 = (rng.integers(0, 1 << 63, (d, L, l), np.uint64) % qs[0])
    return c1.astype(np.uint64), c2.astype(np.uint64)


CONFIGS = [
    (8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001)),
    # the reference's 4 x 55-bit chain (examples/pvw_valid_dec.rs:40-45)
    (5, 64, 8, (0x80000000080001, 0x80000000130001,
                0x80000000190001, 0x800000001d0001)),
    (4, 16, 16, (0xFFFFC4001, 0x1FFFFE0001, 0xFFFFEE001)),
]


@pytest.mark.parametrize("n,k,l,moduli", CONFIGS)
def test_host_decrypt_matches_oracle(n, k, l, moduli):
    """Host C++ path vs device contraction + Python decode on random
    residues (covers the lazy-reduction contraction, the C++ inverse NTT,
    and the decode conventions in one shot)."""
    params = _params(n, k, l, moduli)
    if not native_decode.decrypt_decode_supported(params):
        pytest.skip("config outside native engine support")
    sk = SecretKey.random(params, jax.random.key(42))
    d = 5
    c1, c2 = _rand_operands(params, d, seed=1)
    c1h, c1l = u64op.split_u64_np(c1)
    c2h, c2l = u64op.split_u64_np(c2)

    got = dec._host_decrypt(params, sk, c1h, c1l, c2h, c2l)

    skp = sk.to_polynomials()
    z = np.asarray(dec._noisy_message_kernel(
        params, skp.hi, skp.lo, *map(np.asarray, (c1h, c1l, c2h, c2l))))
    residues = u64op.join_u64_np(z[0], z[1])
    want = [dec.decode_scalar_pvw_rns(residues[i], params) for i in range(d)]
    assert got == want


def test_host_decrypt_noncontiguous_inputs():
    """np.asarray of accelerator arrays can carry non-C-contiguous
    strides; the ctypes bridge must not hand C++ the base buffer in the
    wrong element order (TPU regression, round 3)."""
    params = _params(8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001))
    if not native_decode.decrypt_decode_supported(params):
        pytest.skip("native engine unavailable")
    sk = SecretKey.random(params, jax.random.key(2))
    d = 3
    c1, c2 = _rand_operands(params, d, seed=9)
    c1h, c1l = u64op.split_u64_np(c1)
    c2h, c2l = u64op.split_u64_np(c2)
    want = dec._host_decrypt(params, sk, c1h, c1l, c2h, c2l)

    def scramble(a):
        # a transposed copy re-transposed: same values, F-order strides
        return np.asfortranarray(a)

    got = dec._host_decrypt(params, sk, scramble(c1h), scramble(c1l),
                            scramble(c2h), scramble(c2l))
    assert got == want
    # and a non-contiguous secret-key cache
    sk._host_ntt_cache = scramble(sk.host_ntt_residues())
    from pvw_tpu.utils.native_decode import decrypt_decode_pairs_native

    got2 = decrypt_decode_pairs_native(
        sk._host_ntt_cache, c1h, c1l, c2h, c2l, params)
    assert got2 == want


def test_adaptive_routing_thresholds():
    params = _params(8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001))
    assert dec._decode_mode(params, d=1) == "host"
    assert dec._decode_mode(params, d=dec._host_crossover() - 1) == "host"
    assert dec._decode_mode(params, d=dec._host_crossover()) == "device"
    # no batch hint -> device (large-batch default)
    assert dec._decode_mode(params) == "device"
    # explicit override wins
    os.environ["PVW_TPU_DECODE"] = "device"
    try:
        assert dec._decode_mode(params, d=1) == "device"
    finally:
        del os.environ["PVW_TPU_DECODE"]


def test_routing_falls_back_without_native(monkeypatch):
    params = _params(8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001))
    monkeypatch.setenv("PVW_TPU_NO_NATIVE", "1")
    assert dec._decode_mode(params, d=1) in ("device", "native")
    monkeypatch.delenv("PVW_TPU_NO_NATIVE")
    # explicit host on an unsupported set degrades gracefully
    monkeypatch.setattr(native_decode, "decrypt_decode_supported",
                        lambda p: False)
    monkeypatch.setenv("PVW_TPU_DECODE", "host")
    assert dec._decode_mode(params, d=1) in ("device", "native")


def test_threshold_routes_to_host_for_small_subsets():
    """decrypt_valid_shares with a small valid subset takes the host
    route by default and must agree with the device route."""
    from pvw_tpu import GlobalPublicKey, Party, PvwCrs
    from pvw_tpu.crypto.encryption import encrypt_all_party_shares_batched
    from pvw_tpu.crypto.threshold import decrypt_valid_shares

    params = _params(8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001))
    key = jax.random.key(11)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(params.n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    vectors = np.array(
        [[dd * 10 + r + 1 for r in range(params.n)]
         for dd in range(params.n)], np.uint64)
    ct = encrypt_all_party_shares_batched(vectors, gpk,
                                          jax.random.fold_in(key, 6))
    valid = [1, 3, 5]
    assert dec._decode_mode(params, len(valid)) == "host"
    got = decrypt_valid_shares(ct, valid, 2, parties[0].secret_key, 0)
    os.environ["PVW_TPU_DECODE"] = "device"
    try:
        want = decrypt_valid_shares(ct, valid, 2, parties[0].secret_key, 0)
    finally:
        del os.environ["PVW_TPU_DECODE"]
    assert got == want == [(i, int(vectors[i][0])) for i in valid]


def test_host_decrypt_roundtrip_end_to_end():
    """Full encrypt -> host decrypt round trip through the public API
    (the d=1 route a latency-sensitive caller takes by default)."""
    from pvw_tpu import GlobalPublicKey, Party, PvwCrs
    from pvw_tpu.crypto.encryption import encrypt

    params = _params(8, 32, 8, (0xFFFFC4001, 0x1FFFFE0001))
    key = jax.random.key(3)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(params.n)]
    gpk = GlobalPublicKey(crs)
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    msgs = np.arange(1, params.n + 1, dtype=np.uint64) * 7919
    ct = encrypt(msgs, gpk, jax.random.fold_in(key, 5))
    assert dec._decode_mode(params, 1) == "host"
    for i in range(params.n):
        assert dec.decrypt_party_value(
            ct, parties[i].secret_key, i) == int(msgs[i])
