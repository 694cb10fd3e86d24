"""Test-matrix corners from the reference's supported ranges.

- end-to-end round trip at l=32, the largest ring degree the reference
  supports (``parameters.rs:140-144``);
- round trips at k=1024/2048, the top of the reference's tested LWE
  dimension range (SURVEY.md: examples/tests use k = 256..2048);
- u64 scalars >= 2^63: pinned against the reference's ``as i64`` wrap
  semantics (``encryption.rs:195``) + the decode clamp
  (``decryption.rs:226-247``) — such scalars do NOT round-trip to
  themselves; the exact expected value is computed from the conventions.
"""

import numpy as np
import pytest

import jax

from pvw_tpu import (
    GlobalPublicKey, Party, PvwCrs, PvwParameters, PvwParametersBuilder,
    decrypt_party_value, encrypt,
)
from pvw_tpu.utils.intmath import center_mod, generate_ntt_primes


def _system(n, k, l, moduli, seed=0):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    params = (PvwParametersBuilder().set_parties(n).set_dimension(k)
              .set_l(l).set_moduli(moduli).set_secret_variance(0.5)
              .set_error_bounds_u32(b1, b2).build())
    key = jax.random.key(seed)
    crs = PvwCrs.new(params, jax.random.fold_in(key, 0))
    gpk = GlobalPublicKey(crs)
    parties = [Party.new(i, params, jax.random.fold_in(key, 100 + i))
               for i in range(n)]
    gpk.generate_all_party_keys(parties, jax.random.fold_in(key, 1))
    return params, gpk, parties, key


def test_l32_roundtrip():
    """Largest supported ring degree, end to end."""
    n, k, l = 3, 16, 32
    moduli = (0xFFFFC4001, 0x1FFFFE0001)   # both are 1 mod 64
    params, gpk, parties, key = _system(n, k, l, moduli)
    scalars = [123456789, 2**40 + 7, 0]
    ct = encrypt(scalars, gpk, jax.random.fold_in(key, 2))
    for i, party in enumerate(parties):
        assert decrypt_party_value(ct, party.secret_key, i) == scalars[i]


def _expected_wrapped(m: int, params) -> int:
    """What the reference decodes for a scalar encoded via `m as i64`
    (encryption.rs:195) assuming zero residual decode noise: the encoded
    value is m_signed = m - 2^64 for m >= 2^63, and the final clamp maps
    small negatives to 0, wraps large negatives mod q, and zeroes
    anything >= 2^64 (decryption.rs:226-247)."""
    q = params.q_total()
    m_signed = m - (1 << 64) if m >= 1 << 63 else m
    mf = center_mod(m_signed % q, q)
    if mf < 0:
        if -mf <= 1000:
            return 0
        pos = (mf + q) % q
        return pos if pos < 1 << 64 else 0
    return mf if mf < 1 << 64 else 0


def test_u64_wrap_scalar_semantics_big_q():
    """q > 2^64: the wrapped value q - 2^64 + m exceeds u64 -> decodes 0."""
    n, k, l = 3, 32, 8
    moduli = (0xFFFFC4001, 0x1FFFFE0001)   # q ~ 2^74
    params, gpk, parties, key = _system(n, k, l, moduli)
    m = (1 << 63) + 12345
    exp = _expected_wrapped(m, params)
    assert exp == 0  # the documented semantics for this chain
    ct = encrypt([m, 7, 9], gpk, jax.random.fold_in(key, 2))
    assert decrypt_party_value(ct, parties[0].secret_key, 0) == exp
    assert decrypt_party_value(ct, parties[1].secret_key, 1) == 7


def test_u64_wrap_scalar_semantics_small_q():
    """Single limb q < 2^62: the wrap lands back inside u64 and the exact
    value (m - 2^64) mod q must come out. (61-bit prime so Δ = q^(1/8)
    ≈ 2^7.6 comfortably exceeds the error bounds — a 36-bit single-limb
    chain has Δ = 22 and decodes with off-by-one rounding slack.)"""
    n, k, l = 3, 32, 8
    moduli = tuple(generate_ntt_primes(61, 1, 8))
    params, gpk, parties, key = _system(n, k, l, moduli, seed=3)
    m = (1 << 63) + 999983
    exp = _expected_wrapped(m, params)
    assert 0 < exp < 1 << 62
    ct = encrypt([m, 5, 6], gpk, jax.random.fold_in(key, 2))
    assert decrypt_party_value(ct, parties[0].secret_key, 0) == exp


def test_k1024_roundtrip():
    """Upper-middle of the reference's k range (pvw_valid_dec.rs uses
    k=1024); exercises the deep-contraction matmul path."""
    n, k, l = 2, 1024, 8
    moduli = tuple(generate_ntt_primes(55, 4, 8))
    params, gpk, parties, key = _system(n, k, l, moduli, seed=5)
    scalars = [31337, 2**50 + 1]
    ct = encrypt(scalars, gpk, jax.random.fold_in(key, 2))
    for i, party in enumerate(parties):
        assert decrypt_party_value(ct, party.secret_key, i) == scalars[i]


@pytest.mark.slow
def test_k2048_roundtrip():
    """Top of the reference's tested k range."""
    n, k, l = 2, 2048, 8
    moduli = tuple(generate_ntt_primes(55, 4, 8))
    params, gpk, parties, key = _system(n, k, l, moduli, seed=6)
    scalars = [42, 2**60]
    ct = encrypt(scalars, gpk, jax.random.fold_in(key, 2))
    for i, party in enumerate(parties):
        assert decrypt_party_value(ct, party.secret_key, i) == scalars[i]
