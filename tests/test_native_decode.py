"""Differential tests: native C++ decoder vs the exact Python oracle.

The Python transcription of ``decode_scalar_pvw_rns`` is the source of
truth (itself pinned against the reference's conventions in
tests/test_crypto.py); the native engine must agree bit-for-bit on random
residues (not just well-formed ciphertexts — adversarial inputs exercise
the clamp/centering edges)."""

import numpy as np
import pytest

from pvw_tpu import PvwParameters, PvwParametersBuilder
from pvw_tpu.crypto.decryption import decode_scalar_pvw_rns
from pvw_tpu.utils.native_decode import decode_batch_native, _lib

MODULI3 = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)
MODULI55 = (0x800000022A0001, 0x800000021A0001,
            0x80000002120001, 0x80000001F60001)


def make_params(n=3, k=4, l=8, moduli=MODULI3):
    b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, 0.5)
    return (PvwParametersBuilder().set_parties(n).set_dimension(k).set_l(l)
            .set_moduli(moduli).set_secret_variance(0.5)
            .set_error_bounds_u32(b1, b2).build())


needs_native = pytest.mark.skipif(_lib() is None,
                                  reason="native decode lib unavailable")


@needs_native
@pytest.mark.parametrize("moduli,l", [(MODULI3, 8), (MODULI3, 16),
                                      (MODULI55, 8), (MODULI3, 32)])
def test_native_matches_python_on_random_residues(moduli, l):
    p = make_params(l=l, moduli=moduli)
    rng = np.random.default_rng(hash((moduli, l)) & 0xFFFF)
    d = 64
    qs = np.array(moduli, np.uint64).reshape(1, -1, 1)
    res = (rng.integers(0, 1 << 62, size=(d, len(moduli), l), dtype=np.uint64)
           % qs)
    native = decode_batch_native(res, p)
    assert native is not None
    python = [decode_scalar_pvw_rns(res[i], p) for i in range(d)]
    assert native == python


@needs_native
def test_native_matches_python_on_structured_inputs(moduli=MODULI3):
    """Encodings of actual messages + tiny noise: the decode must recover
    the message and agree with Python in every case."""
    p = make_params()
    q = p.q_total()
    d_vals = [0, 1, 42, 1000, 123456789, p.delta_power_l_minus_1() - 1]
    rows = []
    for m in d_vals:
        # z = -(m*g) mod q  (decrypt computes -(message+noise))
        coeffs = [(-m * g) % q for g in p.gadget_vector()]
        res = p.ring.residues_from_int_coeffs(coeffs)
        rows.append(res)
    res = np.stack(rows).astype(np.uint64)
    native = decode_batch_native(res, p)
    python = [decode_scalar_pvw_rns(res[i], p) for i in range(len(rows))]
    assert native == python
    # noiseless decode recovers the message exactly for u64-range values;
    # values >= 2^64 hit the reference's to_u64().unwrap_or(0) convention
    for m, got in zip(d_vals, python):
        if m < min(p.delta_power_l_minus_1(), 1 << 64):
            assert got == m
        elif m >= 1 << 64:
            assert got == 0


@needs_native
def test_native_edge_values():
    p = make_params()
    L, l = p.ring.num_limbs, p.l
    rows = [
        np.zeros((L, l), np.uint64),                                  # all 0
        np.array([[q - 1] * l for q in p.ring.moduli], np.uint64),    # q-1
        np.array([[1] + [0] * (l - 1) for _ in p.ring.moduli], np.uint64),
        np.array([[500] + [0] * (l - 1) for _ in p.ring.moduli], np.uint64),
        np.array([[1001] + [0] * (l - 1) for _ in p.ring.moduli], np.uint64),
    ]
    res = np.stack(rows)
    native = decode_batch_native(res, p)
    python = [decode_scalar_pvw_rns(res[i], p) for i in range(len(rows))]
    assert native == python


@needs_native
def test_native_deep_chain_boundaries():
    """Support boundary for the native engine: big q is fine (MAX_NW=18)
    as long as delta < 2^63. The 1024-bit l=8 preset has delta ~ 2^129 ->
    clean Python fallback; the same chain at l=32 has delta ~ 2^32 ->
    native, differential-tested."""
    from pvw_tpu.utils.intmath import generate_ntt_primes

    # l=8: delta = q^(1/8) ~ 2^129 >= 2^63 -> fallback (returns None)
    moduli8 = generate_ntt_primes(61, 17, 8)
    p8 = make_params(moduli=moduli8)
    res8 = np.zeros((2, 17, 8), np.uint64)
    assert decode_batch_native(res8, p8) is None

    # l=32: delta ~ 2^32 < 2^63 -> native path on a 1037-bit q
    moduli32 = generate_ntt_primes(61, 17, 32)
    p32 = make_params(l=32, moduli=moduli32)
    rng = np.random.default_rng(17)
    qs = np.array(moduli32, np.uint64).reshape(1, -1, 1)
    res = (rng.integers(0, 1 << 62, size=(8, 17, 32), dtype=np.uint64) % qs)
    native = decode_batch_native(res, p32)
    assert native is not None, "17-limb l=32 chain should be native"
    python = [decode_scalar_pvw_rns(res[i], p32) for i in range(8)]
    assert native == python
