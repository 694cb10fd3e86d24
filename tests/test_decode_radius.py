"""Property test: the PVW decoder recovers any message whose noise
polynomial stays within the scheme's decoding radius.

This is stronger than the end-to-end round trips (which only exercise
honestly-sampled noise): here we inject ADVERSARIAL synthetic noise
e(X) = e_0 + e_1 X + ... and check exact recovery for noise well inside
the radius, plus graceful (wrong-but-defined) behavior beyond it.

The decoder sees z = -(m·g(X) + e(X)) mod q, matching the decryption
convention plaintext = -(z_0 + e_0) (``decryption.rs:274``; SURVEY §2.4.5).
"""

import numpy as np
import pytest

from pvw_tpu import PvwParameters, PvwParametersBuilder
from pvw_tpu.crypto.decryption import decode_scalar_pvw_rns

MODULI = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)


def make_params(l=8):
    b1, b2 = PvwParameters.suggest_error_bounds(3, 4, l, MODULI, 0.5)
    return (PvwParametersBuilder().set_parties(3).set_dimension(4).set_l(l)
            .set_moduli(MODULI).set_secret_variance(0.5)
            .set_error_bounds_u32(b1, b2).build())


def encode_noisy(params, m: int, noise: list[int]) -> np.ndarray:
    q = params.q_total()
    g = params.gadget_vector()
    coeffs = [(-(m * g[i] + noise[i])) % q for i in range(params.l)]
    return params.ring.residues_from_int_coeffs(coeffs).astype(np.uint64)


@pytest.mark.parametrize("l", [8, 16])
def test_recovery_within_radius(l):
    params = make_params(l)
    rng = np.random.default_rng(l)
    # conservative radius: |e_i| << delta/2 guarantees each rounding step
    bound = max(1, params.delta() // 8)
    for _ in range(25):
        m = int(rng.integers(0, min(params.delta_power_l_minus_1(), 1 << 63)))
        noise = [int(rng.integers(-bound, bound + 1)) for _ in range(params.l)]
        res = encode_noisy(params, m, noise)
        assert decode_scalar_pvw_rns(res, params) == m, (m, noise)


def test_recovery_zero_noise_edge_messages():
    params = make_params()
    for m in (0, 1, 2**32 - 1, 2**63 - 1):
        res = encode_noisy(params, m, [0] * params.l)
        assert decode_scalar_pvw_rns(res, params) == m


def test_graceful_beyond_radius():
    """Far outside the radius the decode returns SOME u64 (possibly the
    clamp's 0) without crashing — matching the reference's behavior of
    failed decryptions (tests/crypto.rs only demands >=95% success)."""
    params = make_params()
    rng = np.random.default_rng(99)
    huge = params.delta() * 4
    for _ in range(5):
        m = int(rng.integers(0, 1 << 40))
        noise = [int(rng.integers(-huge, huge)) for _ in range(params.l)]
        res = encode_noisy(params, m, noise)
        v = decode_scalar_pvw_rns(res, params)
        assert isinstance(v, int) and 0 <= v < 1 << 64


def test_native_agrees_on_radius_sweep():
    """The native decoder must agree with the Python oracle across the
    whole radius sweep including boundary noise magnitudes."""
    from pvw_tpu.utils.native_decode import decode_batch_native, _lib

    if _lib() is None:
        pytest.skip("native decode unavailable")
    params = make_params()
    rng = np.random.default_rng(7)
    rows, expected = [], []
    for mag_exp in range(0, 30, 3):
        bound = 2**mag_exp
        m = int(rng.integers(0, 1 << 50))
        noise = [int(rng.integers(-bound, bound + 1)) for _ in range(params.l)]
        rows.append(encode_noisy(params, m, noise))
    res = np.stack(rows)
    native = decode_batch_native(res, params)
    python = [decode_scalar_pvw_rns(res[i], params) for i in range(len(rows))]
    assert native == python
