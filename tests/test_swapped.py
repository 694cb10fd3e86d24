"""Exactness pins for the round-4 experimental kernels (interpret mode):

- the SWAPPED-operand fused matmul (Shoup scales on the cached lhs,
  plain-digit rhs — DESIGN.md §5f; opt-in via settings.swapped_form,
  measured ~5% slower end-to-end at the headline, kept as a measured
  branch);
- the fused NTT+prescale kernel (ntt_prescale_band — routed by DEFAULT
  as the r-stage engine on deep chains, nd >= 8, in both encrypt paths
  since round 4: measured 0.78-0.89x the XLA pipeline there, 1.18-1.26x
  at nd=5; settings.fused_prescale routes, BASELINE.md r-stage rows).

Both must stay bit-identical to the production banded/XLA paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pvw_tpu.ops import modmat, ntt as ntt_ops, u64 as u64op
from pvw_tpu.ops.pallas_modmat import (
    matmul_fold_scaled, matmul_fold_swapped, ntt_prescale_band,
)
from pvw_tpu.params.ring import get_ring

CHAINS = [
    ((0xFFFFC4001, 0x1FFFFE0001), 5),                      # 37-bit, nd=5
    ((0x80000000080001, 0x80000000130001), 8),             # 55-bit, nd=8
]


@pytest.mark.parametrize("moduli,nd", CHAINS)
def test_swapped_matmul_bit_identical(moduli, nd):
    ring = get_ring(moduli, 8)
    assert ring.num_digits == nd
    L, l, m, k, d = ring.num_limbs, 8, 16, 8, 128
    rng = np.random.default_rng(3)
    qcol = np.array(moduli, np.uint64).reshape(L, 1, 1, 1)
    A = rng.integers(0, 1 << 62, (L, l, m, k), np.uint64) % qcol
    R = rng.integers(0, 1 << 62, (L, l, k, d), np.uint64) % qcol
    Ah, Al = map(jnp.asarray, u64op.split_u64_np(A))
    Rh, Rl = map(jnp.asarray, u64op.split_u64_np(R))
    A_can = (jnp.transpose(Ah, (2, 3, 0, 1)), jnp.transpose(Al, (2, 3, 0, 1)))
    a_dig = modmat.lhs_digit_planes(*A_can, ring)
    r_band = modmat.prescale_digits_band((Rh, Rl), ring)
    ref = matmul_fold_scaled(None, r_band, ring, lhs_dig=a_dig)

    planes = modmat.lhs_scaled_planes(*A_can, ring)
    rd = modmat.rhs_digit_cols((Rh, Rl), ring)
    got = matmul_fold_swapped(planes, rd, ring, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))

    # with input noise planes (the v3 path)
    noise = jnp.asarray(rng.integers(-100, 101, (l, m, d), np.int64),
                        jnp.int8)
    ref_n = matmul_fold_scaled(None, r_band, ring, lhs_dig=a_dig,
                               noise=noise, noise_bound=100)
    got_n = matmul_fold_swapped(planes, rd, ring, noise=noise,
                                noise_bound=100, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_n[0]), np.asarray(got_n[0]))
    np.testing.assert_array_equal(np.asarray(ref_n[1]), np.asarray(got_n[1]))


@pytest.mark.parametrize("moduli,bound", [
    ((0xFFFFC4001, 0x1FFFFE0001), 1),
    ((0xFFFFC4001, 0x1FFFFE0001), 200),
    ((0x80000000080001, 0x80000000130001,
      0x80000000190001, 0x800000001D0001), 1),
])
def test_ntt_prescale_band_bit_identical(moduli, bound):
    ring = get_ring(moduli, 8)
    k, d = 16, 128
    rng = np.random.default_rng(5)
    rc = jnp.asarray(rng.integers(-bound, bound + 1, (k, d, 8), np.int64),
                     jnp.int32)
    ref = modmat.prescale_digits_band(
        ntt_ops.ntt_forward_signed_ch(rc, ring, bound), ring)
    got = ntt_prescale_band(rc, ring, bound, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_swapped_routing_off_by_default():
    from pvw_tpu.crypto.encryption import _swapped_form_ok
    from pvw_tpu.params.parameters import PvwParameters

    p = PvwParameters(8, 8, 8, (0xFFFFC4001, 0x1FFFFE0001), 0.5, 100, 200)
    assert _swapped_form_ok(p, 8192) is False
