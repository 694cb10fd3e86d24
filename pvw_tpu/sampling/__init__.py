"""Sampling layer (mirrors ``/root/reference/src/sampling/mod.rs``)."""
from .cbd import sample_vec_cbd, cbd_bound
from .uniform import (
    sample_bounded_u64,
    sample_uniform_coefficients,
    sample_uniform_residues,
)
from .normal import (
    sample_discrete_gaussian_vec,
    sample_bigint_normal_vec,
    sample_bigint_normal_vec_u64,
    sample_bigint_normal_vec_bits,
    sample_bigint_normal_u64,
    sample_bigint_normal_bits,
    box_muller,
    TAIL_STDDEV_MULTIPLIER,
)

__all__ = [
    "sample_vec_cbd", "cbd_bound",
    "sample_bounded_u64", "sample_uniform_coefficients", "sample_uniform_residues",
    "sample_discrete_gaussian_vec", "sample_bigint_normal_vec",
    "sample_bigint_normal_vec_u64", "sample_bigint_normal_vec_bits",
    "sample_bigint_normal_u64", "sample_bigint_normal_bits",
    "box_muller", "TAIL_STDDEV_MULTIPLIER",
]
