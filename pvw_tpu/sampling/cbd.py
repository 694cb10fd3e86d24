"""Centered binomial sampling on device, counter-based and deterministic.

Distribution-equivalent rebuild of ``sample_vec_cbd``
(``/root/reference/src/sampling/uniform.rs:27-70``):

- variance 0.5: each coefficient is ``b1 - b2`` for two independent bits
  (support {-1, 0, 1}); the reference draws two ``next_u32() & 1``.
- integer variance v in [1, 16]: CBD(2v) — popcount of 2v random bits minus
  popcount of another 2v random bits (the reference's mask_add/mask_sub bit
  pool, ``uniform.rs:45-67``).

Unlike the reference — whose parallel paths draw from per-thread
``rand::thread_rng()`` and are therefore irreproducible (SURVEY.md §2.2) —
every sample here is derived from an explicit threefry key, so results are
bit-stable across runs, device counts and mesh shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import SamplingError


def _check_variance(variance: float) -> None:
    if not (0.5 <= float(variance) <= 16.0):
        # Reference error string: uniform.rs:33
        raise SamplingError("The variance should be between 0.5 and 16")


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1, 2))
def sample_vec_cbd(key: jax.Array, shape: tuple[int, ...], variance: float):
    """Return int32 array of ``shape`` with CBD(variance) samples.

    ``variance`` must be 0.5 (ternary) or effectively-integer in [1, 16]
    (the reference truncates ``variance as usize``, ``uniform.rs:47``).
    Jitted (static shape/variance): called eagerly it would dispatch each
    op through a separate remote compile on the tunnel backend.
    """
    _check_variance(variance)
    if abs(float(variance) - 0.5) < 1e-6:
        bits = jax.random.bits(key, shape + (2,), dtype=jnp.uint32) & 1
        return (bits[..., 0].astype(jnp.int32)) - (bits[..., 1].astype(jnp.int32))

    v = int(variance)  # truncation matches `variance as usize`
    two_v = 2 * v      # 4v bits total, 2v add + 2v sub
    words = jax.random.bits(key, shape + (2,), dtype=jnp.uint32)
    w0, w1 = words[..., 0], words[..., 1]
    if two_v <= 32:
        mask = np.uint32((1 << two_v) - 1) if two_v < 32 else np.uint32(0xFFFFFFFF)
        add_bits = w0 & mask
        # subtract half occupies the next 2v bits, possibly spanning w0/w1
        if 2 * two_v <= 32:
            sub_bits = (w0 >> two_v) & mask
            sub_hi = jnp.zeros_like(w1)
        else:
            low_avail = 32 - two_v
            sub_bits = w0 >> two_v
            sub_hi = w1 & np.uint32((1 << (two_v - low_avail)) - 1)
        add = jax.lax.population_count(add_bits)
        sub = jax.lax.population_count(sub_bits) + jax.lax.population_count(sub_hi)
        return add.astype(jnp.int32) - sub.astype(jnp.int32)
    raise SamplingError("The variance should be between 0.5 and 16")


def sample_vec_cbd_rows(key: jax.Array, row_offset, num_rows: int,
                        shape_tail: tuple[int, ...], variance: float):
    """Row-keyed CBD ("stream v2", see
    :func:`pvw_tpu.sampling.uniform.sample_uniform_residues_rows`): row i is
    drawn from ``fold_in(key, row_offset + i)`` so mesh shards can sample
    only their rows and still match the full-array call bit for bit."""
    _check_variance(variance)
    idx = jnp.asarray(row_offset) + jnp.arange(num_rows)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
    return jax.vmap(lambda k: sample_vec_cbd(k, tuple(shape_tail), variance))(keys)


def cbd_bound(variance: float) -> int:
    """Maximum |coefficient| for CBD(variance): 1 for var 0.5, else 2v
    (``secret_key.rs:226`` uses 2*variance as the validation bound)."""
    if abs(float(variance) - 0.5) < 1e-6:
        return 1
    return 2 * int(variance)
