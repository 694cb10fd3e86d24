"""PVW secret keys: k x l CBD coefficient matrix, polys built on demand.

Rebuild of ``/root/reference/src/keys/secret_key.rs``. Coefficients live in
a host numpy int32 array (k, l) so they can be zeroized in place
(``secret_key.rs:20-30``); NTT polynomials are materialized as ONE batched
device tensor when crypto ops need them — and cached, fixing the
reference's quirk of re-NTT'ing the key k times per keygen
(``secret_key.rs:98-112``, noted in SURVEY.md §3.2). ``zeroize`` drops the
cache. Device copies cannot be scrubbed from HBM — documented limitation
(SURVEY.md §5, race-detection/sanitizers row).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from functools import partial

import jax.numpy as jnp

from ..errors import InvalidParameters, SamplingError
from ..params.parameters import PvwParameters
from ..params.ring import RingPlan
from ..poly import Poly, Representation
from ..sampling.cbd import sample_vec_cbd


@partial(jax.jit, static_argnums=(0,))
def _sk_ntt_jit(ring: RingPlan, coeffs):
    p = Poly.from_coefficients(coeffs, ring).to_ntt()
    return p.hi, p.lo


class SecretKey:
    """``SecretKey`` (``secret_key.rs:14-18``)."""

    def __init__(self, params: PvwParameters, secret_coeffs: np.ndarray) -> None:
        self.params = params
        # Own, writeable copy: zeroize() must be able to scrub in place
        # (np views of jax buffers are read-only).
        self.secret_coeffs = np.array(secret_coeffs, np.int32, copy=True)
        self._poly_cache: Optional[Poly] = None
        self._host_ntt_cache: Optional[np.ndarray] = None

    # -- construction ----------------------------------------------------

    @classmethod
    def random(cls, params: PvwParameters, key: jax.Array) -> "SecretKey":
        """CBD(secret_variance) sampling of the k x l matrix
        (``secret_key.rs:45-63``), deterministic in ``key``."""
        try:
            coeffs = sample_vec_cbd(key, (params.k, params.l), params.secret_variance)
        except SamplingError as e:
            raise SamplingError(f"CBD sampling failed: {e.msg}") from e
        return cls(params, np.asarray(coeffs, np.int32))

    @classmethod
    def from_coefficients(cls, params: PvwParameters, coefficients) -> "SecretKey":
        """``secret_key.rs:258-269`` — validates structure."""
        sk = cls(params, np.asarray(coefficients, np.int32))
        sk.validate()
        return sk

    # -- polynomials ------------------------------------------------------

    def to_polynomials(self) -> Poly:
        """All k polynomials as one NTT-rep Poly batch (k,)
        (``secret_key.rs:72-85``). One jitted program (the eager
        from_coefficients -> NTT chain cost seconds of per-op dispatch on
        the tunnel backend); cached per key."""
        if self._poly_cache is None:
            hi, lo = _sk_ntt_jit(self.params.ring,
                                 jnp.asarray(self.secret_coeffs))
            self._poly_cache = Poly(hi, lo, Representation.Ntt,
                                    self.params.ring)
        return self._poly_cache

    def host_ntt_residues(self) -> np.ndarray:
        """uint64 [k, L, l] NTT-domain residues, host-resident and cached
        — the secret-key operand of the native host decrypt path
        (:func:`pvw_tpu.utils.native_decode.decrypt_decode_pairs_native`)."""
        if self._host_ntt_cache is None:
            self._host_ntt_cache = np.ascontiguousarray(
                self.to_polynomials().residues_np())
        return self._host_ntt_cache

    def get_polynomial(self, index: int) -> Poly:
        """Single NTT polynomial (``secret_key.rs:98-112``)."""
        if index >= len(self.secret_coeffs):
            raise InvalidParameters(
                f"Index {index} out of bounds for {len(self.secret_coeffs)} polynomials"
            )
        return self.to_polynomials()[index]

    def as_poly_vector(self) -> Poly:
        """Legacy alias (``secret_key.rs:173-175``)."""
        return self.to_polynomials()

    # -- coefficient access ----------------------------------------------

    def coefficients(self) -> np.ndarray:
        """k x l int32 view (``secret_key.rs:122-124``)."""
        return self.secret_coeffs

    def coefficients_mut(self) -> np.ndarray:
        """Mutable access — invalidates the poly cache
        (``secret_key.rs:133-135``)."""
        self._poly_cache = None
        self._host_ntt_cache = None
        return self.secret_coeffs

    def get_coefficients(self, index: int) -> Optional[np.ndarray]:
        if 0 <= index < len(self.secret_coeffs):
            return self.secret_coeffs[index]
        return None

    def get_coefficients_mut(self, index: int) -> Optional[np.ndarray]:
        if 0 <= index < len(self.secret_coeffs):
            self._poly_cache = None
            self._host_ntt_cache = None
            return self.secret_coeffs[index]
        return None

    def to_coefficient_matrix(self) -> np.ndarray:
        """Legacy (``secret_key.rs:160-162``)."""
        return self.secret_coeffs.copy()

    def as_matrix(self) -> np.ndarray:
        return self.to_coefficient_matrix()

    def as_matrix_mut(self) -> np.ndarray:
        return self.to_coefficient_matrix()

    # -- structure --------------------------------------------------------

    def __len__(self) -> int:
        return len(self.secret_coeffs)

    def is_empty(self) -> bool:
        return len(self.secret_coeffs) == 0

    def validate(self) -> None:
        """``secret_key.rs:194-216``."""
        if len(self.secret_coeffs) != self.params.k:
            raise InvalidParameters(
                f"Secret key has {len(self.secret_coeffs)} polynomials "
                f"but k={self.params.k}"
            )
        if self.secret_coeffs.ndim != 2 or self.secret_coeffs.shape[1] != self.params.l:
            raise InvalidParameters(
                f"Secret key polynomial has {self.secret_coeffs.shape[-1] if self.secret_coeffs.ndim == 2 else '?'} "
                f"coefficients but l={self.params.l}"
            )

    def validate_coefficient_bounds(self) -> None:
        """``secret_key.rs:225-245``. Quirk preserved: the reference
        computes ``2 * (variance as i64)`` — the cast binds before the
        multiply, so variance 0.5 yields bound 0 and any nonzero
        coefficient fails."""
        max_bound = 2 * int(self.params.secret_variance)
        bad = np.abs(self.secret_coeffs) > max_bound
        if np.any(bad):
            pi, ci = map(int, np.argwhere(bad)[0])
            c = int(self.secret_coeffs[pi, ci])
            raise InvalidParameters(
                f"Coefficient at polynomial {pi} index {ci} is {c} but should "
                f"be in [-{max_bound}, {max_bound}] for variance "
                f"{self.params.secret_variance}"
            )

    def coefficient_stats(self) -> tuple[int, int, float]:
        """(min, max, mean) (``secret_key.rs:278-291``)."""
        if self.secret_coeffs.size == 0:
            return (0, 0, 0.0)
        return (
            int(self.secret_coeffs.min()),
            int(self.secret_coeffs.max()),
            float(self.secret_coeffs.mean()),
        )

    # -- hygiene ----------------------------------------------------------

    def zeroize(self) -> None:
        """Best-effort secret scrubbing (``secret_key.rs:20-30``): zeroes
        the host coefficient array in place and drops the device poly cache
        (device HBM cannot be scrubbed — documented limitation)."""
        self.secret_coeffs[...] = 0
        self.secret_coeffs = np.zeros((0, self.params.l), np.int32)
        self._poly_cache = None
        self._host_ntt_cache = None

    def __repr__(self) -> str:
        return f"SecretKey(k={self.params.k}, l={self.params.l})"

    def to_bytes(self) -> bytes:
        from ..utils.serialization import secret_key_to_bytes
        return secret_key_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SecretKey":
        from ..utils.serialization import secret_key_from_bytes
        return secret_key_from_bytes(data)
