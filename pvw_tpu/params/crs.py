"""Common Reference String: the k x k uniform matrix over R_q.

Rebuild of ``/root/reference/src/params/crs.rs``. The matrix is ONE device
tensor (a :class:`~pvw_tpu.poly.Poly` of batch shape (k, k)) rather than an
``Array2<Poly>``; the matrix-vector products used by keygen and encryption
(``crs.rs:138-205``) are single batched digit-matmuls on the MXU.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import jax

from ..errors import (
    CrsError, DimensionMismatch, IndexOutOfBounds, InvalidParameters,
)
from ..ops import modmat
from ..poly import Poly, Representation
from ..utils.chacha import ChaCha8Rng, uniform_residues_from_seeds
from ..utils.siphash import tag_seed
from .parameters import PvwParameters


class PvwCrs:
    """k x k CRS matrix A in NTT representation (``crs.rs:12-17``)."""

    def __init__(self, matrix: Poly, params: PvwParameters) -> None:
        self.matrix = matrix
        self.params = params

    # -- constructors ---------------------------------------------------

    @classmethod
    def new(cls, params: PvwParameters, key: jax.Array) -> "PvwCrs":
        """Random CRS from a device PRNG key (``crs.rs:24-39``)."""
        matrix = Poly.random(
            params.ring, Representation.Ntt, key, batch=(params.k, params.k)
        )
        return cls(matrix, params)

    @classmethod
    def new_deterministic(cls, params: PvwParameters, seed: bytes) -> "PvwCrs":
        """Deterministic CRS from a 32-byte master seed (``crs.rs:45-67``):
        a ChaCha8 master stream yields one 32-byte seed per matrix element
        (row-major), each expanded to uniform residues. Reproducible across
        hosts, devices and mesh shapes."""
        if len(seed) != 32:
            # Python-only failure mode: the reference takes [u8; 32] at the
            # type level (crs.rs:45), so this cannot occur there — surfaced
            # as the CRS-specific variant (errors.rs:29-30)
            raise CrsError(f"seed must be 32 bytes, got {len(seed)}")
        k = params.k
        master = ChaCha8Rng(seed)
        n_elems = k * k
        seeds = np.frombuffer(master.next_bytes(32 * n_elems), np.uint8)
        seeds = seeds.reshape(n_elems, 32)
        vals = uniform_residues_from_seeds(
            seeds, params.ring.moduli, params.ring.degree
        ).reshape(k, k, params.ring.num_limbs, params.ring.degree)
        matrix = Poly.from_residues_np(vals, params.ring, Representation.Ntt)
        return cls(matrix, params)

    @classmethod
    def new_from_tag(cls, params: PvwParameters, tag: str) -> "PvwCrs":
        """Deterministic CRS from a string tag (``crs.rs:74-90``): seed =
        SipHash-1-3(tag + "CRS") cycled to 32 bytes. The reference flags
        this derivation as weak (TODO at ``crs.rs:73``); reproduced for
        compatibility — prefer ``new_deterministic`` with a real seed."""
        return cls.new_deterministic(params, tag_seed(tag))

    # -- accessors ------------------------------------------------------

    def get(self, i: int, j: int) -> Optional[Poly]:
        """Element (i, j) (``crs.rs:93-95``)."""
        if not (0 <= i < self.params.k and 0 <= j < self.params.k):
            return None
        return self.matrix[i, j]

    def set_element(self, i: int, j: int, poly: Poly) -> None:
        """Replace element (i, j) — functional-update analogue of
        ``get_mut`` (``crs.rs:98-100``); JAX arrays are immutable so the
        matrix tensor is rebuilt."""
        if not (0 <= i < self.params.k and 0 <= j < self.params.k):
            raise InvalidParameters(f"index ({i}, {j}) out of bounds")
        if poly.ring != self.params.ring:
            raise InvalidParameters("CRS polynomial context mismatch")
        self.matrix = Poly(
            self.matrix.hi.at[i, j].set(poly.to_ntt().hi),
            self.matrix.lo.at[i, j].set(poly.to_ntt().lo),
            Representation.Ntt,
            self.params.ring,
        )

    def dimensions(self) -> tuple[int, int]:
        return (self.params.k, self.params.k)

    def __len__(self) -> int:
        return self.params.k * self.params.k

    def is_empty(self) -> bool:
        return self.params.k == 0

    def __iter__(self) -> Iterator[Poly]:
        for i in range(self.params.k):
            for j in range(self.params.k):
                yield self.matrix[i, j]

    def validate(self) -> None:
        """``crs.rs:108-132``."""
        shape = self.matrix.batch_shape
        if shape != (self.params.k, self.params.k):
            raise InvalidParameters(
                f"CRS matrix dimensions {shape[0]}×{shape[1]} don't match "
                f"parameter k={self.params.k}"
            )
        if self.matrix.ring != self.params.ring:
            raise InvalidParameters("CRS polynomial context mismatch")
        if self.matrix.rep != Representation.Ntt:
            raise InvalidParameters("CRS polynomial not in NTT representation")

    # -- products -------------------------------------------------------

    def _check_matrix_extent(self) -> None:
        """Both matvec products access every element of a k×k matrix; a
        smaller stored matrix (e.g. hand-built) is the dense-tensor
        analogue of the reference's per-element ``get(i, j)`` returning
        ``None`` mid-multiply (``crs.rs:158-161, 192-195``) — raised as
        the same structured variant."""
        shape = self.matrix.batch_shape
        for extent in shape[:2]:
            if extent < self.params.k:
                raise IndexOutOfBounds(extent, self.params.k)

    def multiply_by_secret_key(self, secret_key) -> Poly:
        """s^T A: result[i] = Σ_j sk[j] · A[j][i] (``crs.rs:138-171``).

        One [1, k] x [k, k] digit-matmul over all (limb, slot) channels —
        the reference's k² on-demand NTT'd poly multiplies collapse into a
        single MXU contraction."""
        sk_polys = secret_key.to_polynomials()  # Poly batch (k,) in NTT
        if sk_polys.batch_shape[0] != self.params.k:
            raise InvalidParameters(
                f"Secret key length {sk_polys.batch_shape[0]} doesn't match "
                f"CRS dimension k={self.params.k}"
            )
        self._check_matrix_extent()
        lhs = (sk_polys.hi[None], sk_polys.lo[None])      # [1, k, L, l]
        hi, lo = modmat.poly_matmul(lhs, self.matrix.pair, self.params.ring)
        return Poly(hi[0], lo[0], Representation.Ntt, self.params.ring)

    def multiply_by_randomness(self, randomness: Poly) -> Poly:
        """A·r: result[i] = Σ_j A[i][j] · r[j] (``crs.rs:177-205``).

        ``randomness``: Poly batch (k,) or (k, d) for d stacked encryptions
        (the TPU-native batch axis; d > 1 turns the matvec into a
        MXU-efficient matmul)."""
        shape = randomness.batch_shape
        if shape[0] != self.params.k:
            raise DimensionMismatch(self.params.k, shape[0])
        self._check_matrix_extent()
        squeeze = len(shape) == 1
        rh, rl = randomness.pair
        if squeeze:
            rh, rl = rh[:, None], rl[:, None]
        hi, lo = modmat.poly_matmul(self.matrix.pair, (rh, rl), self.params.ring)
        if squeeze:
            hi, lo = hi[:, 0], lo[:, 0]
        return Poly(hi, lo, Representation.Ntt, self.params.ring)

    def __repr__(self) -> str:
        return f"PvwCrs(k={self.params.k}, ring={self.params.ring})"

    def to_bytes(self) -> bytes:
        from ..utils.serialization import crs_to_bytes
        return crs_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PvwCrs":
        from ..utils.serialization import crs_from_bytes
        return crs_from_bytes(data)
