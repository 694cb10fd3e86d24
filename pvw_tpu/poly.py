"""User-facing polynomial tensor over R_q.

API-parity analogue of fhe-math's ``rq::Poly`` as consumed by the reference
(SURVEY.md §2.3): representation tags (PowerBasis/Ntt), ``zero``,
``random``, ``random_from_seed``, ``from_coefficients``, ring operators
``+ - *``, CRT lift to Python ints, and byte serialization — but with one
decisive design change: a ``Poly`` holds an arbitrary LEADING BATCH of
polynomials as a dense ``uint32 [..., 2, L, l]``-equivalent pair of arrays.
A CRS is a single ``Poly`` of batch shape (k, k); a ciphertext's c2 is one
of batch shape (n,). There is no per-element object graph to traverse —
every ring operation maps onto the batched kernels in ``pvw_tpu.ops``.
"""

from __future__ import annotations

from enum import Enum

import numpy as np
import jax
import jax.numpy as jnp

from .errors import ContextError, PolynomialError
from .ops import modmat, ntt as ntt_ops, u64 as u64op
from .params.ring import RingPlan
from .utils.chacha import uniform_residues_from_seeds


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0, 1))
def _random_residues_jit(ring: RingPlan, batch: tuple, key: jax.Array):
    """Uniform residues [*batch, L, l] as one compiled program — eager
    per-op dispatch compiled ~30 tiny kernels over the remote tunnel and
    took ~90 s cold at the CRS shape; this is one compile of ~1 s."""
    from .sampling.uniform import sample_bounded_u64

    shape = tuple(batch) + (ring.degree,)
    his, los = [], []
    for i, q in enumerate(ring.moduli):
        vh, vl = sample_bounded_u64(jax.random.fold_in(key, i), shape, q)
        his.append(vh)
        los.append(vl)
    return jnp.stack(his, axis=-2), jnp.stack(los, axis=-2)


class Representation(str, Enum):
    """``fhe_math::rq::Representation`` (PowerBasis / Ntt; NttShoup is not
    used by the reference — ``parameters.rs`` note in SURVEY.md §2.3)."""

    PowerBasis = "power"
    Ntt = "ntt"


@jax.tree_util.register_pytree_node_class
class Poly:
    """A batch of polynomials in R_q.

    ``hi``/``lo``: uint32 arrays of shape ``batch + (L, l)``.
    ``rep`` and ``ring`` are static (aux data under jax transformations).

    Storage is dual-layout: the canonical batch-major pair, OR a
    channel-major pair ``[L, l, *batch]`` (:meth:`from_channel_major`) —
    the layout the TPU kernels natively produce and consume. A
    channel-major Poly materializes (and caches) the canonical layout
    lazily on first ``.hi``/``.lo`` access, so pipelines that stay on
    device (encrypt -> batched decrypt) never pay the [*, L, l]
    transpose, while every canonical consumer (serialization, indexing,
    host lifts) sees the usual layout transparently.
    """

    def __init__(self, hi, lo, rep: Representation, ring: RingPlan) -> None:
        self._hi = hi
        self._lo = lo
        self._chh = None
        self._chl = None
        self.rep = rep
        self.ring = ring

    @classmethod
    def from_channel_major(cls, ch_hi, ch_lo, rep: Representation,
                           ring: RingPlan) -> "Poly":
        """Wrap channel-major arrays ``[L, l, *batch]`` without
        transposing; canonical layout materializes lazily."""
        p = cls.__new__(cls)
        p._hi = None
        p._lo = None
        p._chh = ch_hi
        p._chl = ch_lo
        p.rep = rep
        p.ring = ring
        return p

    def _canonicalize(self) -> None:
        if self._hi is None:
            nb = self._chh.ndim - 2
            perm = tuple(range(2, 2 + nb)) + (0, 1)
            self._hi = jnp.transpose(self._chh, perm)
            self._lo = jnp.transpose(self._chl, perm)

    @property
    def hi(self):
        self._canonicalize()
        return self._hi

    @property
    def lo(self):
        self._canonicalize()
        return self._lo

    @property
    def is_channel_major(self) -> bool:
        """True when the native storage is channel-major (canonical layout
        not yet materialized)."""
        return self._hi is None

    def channel_pair(self):
        """(hi, lo) in channel-major layout ``[L, l, *batch]`` — free when
        constructed via :meth:`from_channel_major`, one transpose
        otherwise."""
        if self._chh is not None:
            return self._chh, self._chl
        nb = self._hi.ndim - 2
        perm = (nb, nb + 1) + tuple(range(nb))
        return (jnp.transpose(self._hi, perm), jnp.transpose(self._lo, perm))

    # -- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        # Flatten the NATIVE storage with a layout flag, so channel-major
        # laziness survives pytree boundaries (jit args, tree_map,
        # shard_map) instead of silently materializing the transpose.
        if self._hi is None:
            return (self._chh, self._chl), (self.rep, self.ring, True)
        return (self._hi, self._lo), (self.rep, self.ring, False)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if len(aux) > 2 and aux[2]:
            return cls.from_channel_major(children[0], children[1],
                                          aux[0], aux[1])
        return cls(children[0], children[1], aux[0], aux[1])

    # -- constructors ---------------------------------------------------
    @classmethod
    def zero(cls, ring: RingPlan, rep: Representation = Representation.Ntt,
             batch: tuple[int, ...] = ()) -> "Poly":
        """``Poly::zero`` (``crs.rs:27`` et al.)."""
        shape = batch + (ring.num_limbs, ring.degree)
        z = jnp.zeros(shape, jnp.uint32)
        return cls(z, z, rep, ring)

    @classmethod
    def random(cls, ring: RingPlan, rep: Representation, key: jax.Array,
               batch: tuple[int, ...] = ()) -> "Poly":
        """Uniform element(s) of R_q (``Poly::random``, ``crs.rs:32``),
        sampled on device from a threefry key. The residues are uniform in
        [0, q_i) up to statistical distance < 2^-66 per value."""
        hi, lo = _random_residues_jit(ring, batch, key)
        return cls(hi, lo, rep, ring)

    @classmethod
    def random_from_seed(cls, ring: RingPlan, rep: Representation,
                         seed: bytes, batch: tuple[int, ...] = ()) -> "Poly":
        """Deterministic uniform element(s) from a 32-byte seed
        (``Poly::random_from_seed``, ``crs.rs:60``) — ChaCha8 + Lemire
        rejection, host-side; stream layout documented in
        :func:`pvw_tpu.utils.chacha.uniform_residues_from_seeds`.
        For batches, each element uses the SAME seed (callers wanting
        distinct elements pass distinct seeds via the CRS path)."""
        n = int(np.prod(batch)) if batch else 1
        seeds = np.tile(np.frombuffer(seed, np.uint8), (n, 1))
        vals = uniform_residues_from_seeds(seeds, ring.moduli, ring.degree)
        vals = vals.reshape(batch + (ring.num_limbs, ring.degree))
        hi, lo = u64op.split_u64_np(vals)
        return cls(jnp.asarray(hi), jnp.asarray(lo), rep, ring)

    @classmethod
    def from_coefficients(cls, coeffs, ring: RingPlan) -> "Poly":
        """Small signed coefficients [..., l] -> PowerBasis poly
        (``Poly::from_coefficients``; negatives wrap mod each q_i)."""
        arr = jnp.asarray(coeffs, jnp.int32)
        if arr.shape[-1] != ring.degree:
            raise PolynomialError(
                f"expected last dim {ring.degree}, got {arr.shape[-1]}"
            )
        hi, lo = modmat.from_signed_coeffs(arr, ring)
        return cls(hi, lo, Representation.PowerBasis, ring)

    @classmethod
    def from_residues_np(cls, residues: np.ndarray, ring: RingPlan,
                         rep: Representation) -> "Poly":
        """Host uint64 residue array [..., L, l] -> Poly (the
        ``try_convert_from`` bridge, ``parameters.rs:461-471``)."""
        residues = np.asarray(residues, np.uint64)
        qs = np.array(ring.moduli, np.uint64).reshape(
            (1,) * (residues.ndim - 2) + (ring.num_limbs, 1)
        )
        if np.any(residues >= qs):
            raise PolynomialError("residue out of range for modulus")
        hi, lo = u64op.split_u64_np(residues)
        return cls(jnp.asarray(hi), jnp.asarray(lo), rep, ring)

    # -- accessors ------------------------------------------------------
    @property
    def batch_shape(self) -> tuple[int, ...]:
        if self._hi is None:
            return tuple(self._chh.shape[2:])
        return tuple(self._hi.shape[:-2])

    @property
    def pair(self):
        return (self.hi, self.lo)

    def representation(self) -> Representation:
        """``poly.representation()`` accessor (``crs.rs:124``)."""
        return self.rep

    def residues_np(self) -> np.ndarray:
        """Device -> host uint64 residues [..., L, l]."""
        return u64op.join_u64_np(np.asarray(self.hi), np.asarray(self.lo))

    def coefficients_int(self) -> np.ndarray:
        """CRT lift to canonical integer coefficients in [0, q), as an
        object-dtype array [..., l] of Python ints (``Vec<BigUint>::from``).
        Requires PowerBasis representation."""
        if self.rep != Representation.PowerBasis:
            raise PolynomialError("coefficients_int requires PowerBasis")
        res = self.residues_np()
        batch = res.shape[:-2]
        flat = res.reshape((-1,) + res.shape[-2:])
        out = np.empty(flat.shape[0] * self.ring.degree, object)
        crt = self.ring.crt
        L = self.ring.num_limbs
        idx = 0
        for e in range(flat.shape[0]):
            for j in range(self.ring.degree):
                out[idx] = crt.lift(tuple(int(flat[e, i, j]) for i in range(L)))
                idx += 1
        return out.reshape(batch + (self.ring.degree,))

    # -- representation changes ----------------------------------------
    def change_representation(self, rep: Representation) -> "Poly":
        """Functional analogue of ``change_representation`` (returns a new
        Poly; JAX arrays are immutable)."""
        rep = Representation(rep)
        if rep == self.rep:
            return self
        if rep == Representation.Ntt:
            hi, lo = ntt_ops.ntt_forward(self.pair, self.ring)
        else:
            hi, lo = ntt_ops.ntt_inverse(self.pair, self.ring)
        return Poly(hi, lo, rep, self.ring)

    def to_ntt(self) -> "Poly":
        return self.change_representation(Representation.Ntt)

    def to_power_basis(self) -> "Poly":
        return self.change_representation(Representation.PowerBasis)

    # -- ring operators -------------------------------------------------
    def _check_compat(self, other: "Poly", op: str) -> None:
        if self.ring != other.ring:
            raise ContextError(f"{op}: ring/context mismatch")
        if self.rep != other.rep:
            raise PolynomialError(f"{op}: representation mismatch")

    def __add__(self, other: "Poly") -> "Poly":
        self._check_compat(other, "add")
        hi, lo = modmat.poly_add(self.pair, other.pair, self.ring)
        return Poly(hi, lo, self.rep, self.ring)

    def __sub__(self, other: "Poly") -> "Poly":
        self._check_compat(other, "sub")
        hi, lo = modmat.poly_sub(self.pair, other.pair, self.ring)
        return Poly(hi, lo, self.rep, self.ring)

    def __neg__(self) -> "Poly":
        hi, lo = modmat.poly_neg(self.pair, self.ring)
        return Poly(hi, lo, self.rep, self.ring)

    def __mul__(self, other: "Poly") -> "Poly":
        """Ring product; NTT-domain pointwise (both operands must be Ntt,
        matching fhe-math's operator contract)."""
        self._check_compat(other, "mul")
        if self.rep != Representation.Ntt:
            raise PolynomialError("mul requires Ntt representation")
        hi, lo = modmat.poly_pointwise_mul(self.pair, other.pair, self.ring)
        return Poly(hi, lo, self.rep, self.ring)

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Poly):
            return NotImplemented
        return (
            self.ring == other.ring
            and self.rep == other.rep
            and bool(jnp.array_equal(self.hi, other.hi))
            and bool(jnp.array_equal(self.lo, other.lo))
        )

    # -- batch indexing -------------------------------------------------
    def __getitem__(self, idx) -> "Poly":
        """Index into the leading batch dims."""
        if self._hi is None and isinstance(idx, (int, np.integer)):
            # channel-major fast path: first batch dim is axis 2
            return Poly.from_channel_major(
                self._chh[:, :, idx], self._chl[:, :, idx],
                self.rep, self.ring,
            )
        return Poly(self.hi[idx], self.lo[idx], self.rep, self.ring)

    def __repr__(self) -> str:
        return (
            f"Poly(batch={self.batch_shape}, rep={self.rep.value}, "
            f"L={self.ring.num_limbs}, l={self.ring.degree})"
        )

    # -- byte serialization (PVWT container) ----------------------------
    def to_bytes(self) -> bytes:
        """Canonical byte form (see pvw_tpu.utils.serialization)."""
        from .utils.serialization import poly_to_bytes
        return poly_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes, ring=None) -> "Poly":
        from .utils.serialization import poly_from_bytes
        return poly_from_bytes(data, ring)


def stack(polys: list[Poly], axis: int = 0) -> Poly:
    """Stack same-ring, same-rep polys along a new leading batch axis."""
    if not polys:
        raise PolynomialError("cannot stack empty list")
    p0 = polys[0]
    for p in polys[1:]:
        p0._check_compat(p, "stack")
    return Poly(
        jnp.stack([p.hi for p in polys], axis=axis),
        jnp.stack([p.lo for p in polys], axis=axis),
        p0.rep,
        p0.ring,
    )
