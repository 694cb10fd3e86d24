"""PVW parameters: builder, gadget machinery, correctness condition.

Rebuild of ``/root/reference/src/params/parameters.rs``. Everything here is
host-side, once-per-deployment work (SURVEY.md §3.1); the outputs that
matter on device are precomputed tables:

- ``gadget_ntt_*``: the NTT-domain gadget polynomial g(X) = Σ Δ^i X^i as
  per-limb residues with 64-bit Shoup companions, so the encryption encode
  ``m · g`` is a single constant-multiply per slot on device
  (``encode_scalar``, ``parameters.rs:344-367``);
- ``gadget_wrap_*``: (2^64 mod q) · g, the correction subtracted when the
  reference's ``scalars[i] as i64`` cast (``encryption.rs:195``) makes a
  u64 scalar >= 2^63 wrap negative.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax

from ..errors import (
    EncodingError, InvalidParameters, SamplingError, SerializationError,
)
from ..utils.intmath import integer_nth_root
from .ring import RingPlan, get_ring


def _to_f64(x: int) -> float:
    """num-traits ``to_f64`` semantics: saturate to +/-inf, never fail."""
    try:
        return float(x)
    except OverflowError:
        return math.inf if x > 0 else -math.inf


class PvwParameters:
    """Scheme parameters (``parameters.rs:19-40``).

    Fields: n (parties), t = (n-1)//2 (threshold, stored but unused by this
    crate — quirk preserved), k (LWE dimension), l (redundancy / ring
    degree), secret_variance, error_bound_1/2 (Python ints), the ring plan,
    and the cached Δ = ⌊q^(1/l)⌋ and Δ^(l-1).
    """

    def __init__(
        self,
        n: int,
        k: int,
        l: int,
        moduli: tuple[int, ...],
        secret_variance: float,
        error_bound_1: int,
        error_bound_2: int,
    ) -> None:
        # Validation mirrors PvwParametersBuilder::build (parameters.rs:117-181)
        if n == 0:
            raise InvalidParameters("n must be > 0")
        if k == 0:
            raise InvalidParameters("k must be > 0")
        if l < 8 or (l & (l - 1)) != 0:
            raise InvalidParameters(
                "l must be power of 2 and >= 8 (fhe.rs Context requirement)"
            )
        try:
            ring = get_ring(tuple(int(m) for m in moduli), l)
        except InvalidParameters as e:
            raise InvalidParameters(f"Context creation failed: {e}") from e
        if int(error_bound_1) <= 0:
            raise InvalidParameters("error_bound_1 must be positive")
        if int(error_bound_2) <= 0:
            raise InvalidParameters("error_bound_2 must be positive")

        self.n = int(n)
        self.t = (self.n - 1) // 2
        self.k = int(k)
        self.l = int(l)
        self.secret_variance = float(secret_variance)
        self.error_bound_1 = int(error_bound_1)
        self.error_bound_2 = int(error_bound_2)
        self.ring: RingPlan = ring
        q_total = ring.q_total
        self._q_total = q_total
        self._delta = integer_nth_root(q_total, l)
        self._delta_pow = self._delta ** (l - 1) if l > 1 else 1

        self._build_gadget_tables()

    # -- construction ---------------------------------------------------

    @staticmethod
    def builder() -> "PvwParametersBuilder":
        return PvwParametersBuilder()

    @classmethod
    def new(cls, n, k, l, moduli, secret_variance, error_bound_1, error_bound_2):
        """Convenience constructor (``parameters.rs:210-228``)."""
        return cls(n, k, l, tuple(moduli), secret_variance,
                   int(error_bound_1), int(error_bound_2))

    @classmethod
    def new_with_u32_bounds(cls, n, k, l, moduli, secret_variance,
                            error_bound_1, error_bound_2):
        """``parameters.rs:231-249``."""
        return cls.new(n, k, l, moduli, secret_variance,
                       int(error_bound_1), int(error_bound_2))

    def _build_gadget_tables(self) -> None:
        """Precompute NTT-domain gadget tables for device encode."""
        ring = self.ring
        L, l = ring.num_limbs, ring.degree
        g_coeffs = self.gadget_vector()                       # [1, Δ, ..., Δ^(l-1)]
        g_res = ring.residues_from_int_coeffs(g_coeffs)       # [L, l] power basis
        g_ntt = np.zeros((L, l), np.uint64)
        g_wrap = np.zeros((L, l), np.uint64)
        g_ntt_sh = np.zeros((L, l), np.uint64)
        g_wrap_sh = np.zeros((L, l), np.uint64)
        for i, lp in enumerate(ring.limbs):
            q = lp.q
            wrap = pow(2, 64, q)
            for j in range(l):
                acc = 0
                for c in range(l):
                    acc += int(lp.ntt_fwd[j, c]) * int(g_res[i, c])
                v = acc % q
                g_ntt[i, j] = v
                g_ntt_sh[i, j] = (v << 64) // q
                w = v * wrap % q
                g_wrap[i, j] = w
                g_wrap_sh[i, j] = (w << 64) // q
        self.gadget_ntt = g_ntt
        self.gadget_ntt_shoup = g_ntt_sh
        self.gadget_wrap = g_wrap
        self.gadget_wrap_shoup = g_wrap_sh
        # signed digit decomposition of the NTT gadget residues, for the
        # column-space encode (see crypto/encryption.py): int8 [L, l, nd]
        from .ring import _digits_np

        self.gadget_ntt_dig = _digits_np(g_ntt, self.ring.num_digits)

    # -- cached values ---------------------------------------------------

    def delta(self) -> int:
        """Δ = ⌊q^(1/l)⌋ (``parameters.rs:370``)."""
        return self._delta

    def delta_power_l_minus_1(self) -> int:
        """Δ^(l-1) (``parameters.rs:375``)."""
        return self._delta_pow

    def q_total(self) -> int:
        """q = ∏ q_i (``parameters.rs:380-386``)."""
        return self._q_total

    def moduli(self) -> tuple[int, ...]:
        return self.ring.moduli

    def rns_context(self):
        """The CRT basis (analogue of ``params.rns_context()``)."""
        return self.ring.crt

    def ntt_operators(self):
        """Per-limb NTT plans (analogue of ``params.ntt_operators()``)."""
        return self.ring.limbs

    # -- sampling shortcuts (``parameters.rs:252-284``) ------------------

    def sample_secret_polynomial(self, key: jax.Array):
        """CBD(variance) coefficients -> NTT poly (``parameters.rs:252``)."""
        from ..sampling.cbd import sample_vec_cbd
        from ..poly import Poly

        try:
            coeffs = sample_vec_cbd(key, (self.l,), self.secret_variance)
        except SamplingError as e:
            raise SamplingError(f"CBD sampling failed: {e.msg}") from e
        return Poly.from_coefficients(coeffs, self.ring).to_ntt()

    def sample_error_1(self, key: jax.Array, batch: tuple[int, ...] = ()):
        """Bounded-uniform error, NTT rep (``parameters.rs:264-273``).

        NOTE (quirk preserved, SURVEY.md §2.4.1): this is UNIFORM in
        [-B1, B1], not Gaussian, despite the reference README."""
        from ..sampling.uniform import (
            sample_uniform_residues, sample_uniform_residues_host,
        )
        from ..poly import Poly, Representation
        from ..ops import ntt as ntt_ops

        sampler = (
            sample_uniform_residues
            if self.error_bound_1 < min(self.ring.moduli)
            else sample_uniform_residues_host
        )
        hi, lo = sampler(
            key, batch + (self.l,), self.error_bound_1, self.ring
        )
        hi, lo = ntt_ops.ntt_forward((hi, lo), self.ring)
        return Poly(hi, lo, Representation.Ntt, self.ring)

    def sample_error_2(self, key: jax.Array, batch: tuple[int, ...] = ()):
        """Bounded-uniform error 2, NTT rep (``parameters.rs:275-284``)."""
        from ..sampling.uniform import (
            sample_uniform_residues, sample_uniform_residues_host,
        )
        from ..poly import Poly, Representation
        from ..ops import ntt as ntt_ops

        sampler = (
            sample_uniform_residues
            if self.error_bound_2 < min(self.ring.moduli)
            else sample_uniform_residues_host
        )
        hi, lo = sampler(
            key, batch + (self.l,), self.error_bound_2, self.ring
        )
        hi, lo = ntt_ops.ntt_forward((hi, lo), self.ring)
        return Poly(hi, lo, Representation.Ntt, self.ring)

    # -- gadget / encoding -----------------------------------------------

    def gadget_vector(self) -> list[int]:
        """[1, Δ, Δ², ..., Δ^(l-1)] (``parameters.rs:311-324``)."""
        out = [1]
        for _ in range(self.l - 1):
            out.append(out[-1] * self._delta)
        return out

    def gadget_element(self) -> list[int]:
        """[Δ^(l-1), ..., Δ, 1] — legacy/descending order, no callers in the
        reference either (``parameters.rs:326-342``; quirk §2.4.11)."""
        return list(reversed(self.gadget_vector()))

    def gadget_polynomial(self):
        """g(X) = Σ Δ^i X^i as an NTT-rep Poly (``parameters.rs:286-308``)."""
        return self.bigints_to_poly(self.gadget_vector()).to_ntt()

    def encode_scalar(self, scalar: int):
        """scalar * g(X), NTT rep (``parameters.rs:344-367``).

        ``scalar`` is interpreted as i64 — the reference casts u64 scalars
        with ``as i64`` wrap-around (``encryption.rs:195``); pass the raw
        u64 here and the same wrap is applied."""
        s = int(scalar)
        if not 0 <= s < 1 << 64:
            # Python-only failure mode: the reference takes u64 at the type
            # level, so out-of-range inputs cannot occur there
            # (errors.rs:38-39)
            raise EncodingError(f"scalar {s} outside the u64 range")
        if s >= 1 << 63:
            s -= 1 << 64  # u64 -> i64 wrap, encryption.rs:195
        coeffs = [s * g for g in self.gadget_vector()]
        return self.bigints_to_poly(coeffs).to_ntt()

    def scalar_to_polynomial(self, scalar: int):
        """Constant polynomial, NTT rep (``parameters.rs:404-416``;
        vestigial API preserved)."""
        coeffs = [0] * self.l
        coeffs[0] = int(scalar)
        return self.bigints_to_poly(coeffs).to_ntt()

    def bigints_to_poly(self, bigints: list[int]):
        """Arbitrary-magnitude integer coefficients -> PowerBasis Poly via
        RNS reduction (``parameters.rs:420-474``)."""
        from ..poly import Poly, Representation

        res = self.ring.residues_from_int_coeffs(bigints)
        return Poly.from_residues_np(res, self.ring, Representation.PowerBasis)

    # -- correctness / verification --------------------------------------

    def verify_parameters(self) -> bool:
        """``parameters.rs:477-506``."""
        if self._delta != integer_nth_root(self._q_total, self.l):
            return False
        gv = self.gadget_vector()
        if len(gv) != self.l or gv[0] != 1 or gv[-1] != self._delta_pow:
            return False
        return self.verify_correctness_condition()

    def verify_correctness_condition(self) -> bool:
        """Δ^(l-1) > B2·sqrt(n·l)·(1+sqrt(n)) + 2·B1·k·l + 14·B1·sqrt(n·k·l),
        evaluated in f64 exactly like ``parameters.rs:508-551``."""
        n, k, l = float(self.n), float(self.k), float(self.l)
        b1 = _to_f64(self.error_bound_1)
        b2 = _to_f64(self.error_bound_2)
        sqrt_nl = math.sqrt(n * l) if n * l > 0 else math.inf
        sqrt_n = math.sqrt(n) if n > 0 else math.inf
        first = b2 * sqrt_nl * (1.0 + sqrt_n)
        second = 2.0 * b1 * k * l
        sqrt_nkl = math.sqrt(n * k * l) if n * k * l > 0 else math.inf
        third = 14.0 * b1 * sqrt_nkl
        total = first + second + third
        delta_power = _to_f64(self._delta_pow)
        return delta_power > total

    @staticmethod
    def suggest_error_bounds(n: int, k: int, l: int, moduli, variance: float):
        """Grid-search {50,100,200,500,1000,2000}² (``parameters.rs:554-603``)."""
        temp = PvwParameters(n, k, l, tuple(moduli), variance, 1, 1)
        delta_power = _to_f64(temp._delta_pow)
        n_f, k_f, l_f = float(n), float(k), float(l)
        sqrt_nkl = math.sqrt(n_f * k_f * l_f)
        coeff_b1 = 2.0 * k_f * l_f + 14.0 * sqrt_nkl
        sqrt_nl = math.sqrt(n_f * l_f)
        sqrt_n = math.sqrt(n_f)
        coeff_b2 = sqrt_nl * (1.0 + sqrt_n)
        for b1 in (50, 100, 200, 500, 1000, 2000):
            for b2 in (50, 100, 200, 500, 1000, 2000):
                if delta_power > b1 * coeff_b1 + b2 * coeff_b2:
                    return (b1, b2)
        raise InvalidParameters(
            f"Cannot find suitable error bounds for variance {variance} "
            "with the correctness condition"
        )

    # -- serde (7 scalar fields; context rebuilt on load,
    #    ``parameters.rs:606-664``) --------------------------------------

    def to_dict(self) -> dict:
        # Limb-restricted views (restrict_limbs) carry a moduli SUBSET but
        # full-q Δ/gadget; the 7-field serde form (parameters.rs:606-664)
        # cannot represent that provenance — a round-trip would silently
        # rebuild a DIFFERENT scheme (Δ from the subset product). Refuse.
        prod = 1
        for m in self.ring.moduli:
            prod *= m
        if prod != self._q_total:
            raise SerializationError(
                "limb-restricted parameter views cannot be serialized "
                "(Δ/gadget derive from the full q; re-serialize the "
                "unrestricted parameters instead)"
            )
        return {
            "n": self.n,
            "k": self.k,
            "l": self.l,
            "moduli": [int(m) for m in self.ring.moduli],
            "secret_variance": self.secret_variance,
            "error_bound_1": str(self.error_bound_1),
            "error_bound_2": str(self.error_bound_2),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "PvwParameters":
        return cls(
            d["n"], d["k"], d["l"], tuple(d["moduli"]),
            d["secret_variance"], int(d["error_bound_1"]), int(d["error_bound_2"]),
        )

    # -- limb-restricted views (RNS parallelism) --------------------------

    def restrict_limbs(self, limb_indices) -> "PvwParameters":
        """A params view over a SUBSET of the RNS limbs whose gadget and Δ
        still derive from the FULL q. Every per-limb quantity of the
        scheme (c1/c2 residues, key rows, NTTs) depends only on its own
        limb, and the coefficient-space randomness streams are
        limb-independent — so running the encryption kernel once per limb
        shard and concatenating the limb axes is bit-identical to the
        full-ring run (see :mod:`pvw_tpu.parallel.limb_parallel`).

        Restricted params are ephemeral execution views: ``to_dict`` /
        ``to_bytes`` raise :class:`SerializationError` on them (the 7-field
        serde form cannot represent the full-q provenance)."""
        idx = tuple(int(i) for i in limb_indices)
        if not idx or any(not 0 <= i < self.ring.num_limbs for i in idx):
            raise InvalidParameters(f"invalid limb indices {idx}")
        sub = PvwParameters.__new__(PvwParameters)
        sub.n, sub.t, sub.k, sub.l = self.n, self.t, self.k, self.l
        sub.secret_variance = self.secret_variance
        sub.error_bound_1 = self.error_bound_1
        sub.error_bound_2 = self.error_bound_2
        sub.ring = get_ring(tuple(self.ring.moduli[i] for i in idx), self.l)
        sub._q_total = self._q_total      # FULL q: Δ/gadget/correctness
        sub._delta = self._delta
        sub._delta_pow = self._delta_pow
        sub._build_gadget_tables()        # full-Δ gadget, sub-limb residues
        return sub

    # -- identity ---------------------------------------------------------

    def __eq__(self, other: object) -> bool:
        # field-wise, NOT via to_dict: limb-restricted views refuse to_dict
        # but still serve as (hashable) static jit-cache keys
        return (isinstance(other, PvwParameters)
                and self.n == other.n
                and self.k == other.k
                and self.l == other.l
                and self.ring.moduli == other.ring.moduli
                and self.secret_variance == other.secret_variance
                and self.error_bound_1 == other.error_bound_1
                and self.error_bound_2 == other.error_bound_2
                and self._q_total == other._q_total)

    def __hash__(self) -> int:
        # _q_total distinguishes limb-restricted views (whose ring holds a
        # moduli subset but whose gadget/Δ come from the full product)
        return hash((self.n, self.k, self.l, self.ring.moduli,
                     self.secret_variance, self.error_bound_1,
                     self.error_bound_2, self._q_total))

    def __repr__(self) -> str:
        return (
            f"PvwParameters(n={self.n}, t={self.t}, k={self.k}, l={self.l}, "
            f"secret_variance={self.secret_variance}, "
            f"error_bounds=({self.error_bound_1}, {self.error_bound_2}), "
            f"moduli={[hex(m) for m in self.ring.moduli]})"
        )

    def to_bytes(self) -> bytes:
        from ..utils.serialization import params_to_bytes
        return params_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PvwParameters":
        from ..utils.serialization import params_from_bytes
        return params_from_bytes(data)


class PvwParametersBuilder:
    """Fluent builder (``parameters.rs:44-201``)."""

    def __init__(self) -> None:
        self._n: Optional[int] = None
        self._k: Optional[int] = None
        self._l: Optional[int] = None
        self._moduli: Optional[tuple[int, ...]] = None
        self._secret_variance: Optional[float] = None
        self._error_bound_1: Optional[int] = None
        self._error_bound_2: Optional[int] = None

    def set_parties(self, n: int) -> "PvwParametersBuilder":
        self._n = int(n)
        return self

    def set_dimension(self, k: int) -> "PvwParametersBuilder":
        self._k = int(k)
        return self

    def set_l(self, l: int) -> "PvwParametersBuilder":
        self._l = int(l)
        return self

    def set_moduli(self, moduli) -> "PvwParametersBuilder":
        self._moduli = tuple(int(m) for m in moduli)
        return self

    def set_secret_variance(self, variance: float) -> "PvwParametersBuilder":
        self._secret_variance = float(variance)
        return self

    def set_error_bound_1(self, bound: int) -> "PvwParametersBuilder":
        self._error_bound_1 = int(bound)
        return self

    def set_error_bound_2(self, bound: int) -> "PvwParametersBuilder":
        self._error_bound_2 = int(bound)
        return self

    def set_error_bounds(self, b1: int, b2: int) -> "PvwParametersBuilder":
        self._error_bound_1 = int(b1)
        self._error_bound_2 = int(b2)
        return self

    def set_error_bounds_u32(self, b1: int, b2: int) -> "PvwParametersBuilder":
        return self.set_error_bounds(int(b1), int(b2))

    def build(self) -> PvwParameters:
        if self._n is None:
            raise InvalidParameters("n not set")
        if self._k is None:
            raise InvalidParameters("k not set")
        if self._l is None:
            raise InvalidParameters("l not set")
        if self._moduli is None:
            raise InvalidParameters("moduli not set")
        return PvwParameters(
            self._n,
            self._k,
            self._l,
            self._moduli,
            0.5 if self._secret_variance is None else self._secret_variance,
            100 if self._error_bound_1 is None else self._error_bound_1,
            200 if self._error_bound_2 is None else self._error_bound_2,
        )

    def build_arc(self) -> PvwParameters:
        """Alias for ``build`` — Python has no Arc; shared ownership is the
        default (``parameters.rs:197-200``)."""
        return self.build()
