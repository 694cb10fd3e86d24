"""RingPlan: the device-resident description of R_q = Z_q[X]/(X^l + 1).

This replaces fhe-math's ``rq::Context`` (``parameters.rs:147``; SURVEY.md
§2.3): it validates the NTT-friendly RNS prime chain, and precomputes every
constant table the TPU kernels need:

- per-limb negacyclic NTT matrices (degree l is tiny — 8..32 — so the NTT
  *is* a matmul, fully MXU-resident; no butterfly network needed),
  pre-decomposed into signed 8-bit digits for int8 contractions;
- per-limb digit-fold tables (2^(8c) mod q_i with 32-bit Shoup companions);
- CRT lift/reduce constants (host Python ints) for the decode path.

Polynomials are stored as dense uint32 hi/lo pairs of shape ``[..., L, l]``
(L = number of RNS limbs). There is no per-element ``Poly`` object graph —
one tensor per logical matrix, the TPU-idiomatic inversion of the
reference's ``Array2<Poly>`` design (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..errors import InvalidParameters
from ..utils.intmath import (
    CrtBasis,
    primitive_root_of_unity,
    validate_ntt_modulus,
)
from ..ops import u64 as u64op
from ..ops.u64 import MAX_CONTRACTION  # noqa: F401 (re-export)

# Context requirement inherited from the reference's math layer: degree must
# be a power of two >= 8 (``parameters.rs:139-144``).
MIN_DEGREE = 8


def _digits_np(values: np.ndarray, nd: int = 8) -> np.ndarray:
    """Host-side signed digit decomposition of uint64 values.

    Mirrors :func:`pvw_tpu.ops.u64.to_signed_digits` exactly; returns int8
    with a trailing axis of length ``nd``. Exact iff every value
    satisfies ``value >> (8*(nd-1)) <= 126`` (checked).
    """
    v = values.astype(np.uint64)
    raw = np.stack(
        [((v >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int32) for i in range(nd)],
        axis=-1,
    )
    out = np.zeros_like(raw)
    carry = np.zeros(v.shape, np.int32)
    for i in range(nd):
        t = raw[..., i] + carry
        big = t >= 128
        out[..., i] = np.where(big, t - 256, t)
        carry = big.astype(np.int32)
    if np.any(carry) or np.any((v >> np.uint64(8 * (nd - 1))) > np.uint64(126)):
        raise ValueError(f"digit decomposition overflow for nd={nd}")
    return out.astype(np.int8)


def _band_lhs_np(dig: np.ndarray, jr: int | None = None) -> np.ndarray:
    """lhs digits [m, k, nd] int8 -> banded [(nd+jr-1)m, jr*k] with
    band[(c, m), (k, j)] = dig[m, k, c - j] for 0 <= c-j < nd, else 0.

    A matmul of this band against rhs digits arranged [(k, j), n]
    (k-major, digit-minor, j < jr) produces the nd+jr-1 digit-convolution
    columns c-major — no nd x jr outer product, no column-sum pass.
    ``jr`` is the RHS digit count (default: square, jr = nd); jr < nd is
    the small-coefficient path (CBD secrets fit 1 digit, bounded errors 2).
    """
    m, k, nd = dig.shape
    if jr is None:
        jr = nd
    ncols = nd + jr - 1
    band = np.zeros((ncols, m, k, jr), np.int8)
    for c in range(ncols):
        for j in range(jr):
            d = c - j
            if 0 <= d < nd:
                band[c, :, :, j] = dig[:, :, d]
    return band.reshape(ncols * m, k * jr)


@dataclass(frozen=True)
class LimbPlan:
    """Per-prime constants."""

    q: int
    psi: int                      # primitive 2l-th root of unity mod q
    ntt_fwd: np.ndarray           # uint64 [l, l]  W[j, i] = psi^(i*(2j+1))
    ntt_inv: np.ndarray           # uint64 [l, l]  includes the 1/l factor
    ntt_fwd_dig: np.ndarray       # int8 [l, l, 8]
    ntt_inv_dig: np.ndarray       # int8 [l, l, 8]


class RingPlan:
    """Immutable plan for one (moduli, degree) ring.

    Hashable/equal by (moduli, degree) so it can be a ``jit`` static
    argument; device tables are embedded as numpy constants.
    """

    def __init__(self, moduli: tuple[int, ...], degree: int) -> None:
        moduli = tuple(int(m) for m in moduli)
        if len(moduli) == 0:
            raise InvalidParameters("at least one modulus required")
        if len(set(moduli)) != len(moduli):
            raise InvalidParameters("moduli must be distinct")
        if degree < MIN_DEGREE or degree & (degree - 1):
            raise InvalidParameters(
                "l must be power of 2 and >= 8 (fhe.rs Context requirement)"
            )
        for q in moduli:
            validate_ntt_modulus(q, degree)

        self.moduli = moduli
        self.degree = int(degree)
        self.num_limbs = len(moduli)
        self.crt = CrtBasis(moduli)
        self.q_total = self.crt.q
        # Per-ring digit width: a 37-bit prime chain needs only 5 signed
        # 8-bit digits (9 convolution columns) instead of the full 8/15 —
        # 2.7x fewer MXU MACs in every matmul of the scheme. All limbs
        # share one width so digit tensors stack along the limb axis.
        # PVW_NUM_DIGITS overrides (>= the minimal width; perf experiments).
        self.num_digits = max(u64op.digits_for_max(q - 1) for q in moduli)
        from ..config import settings

        forced = settings.num_digits
        if forced:
            if forced < self.num_digits or forced > u64op.NUM_DIGITS:
                raise InvalidParameters(
                    f"PVW_NUM_DIGITS={forced} outside "
                    f"[{self.num_digits}, {u64op.NUM_DIGITS}]"
                )
            self.num_digits = forced
        self.num_columns = 2 * self.num_digits - 1

        self.limbs: list[LimbPlan] = [self._build_limb(q) for q in moduli]

        # Stacked device tables ------------------------------------------
        l, L = self.degree, self.num_limbs
        C = self.num_columns
        q_arr = np.array(moduli, np.uint64)
        self.q_hi, self.q_lo = u64op.split_u64_np(q_arr)          # [L]
        # fold tables: pow[c] = 2^(8c) mod q, c in 0..C
        pow_vals = np.zeros((L, C), np.uint64)
        pow_sh32 = np.zeros((L, C), np.uint64)
        pow_sh64 = np.zeros((L, C), object)
        for i, q in enumerate(moduli):
            for c in range(C):
                w = pow(2, 8 * c, q)
                pow_vals[i, c] = w
                pow_sh32[i, c] = (w << 32) // q
                pow_sh64[i, c] = (w << 64) // q
        self.pow_hi, self.pow_lo = u64op.split_u64_np(pow_vals)    # [L, C]
        self.pow_wp32 = pow_sh32.astype(np.uint32)                 # [L, C]
        # 64-bit Shoup companions of 2^(8c) mod q — the scaled-digit
        # matmul's prescale constants (see ops/modmat.py scaled path)
        self.pow_s64_hi, self.pow_s64_lo = u64op.split_u64_np(
            (pow_sh64 & np.uint64(0xFFFFFFFFFFFFFFFF)).astype(np.uint64)
        )
        # grouped-fold tables: w_g = 2^(32g) mod q with 64-bit Shoup
        # companions, and the bias constant K = sum_c 2^31 * 2^(8c) mod q
        # (only ceil(C/4) groups are touched by the fold; keep 4 columns
        # so the table shape is digit-count independent)
        grp_w = np.zeros((L, 4), np.uint64)
        grp_s = np.zeros((L, 4), np.uint64)
        bias = np.zeros((L,), np.uint64)
        for i, q in enumerate(moduli):
            for g in range(4):
                w = pow(2, 32 * g, q)
                grp_w[i, g] = w
                grp_s[i, g] = (w << 64) // q
            k_const = sum((1 << 31) << (8 * c) for c in range(C))
            bias[i] = k_const % q
        self.grp_hi, self.grp_lo = u64op.split_u64_np(grp_w)       # [L, 4]
        self.grp_sh, self.grp_sl = u64op.split_u64_np(grp_s)
        self.bias_hi, self.bias_lo = u64op.split_u64_np(bias)      # [L]
        # word-fold tables: 2^(32w) mod q for w = 1..4 with 32-bit Shoup
        # companions (see u64.fold_columns_words). Valid only when every
        # modulus exceeds 2^32 (W_0 < q precondition).
        wrd_w = np.zeros((L, 4), np.uint64)
        wrd_p32 = np.zeros((L, 4), np.uint32)
        for i, q in enumerate(moduli):
            for w in range(1, 5):
                v = pow(2, 32 * w, q)
                wrd_w[i, w - 1] = v
                wrd_p32[i, w - 1] = (v << 32) // q
        self.wrd_hi, self.wrd_lo = u64op.split_u64_np(wrd_w)       # [L, 4]
        self.wrd_wp32 = wrd_p32                                    # [L, 4]
        self.fold_words_ok = all(q > (1 << 32) for q in moduli)
        self.ntt_fwd_dig = np.stack([lp.ntt_fwd_dig for lp in self.limbs])  # [L,l,l,8]
        self.ntt_inv_dig = np.stack([lp.ntt_inv_dig for lp in self.limbs])
        # lhs-banded twiddle matrices: one matmul yields the 15 convolution
        # columns directly (see ops/modmat.py banded discussion) — free at
        # plan-build time since the twiddles are constant.
        self.ntt_fwd_band = np.stack([_band_lhs_np(lp.ntt_fwd_dig)
                                      for lp in self.limbs])  # [L, Cl, nd*l]
        self.ntt_inv_band = np.stack([_band_lhs_np(lp.ntt_inv_dig)
                                      for lp in self.limbs])
        self._band_jr_cache: dict[tuple[str, int], np.ndarray] = {}
        self._bias_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {
            C: (self.bias_hi, self.bias_lo)
        }

    def ntt_band_jr(self, direction: str, jr: int) -> np.ndarray:
        """Banded twiddle matrix for an ``jr``-digit rhs (the
        small-coefficient NTT path): int8 [L, (nd+jr-1)l, jr*l]."""
        key = (direction, jr)
        if key not in self._band_jr_cache:
            digs = [lp.ntt_fwd_dig if direction == "fwd" else lp.ntt_inv_dig
                    for lp in self.limbs]
            self._band_jr_cache[key] = np.stack(
                [_band_lhs_np(d, jr) for d in digs]
            )
        return self._band_jr_cache[key]

    def ntt_scaled_tab(self, jr: int) -> np.ndarray:
        """Scaled-twiddle digit table for the in-VMEM noise NTT
        (:func:`pvw_tpu.ops.pallas_modmat.matmul_fold_scaled` ``noise=``):
        int8 [L, l(out s), l*jr, nd], entry (i, s, j*jr+dd, c) = signed
        digit c of ``fwd[s, j] * 2^(8*dd) mod q_i``.

        A signed noise value v[j] = sum_dd d[j,dd]*2^(8*dd) contracted
        against rows (j, dd) accumulates NTT(v)[s] directly into the
        scaled-digit convolution columns (weight 2^(8c)) — the same
        columns the scaled matmul folds, so adding them pre-fold yields
        residues bit-identical to NTT-then-addmod."""
        key = ("scaled-noise", jr)
        if key not in self._band_jr_cache:
            l, nd = self.degree, self.num_digits
            out = np.zeros((self.num_limbs, l, l * jr, nd), np.int8)
            for i, lp in enumerate(self.limbs):
                q = lp.q
                for dd in range(jr):
                    scaled = np.zeros((l, l), np.uint64)
                    w = pow(2, 8 * dd, q)
                    for s in range(l):
                        for j in range(l):
                            scaled[s, j] = int(lp.ntt_fwd[s, j]) * w % q
                    dig = _digits_np(scaled, nd)          # [l(s), l(j), nd]
                    out[i, :, dd::jr, :] = dig
            self._band_jr_cache[key] = out
        return self._band_jr_cache[key]

    def bias_pair_for_columns(self, ncols: int):
        """Grouped-fold bias K = sum_{c<ncols} 2^31 * 2^(8c) mod q as
        (hi, lo) uint32 [L] — for folding column tensors narrower than the
        full num_columns (small-coefficient NTT outputs)."""
        if ncols not in self._bias_cache:
            bias = np.zeros((self.num_limbs,), np.uint64)
            for i, q in enumerate(self.moduli):
                bias[i] = sum((1 << 31) << (8 * c) for c in range(ncols)) % q
            self._bias_cache[ncols] = u64op.split_u64_np(bias)
        return self._bias_cache[ncols]

    # -- construction helpers ------------------------------------------

    def _build_limb(self, q: int) -> LimbPlan:
        l = self.degree
        psi = primitive_root_of_unity(2 * l, q)
        inv_l = pow(l, -1, q)
        fwd = np.zeros((l, l), np.uint64)
        inv = np.zeros((l, l), np.uint64)
        for j in range(l):
            e = 2 * j + 1
            for i in range(l):
                fwd[j, i] = pow(psi, (e * i) % (2 * l), q)
        psi_inv = pow(psi, -1, q)
        for i in range(l):
            for j in range(l):
                e = 2 * j + 1
                inv[i, j] = inv_l * pow(psi_inv, (e * i) % (2 * l), q) % q
        return LimbPlan(
            q=q,
            psi=psi,
            ntt_fwd=fwd,
            ntt_inv=inv,
            ntt_fwd_dig=_digits_np(fwd, self.num_digits),
            ntt_inv_dig=_digits_np(inv, self.num_digits),
        )

    # -- identity ------------------------------------------------------

    def __hash__(self) -> int:
        return hash((self.moduli, self.degree, self.num_digits))

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, RingPlan)
            and other.moduli == self.moduli
            and other.degree == self.degree
            and other.num_digits == self.num_digits
        )

    def __repr__(self) -> str:
        return (
            f"RingPlan(moduli={[hex(m) for m in self.moduli]}, "
            f"degree={self.degree}, num_digits={self.num_digits})"
        )

    # -- host packing helpers ------------------------------------------

    def residues_from_int_coeffs(self, coeffs) -> np.ndarray:
        """List/array of Python-int coefficients (length l, any magnitude,
        negatives allowed) -> uint64 residue matrix [L, l].

        The ``bigints_to_poly`` bridge (``parameters.rs:420-474``).
        """
        if len(coeffs) != self.degree:
            raise InvalidParameters(
                f"Expected {self.degree} coefficients, got {len(coeffs)}"
            )
        out = np.zeros((self.num_limbs, self.degree), np.uint64)
        for col, c in enumerate(coeffs):
            c = int(c)
            for row, m in enumerate(self.moduli):
                out[row, col] = c % m
        return out

    def lift_to_ints(self, residues: np.ndarray) -> list[int]:
        """uint64 [L, l] residues -> list of l canonical coefficients in
        [0, q) (the ``Vec<BigUint>::from(&poly)`` CRT lift)."""
        res = np.asarray(residues, np.uint64)
        return [
            self.crt.lift(tuple(int(res[i, j]) for i in range(self.num_limbs)))
            for j in range(self.degree)
        ]


@lru_cache(maxsize=32)
def get_ring(moduli: tuple[int, ...], degree: int) -> RingPlan:
    """Memoized RingPlan constructor (plans are pure functions of inputs)."""
    return RingPlan(tuple(moduli), degree)
