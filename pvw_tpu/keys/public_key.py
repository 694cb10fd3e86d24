"""Party, per-party public keys, and the global public-key matrix B.

Rebuild of ``/root/reference/src/keys/public_key.rs``. The n x k matrix B
is ONE device tensor (Poly batch (n, k)); batch key generation
(``generate_all_party_keys`` / ``generate_all_keys``, the reference's rayon
sites P1/P2, ``public_key.rs:376-434``) is a single [n, k] x [k, k]
digit-matmul plus one batched error sample — the TPU replaces the thread
pool with the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import DimensionMismatch, InvalidParameters
from ..ops import modmat, ntt as ntt_ops
from ..params.crs import PvwCrs
from ..params.parameters import PvwParameters
from ..poly import Poly, Representation
from ..sampling.uniform import (
    sample_uniform_residues_rows,
    sample_uniform_signed_rows,
)
from .secret_key import SecretKey


@partial(jax.jit, static_argnums=(0, 5))
def _batch_keygen_kernel(params: PvwParameters, a_hi, a_lo, coeffs, key,
                         coeff_bound, row_offset):
    """Public keys for a BLOCK of parties in one compiled program:
    b[p, i] = sum_j sk[p, j] * A[j, i] + e1[p, i].

    coeffs: int32 [p, k, l] CBD secrets for parties
    [row_offset, row_offset + p); A: [k, k, L, l] NTT; coeff_bound: static
    max |coefficient| (quantized by the caller to avoid recompiles).
    Returns (hi, lo) [p, k, L, l]. e1 rows are keyed by GLOBAL party index
    (stream v2), so chunking over parties is value-identical to one big
    call. Same fused structure as the encryption kernel: the s^T A
    product runs through the scaled-digit Pallas matmul with the e1 NTT
    computed IN-KERNEL from signed digit planes (the prior column-space
    accumulation materialized ~600 MB of int32 columns in HBM per call
    and ran seconds instead of tens of ms at n=4096). Secrets take the
    small-coefficient NTT path when their bound allows; errors whose
    bound exceeds the signed-digit range fall back to NTT + addmod.
    """
    from ..ops import u64 as u64op
    from ..ops.pallas_modmat import matmul_fold_scaled

    ring = params.ring
    L, l, k = ring.num_limbs, ring.degree, params.k
    p = coeffs.shape[0]
    if ntt_ops.signed_digit_count(coeff_bound):
        sk_ch = ntt_ops.ntt_forward_signed_ch(coeffs, ring, coeff_bound)
    else:
        sk_ntt = ntt_ops.ntt_forward(
            modmat.from_signed_coeffs(coeffs, ring), ring
        )
        sk_ch = (jnp.transpose(sk_ntt[0], (2, 3, 0, 1)),
                 jnp.transpose(sk_ntt[1], (2, 3, 0, 1)))
    to_ch = lambda x: jnp.transpose(x, (2, 3, 0, 1))
    a_scaled = modmat.prescale_digits_band((to_ch(a_hi), to_ch(a_lo)), ring)
    b1 = params.error_bound_1
    noise = ntt_ops.noise_digit_planes(key, row_offset, p, k, l, b1)
    bh, bl = matmul_fold_scaled(
        sk_ch, a_scaled, ring, noise=noise, noise_bound=b1,
    )                                                  # [L, l, p, k]
    if noise is None:
        e1 = sample_uniform_residues_rows(key, row_offset, p, (k, l), b1, ring)
        e1h, e1l = ntt_ops.ntt_forward(e1, ring)       # [p, k, L, l]
        qh4 = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
        ql4 = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)
        bh, bl = u64op.addmod(
            bh, bl,
            jnp.transpose(e1h, (2, 3, 0, 1)), jnp.transpose(e1l, (2, 3, 0, 1)),
            qh4, ql4,
        )
    back = lambda x: jnp.transpose(x, (2, 3, 0, 1))    # -> [p, k, L, l]
    return back(bh), back(bl)


def _quantized_coeff_bound(coeffs: np.ndarray) -> int:
    """Static bound bucket for the keygen kernel: 127 / 32639 / huge."""
    m = int(np.abs(coeffs.astype(np.int64)).max()) if coeffs.size else 0
    for b in (127, 32639):
        if m <= b:
            return b
    return 1 << 40


def _keygen_chunk_size(params: PvwParameters) -> int:
    """Parties per kernel call so the dominant intermediates stay within
    budget. On the fused Pallas path those are the digitized lhs
    (S*k*nd int8/party), the noise planes, and the output pair
    (S*k*8 B/party); the XLA fallback additionally materializes the nd
    scaled columns (S*k*nd*4 B/party) — sized for the worst case."""
    ring = params.ring
    S = ring.num_limbs * ring.degree
    per_party = S * params.k * (5 * ring.num_digits + 10)
    chunk = max(8, min(8192, modmat.COLS_BYTES_BUDGET // max(per_party, 1)))
    # round down to a tile-friendly multiple so the fused Pallas kernel
    # gets legal (>= 8, divisible) m-tiles instead of falling back to XLA
    # on awkward chunk sizes (e.g. 308)
    if chunk > 256:
        chunk -= chunk % 256
    return chunk


class Party:
    """A protocol participant: index + secret key (``public_key.rs:17-22``)."""

    def __init__(self, index: int, secret_key: SecretKey) -> None:
        self.index = index
        self.secret_key = secret_key

    @classmethod
    def new(cls, index: int, params: PvwParameters, key: jax.Array) -> "Party":
        """``public_key.rs:62-79``."""
        if index >= params.n:
            raise InvalidParameters(
                f"Party index {index} exceeds maximum {params.n - 1}"
            )
        return cls(index, SecretKey.random(params, key))

    def generate_public_key(self, crs: PvwCrs, key: jax.Array) -> "PublicKey":
        """b_i = s_i^T A + e_i (``public_key.rs:85-92``)."""
        pk, _errors = PublicKey.generate(self.secret_key, crs, key)
        return pk

    # accessors (``public_key.rs:95-103``)
    def get_index(self) -> int:
        return self.index

    def get_secret_key(self) -> SecretKey:
        return self.secret_key


@partial(jax.jit, static_argnums=(0,))
def _single_pk_kernel(params: PvwParameters, a_hi, a_lo, coeffs, key):
    """One party's b = s^T A + e as a single program. Identical values to
    the eager Poly-op chain: from_coefficients -> NTT -> poly_matmul,
    128-bit bounded-uniform error -> NTT, modular add."""
    from ..poly import Poly as _Poly
    from ..poly import Representation as _Rep

    ring = params.ring
    sk = _Poly.from_coefficients(coeffs, ring).to_ntt()
    hi, lo = modmat.poly_matmul(
        (sk.hi[None], sk.lo[None]), (a_hi, a_lo), ring
    )
    errors = params.sample_error_1(key, batch=(params.k,))
    b = _Poly(hi[0], lo[0], _Rep.Ntt, ring) + errors
    return b.hi, b.lo, errors.hi, errors.lo


class PublicKey:
    """One party's k public-key polynomials (``public_key.rs:29-35``)."""

    def __init__(self, key_polynomials: Poly, params: PvwParameters) -> None:
        self.key_polynomials = key_polynomials  # Poly batch (k,), NTT
        self.params = params

    @classmethod
    def generate(
        cls, secret_key: SecretKey, crs: PvwCrs, key: jax.Array
    ) -> tuple["PublicKey", Poly]:
        """b = s^T A + e with e ~ U[-B1, B1]^l per component
        (``public_key.rs:111-147``). Returns (public_key, error_polys).

        The device branch runs as ONE jitted program (the eager chain of
        Poly ops cost ~0.6 s/party in per-op tunnel dispatches; values are
        identical — same primitives, same key stream)."""
        if secret_key.params.k != crs.params.k:
            raise DimensionMismatch(crs.params.k, secret_key.params.k)
        params = secret_key.params
        if params.error_bound_1 < min(params.ring.moduli):
            bh, bl, eh, el = _single_pk_kernel(
                params, crs.matrix.hi, crs.matrix.lo,
                jnp.asarray(secret_key.secret_coeffs, jnp.int32), key,
            )
            errors = Poly(eh, el, Representation.Ntt, params.ring)
            return cls(Poly(bh, bl, Representation.Ntt, params.ring),
                       params), errors
        sk_a = crs.multiply_by_secret_key(secret_key)           # Poly (k,)
        errors = params.sample_error_1(key, batch=(params.k,))  # Poly (k,)
        b = sk_a + errors
        return cls(b, params), errors

    def dimension(self) -> int:
        return self.key_polynomials.batch_shape[0]

    def get_polynomial(self, i: int) -> Optional[Poly]:
        if 0 <= i < self.dimension():
            return self.key_polynomials[i]
        return None

    def polynomials(self) -> Poly:
        return self.key_polynomials

    def validate(self) -> None:
        """``public_key.rs:168-187``."""
        if self.dimension() != self.params.k:
            raise InvalidParameters(
                f"Public key dimension {self.dimension()} doesn't match "
                f"parameter k={self.params.k}"
            )
        if self.key_polynomials.ring != self.params.ring:
            raise InvalidParameters("Public key polynomial context mismatch")

    def to_bytes(self) -> bytes:
        from ..utils.serialization import public_key_to_bytes
        return public_key_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PublicKey":
        from ..utils.serialization import public_key_from_bytes
        return public_key_from_bytes(data)


class GlobalPublicKey:
    """The n x k matrix B stacking every party's key row
    (``public_key.rs:42-54``)."""

    def __init__(self, crs: PvwCrs) -> None:
        """``GlobalPublicKey::new`` (``public_key.rs:196-208``)."""
        params = crs.params
        self.matrix = Poly.zero(
            params.ring, Representation.Ntt, batch=(params.n, params.k)
        )
        self.crs = crs
        self.params = params
        self.num_keys = 0
        # error_polynomials[party] -> Poly (k,) | None (``public_key.rs:52-53``)
        self.error_polynomials: list[Optional[Poly]] = []

    # -- insertion -------------------------------------------------------

    def add_public_key(self, index: int, public_key: PublicKey) -> None:
        """``public_key.rs:214-250``. Note ``num_keys`` tracks
        max(index)+1, NOT a count — quirk preserved (SURVEY.md §2.4.10)."""
        if index >= self.params.n:
            raise InvalidParameters(
                f"Party index {index} exceeds maximum {self.params.n - 1}"
            )
        public_key.validate()
        if public_key.params.k != self.params.k:
            raise InvalidParameters(
                f"Public key dimension {public_key.params.k} doesn't match "
                f"global key dimension {self.params.k}"
            )
        row = public_key.key_polynomials
        self.matrix = Poly(
            self.matrix.hi.at[index].set(row.hi),
            self.matrix.lo.at[index].set(row.lo),
            Representation.Ntt,
            self.params.ring,
        )
        if index >= self.num_keys:
            self.num_keys = index + 1

    def generate_and_add_party(self, party: Party, key: jax.Array) -> None:
        """``public_key.rs:256-263``."""
        pk = party.generate_public_key(self.crs, key)
        self.add_public_key(party.index, pk)

    def generate_and_add(self, index: int, secret_key: SecretKey,
                         key: jax.Array) -> None:
        """``public_key.rs:269-277``."""
        pk, _errors = PublicKey.generate(secret_key, self.crs, key)
        self.add_public_key(index, pk)

    def generate_and_add_with_errors(self, index: int, secret_key: SecretKey,
                                     key: jax.Array) -> None:
        """``public_key.rs:304-320`` — records the error polynomials for
        external PVSS proofs."""
        pk, errors = PublicKey.generate(secret_key, self.crs, key)
        self.add_public_key(index, pk)
        while len(self.error_polynomials) <= index:
            self.error_polynomials.append(None)
        self.error_polynomials[index] = errors

    def generate_and_add_party_with_errors(self, party: Party,
                                           key: jax.Array) -> None:
        """``public_key.rs:322-328``."""
        self.generate_and_add_with_errors(party.index, party.secret_key, key)

    # -- batch keygen (rayon sites P1/P2 -> one MXU contraction) ---------

    def generate_all_party_keys(self, parties: list[Party],
                                key: jax.Array) -> None:
        """All parties' b_i = s_i^T A + e_i in ONE batched matmul
        (``public_key.rs:376-401``)."""
        if len(parties) > self.params.n:
            raise InvalidParameters(
                f"Too many parties: {len(parties)} > {self.params.n}"
            )
        self._batch_generate(
            [p.secret_key for p in parties], [p.index for p in parties], key,
            record_errors=False,
        )

    def generate_all_keys(self, secret_keys: list[SecretKey],
                          key: jax.Array) -> None:
        """``public_key.rs:407-434`` — indices assigned in order."""
        if len(secret_keys) > self.params.n:
            raise InvalidParameters(
                f"Too many secret keys: {len(secret_keys)} > {self.params.n}"
            )
        self._batch_generate(secret_keys, list(range(len(secret_keys))), key,
                             record_errors=False)

    def generate_all_keys_device(self, coeffs, key: jax.Array,
                                 coeff_bound: int | None = None) -> None:
        """TPU-native batch keygen from DEVICE-RESIDENT secret coefficients
        (int32 [p, k, l], p <= n; indices 0..p-1): same values as
        :meth:`generate_all_keys` on SecretKeys built from the same
        coefficients, without the device->host->device round trip of the
        coefficient tensor (a 33 MB fetch costs up to minutes over a
        remote-device link). ``coeff_bound``: static max |coefficient|;
        defaults to the CBD bound of ``params.secret_variance``."""
        from ..sampling.cbd import cbd_bound

        if coeffs.shape[0] > self.params.n:
            raise InvalidParameters(
                f"Too many secret keys: {coeffs.shape[0]} > {self.params.n}"
            )
        if self.params.error_bound_1 >= min(self.params.ring.moduli):
            # the device error-sampling kernel requires bound < min modulus;
            # generate_all_keys falls back to host sampling for such
            # configs — fail loudly here instead of deep in the kernel.
            raise InvalidParameters(
                f"error_bound_1 {self.params.error_bound_1:#x} >= smallest "
                "modulus: device keygen unsupported, use generate_all_keys"
            )
        if coeff_bound is None:
            coeff_bound = cbd_bound(self.params.secret_variance)
        for b in (127, 32639):
            if coeff_bound <= b:
                coeff_bound = b
                break
        self._batch_generate_device(
            coeffs, list(range(coeffs.shape[0])), key, coeff_bound
        )

    def _batch_generate(self, secret_keys: list[SecretKey], indices: list[int],
                        key: jax.Array, record_errors: bool) -> None:
        del record_errors  # batch paths never record (matches reference)
        params = self.params
        coeffs = np.stack([sk.secret_coeffs for sk in secret_keys])
        if params.error_bound_1 < min(params.ring.moduli):
            self._batch_generate_device(
                jnp.asarray(coeffs), indices, key,
                _quantized_coeff_bound(coeffs),
            )
            return
        # huge-bound host sampling path (device kernel requires
        # bound < min modulus)
        sk_polys = Poly.from_coefficients(coeffs, params.ring).to_ntt()
        hi, lo = modmat.poly_matmul(sk_polys.pair, self.crs.matrix.pair,
                                    params.ring)
        errors = params.sample_error_1(key, batch=(len(secret_keys),
                                                   params.k))
        b = Poly(hi, lo, Representation.Ntt, params.ring) + errors
        self._place_rows(b.hi, b.lo, indices)

    def _batch_generate_device(self, coeffs, indices: list[int],
                               key: jax.Array, cb: int) -> None:
        params = self.params
        chunk = _keygen_chunk_size(params)
        p_total = coeffs.shape[0]
        if p_total <= chunk:
            bh, bl = _batch_keygen_kernel(
                params, self.crs.matrix.hi, self.crs.matrix.lo,
                jnp.asarray(coeffs), key, cb, 0,
            )
        else:
            # chunk over parties; stream v2 keeps values identical
            parts_h, parts_l = [], []
            for start in range(0, p_total, chunk):
                block = jnp.asarray(coeffs[start : start + chunk])
                h, lo_ = _batch_keygen_kernel(
                    params, self.crs.matrix.hi, self.crs.matrix.lo,
                    block, key, cb, start,
                )
                parts_h.append(h)
                parts_l.append(lo_)
            bh = jnp.concatenate(parts_h, axis=0)
            bl = jnp.concatenate(parts_l, axis=0)
        self._place_rows(bh, bl, indices)

    def _place_rows(self, bh, bl, indices: list[int]) -> None:
        # contiguous in-range index blocks take a slice-update (or a
        # straight replacement when the batch covers rows 0..n-1) — XLA
        # scatter on the [n, k, L, l] matrix measured ~2.8 s at n=4096 vs
        # ~ms here. Out-of-range indices fall back to scatter, which drops
        # them (the pre-optimization behavior; dynamic_update_slice would
        # clamp and misplace rows instead).
        params = self.params
        contiguous = indices == list(range(indices[0], indices[0] + len(indices)))
        in_range = indices and 0 <= indices[0] and indices[-1] < params.n
        if contiguous and in_range and indices[0] == 0 \
                and len(indices) == params.n:
            mh, ml = bh, bl
        elif contiguous and in_range:
            start = (indices[0],) + (0,) * (self.matrix.hi.ndim - 1)
            mh = jax.lax.dynamic_update_slice(self.matrix.hi, bh, start)
            ml = jax.lax.dynamic_update_slice(self.matrix.lo, bl, start)
        else:
            idx = jnp.asarray(indices, jnp.int32)
            mh = self.matrix.hi.at[idx].set(bh)
            ml = self.matrix.lo.at[idx].set(bl)
        self.matrix = Poly(mh, ml, Representation.Ntt, params.ring)
        for i in indices:
            if i >= self.num_keys:
                self.num_keys = i + 1

    # -- accessors -------------------------------------------------------

    def encrypt_operands(self):
        """Cached channel-major digit planes of (A, B) — the encryption-
        invariant lhs operands of the fused encryption kernel (int8
        [L, l, k, k*nd] / [L, l, n, k*nd]). Recomputed automatically when
        the key matrix changes (``self.matrix`` is reassigned by every
        mutator, so identity comparison is the invalidation signal; the
        cache holds references, so ids cannot be recycled)."""
        from ..ops import modmat

        src = (self.crs.matrix.hi, self.matrix.hi)
        cached = getattr(self, "_enc_ops", None)
        if cached is None or cached[0][0] is not src[0] \
                or cached[0][1] is not src[1]:
            planes = (
                modmat.lhs_digit_planes(*self.crs.matrix.pair,
                                        self.params.ring),
                modmat.lhs_digit_planes(*self.matrix.pair, self.params.ring),
            )
            self._enc_ops = (src, planes)
            cached = self._enc_ops
        return cached[1]

    def encrypt_operands_swapped(self):
        """Cached SCALED channel-major digit planes of (A, B) — the
        swapped-form lhs operands (int8 [L, l, nd, k, k*nd] /
        [L, l, nd, n, k*nd], :func:`pvw_tpu.ops.modmat.lhs_scaled_planes`).
        Moving the Shoup prescale onto the encryption-invariant side means
        each encryption's rhs needs only the plain digits of r — the
        per-call prescale (~30% of device time at the headline shape)
        amortizes to zero (DESIGN.md §5f). nd x the plain-plane footprint;
        same invalidation discipline as :meth:`encrypt_operands`."""
        from ..ops import modmat

        src = (self.crs.matrix.hi, self.matrix.hi)
        cached = getattr(self, "_enc_ops_swapped", None)
        if cached is None or cached[0][0] is not src[0] \
                or cached[0][1] is not src[1]:
            planes = (
                modmat.lhs_scaled_planes(*self.crs.matrix.pair,
                                         self.params.ring),
                modmat.lhs_scaled_planes(*self.matrix.pair,
                                         self.params.ring),
            )
            self._enc_ops_swapped = (src, planes)
            cached = self._enc_ops_swapped
        return cached[1]

    def get_public_key(self, index: int) -> Optional[PublicKey]:
        """``public_key.rs:283-301``."""
        if index >= self.num_keys:
            return None
        return PublicKey(self.matrix[index], self.params)

    def get_polynomial(self, i: int, j: int) -> Optional[Poly]:
        if 0 <= i < self.params.n and 0 <= j < self.params.k:
            return self.matrix[i, j]
        return None

    def dimensions(self) -> tuple[int, int]:
        return (self.params.n, self.params.k)

    def num_public_keys(self) -> int:
        return self.num_keys

    def is_full(self) -> bool:
        """``public_key.rs:349-351``."""
        return self.num_keys >= self.params.n

    def get_crs(self) -> PvwCrs:
        return self.crs

    def validate(self) -> None:
        """``public_key.rs:361-370``."""
        shape = self.matrix.batch_shape
        if shape != (self.params.n, self.params.k):
            raise InvalidParameters(
                f"Global public key matrix dimensions {shape[0]}×{shape[1]} "
                f"don't match parameters n={self.params.n}, k={self.params.k}"
            )

    def get_party_polynomials(self, party_index: int) -> Poly:
        """``public_key.rs:440-459``."""
        if party_index >= self.num_keys:
            raise InvalidParameters(f"Party index {party_index} not found")
        return self.matrix[party_index]

    def get_party_errors(self, party_index: int) -> Optional[Poly]:
        if 0 <= party_index < len(self.error_polynomials):
            return self.error_polynomials[party_index]
        return None

    def get_all_errors(self) -> list[Optional[Poly]]:
        return self.error_polynomials

    def __repr__(self) -> str:
        return (
            f"GlobalPublicKey(n={self.params.n}, k={self.params.k}, "
            f"num_keys={self.num_keys})"
        )

    def to_bytes(self) -> bytes:
        from ..utils.serialization import global_public_key_to_bytes
        return global_public_key_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "GlobalPublicKey":
        from ..utils.serialization import global_public_key_from_bytes
        return global_public_key_from_bytes(data)
