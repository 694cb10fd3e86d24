"""PVW encryption: vector, share-distribution, and broadcast modes.

Rebuild of ``/root/reference/src/crypto/encryption.rs``. The math is the
reference's (c1 = A·r + e1, c2 = B·r + e2 + encode(m⃗)); the execution
shape is TPU-native:

- every mode runs through ONE jitted kernel batched over d independent
  encryptions: r is a [k, d] block, so ``A·r`` and ``B·r`` are
  [k,k]x[k,d] and [n,k]x[k,d] int8-digit MXU matmuls instead of the
  reference's rayon loops (P3-P6, SURVEY.md §2.2);
- the gadget encode is a constant Shoup multiply against the precomputed
  NTT-domain gadget table (``parameters.rs:344-367`` does a BigInt->RNS
  conversion + NTT per scalar per call);
- randomness is counter-based (threefry keys), so a fixed key gives
  bit-identical ciphertexts on any device count or mesh shape — the
  reference's ``thread_rng`` paths are irreproducible by construction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import InvalidParameters
from ..keys.public_key import GlobalPublicKey
from ..ops import modmat, ntt as ntt_ops, u64 as u64op
from ..params.parameters import PvwParameters
from ..poly import Poly, Representation
from ..sampling.cbd import cbd_bound, sample_vec_cbd_rows
from ..sampling.uniform import (
    sample_uniform_residues_rows,
    sample_uniform_signed_rows,
)


class PvwCiphertext:
    """c1 in R_q^k, c2 in R_q^n (``encryption.rs:15-24``).

    c1/c2 are Poly batches of shape (k,)/(n,) — or (k, d)/(n, d) for the
    batched variants, where slice d indexes an independent ciphertext.
    """

    def __init__(self, c1: Poly, c2: Poly, params: PvwParameters) -> None:
        self.c1 = c1
        self.c2 = c2
        self.params = params

    def __len__(self) -> int:
        """Number of encrypted values == n (``encryption.rs:27-30``)."""
        return self.c2.batch_shape[0]

    def is_empty(self) -> bool:
        return self.c1.batch_shape[0] == 0 and self.c2.batch_shape[0] == 0

    def validate(self) -> None:
        """``encryption.rs:41-76``."""
        if self.c1.batch_shape[0] != self.params.k:
            raise InvalidParameters(
                f"c1 has {self.c1.batch_shape[0]} components but should have "
                f"k={self.params.k}"
            )
        if self.c2.batch_shape[0] != self.params.n:
            raise InvalidParameters(
                f"c2 has {self.c2.batch_shape[0]} components but should have "
                f"n={self.params.n}"
            )
        if self.c1.ring != self.params.ring or self.c2.ring != self.params.ring:
            raise InvalidParameters("ciphertext context mismatch")

    def get_party_ciphertext(self, party_index: int) -> Optional[Poly]:
        """``encryption.rs:82-84``."""
        if 0 <= party_index < self.c2.batch_shape[0]:
            return self.c2[party_index]
        return None

    def c1_components(self) -> Poly:
        return self.c1

    def c2_components(self) -> Poly:
        return self.c2

    def __repr__(self) -> str:
        return (
            f"PvwCiphertext(k={self.c1.batch_shape}, n={self.c2.batch_shape})"
        )

    def to_bytes(self) -> bytes:
        from ..utils.serialization import ciphertext_to_bytes
        return ciphertext_to_bytes(self)

    @classmethod
    def from_bytes(cls, data: bytes) -> "PvwCiphertext":
        from ..utils.serialization import ciphertext_from_bytes
        return ciphertext_from_bytes(data)


# --------------------------------------------------------------------------
# the jitted batched kernel
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 6, 9))
def _encrypt_kernel(params: PvwParameters, a_dig, b_dig, sc_hi, sc_lo, key,
                    encode32: bool = False, host_e1=None, host_e2=None,
                    stream: str | None = "v4", col_off=0):
    """d-batched PVW encryption.

    a_dig: CRS digit planes int8 [L, l, k, k*nd]; b_dig: global pk digit
    planes int8 [L, l, n, k*nd] (both from
    :func:`pvw_tpu.ops.modmat.lhs_digit_planes` — encryption-invariant,
    cached on :class:`GlobalPublicKey.encrypt_operands`);
    sc_*: scalars as uint32 pairs [d, n]; key: threefry key.
    ``encode32`` (static): all scalars are < 2^32 — host-checked by
    :func:`encrypt_batch` — so the in-kernel encode uses one 32-bit Shoup
    multiply and skips the i64-wrap correction.
    ``host_e1``/``host_e2``: optional NTT-domain channel-major noise pairs
    ([L, l, rows, d]) pre-sampled on the host for error bounds >= the
    smallest RNS modulus (the reference's BigInt sampling path,
    ``encryption.rs:161-173`` -> ``parameters.rs:263-284``, supports any
    bound; device sampling cannot embed such values in one subtraction, so
    :func:`encrypt_batch` samples them exactly with Python ints instead).
    Returns CHANNEL-MAJOR pairs c1 [L, l, k, d], c2 [L, l, n, d] — the
    layout the kernels emit; :func:`encrypt_batch` wraps them in lazy
    channel-major Polys so the [*, L, l] transpose (the third-largest
    device cost of a batch) is paid only if a canonical consumer asks.
    """
    ring = params.ring
    k, n, l = params.k, params.n, params.l
    L = ring.num_limbs
    d = sc_hi.shape[0]
    # SWAPPED operand form (DESIGN.md §5f): 5-D lhs planes carry the
    # Shoup scales (cached per key set), so r needs only plain digits
    swapped = a_dig.ndim == 5
    k_r, k_e1, k_e2 = jax.random.split(key, 3)

    # r: row-keyed CBD ("stream v2": row j from fold_in(k_r, j), so mesh
    # shards sample only their k-block; see sampling/uniform.py) ->
    # coefficients [k, d, l] -> NTT via the small-coefficient path (CBD
    # values fit one signed digit).                      (encryption.rs:132-154)
    # Under v3k, r comes from the global-counter CBD twin ("cbd-k",
    # ops/tfry.py) so the WHOLE encryption — r and noise — is
    # batch-shape/mesh/tile independent (the dealer data-parallel
    # bit-identity contract, parallel/data_parallel.py).
    if stream == "v3k":
        from ..ops import tfry

        rk0, rk1 = tfry.key_words(k_r)
        r_coeffs = tfry.v3k_cbd_values(rk0, rk1, 0, k, d, l,
                                       params.secret_variance, col_off)
    else:
        r_coeffs = sample_vec_cbd_rows(k_r, 0, k, (d, l),
                                       params.secret_variance)
    r_bound = cbd_bound(params.secret_variance)

    # Structure, measured on v5e (benchmarks/ablate_encrypt.py + probes):
    # both matrix products run through the fused Pallas matmul+fold on
    # TPU (the int32 column tensor never leaves VMEM; XLA elsewhere).
    # The errors ride INTO the same kernel as raw signed digit planes:
    # the error NTT's scaled-digit columns are produced and consumed in
    # VMEM (ring.ntt_scaled_tab contraction) — the separate NTT+addmod
    # path wrote/read the [rows,d,L,l] residues plus a 2nd-1-column int32
    # tensor through HBM, ~20 ms of the 39 ms batch-1024 call. The gadget
    # encode addmods in the kernel epilogue (``post=``). Bounds too large
    # for signed digits (> 32639) fall back to the residue path.
    #
    # On TPU the noise is GENERATED INSIDE the kernel by default ("stream
    # v4": per-tile-seeded hardware PRNG, same floor(x*range/2^96) exact
    # reduction — see pallas_modmat._make_fold_body) — the separate
    # threefry draw was ~15% of device time and its digit planes another
    # HBM round trip. PVW_TPU_NOISE=v3 restores the threefry stream
    # (bit-identical to the CPU backend); off-TPU always uses v3.
    from ..config import settings
    from ..ops.pallas_modmat import (
        kernel_noise_available, matmul_fold_scaled, matmul_fold_swapped,
        swapped_available,
    )
    from ..ops.ntt import signed_digit_count

    # stream routing (the ``stream`` STATIC argument — callers read
    # config.settings.kernel_noise_stream() at call time so a settings
    # change re-traces instead of silently reusing a stale stream):
    # "v4" = in-kernel hardware PRNG, "v3k" = in-kernel Threefry-2x32-20
    # (specified CSPRNG, bit-identical across backends — ops/tfry.py),
    # None = legacy v3 separate threefry pass. The swapped kernel
    # variant supports v4 only.

    def _gen_noise(kk, rows, bound, has_post, has_encode):
        """(seeds, jr, bound[, "tfry"]) for the in-kernel PRNG path, or
        None (v3 / fallback planes)."""
        if stream is None:
            return None
        jr = signed_digit_count(bound)
        if swapped:
            avail = stream == "v4" and swapped_available(
                ring, rows, d, k, bound, has_encode)
        else:
            avail = kernel_noise_available(
                ring, rows, d, k, bound, has_post, has_encode,
                tfry=stream == "v3k")
        if not jr or not avail:
            return None
        kd_words = jax.lax.bitcast_convert_type(
            jax.random.key_data(kk).reshape(2), jnp.int32)
        # last seed word = GLOBAL column offset (dealer-batch
        # data-parallel sharding; 0 everywhere else)
        seeds = jnp.concatenate([
            kd_words, jnp.zeros(1, jnp.int32),
            jnp.asarray(col_off, jnp.int32).reshape(1)])
        if stream == "v3k":
            return (seeds, jr, int(bound), "tfry")
        return (seeds, jr, int(bound))

    def _noise_planes(kk, rows, bound):
        """int8 signed-digit planes [l*jr, rows, d], or None (big bound).
        Under v3k the planes come from the v3k reference stream (the
        XLA twin of the in-kernel threefry — bit-identical values), so a
        given noise_stream setting means ONE stream regardless of
        backend or kernel availability."""
        if stream == "v3k":
            from ..ops import tfry

            if not signed_digit_count(bound):
                return None
            k0, k1 = tfry.key_words(kk)
            return tfry.v3k_noise_digit_planes(k0, k1, 0, rows, d, l,
                                               bound, col_off)
        return ntt_ops.noise_digit_planes(kk, 0, rows, d, l, bound)

    def _noise_residues_ch(kk, rows, bound):
        e = sample_uniform_residues_rows(kk, 0, rows, (d, l), bound, ring)
        eh, el = ntt_ops.ntt_forward(e, ring)            # [rows, d, L, l]
        return (jnp.transpose(eh, (2, 3, 0, 1)),
                jnp.transpose(el, (2, 3, 0, 1)))

    qh4 = jnp.asarray(ring.q_hi).reshape(L, 1, 1, 1)
    ql4 = jnp.asarray(ring.q_lo).reshape(L, 1, 1, 1)

    # r is the shared rhs of both products. Swapped form: PLAIN digits
    # only (the Shoup scales live on the cached lhs planes — DESIGN.md
    # §5f; the per-call prescale was ~30% of device time at the headline
    # shape). Banded form: prescale the digits ONCE (scaled-digit form,
    # see ops/modmat.prescale_digits_band) so each matmul contracts over
    # (k, nd) and folds only nd narrow columns.
    from ..ops.pallas_modmat import ntt_prescale_available, ntt_prescale_band

    if swapped:
        r_ch = ntt_ops.ntt_forward_signed_ch(r_coeffs, ring, r_bound)
        r_op = modmat.rhs_digit_cols(r_ch, ring)        # [L,l,k*nd,d]
    elif (settings.use_fused_prescale(ring.num_digits)
          and ntt_prescale_available(ring, k, d, r_bound)):
        # deep chains (nd >= 8): the one-pass Pallas NTT+prescale kernel
        # measured 0.78-0.89x the XLA pipeline below (BASELINE.md r4;
        # bit-identical, tests/test_swapped.py)
        r_op = ntt_prescale_band(r_coeffs, ring, r_bound)
    else:
        r_ch = ntt_ops.ntt_forward_signed_ch(r_coeffs, ring, r_bound)
        r_op = modmat.prescale_digits_band(r_ch, ring)  # [L,l,nd,k*nd,d]

    def _product(lhs_dig, gen_noise=None, noise=None, encode=None,
                 noise_bound=None):
        if swapped:
            return matmul_fold_swapped(
                lhs_dig, r_op, ring, noise=noise, encode=encode,
                encode32=encode32, gen_noise=gen_noise,
                noise_bound=noise_bound,
            )
        return matmul_fold_scaled(
            None, r_op, ring, noise=noise, encode=encode,
            lhs_dig=lhs_dig, encode32=encode32, gen_noise=gen_noise,
            noise_bound=noise_bound,
        )

    # c1 = A·r + e1                                      (encryption.rs:156-173)
    g1 = (None if host_e1 is not None
          else _gen_noise(k_e1, k, params.error_bound_1, False, False))
    if g1 is not None:
        c1h, c1l = _product(a_dig, gen_noise=g1)                # [L,l,k,d]
    else:
        n1 = (None if host_e1 is not None
              else _noise_planes(k_e1, k, params.error_bound_1))
        c1h, c1l = _product(a_dig, noise=n1,
                            noise_bound=params.error_bound_1)
        if n1 is None:
            e1h, e1l = (host_e1 if host_e1 is not None else
                        _noise_residues_ch(k_e1, k, params.error_bound_1))
            c1h, c1l = u64op.addmod(c1h, c1l, e1h, e1l, qh4, ql4)

    # encode: m·g in NTT domain, computed INSIDE the matmul kernel from the
    # scalar pair tile + per-channel constants (g, Shoup(g), and the
    # u64->i64 wrap correction (2^64 mod q)·g — encryption.rs:195
    # semantics); the [L,l,n,d] encode residues never exist in HBM.
    from ..ops.pallas_modmat import encode_tab

    etab = jnp.asarray(encode_tab(
        params.gadget_ntt, params.gadget_ntt_shoup, params.gadget_wrap,
        ring.moduli,
    ))
    enc = (jnp.transpose(sc_hi), jnp.transpose(sc_lo), etab)     # sc [n, d]

    # c2 = B·r + encode(scalars) + e2                    (encryption.rs:175-200)
    g2 = (None if host_e2 is not None
          else _gen_noise(k_e2, n, params.error_bound_2, False, True))
    if g2 is not None:
        c2h, c2l = _product(b_dig, gen_noise=g2, encode=enc)    # [L,l,n,d]
    else:
        n2 = (None if host_e2 is not None
              else _noise_planes(k_e2, n, params.error_bound_2))
        c2h, c2l = _product(b_dig, noise=n2, encode=enc,
                            noise_bound=params.error_bound_2)
        if n2 is None:
            e2h, e2l = (host_e2 if host_e2 is not None else
                        _noise_residues_ch(k_e2, n, params.error_bound_2))
            c2h, c2l = u64op.addmod(c2h, c2l, e2h, e2l, qh4, ql4)
    return c1h, c1l, c2h, c2l                         # channel-major


def _encode_channel_major(params, sc_hi, sc_lo, ring):
    """Gadget encode of u64 scalar pairs [d, n] -> residue pair
    [L, l, n, d] (channel-major, ready for the matmul ``post=`` input).
    Same math as ``shoup_scale_table`` + wrap-select (``encryption.rs:195``
    semantics: scalars >= 2^63... the u64->i64 reinterpretation quirk is
    handled by subtracting (2^64 mod q)·g when the high bit is set)."""
    L = ring.num_limbs
    xh = jnp.transpose(sc_hi)[None, None]                # [1, 1, n, d]
    xl = jnp.transpose(sc_lo)[None, None]
    exp = lambda t: jnp.asarray(t)[:, :, None, None]     # [L, l, 1, 1]
    gh, gl = u64op.split_u64_np(params.gadget_ntt)
    sh, sl = u64op.split_u64_np(params.gadget_ntt_shoup)
    qh, ql = exp(ring.q_hi[:, None]), exp(ring.q_lo[:, None])
    eh, el = u64op.shoup_mul64_arr(
        xh, xl, exp(gh), exp(gl), exp(sh), exp(sl), qh, ql
    )
    wh_, wl_ = u64op.split_u64_np(params.gadget_wrap)
    wh2, wl2 = u64op.submod(eh, el, exp(wh_), exp(wl_), qh, ql)
    neg = (jnp.transpose(sc_hi) >= jnp.uint32(1 << 31))[None, None]
    return jnp.where(neg, wh2, eh), jnp.where(neg, wl2, el)


def _scalars_to_pairs(scalars) -> tuple[jax.Array, jax.Array]:
    arr = np.asarray(scalars, np.uint64)
    hi, lo = u64op.split_u64_np(arr)
    return jnp.asarray(hi), jnp.asarray(lo)


def _host_noise_ch(kk: jax.Array, rows: int, d: int, bound: int, params):
    """Exact host sampling of uniform noise in [-bound, bound] for bounds
    >= the smallest RNS modulus (the reference's BigInt path supports any
    bound, ``parameters.rs:263-284`` / ``uniform.rs:5-22``), returned as
    NTT-domain channel-major pairs [L, l, rows, d] ready for the kernel's
    post-matmul addmod. Deterministic in ``kk``."""
    from ..sampling.uniform import sample_uniform_residues_host

    ring = params.ring
    eh, el = sample_uniform_residues_host(
        kk, (rows, d, params.l), bound, ring
    )                                                   # [rows, d, L, l]
    eh, el = ntt_ops.ntt_forward((eh, el), ring)
    return (jnp.transpose(eh, (2, 3, 0, 1)),
            jnp.transpose(el, (2, 3, 0, 1)))


def _host_noise_pairs(params, key: jax.Array, d: int,
                      min_q: int | None = None):
    """(host_e1, host_e2) for :func:`_encrypt_kernel` — non-None only for
    the error bounds the device sampler cannot embed (>= min(q_i)).
    Splits ``key`` exactly like the kernel does, so the host draw consumes
    the same logical stream slot the device draw would have.

    ``min_q``: the routing threshold — limb-restricted callers pass the
    FULL ring's smallest modulus so every limb shard makes the same
    host/device decision the full-ring path makes (a bound can exceed the
    full ring's minimum while staying under a restricted subset's)."""
    if min_q is None:
        min_q = min(params.ring.moduli)
    if max(params.error_bound_1, params.error_bound_2) < min_q:
        return None, None
    _, k_e1, k_e2 = jax.random.split(key, 3)
    host_e1 = host_e2 = None
    if params.error_bound_1 >= min_q:
        host_e1 = _host_noise_ch(k_e1, params.k, d, params.error_bound_1,
                                 params)
    if params.error_bound_2 >= min_q:
        host_e2 = _host_noise_ch(k_e2, params.n, d, params.error_bound_2,
                                 params)
    return host_e1, host_e2


def _swapped_form_ok(params: PvwParameters, d: int) -> bool:
    """Route to the swapped operand form (scales on the cached lhs,
    plain-digit rhs — DESIGN.md §5f) when explicitly enabled and the TPU
    kernel supports both products at this shape.

    OFF by default: although the swapped dots match the banded MXU rate
    in isolation (probe_swap) and the per-encryption r-stage drops from
    ~21.6 to ~14 ms at the headline batch, the full kernel measured ~5%
    slower end-to-end (111.6k vs 117.0k enc/s, r4 same-session — the
    wider n-tiles the swapped block economics force degrade the
    epilogue/noise path more than the prescale saving). Kept as a
    measured, opt-in branch (settings.swapped_form / PVW_TPU_SWAPPED)."""
    from ..config import settings
    from ..ops.pallas_modmat import swapped_available

    if not settings.swapped_form or d < 128:
        return False
    ring = params.ring
    return (swapped_available(ring, params.n, d, params.k,
                              params.error_bound_2, True)
            and swapped_available(ring, params.k, d, params.k,
                                  params.error_bound_1, False))


def encrypt_batch(all_scalars, global_pk: GlobalPublicKey,
                  key: jax.Array) -> PvwCiphertext:
    """Encrypt d independent scalar vectors in one kernel call.

    ``all_scalars``: [d, n] u64. Returns a batched PvwCiphertext with
    c1 [k, d], c2 [n, d]. This is the TPU-native throughput path; the d
    axis is what keeps the MXU busy (matvec -> matmul)."""
    params = global_pk.params
    arr = np.asarray(all_scalars, np.uint64)
    if arr.ndim != 2 or arr.shape[1] != params.n:
        raise InvalidParameters(
            f"Must provide exactly n={params.n} scalars, got "
            f"{arr.shape[-1] if arr.ndim else 0}"
        )
    if not global_pk.is_full():
        raise InvalidParameters(
            "Global public key is not complete (missing party keys)"
        )
    if not params.verify_correctness_condition():
        raise InvalidParameters(
            "Parameters do not satisfy correctness condition - decryption "
            "may fail"
        )
    from ..config import settings

    sc_hi, sc_lo = _scalars_to_pairs(arr)
    encode32 = not bool(np.any(arr >> np.uint64(32)))
    # bounds >= min(q_i): exact host sampling (the reference's BigInt
    # path accepts any bound — encryption.rs:161-173)
    host_e1, host_e2 = _host_noise_pairs(params, key, arr.shape[0])
    # SWAPPED operand form on TPU (DESIGN.md §5f): the cached lhs planes
    # carry the Shoup scales, removing the per-call rhs prescale
    if (host_e1 is None and host_e2 is None
            and _swapped_form_ok(params, arr.shape[0])):
        a_dig, b_dig = global_pk.encrypt_operands_swapped()
    else:
        a_dig, b_dig = global_pk.encrypt_operands()
    c1h, c1l, c2h, c2l = _encrypt_kernel(
        params, a_dig, b_dig, sc_hi, sc_lo, key, encode32,
        host_e1, host_e2, settings.kernel_noise_stream(),
    )
    c1 = Poly.from_channel_major(c1h, c1l, Representation.Ntt, params.ring)
    c2 = Poly.from_channel_major(c2h, c2l, Representation.Ntt, params.ring)
    return PvwCiphertext(c1, c2, params)


def _squeeze_batch(ct: PvwCiphertext) -> PvwCiphertext:
    def squeeze(p: Poly) -> Poly:
        if p.is_channel_major:
            ch, cl = p.channel_pair()             # [L, l, rows, 1]
            return Poly.from_channel_major(ch[..., 0], cl[..., 0],
                                           p.rep, p.ring)
        return Poly(p.hi[:, 0], p.lo[:, 0], p.rep, p.ring)

    return PvwCiphertext(squeeze(ct.c1), squeeze(ct.c2), ct.params)


def encrypt(scalars, global_pk: GlobalPublicKey, key: jax.Array) -> PvwCiphertext:
    """Encrypt one length-n vector: party i can decrypt scalars[i]
    (``encryption.rs:105-214``)."""
    arr = np.asarray(scalars, np.uint64)
    if arr.ndim != 1:
        raise InvalidParameters("scalars must be a 1-D vector")
    ct = encrypt_batch(arr[None, :], global_pk, key)
    ct = _squeeze_batch(ct)
    ct.validate()
    return ct


def encrypt_party_shares(party_shares, party_index: int,
                         global_pk: GlobalPublicKey, key: jax.Array) -> PvwCiphertext:
    """PVSS dealer mode (``encryption.rs:221-245``)."""
    params = global_pk.params
    if party_index >= params.n:
        raise InvalidParameters(
            f"Party index {party_index} exceeds maximum {params.n - 1}"
        )
    shares = np.asarray(party_shares, np.uint64)
    if shares.shape != (params.n,):
        raise InvalidParameters(
            f"Party must provide {params.n} shares, got {shares.shape[0] if shares.ndim else 0}"
        )
    return encrypt(shares, global_pk, key)


def encrypt_all_party_shares(all_shares, global_pk: GlobalPublicKey,
                             key: jax.Array) -> list[PvwCiphertext]:
    """All n dealers' encryptions at once (``encryption.rs:253-286``).

    The reference parallelizes with rayon over dealers (P6); here all n
    encryptions share one batched kernel call (the d axis), then are split
    into per-dealer ciphertexts for API parity. Use
    :func:`encrypt_all_party_shares_batched` to keep the batch form."""
    ct = encrypt_all_party_shares_batched(all_shares, global_pk, key)
    n = global_pk.params.n
    out = []
    for d in range(n):
        out.append(PvwCiphertext(
            Poly(ct.c1.hi[:, d], ct.c1.lo[:, d], ct.c1.rep, ct.c1.ring),
            Poly(ct.c2.hi[:, d], ct.c2.lo[:, d], ct.c2.rep, ct.c2.ring),
            ct.params,
        ))
    return out


def encrypt_all_party_shares_batched(all_shares, global_pk: GlobalPublicKey,
                                     key: jax.Array) -> PvwCiphertext:
    """Batched form of :func:`encrypt_all_party_shares`: returns ONE
    PvwCiphertext with c1 [k, n_dealers], c2 [n, n_dealers]."""
    params = global_pk.params
    shares = np.asarray(all_shares, np.uint64)
    if shares.shape[0] != params.n:
        raise InvalidParameters(
            f"Must provide shares for all {params.n} parties"
        )
    for dealer_idx in range(shares.shape[0]):
        if shares[dealer_idx].shape != (params.n,):
            raise InvalidParameters(
                f"Dealer {dealer_idx} provided {shares[dealer_idx].shape[0]} "
                f"shares but needs {params.n}"
            )
    return encrypt_batch(shares, global_pk, key)


def encrypt_broadcast(scalar: int, global_pk: GlobalPublicKey,
                      key: jax.Array) -> PvwCiphertext:
    """Same value for every party (``encryption.rs:292-296``)."""
    vals = np.full((global_pk.params.n,), np.uint64(scalar), np.uint64)
    return encrypt(vals, global_pk, key)
