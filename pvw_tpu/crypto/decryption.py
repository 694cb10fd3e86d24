"""PVW decryption: device inner products + exact sequential-rounding decode.

Rebuild of ``/root/reference/src/crypto/decryption.rs``. Two stages:

1. Device: z = <s, c1> - c2[i] (``decryption.rs:257-274``) as a batched
   digit-matmul over the k axis (the reference's rayon site P7), then one
   inverse NTT. Batched over dealers/ciphertexts.

2. Host: the PVW sequential-rounding decode (``decode_scalar_pvw_rns``,
   ``decryption.rs:10-58``) on CRT-lifted integers. The reference dresses
   this scalar recurrence in ~6l NTT/CRT round-trips of constant
   polynomials (quirk SURVEY.md §2.4.4); here it is plain exact integer
   arithmetic with the reference's conventions preserved EXACTLY:
   - centering subtracts q only for values STRICTLY greater than q//2
     (``decryption.rs:140-152``);
   - every intermediate is re-reduced mod q (values lived as polys mod q);
   - the rounding division is sign-split truncated division
     ((2a±Δ)/(2Δ), ``decryption.rs:180-207``, tests/crypto.rs:308-330);
   - modulo Δ^(l-1) uses Rust's truncated %, centered with the
     half_mod = m/2 convention (``decryption.rs:154-178``);
   - the final noise clamp maps small negatives (|v| <= 1000) to 0 and
     wraps large negatives mod q (``decryption.rs:226-247``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import DecodingError, InternalError, InvalidParameters
from ..keys.secret_key import SecretKey
from ..ops import modmat, ntt as ntt_ops, u64 as u64op
from ..params.parameters import PvwParameters
from ..utils.intmath import center_mod, rust_div, rust_rem
from . import device_decode
from .encryption import PvwCiphertext


# --------------------------------------------------------------------------
# device stage
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def _noisy_message_kernel(params: PvwParameters, sk_hi, sk_lo,
                          c1_hi, c1_lo, c2_hi, c2_lo):
    """z = <s, c1> - c2, inverse-NTT'd to PowerBasis.

    sk_*: [k, L, l] (NTT); c1_*: [k, d, L, l]; c2_*: [d, L, l]
    -> STACKED residues uint32 [2, d, L, l] (hi, lo) in PowerBasis — one
    array so the host decode needs a single device->host fetch (each
    fetch costs a ~25 ms sync over the axon tunnel).
    """
    ring = params.ring
    lhs = (sk_hi[None], sk_lo[None])                       # [1, k, L, l]
    prod = modmat.poly_matmul(lhs, (c1_hi, c1_lo), ring)   # [1, d, L, l]
    z = modmat.poly_sub((prod[0][0], prod[1][0]), (c2_hi, c2_lo), ring)
    zh, zl = ntt_ops.ntt_inverse(z, ring)
    return jnp.stack([zh, zl])


@partial(jax.jit, static_argnums=(0,))
def _noisy_message_kernel_ch(params: PvwParameters, sk_hi, sk_lo,
                             c1ch_hi, c1ch_lo, c2ch_hi, c2ch_lo):
    """Channel-major twin of :func:`_noisy_message_kernel` — consumes the
    layout :func:`pvw_tpu.crypto.encryption._encrypt_kernel` natively
    emits, skipping the big [*, L, l] transposes on both ciphertext
    operands.

    sk_*: [k, L, l] (NTT); c1ch_*: [L, l, k, d]; c2ch_*: [L, l, d]
    -> STACKED residues uint32 [2, d, L, l] (hi, lo) in PowerBasis.
    """
    ring = params.ring
    skc = (jnp.transpose(sk_hi, (1, 2, 0))[:, :, None, :],   # [L, l, 1, k]
           jnp.transpose(sk_lo, (1, 2, 0))[:, :, None, :])
    ph, pl = modmat.matmul_channels(skc, (c1ch_hi, c1ch_lo), ring)
    qh = jnp.asarray(ring.q_hi)[:, None, None]
    ql = jnp.asarray(ring.q_lo)[:, None, None]
    zh, zl = u64op.submod(ph[:, :, 0], pl[:, :, 0], c2ch_hi, c2ch_lo,
                          qh, ql)                            # [L, l, d]
    zh = jnp.transpose(zh, (2, 0, 1))                        # [d, L, l]
    zl = jnp.transpose(zl, (2, 0, 1))
    oh, ol = ntt_ops.ntt_inverse((zh, zl), ring)
    return jnp.stack([oh, ol])


@partial(jax.jit, static_argnums=(0,))
def _decrypt_decode_kernel(params: PvwParameters, sk_hi, sk_lo,
                           c1_hi, c1_lo, c2_hi, c2_lo):
    """Fully-fused decryption: <s,c1> - c2, inverse NTT, AND the exact
    sequential-rounding decode (:mod:`pvw_tpu.crypto.device_decode`) in
    ONE device program. The only host fetch is 8 bytes per message.
    Returns stacked uint32 [2, d] (message hi, lo)."""
    z = _noisy_message_kernel(params, sk_hi, sk_lo, c1_hi, c1_lo,
                              c2_hi, c2_lo)
    plan = device_decode.get_plan(params)
    return device_decode.decode_residues(plan, z[0], z[1])


@partial(jax.jit, static_argnums=(0,))
def _decrypt_decode_kernel_ch(params: PvwParameters, sk_hi, sk_lo,
                              c1ch_hi, c1ch_lo, c2ch_hi, c2ch_lo):
    """Channel-major twin of :func:`_decrypt_decode_kernel`."""
    z = _noisy_message_kernel_ch(params, sk_hi, sk_lo, c1ch_hi, c1ch_lo,
                                 c2ch_hi, c2ch_lo)
    plan = device_decode.get_plan(params)
    return device_decode.decode_residues(plan, z[0], z[1])


@partial(jax.jit, static_argnums=(0,))
def _decrypt_decode_subset_kernel(params: PvwParameters, sk_hi, sk_lo,
                                  c1_hi, c1_lo, c2_hi, c2_lo, sel):
    """Subset decrypt: gather the selected dealer columns AND run the
    fused decrypt-decode in ONE program — XLA fuses the gather into the
    contraction's operand reads; dispatching the takes separately
    measured 1.7x slower per share (benchmarks/time_threshold.py)."""
    args = (params, sk_hi, sk_lo,
            jnp.take(c1_hi, sel, axis=1), jnp.take(c1_lo, sel, axis=1),
            jnp.take(c2_hi, sel, axis=0), jnp.take(c2_lo, sel, axis=0))
    return _decrypt_decode_kernel(*args)


@partial(jax.jit, static_argnums=(0,))
def _decrypt_decode_subset_kernel_ch(params: PvwParameters, sk_hi, sk_lo,
                                     c1ch_hi, c1ch_lo, c2ch_hi, c2ch_lo,
                                     sel):
    """Channel-major twin of :func:`_decrypt_decode_subset_kernel`."""
    args = (params, sk_hi, sk_lo,
            jnp.take(c1ch_hi, sel, axis=3), jnp.take(c1ch_lo, sel, axis=3),
            jnp.take(c2ch_hi, sel, axis=2), jnp.take(c2ch_lo, sel, axis=2))
    return _decrypt_decode_kernel_ch(*args)


# Measured device/host crossover for the DEFAULT routing (BASELINE.md
# "adaptive decode routing"): a single-message device dispatch costs
# ~559 µs pipelined / ~25 ms synced over the tunnel, while the full host
# path (native contraction + inverse NTT + decode) runs in tens of µs —
# so batches below this size decrypt on the host when the native engine
# supports the parameter set. Override with PVW_TPU_DECODE_CROSSOVER.
_HOST_CROSSOVER = 64


def _host_crossover() -> int:
    from ..config import settings

    return settings.decode_crossover


def _decode_mode(params: PvwParameters, d: int | None = None) -> str:
    """Decode engine selection: ``PVW_TPU_DECODE`` in {auto, device, host,
    native, python}. ``auto`` (the default) routes batches smaller than
    the measured crossover (~64 messages) to the full HOST path — native
    C++ contraction + inverse NTT + decode, no accelerator dispatch
    (``decryption.rs:249-278``) — and everything else to the fused
    on-device decode. Explicit modes: ``device`` (always on-device),
    ``host`` (full host decrypt), ``native`` (device contraction + native
    host decode), ``python`` (device contraction + Python oracle)."""
    from ..config import settings
    from ..utils import native_decode

    no_native = settings.no_native
    mode = settings.decode_mode
    if mode == "auto":
        if (d is not None and d < _host_crossover() and not no_native
                and native_decode.decrypt_decode_supported(params)):
            return "host"
        mode = "device"
    if mode == "host" and (
            no_native or not native_decode.decrypt_decode_supported(params)):
        mode = "device"
    if mode == "device" and not device_decode.decode_supported(params):
        mode = "native"
    return mode


def _host_decrypt(params: PvwParameters, secret_key: SecretKey,
                  c1_hi, c1_lo, c2_hi, c2_lo) -> list[int]:
    """Full host decrypt of d messages (mode ``host``): c1 [k, d, L, l],
    c2 [d, L, l] (device or host arrays — fetched if needed). Callers
    must have checked ``decrypt_decode_supported``."""
    from ..utils.native_decode import decrypt_decode_pairs_native

    sk_res = secret_key.host_ntt_residues()
    out = decrypt_decode_pairs_native(
        sk_res, np.asarray(c1_hi), np.asarray(c1_lo),
        np.asarray(c2_hi), np.asarray(c2_lo), params)
    if out is None:  # pragma: no cover — support pre-checked by router
        raise InternalError("native host decrypt unexpectedly unavailable")
    return out


def _messages_from_device(out) -> list[int]:
    """Stacked uint32 [2, d] -> list of ints."""
    arr = np.asarray(out)
    vals = (arr[0].astype(np.uint64) << np.uint64(32)) | arr[1].astype(
        np.uint64)
    return [int(v) for v in vals]


# --------------------------------------------------------------------------
# host decode
# --------------------------------------------------------------------------

def decode_scalar_pvw_rns(coeff_residues: np.ndarray,
                          params: PvwParameters) -> int:
    """Decode one noisy gadget-encoded message from its PowerBasis residues
    (uint64 [L, l]) — exact integer transcription of
    ``decode_scalar_pvw_rns`` (``decryption.rs:10-58``)."""
    ring = params.ring
    q = params.q_total()
    delta = params.delta()
    ell = params.l
    if tuple(coeff_residues.shape) != (ring.num_limbs, ell):
        raise DecodingError(
            f"residue block shape {tuple(coeff_residues.shape)} does not "
            f"match the parameter set's [L={ring.num_limbs}, l={ell}]"
        )
    lifted = ring.lift_to_ints(coeff_residues)       # canonical in [0, q)
    zc = [center_mod(v, q) for v in lifted]          # extract_coefficient_as_poly

    # tmp[i] = z[i]*Δ - z[i+1] in RNS (mod q)         decryption.rs:19-27
    tmp = [(zc[i] * delta - zc[i + 1]) % q for i in range(ell - 1)]

    # Horner in RNS                                    decryption.rs:30-33
    last = tmp[0]
    for i in range(1, ell - 1):
        last = (last * delta + tmp[i]) % q

    # reduce mod Δ^(l-1), centered                     decryption.rs:36-37,154-178
    a = center_mod(last, q)
    m = center_mod(params.delta_power_l_minus_1() % q, q)
    reduced = rust_rem(a, m)
    half_mod = rust_div(m, 2)
    if reduced > half_mod:
        reduced -= m
    elif reduced < -half_mod:
        reduced += m
    tmp.append(reduced % q)

    # backward substitution                            decryption.rs:41-47,180-207
    noise = [0] * ell
    noise[ell - 1] = tmp[ell - 1]
    d_const = center_mod(delta % q, q)
    for i in range(ell - 2, -1, -1):
        numerator = (noise[i + 1] - tmp[i]) % q
        a = center_mod(numerator, q)
        if d_const == 0:
            quot = 0
        else:
            twice = a * 2
            if a < 0:
                quot = rust_div(twice - d_const, d_const * 2)
            else:
                quot = rust_div(twice + d_const, d_const * 2)
        noise[i] = quot % q

    # plaintext = -z0 - e0                             decryption.rs:51-57
    val = (-zc[0] - noise[0]) % q
    mf = center_mod(val, q)
    # extract_constant_term_as_u64                     decryption.rs:226-247
    if mf < 0:
        if -mf <= 1000:
            return 0
        pos = (mf + q) % q
        return pos if pos < 1 << 64 else 0
    return mf if mf < 1 << 64 else 0


def _decode_batch(residues: np.ndarray, params: PvwParameters) -> list[int]:
    """Decode d messages: residues uint64 [d, L, l].

    Uses the native C++ engine (OpenMP over the batch) when available and
    the configuration is supported; falls back to the exact Python oracle.
    Set ``PVW_TPU_NO_NATIVE=1`` to force the Python path."""
    from ..config import settings

    if not settings.no_native:
        from ..utils.native_decode import decode_batch_native

        out = decode_batch_native(residues, params)
        if out is not None:
            return out
    return [decode_scalar_pvw_rns(residues[i], params) for i in range(residues.shape[0])]


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def decrypt_party_value(ciphertext: PvwCiphertext, secret_key: SecretKey,
                        party_index: int) -> int:
    """Decrypt component ``party_index`` (``decryption.rs:249-278``)."""
    params = ciphertext.params
    if not (0 <= party_index < params.n):
        raise InvalidParameters(
            f"Party index {party_index} exceeds maximum {params.n - 1}"
        )
    c1 = ciphertext.c1
    c2 = ciphertext.c2[party_index]
    mode = _decode_mode(params, d=1)
    if mode == "host":
        return _host_decrypt(params, secret_key, c1.hi[:, None],
                             c1.lo[:, None], c2.hi[None], c2.lo[None])[0]
    sk = secret_key.to_polynomials()
    args = (params, sk.hi, sk.lo, c1.hi[:, None], c1.lo[:, None],
            c2.hi[None], c2.lo[None])
    if mode == "device":
        return _messages_from_device(_decrypt_decode_kernel(*args))[0]
    z = np.asarray(_noisy_message_kernel(*args))
    residues = u64op.join_u64_np(z[0], z[1])
    return decode_scalar_pvw_rns(residues[0], params)


def decrypt_party_shares(all_ciphertexts, secret_key: SecretKey,
                         party_index: int) -> list[int]:
    """Decrypt this party's share from each dealer ciphertext
    (``decryption.rs:281-325``). Accepts a list of n PvwCiphertexts (API
    parity) or one batched PvwCiphertext (c1 [k, d], c2 [n, d]) from
    :func:`encrypt_all_party_shares_batched` — the device stage runs ONE
    batched contraction either way (rayon site P8 -> d axis)."""
    if isinstance(all_ciphertexts, PvwCiphertext):
        ct = all_ciphertexts
        params = ct.params
        if len(ct.c1.batch_shape) != 2:
            raise InvalidParameters("expected a batched ciphertext")
        d = ct.c1.batch_shape[1]
        if d != params.n:
            raise InvalidParameters(f"Expected {params.n} ciphertexts, got {d}")
        if not (0 <= party_index < params.n):
            raise InvalidParameters(
                f"Party index {party_index} exceeds maximum {params.n - 1}"
            )
        if (ct.c1.is_channel_major and ct.c2.is_channel_major
                and _decode_mode(params, d) != "host"):
            # native encrypt_batch output: consume channel-major directly
            sk = secret_key.to_polynomials()
            args = (params, sk.hi, sk.lo, *ct.c1.channel_pair(),
                    *ct.c2[party_index].channel_pair())
            if _decode_mode(params, d) == "device":
                return _messages_from_device(_decrypt_decode_kernel_ch(*args))
            z = np.asarray(_noisy_message_kernel_ch(*args))
            residues = u64op.join_u64_np(z[0], z[1])
            return _decode_batch(residues, params)
        c1_hi, c1_lo = ct.c1.hi, ct.c1.lo            # [k, d, L, l]
        c2_hi, c2_lo = ct.c2.hi[party_index], ct.c2.lo[party_index]  # [d, L, l]
    else:
        if len(all_ciphertexts) == 0:
            raise InvalidParameters("No ciphertexts provided")
        params = all_ciphertexts[0].params
        if len(all_ciphertexts) != params.n:
            raise InvalidParameters(
                f"Expected {params.n} ciphertexts, got {len(all_ciphertexts)}"
            )
        if not (0 <= party_index < params.n):
            raise InvalidParameters(
                f"Party index {party_index} exceeds maximum {params.n - 1}"
            )
        for i, ct in enumerate(all_ciphertexts):
            try:
                ct.validate()
            except InvalidParameters as e:
                raise InvalidParameters(f"Ciphertext {i} invalid: {e}") from e
        c1_hi = jnp.stack([ct.c1.hi for ct in all_ciphertexts], axis=1)
        c1_lo = jnp.stack([ct.c1.lo for ct in all_ciphertexts], axis=1)
        c2_hi = jnp.stack([ct.c2.hi[party_index] for ct in all_ciphertexts])
        c2_lo = jnp.stack([ct.c2.lo[party_index] for ct in all_ciphertexts])

    d = c2_hi.shape[0]
    mode = _decode_mode(params, d)
    if mode == "host":
        return _host_decrypt(params, secret_key, c1_hi, c1_lo, c2_hi, c2_lo)
    sk = secret_key.to_polynomials()
    args = (params, sk.hi, sk.lo, c1_hi, c1_lo, c2_hi, c2_lo)
    if mode == "device":
        return _messages_from_device(_decrypt_decode_kernel(*args))
    z = np.asarray(_noisy_message_kernel(*args))
    residues = u64op.join_u64_np(z[0], z[1])
    return _decode_batch(residues, params)
