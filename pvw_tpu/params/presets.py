"""Named parameter presets for the benchmark/deployment configurations.

SURVEY.md §5 (config row) requires named presets for the BASELINE.json
configs; the reference has no preset system (the builder is the config
system). Each preset returns a fresh :class:`PvwParameters`.

Moduli provenance: ``TOY``/``MEDIUM`` use the reference's example chains
(``examples/pvw.rs:32``, ``tests/params.rs:21``); ``SECURE_128`` uses the
reference's 128-bit chain (``examples/pvw_valid_dec.rs:40-52``, from the
gnosisguild enclave-research parameter study); the ``*_1024BIT`` chain is
generated deterministically by :func:`generate_ntt_primes`. Security-level
naming follows the reference README's guidance (k >= 256, l >= 8, modulus
bits >= 1024 for 128-bit security).
"""

from __future__ import annotations

from ..utils.intmath import generate_ntt_primes
from .parameters import PvwParameters, PvwParametersBuilder

# Reference example chains
MODULI_TOY = (0xFFFFC4001, 0x1FFFFE0001)                       # ~77-bit q
MODULI_TEST3 = (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)        # ~113-bit q
MODULI_55BIT4 = (0x800000022A0001, 0x800000021A0001,
                 0x80000002120001, 0x80000001F60001)            # ~221-bit q


def _build(n, k, l, moduli, var, b1=None, b2=None):
    builder = (PvwParametersBuilder().set_parties(n).set_dimension(k)
               .set_l(l).set_moduli(moduli).set_secret_variance(var))
    if b1 is None:
        b1, b2 = PvwParameters.suggest_error_bounds(n, k, l, moduli, var)
    return builder.set_error_bounds_u32(b1, b2).build()


def toy(n: int = 7) -> PvwParameters:
    """The examples/pvw.rs demo configuration: k=32, l=8, 2-limb chain."""
    return _build(n, 32, 8, MODULI_TOY, 0.5)


def vector_k256(n: int = 64) -> PvwParameters:
    """BASELINE config 1: vector encryption, k=256, l=8, toy modulus."""
    return _build(n, 256, 8, MODULI_TOY, 0.5)


def broadcast_128bit(n: int = 64) -> PvwParameters:
    """BASELINE config 2: broadcast mode at 128-bit security — k=256, l=8,
    >=1024-bit RNS modulus (17 x 61-bit limbs)."""
    moduli = generate_ntt_primes(61, 17, 8)
    return _build(n, 256, 8, moduli, 0.5)


def shares_n1024(n: int = 1024) -> PvwParameters:
    """BASELINE config 3: share-distribution mode, n=1024 parties, full
    RNS limb set (the reference's 4 x 55-bit chain)."""
    return _build(n, 256, 8, MODULI_55BIT4, 0.5)


def threshold_256bit(n: int = 1024) -> PvwParameters:
    """BASELINE config 4: threshold decryption at ~256-bit parameters —
    k=512, l=16, deep modulus chain."""
    moduli = generate_ntt_primes(61, 17, 16)
    return _build(n, 512, 16, moduli, 0.5)


def pvss_8192(n: int = 8192) -> PvwParameters:
    """BASELINE config 5: PVSS scale, n=8192 receivers (shard over a mesh
    with pvw_tpu.parallel for multi-chip runs)."""
    return _build(n, 256, 8, MODULI_TOY, 0.5)


def secure_128_reference(n: int = 5) -> PvwParameters:
    """The reference's own 128-bit example parameters
    (examples/pvw_valid_dec.rs:40-52): k=1024, variance 10, explicit
    bounds."""
    return _build(n, 1024, 8, MODULI_55BIT4, 10.0, 1, 1172385)


PRESETS = {
    "toy": toy,
    "vector_k256": vector_k256,
    "broadcast_128bit": broadcast_128bit,
    "shares_n1024": shares_n1024,
    "threshold_256bit": threshold_256bit,
    "pvss_8192": pvss_8192,
    "secure_128_reference": secure_128_reference,
}


def get_preset(name: str, **kwargs) -> PvwParameters:
    """Look up a preset by name; kwargs override the party count etc."""
    from ..errors import InvalidParameters

    if name not in PRESETS:
        raise InvalidParameters(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    return PRESETS[name](**kwargs)
