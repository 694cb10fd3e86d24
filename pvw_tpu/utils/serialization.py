"""Stable byte serialization for every PVW type.

The reference's persistence story is feature-gated serde+bincode with polys
encoded by fhe-math's protobuf ``to_bytes`` (``crs.rs:228-295``,
``public_key.rs:471-622``, ``encryption.rs:298-354``, serde tests at
``tests/serialization.rs``). fhe.rs's exact wire bytes are not reproducible
here (no Rust toolchain to emit goldens), so pvw-tpu defines its own
documented, byte-deterministic container and pins it with golden tests:

    b"PVWT" | u8 version | u32 header_len | header JSON (utf-8, sorted
    keys, compact separators) | payload (raw little-endian arrays)

The header carries the type tag, the full parameter set (the reference
also embeds params in every blob — ``parameters.rs:606-664`` round-trips
the 7 scalar fields and rebuilds the context), array shapes, and the
payload section table. Residues are uint64 LE; secret coefficients are
int64 LE (the reference's ``Vec<Vec<i64>>``).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from ..errors import (
    DeserializationError, InsufficientData, InvalidFormat, SerializationError,
)

MAGIC = b"PVWT"
VERSION = 1


def _pack(type_tag: str, header_extra: dict, sections: list[np.ndarray]) -> bytes:
    shapes = [list(a.shape) for a in sections]
    dtypes = [a.dtype.str for a in sections]
    header = dict(header_extra)
    header["type"] = type_tag
    header["sections"] = {"shapes": shapes, "dtypes": dtypes}
    hjson = json.dumps(header, sort_keys=True, separators=(",", ":")).encode()
    out = bytearray()
    out += MAGIC
    out.append(VERSION)
    out += len(hjson).to_bytes(4, "little")
    out += hjson
    for a in sections:
        # enforce little-endian layout
        out += np.ascontiguousarray(a).astype(a.dtype.newbyteorder("<")).tobytes()
    return bytes(out)


def _unpack(data: bytes, expect_type: str) -> tuple[dict, list[np.ndarray]]:
    if len(data) < 9 or data[:4] != MAGIC:
        raise InvalidFormat("not a PVWT blob")
    if data[4] != VERSION:
        raise InvalidFormat(f"unsupported version {data[4]}")
    hlen = int.from_bytes(data[5:9], "little")
    if len(data) < 9 + hlen:
        # structured variant with byte counts (errors.rs:62-63)
        raise InsufficientData(9 + hlen, len(data))
    try:
        header = json.loads(data[9 : 9 + hlen].decode())
    except Exception as e:  # noqa: BLE001
        raise DeserializationError(f"bad header: {e}") from e
    if header.get("type") != expect_type:
        raise DeserializationError(
            f"expected type {expect_type!r}, got {header.get('type')!r}"
        )
    off = 9 + hlen
    sections = []
    for shape, dt in zip(header["sections"]["shapes"],
                         header["sections"]["dtypes"]):
        n = int(np.prod(shape)) if shape else 1
        itemsize = np.dtype(dt).itemsize
        nb = n * itemsize
        if len(data) < off + nb:
            raise InsufficientData(off + nb, len(data))
        arr = np.frombuffer(data[off : off + nb], dtype=dt).reshape(shape)
        sections.append(arr)
        off += nb
    return header, sections


# --------------------------------------------------------------------------
# per-type codecs
# --------------------------------------------------------------------------

def params_to_bytes(params) -> bytes:
    return _pack("params", {"params": params.to_dict()}, [])


def params_from_bytes(data: bytes):
    from ..params.parameters import PvwParameters

    header, _ = _unpack(data, "params")
    return PvwParameters.from_dict(header["params"])


def poly_to_bytes(poly) -> bytes:
    return _pack(
        "poly",
        {
            "rep": poly.rep.value,
            "moduli": [int(m) for m in poly.ring.moduli],
            "degree": poly.ring.degree,
        },
        [poly.residues_np()],
    )


def poly_from_bytes(data: bytes, ring=None):
    from ..params.ring import get_ring
    from ..poly import Poly, Representation

    header, (res,) = _unpack(data, "poly")
    r = ring or get_ring(tuple(header["moduli"]), header["degree"])
    if tuple(int(m) for m in header["moduli"]) != r.moduli:
        raise DeserializationError("modulus chain mismatch")
    return Poly.from_residues_np(res, r, Representation(header["rep"]))


def secret_key_to_bytes(sk) -> bytes:
    return _pack(
        "secret_key",
        {"params": sk.params.to_dict()},
        [sk.secret_coeffs.astype("<i8")],
    )


def secret_key_from_bytes(data: bytes):
    from ..keys.secret_key import SecretKey
    from ..params.parameters import PvwParameters

    header, (coeffs,) = _unpack(data, "secret_key")
    params = PvwParameters.from_dict(header["params"])
    return SecretKey.from_coefficients(params, coeffs.astype(np.int32))


def crs_to_bytes(crs) -> bytes:
    return _pack(
        "crs",
        {"params": crs.params.to_dict()},
        [crs.matrix.residues_np()],
    )


def crs_from_bytes(data: bytes):
    from ..params.crs import PvwCrs
    from ..params.parameters import PvwParameters
    from ..poly import Poly, Representation

    header, (res,) = _unpack(data, "crs")
    params = PvwParameters.from_dict(header["params"])
    matrix = Poly.from_residues_np(res, params.ring, Representation.Ntt)
    return PvwCrs(matrix, params)


def public_key_to_bytes(pk) -> bytes:
    return _pack(
        "public_key",
        {"params": pk.params.to_dict()},
        [pk.key_polynomials.residues_np()],
    )


def public_key_from_bytes(data: bytes):
    from ..keys.public_key import PublicKey
    from ..params.parameters import PvwParameters
    from ..poly import Poly, Representation

    header, (res,) = _unpack(data, "public_key")
    params = PvwParameters.from_dict(header["params"])
    polys = Poly.from_residues_np(res, params.ring, Representation.Ntt)
    return PublicKey(polys, params)


def global_public_key_to_bytes(gpk) -> bytes:
    err_present = [e is not None for e in gpk.error_polynomials]
    sections = [gpk.matrix.residues_np(), gpk.crs.matrix.residues_np()]
    for e in gpk.error_polynomials:
        if e is not None:
            sections.append(e.residues_np())
    return _pack(
        "global_public_key",
        {
            "params": gpk.params.to_dict(),
            "num_keys": gpk.num_keys,
            "errors_present": err_present,
        },
        sections,
    )


def global_public_key_from_bytes(data: bytes):
    from ..keys.public_key import GlobalPublicKey
    from ..params.crs import PvwCrs
    from ..params.parameters import PvwParameters
    from ..poly import Poly, Representation

    header, sections = _unpack(data, "global_public_key")
    params = PvwParameters.from_dict(header["params"])
    matrix = Poly.from_residues_np(sections[0], params.ring, Representation.Ntt)
    crs_matrix = Poly.from_residues_np(sections[1], params.ring, Representation.Ntt)
    crs = PvwCrs(crs_matrix, params)
    gpk = GlobalPublicKey(crs)
    gpk.matrix = matrix
    gpk.num_keys = int(header["num_keys"])
    idx = 2
    errors: list[Optional[Poly]] = []
    for present in header["errors_present"]:
        if present:
            errors.append(
                Poly.from_residues_np(sections[idx], params.ring,
                                      Representation.Ntt)
            )
            idx += 1
        else:
            errors.append(None)
    gpk.error_polynomials = errors
    return gpk


def ciphertext_to_bytes(ct) -> bytes:
    return _pack(
        "ciphertext",
        {"params": ct.params.to_dict()},
        [ct.c1.residues_np(), ct.c2.residues_np()],
    )


def ciphertext_from_bytes(data: bytes):
    from ..crypto.encryption import PvwCiphertext
    from ..params.parameters import PvwParameters
    from ..poly import Poly, Representation

    header, (c1_res, c2_res) = _unpack(data, "ciphertext")
    params = PvwParameters.from_dict(header["params"])
    c1 = Poly.from_residues_np(c1_res, params.ring, Representation.Ntt)
    c2 = Poly.from_residues_np(c2_res, params.ring, Representation.Ntt)
    return PvwCiphertext(c1, c2, params)


# --------------------------------------------------------------------------
# generic dispatch
# --------------------------------------------------------------------------

def to_bytes(obj) -> bytes:
    """Serialize any PVW object to its canonical byte form."""
    from ..crypto.encryption import PvwCiphertext
    from ..keys.public_key import GlobalPublicKey, PublicKey
    from ..keys.secret_key import SecretKey
    from ..params.crs import PvwCrs
    from ..params.parameters import PvwParameters
    from ..poly import Poly

    if isinstance(obj, PvwParameters):
        return params_to_bytes(obj)
    if isinstance(obj, Poly):
        return poly_to_bytes(obj)
    if isinstance(obj, SecretKey):
        return secret_key_to_bytes(obj)
    if isinstance(obj, PvwCrs):
        return crs_to_bytes(obj)
    if isinstance(obj, GlobalPublicKey):
        return global_public_key_to_bytes(obj)
    if isinstance(obj, PublicKey):
        return public_key_to_bytes(obj)
    if isinstance(obj, PvwCiphertext):
        return ciphertext_to_bytes(obj)
    raise SerializationError(f"unsupported type {type(obj).__name__}")


_DECODERS = {
    "params": lambda d: params_from_bytes(d),
    "poly": lambda d: poly_from_bytes(d),
    "secret_key": lambda d: secret_key_from_bytes(d),
    "crs": lambda d: crs_from_bytes(d),
    "global_public_key": lambda d: global_public_key_from_bytes(d),
    "public_key": lambda d: public_key_from_bytes(d),
    "ciphertext": lambda d: ciphertext_from_bytes(d),
}


def from_bytes(data: bytes):
    """Deserialize any PVWT blob by its embedded type tag."""
    if len(data) < 9 or data[:4] != MAGIC:
        raise InvalidFormat("not a PVWT blob")
    hlen = int.from_bytes(data[5:9], "little")
    try:
        header = json.loads(data[9 : 9 + hlen].decode())
    except Exception as e:  # noqa: BLE001
        raise DeserializationError(f"bad header: {e}") from e
    t = header.get("type")
    if t not in _DECODERS:
        raise DeserializationError(f"unknown type tag {t!r}")
    return _DECODERS[t](data)
