"""Value-level interop with pvw-rs: the ``pvw-vectors-v1`` exchange format.

Byte-level wire compatibility with the reference is blocked on fhe-math's
protobuf poly encoding (``crs.rs:234-241``, ``public_key.rs:477-509``,
``encryption.rs:304-346`` — unverifiable without a Rust toolchain; see
PARITY.md), so this module implements the buildable half: import/export
of parameters, CRS, secret keys, and ciphertexts BY VALUE in the
documented JSON schema (``tests/vectors/README.md``). A pvw-rs deployment
that dumps its material with the recipe there can hand keys and
ciphertexts to pvw-tpu (and back) with exact arithmetic fidelity:

* all integers travel as decimal strings (they exceed u64);
* NTT-domain residues travel with a solved CONVENTION BRIDGE: the
  exporter includes the NTT of the monomial X (``ntt_probe``), from
  which :func:`solve_ntt_bridge` derives the exact slot permutation
  between the foreign implementation's NTT order and ours (slot j
  evaluates at psi^(2j+1), ``pvw_tpu/ops/ntt.py``) — a discrete-log
  identification, not a guessed layout.

The drop-in parity suite (tests/test_vectors.py) consumes this module,
so the bridge machinery is exercised in CI via a synthetic foreign
implementation even while no pvw-rs-generated files exist in-image.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import numpy as np

from .errors import InvalidParameters, SerializationError

SCHEMA = "pvw-vectors-v1"


# --------------------------------------------------------------------------
# NTT convention bridge
# --------------------------------------------------------------------------

class NttBridge:
    """Slot permutation between a foreign NTT convention and ours.

    ``perms[i][s]`` = our slot index for foreign slot ``s`` of limb i.
    """

    def __init__(self, perms: list[list[int]]) -> None:
        self.perms = perms

    @classmethod
    def identity(cls, params) -> "NttBridge":
        ring = params.ring
        return cls([list(range(ring.degree))
                    for _ in range(ring.num_limbs)])

    def to_ours(self, res: np.ndarray) -> np.ndarray:
        """Foreign-order NTT residues [..., L, l] -> our slot order."""
        out = np.zeros_like(res)
        for i, perm in enumerate(self.perms):
            for s, j in enumerate(perm):
                out[..., i, j] = res[..., i, s]
        return out

    def to_foreign(self, res: np.ndarray) -> np.ndarray:
        """Our NTT residues [..., L, l] -> the foreign slot order."""
        out = np.zeros_like(res)
        for i, perm in enumerate(self.perms):
            for s, j in enumerate(perm):
                out[..., i, s] = res[..., i, j]
        return out


def ntt_probe(params) -> list[list[str]]:
    """Our ``ntt_probe`` section: the NTT residues of the monomial X per
    limb — slot j holds psi^(2j+1) by our convention, so a foreign loader
    can solve the inverse bridge the same way we do."""
    ring = params.ring
    return [[str(pow(limb.psi, 2 * j + 1, limb.q))
             for j in range(ring.degree)]
            for limb in ring.limbs]


def solve_ntt_bridge(params, probe) -> NttBridge:
    """Derive the exact foreign->ours slot permutation from a dumped NTT
    of the monomial X (schema section ``ntt_probe.x_monomial_ntt``).

    Slot s of NTT(X) IS that slot's evaluation point, a primitive 2l-th
    root of unity; its discrete log base our psi identifies the slot
    exactly. Raises :class:`SerializationError` when a value is not a
    primitive root (a scaled/lazy NTT form would need a scale factor —
    see tests/vectors/README.md).
    """
    rows = probe["x_monomial_ntt"] if isinstance(probe, dict) else probe
    ring = params.ring
    perms = []
    for i, limb in enumerate(ring.limbs):
        q, psi = limb.q, limb.psi
        two_l = 2 * ring.degree
        pow_to_exp = {pow(psi, e, q): e for e in range(1, two_l, 2)}
        perm = []
        for s in range(ring.degree):
            v = int(rows[i][s])
            if v not in pow_to_exp:
                raise SerializationError(
                    f"ntt_probe limb {i} slot {s}: {v} is not a primitive "
                    "2l-th root of unity mod q — the foreign NTT is stored "
                    "in a scaled form; extend the bridge with its scale")
            perm.append((pow_to_exp[v] - 1) // 2)
        if sorted(perm) != list(range(ring.degree)):
            raise SerializationError(
                f"ntt_probe limb {i}: slot map is not a bijection")
        perms.append(perm)
    return NttBridge(perms)


# --------------------------------------------------------------------------
# residue matrix <-> JSON helpers
# --------------------------------------------------------------------------

def _res_to_json(res: np.ndarray) -> list[list[str]]:
    """uint64 [L, l] -> nested decimal strings."""
    return [[str(int(v)) for v in row] for row in np.asarray(res)]

def _res_from_json(rows) -> np.ndarray:
    return np.array([[int(v) for v in row] for row in rows], np.uint64)


# --------------------------------------------------------------------------
# per-type export / import
# --------------------------------------------------------------------------

def export_params(params) -> dict:
    return {
        "n": params.n, "k": params.k, "l": params.l,
        "moduli": [str(m) for m in params.ring.moduli],
        "secret_variance": params.secret_variance,
        "error_bound_1": str(params.error_bound_1),
        "error_bound_2": str(params.error_bound_2),
    }


def load_params(d: dict):
    from .params.parameters import PvwParametersBuilder

    b = (PvwParametersBuilder()
         .set_parties(int(d["n"])).set_dimension(int(d["k"]))
         .set_l(int(d["l"]))
         .set_moduli(tuple(int(m) for m in d["moduli"])))
    if "secret_variance" in d:
        b.set_secret_variance(float(d["secret_variance"]))
    if "error_bound_1" in d:
        b.set_error_bounds_u32(int(d["error_bound_1"]),
                               int(d["error_bound_2"]))
    return b.build()


def export_crs(crs, bridge: Optional[NttBridge] = None) -> dict:
    """CRS -> schema ``crs`` section (NTT residues in the target order;
    default: ours = identity bridge)."""
    res = crs.matrix.residues_np()                       # [k, k, L, l]
    k = res.shape[0]
    flat = res.reshape(k * k, *res.shape[2:])
    if bridge is not None:
        flat = bridge.to_foreign(flat)
    return {"ntt_residues": [_res_to_json(r) for r in flat]}


def load_crs(d: dict, params, bridge: Optional[NttBridge] = None):
    from .params.crs import PvwCrs
    from .poly import Poly, Representation

    k = params.k
    rows = d["ntt_residues"]
    if len(rows) != k * k:
        raise InvalidParameters(
            f"crs.ntt_residues must hold k*k={k * k} entries, got {len(rows)}")
    res = np.stack([_res_from_json(r) for r in rows])
    if bridge is not None:
        res = bridge.to_ours(res)
    res = res.reshape(k, k, params.ring.num_limbs, params.l)
    matrix = Poly.from_residues_np(res, params.ring, Representation.Ntt)
    return PvwCrs(matrix, params)


def export_secret_key(sk) -> dict:
    return {"coeffs": [[int(c) for c in row] for row in sk.coefficients()]}


def load_secret_key(d: dict, params):
    from .keys.secret_key import SecretKey

    return SecretKey.from_coefficients(
        params, np.array(d["coeffs"], np.int64))


def export_ciphertext(ct, bridge: Optional[NttBridge] = None,
                      scalars: Optional[Sequence[int]] = None,
                      plaintexts: Optional[Sequence[int]] = None) -> dict:
    """Single (unbatched) ciphertext -> schema ``ciphertext`` section."""
    c1 = ct.c1.residues_np()                             # [k, L, l]
    c2 = ct.c2.residues_np()                             # [n, L, l]
    if c1.ndim != 3:
        raise InvalidParameters(
            "export_ciphertext takes an unbatched ciphertext; export "
            "batched ones per dealer column")
    if bridge is not None:
        c1 = bridge.to_foreign(c1)
        c2 = bridge.to_foreign(c2)
    out = {
        "c1_ntt": [_res_to_json(r) for r in c1],
        "c2_ntt": [_res_to_json(r) for r in c2],
    }
    if scalars is not None:
        out["scalars"] = [str(int(s)) for s in scalars]
    if plaintexts is not None:
        out["plaintexts"] = [str(int(p)) for p in plaintexts]
    return out


def load_ciphertext(d: dict, params, bridge: Optional[NttBridge] = None):
    from .crypto.encryption import PvwCiphertext
    from .poly import Poly, Representation

    c1 = np.stack([_res_from_json(r) for r in d["c1_ntt"]])
    c2 = np.stack([_res_from_json(r) for r in d["c2_ntt"]])
    if bridge is not None:
        c1 = bridge.to_ours(c1)
        c2 = bridge.to_ours(c2)
    ct = PvwCiphertext(
        Poly.from_residues_np(c1, params.ring, Representation.Ntt),
        Poly.from_residues_np(c2, params.ring, Representation.Ntt),
        params,
    )
    ct.validate()
    return ct


# --------------------------------------------------------------------------
# whole-case dump / load
# --------------------------------------------------------------------------

def dump_case(params, crs=None, secret_keys=None, ciphertext=None,
              scalars=None, plaintexts=None, source: str = "pvw-tpu",
              path: Optional[str] = None) -> dict:
    """Assemble (and optionally write) a complete ``pvw-vectors-v1`` case
    from pvw-tpu objects — includes OUR ``ntt_probe`` so any consumer can
    solve the convention bridge against its own NTT."""
    case = {
        "schema": SCHEMA,
        "source": source,
        "params": export_params(params),
        "ntt_probe": {"x_monomial_ntt": ntt_probe(params)},
        "delta": str(params.delta()),
        "gadget_powerbasis": _res_to_json(
            params.gadget_polynomial().to_power_basis().residues_np()),
    }
    if crs is not None:
        case["crs"] = export_crs(crs)
    if secret_keys is not None:
        case["secret_keys"] = [export_secret_key(sk) for sk in secret_keys]
    if ciphertext is not None:
        case["ciphertext"] = export_ciphertext(
            ciphertext, scalars=scalars, plaintexts=plaintexts)
    if path is not None:
        with open(path, "w") as f:
            json.dump(case, f)
    return case


class LoadedCase:
    """Parsed ``pvw-vectors-v1`` case: params + solved bridge + objects."""

    def __init__(self, case: dict) -> None:
        if case.get("schema") != SCHEMA:
            raise SerializationError(
                f"unknown schema {case.get('schema')!r} (want {SCHEMA})")
        self.raw = case
        self.params = load_params(case["params"])
        if "ntt_probe" in case:
            self.bridge = solve_ntt_bridge(self.params, case["ntt_probe"])
        else:
            self.bridge = NttBridge.identity(self.params)
        self.crs = (load_crs(case["crs"], self.params, self.bridge)
                    if "crs" in case else None)
        self.secret_keys = [load_secret_key(d, self.params)
                            for d in case.get("secret_keys", [])]
        self.ciphertext = (
            load_ciphertext(case["ciphertext"], self.params, self.bridge)
            if "ciphertext" in case else None)
        cd = case.get("ciphertext", {})
        self.plaintexts = [int(p) for p in cd.get("plaintexts", [])]
        self.scalars = [int(s) for s in cd.get("scalars", [])]


def load_case(path_or_dict) -> LoadedCase:
    """Load a case from a JSON file path or an already-parsed dict."""
    if isinstance(path_or_dict, dict):
        return LoadedCase(path_or_dict)
    with open(path_or_dict) as f:
        return LoadedCase(json.load(f))
