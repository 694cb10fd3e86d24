"""Runtime configuration — the single documented surface for every tuning
knob in pvw-tpu.

The reference's stance is "the builder is the config system" (SURVEY.md §5):
everything mathematical lives in :class:`PvwParametersBuilder`. The knobs
here are strictly EXECUTION tuning — which engine/stream/kernel variant runs
the same math — and deliberately cannot change results except where
documented (the noise stream changes the sampled noise values, never the
scheme).

Every knob is one attribute of the module-level :data:`settings` object.
Precedence per knob: programmatic assignment > environment variable >
default. Environment variables are re-read on access (until overridden in
code), so ``PVW_TPU_NOISE=v3 python ...`` and
``pvw_tpu.config.settings.noise_stream = "v3"`` are equivalent.

Knobs
-----

===================  ====================  =======================================
Attribute            Env var               Meaning (default)
===================  ====================  =======================================
noise_stream         PVW_TPU_NOISE         Encryption-noise stream: ``"kernel"``
                                           (stream v4: in-kernel per-tile-seeded
                                           TPU hardware PRNG, the fast path),
                                           ``"v3k"`` (in-kernel
                                           Threefry-2x32-20 — a SPECIFIED
                                           CSPRNG fused into the matmul
                                           kernel, bit-identical across
                                           backends, mesh shapes AND batch
                                           splits; also switches the r
                                           randomness to the global-counter
                                           cbd-k twin — ops/tfry.py), or
                                           ``"v3"`` (legacy
                                           separate threefry pass). See README
                                           "Noise streams & threat model" for
                                           the default decision. Off-TPU,
                                           "kernel" falls back to v3 planes;
                                           "v3k" keeps its exact stream.
decode_mode          PVW_TPU_DECODE        Decode engine: ``"auto"`` (default:
                                           route small batches to the host
                                           engine, everything else on-device),
                                           ``"device"``, ``"host"``,
                                           ``"native"``, ``"python"``.
decode_crossover     PVW_TPU_DECODE_       Batch size below which ``auto``
                     CROSSOVER             decodes on the host (64; measured
                                           break-even, BASELINE.md).
no_native            PVW_TPU_NO_NATIVE     Disable the C++ decode engine
                                           (False).
num_digits           PVW_NUM_DIGITS        Force the int8 digit width of the
                                           modmat decomposition (default: the
                                           minimal exact width per modulus
                                           chain; perf experiments only).
tile_m / tile_n      PVW_TILE_M /          Force the Pallas matmul tile (both
                     PVW_TILE_N            must be set; default: VMEM-exact
                                           cost-model pick; no VMEM check when
                                           forced).
no_pallas            PVW_NO_PALLAS         Force the XLA fallback kernels even
                                           on TPU (False).
dots_first           PVW_TPU_DOTS_FIRST    Kernel experiment: issue all MXU
                                           dots before the fold (False).
noise_value_mac      PVW_TPU_NOISE_VALS    Use the value-plane noise MAC when
                                           its VMEM cost allows (True; set a
                                           falsy value to force the
                                           digit-plane MAC).
fused_prescale       PVW_TPU_FUSED_        r-stage NTT+prescale engine:
                     PRESCALE              ``"auto"`` (default: the one-pass
                                           Pallas kernel on deep chains,
                                           nd >= 8, where it measured 0.78-
                                           0.89x the XLA pipeline; XLA
                                           elsewhere — at nd=5 the kernel
                                           measured 1.18-1.26x, BASELINE.md
                                           round-4 rows), ``"1"`` (force the
                                           kernel when available), ``"0"``
                                           (always the XLA pipeline). Both
                                           engines are bit-identical
                                           (tests/test_swapped.py).
swapped_form         PVW_TPU_SWAPPED       EXPERIMENTAL: swapped-operand
                                           encryption kernel (Shoup scales on
                                           the cached lhs planes, plain-digit
                                           rhs — DESIGN.md §5f). Measured ~5%
                                           SLOWER than the banded default at
                                           the headline shape (r4); kept as an
                                           opt-in measured branch (False).
pipeline_fold        PVW_TPU_PIPELINE      EXPERIMENTAL: software-pipelined
                                           kernel — fold of channel c-1 under
                                           the MXU dots of channel c via a
                                           parity-alternating column scratch
                                           (DESIGN.md §9 overlap lever,
                                           round 5). Bit-identical; routing
                                           per the measured A/B (False).
vmem_limit_mb        PVW_TPU_VMEM_LIMIT_MB Raise Mosaic's scoped-VMEM ceiling
                                           for the Pallas kernels to this many
                                           MiB (``CompilerParams.vmem_limit_
                                           bytes``). The default ~16 MiB
                                           ceiling is a compiler soft limit —
                                           v5e physically has ~128 MiB of VMEM
                                           (a 96 MiB working set measured
                                           compiling AND running, round 5) —
                                           but every raised-limit tile must
                                           still be hardware-validated before
                                           the auto pick may use it (0/unset =
                                           compiler default).
trace                PVW_TPU_TRACE         Enable span tracing to stderr
                                           (False).
jax_cache_dir        PVW_TPU_JAX_CACHE     Persistent JAX compilation cache
                                           directory (repo-local
                                           ``.jax_cache``).
===================  ====================  =======================================

Boolean knobs share ONE convention (round 5): the env values ``0``,
``false``, ``off``, ``no`` (case-insensitive) are falsy; any other
non-empty value is truthy; unset/empty means the default. In particular
``PVW_TPU_NO_NATIVE=0`` now means "native stays enabled" (it historically
meant the opposite — any non-empty value disabled).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

_UNSET = object()


#: One boolean convention for every knob (round-5 unification, VERDICT r4
#: weak #6): these strings are falsy, any other non-empty value is truthy.
#: (Historically PVW_TPU_NO_NATIVE=0 *disabled* the native engine while
#: PVW_TPU_NOISE_VALS=0 meant off — three conventions across one table.)
_FALSY = frozenset({"0", "false", "off", "no"})


def _parse_bool(raw: str) -> bool:
    return raw.strip().lower() not in _FALSY


class _Knob:
    """One setting: programmatic override > env var > default."""

    def __init__(self, env: str, default, parse: Callable = str) -> None:
        self.env = env
        self.default = default
        self.parse = parse

    def __set_name__(self, owner, name: str) -> None:
        self.name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        override = obj._overrides.get(self.name, _UNSET)
        if override is not _UNSET:
            return override
        raw = os.environ.get(self.env)
        if raw is None or raw == "":
            return self.default
        return self.parse(raw)

    def __set__(self, obj, value) -> None:
        obj._overrides[self.name] = value

    def __delete__(self, obj) -> None:
        obj._overrides.pop(self.name, None)


class Settings:
    """See the module docstring for the knob table."""

    noise_stream: str = _Knob("PVW_TPU_NOISE", "kernel")
    decode_mode: str = _Knob("PVW_TPU_DECODE", "auto")
    decode_crossover: int = _Knob("PVW_TPU_DECODE_CROSSOVER", 64, int)
    no_native: bool = _Knob("PVW_TPU_NO_NATIVE", False, _parse_bool)
    num_digits: Optional[int] = _Knob("PVW_NUM_DIGITS", None, int)
    tile_m: Optional[int] = _Knob("PVW_TILE_M", None, int)
    tile_n: Optional[int] = _Knob("PVW_TILE_N", None, int)
    no_pallas: bool = _Knob("PVW_NO_PALLAS", False, _parse_bool)
    dots_first: bool = _Knob("PVW_TPU_DOTS_FIRST", False, _parse_bool)
    noise_value_mac: bool = _Knob("PVW_TPU_NOISE_VALS", True, _parse_bool)
    fused_prescale: str = _Knob("PVW_TPU_FUSED_PRESCALE", "auto")
    swapped_form: bool = _Knob("PVW_TPU_SWAPPED", False, _parse_bool)
    pipeline_fold: bool = _Knob("PVW_TPU_PIPELINE", False, _parse_bool)
    vmem_limit_mb: Optional[int] = _Knob("PVW_TPU_VMEM_LIMIT_MB", None, int)
    trace: bool = _Knob("PVW_TPU_TRACE", False, _parse_bool)
    jax_cache_dir: Optional[str] = _Knob("PVW_TPU_JAX_CACHE", None)

    def __init__(self) -> None:
        self._overrides: dict = {}

    def reset(self) -> None:
        """Drop every programmatic override (env vars apply again)."""
        self._overrides.clear()

    def describe(self) -> dict:
        """Current resolved value of every knob."""
        return {
            name: getattr(self, name)
            for name, attr in type(self).__dict__.items()
            if isinstance(attr, _Knob)
        }

    def use_v4_noise(self) -> bool:
        """True when encryption noise uses an in-kernel stream (v4 or
        v3k) — i.e. anything but the legacy separate-pass v3."""
        return self.noise_stream != "v3"

    def kernel_noise_stream(self) -> Optional[str]:
        """Which in-kernel noise generator to use: ``"v4"`` (hardware
        PRNG), ``"v3k"`` (in-kernel Threefry-2x32-20 — a specified
        CSPRNG, bit-identical across backends and mesh shapes), or None
        (legacy stream v3: separate threefry pass). Unknown values warn
        and fall back to the default rather than silently dropping the
        user from a requested CSPRNG to the hardware PRNG."""
        s = str(self.noise_stream).strip().lower()
        if s == "v3":
            return None
        if s == "v3k":
            return "v3k"
        if s not in ("kernel", "v4"):
            import warnings

            warnings.warn(
                f"PVW_TPU_NOISE={self.noise_stream!r} is not a recognized "
                "stream (kernel/v4/v3k/v3); using the default 'kernel' "
                "(v4 hardware PRNG)",
                stacklevel=2,
            )
        return "v4"

    def use_fused_prescale(self, num_digits: int) -> bool:
        """True when the r-stage should take the one-pass Pallas
        NTT+prescale kernel (callers must still check
        :func:`~pvw_tpu.ops.pallas_modmat.ntt_prescale_available`).
        ``auto``: deep chains only — the kernel measured 0.78-0.89x the
        XLA pipeline at nd=8 (all three 61-bit-limb presets) but
        1.18-1.26x at nd=5 (headline family), 1.15-1.19x at nd=6 and
        1.17-1.22x at nd=7 (round-5 probes,
        benchmarks/probe_rstage_mid.py, k=256/512) — the nd >= 8
        boundary is measured at every digit width, not extrapolated.

        The mode is normalized: booleans and the standard truthy/falsy
        strings all force the choice; unknown strings warn once and fall
        back to ``auto`` rather than being silently ignored."""
        mode = self.fused_prescale
        if isinstance(mode, bool):
            return mode
        norm = str(mode).strip().lower()
        if norm in ("1", "true", "on", "yes", "force"):
            return True
        if norm in _FALSY:
            return False
        if norm != "auto":
            import warnings

            warnings.warn(
                f"PVW_TPU_FUSED_PRESCALE={mode!r} is not a recognized mode "
                "(auto/1/0/true/false/on/off); using 'auto'",
                stacklevel=2,
            )
        return num_digits >= 8

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in self.describe().items())
        return f"Settings({body})"


settings = Settings()
