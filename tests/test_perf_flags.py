"""perf_flags.json is the mechanism that arms measured-winning render
kernels (VERDICT r3 item 6): it must round-trip cleanly and reject
garbage LOUDLY, never silently."""

import json
import warnings

from matryodshka_tpu.ops import pallas_render as pr


def test_absent_file_is_silent_defaults(tmp_path):
    path = tmp_path / "perf_flags.json"
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        flags, p = pr._read_perf_flags(str(path))
    assert flags == {}
    assert p == str(path)


def test_valid_flags_round_trip(tmp_path):
    path = tmp_path / "perf_flags.json"
    path.write_text(json.dumps({"ftb": True, "ftbb": False}))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {"ftb": True, "ftbb": False}
    # the same .get() pattern the module-level DEFAULT_* bindings use
    assert bool(flags.get("ftb", False)) is True
    assert bool(flags.get("ftbb", False)) is False


def test_unknown_key_warns_and_is_dropped(tmp_path):
    path = tmp_path / "perf_flags.json"
    path.write_text(json.dumps({"ftbb_typo": True, "ftb": True}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {"ftb": True}
    assert any("ftbb_typo" in str(x.message) for x in w)


def test_non_bool_value_warns_and_is_dropped(tmp_path):
    path = tmp_path / "perf_flags.json"
    path.write_text(json.dumps({"ftb": "yes", "ftbb": True}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {"ftbb": True}
    assert any("ftb" in str(x.message) for x in w)


def test_corrupt_json_warns_and_defaults(tmp_path):
    path = tmp_path / "perf_flags.json"
    path.write_text("{not json")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {}
    assert any("unreadable" in str(x.message) for x in w)


def test_non_object_json_warns_and_defaults(tmp_path):
    path = tmp_path / "perf_flags.json"
    path.write_text(json.dumps([1, 2, 3]))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {}
    assert any("JSON object" in str(x.message) for x in w)


def test_schema_covers_all_default_bindings():
    # every DEFAULT_* read in pallas_render must have a schema entry,
    # or an armed winner would be silently dropped by validation
    assert {"ftb", "ftbb"} <= set(pr.PERF_FLAG_SCHEMA)


def test_backend_fingerprint_passthrough(tmp_path):
    # the prober's _backend metadata must survive the loader silently
    path = tmp_path / "perf_flags.json"
    path.write_text(json.dumps({"ftb": True, "_backend": "cpu|x|jax-1"}))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        flags, _ = pr._read_perf_flags(str(path))
    assert flags == {"ftb": True, "_backend": "cpu|x|jax-1"}


def test_ensure_armed_noop_off_tpu(tmp_path):
    # on CPU ensure_armed must read and return the stored flags without
    # probing or rewriting anything
    from matryodshka_tpu.ops import perf_probe
    path = tmp_path / "perf_flags.json"
    stored = {"ftbb": True, "net_x2": True, "_backend": "stale"}
    path.write_text(json.dumps(stored))
    flags = perf_probe.ensure_armed(path=str(path))
    assert flags == stored
    assert json.loads(path.read_text()) == stored


def test_refresh_module_globals(tmp_path):
    from matryodshka_tpu.ops import perf_probe
    saved = dict(pr._PERF_FLAGS)
    saved_defaults = (pr.DEFAULT_FTB, pr.DEFAULT_FTBB, pr.DEFAULT_VTAP,
                      pr.DEFAULT_ROLL16)
    try:
        perf_probe._refresh_module_globals({"ftb": True, "vtap": True})
        assert pr.DEFAULT_FTB is True and pr.DEFAULT_VTAP is True
        assert pr.DEFAULT_FTBB is False and pr.DEFAULT_ROLL16 is False
        # pallas_net reads the rebound dict at call time
        from matryodshka_tpu.ops import pallas_net
        perf_probe._refresh_module_globals({"net_x2": True})
        assert pallas_net._default_net_x2() is True
    finally:
        perf_probe._refresh_module_globals(saved)
        (pr.DEFAULT_FTB, pr.DEFAULT_FTBB, pr.DEFAULT_VTAP,
         pr.DEFAULT_ROLL16) = saved_defaults
        pr._PERF_FLAGS = saved
