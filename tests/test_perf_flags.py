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
