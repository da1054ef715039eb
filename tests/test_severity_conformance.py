"""Verbatim port of the stanza severity helper test suite
(pkg/stanza/operator/helper/severity_test.go) against the
build_severity_map / SeverityFinder config surface: the named
TestSeverityParser cases, the generated otlpSevCases (24 enum tokens x
case variants) and validMappingKeyCases (every alias key accepts a
custom value), TestOtelPreset (all 48 otel keys), and
TestBuildCustomMapping's find-level expectations over allTheThingsMap.
"""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions.severity import (
    SEVERITY_NUMBER,
    SEVERITY_TEXT,
    SeverityFinder,
    build_severity_map,
)

S = SEVERITY_NUMBER  # canonical text -> number, e.g. S["ERROR2"] == 18

ALL_THE_THINGS = {
    "info": "3xx",
    "error3": "4xx",
    "debug4": "5xx",
    "trace2": ["ttttttracer", {"min": 1111, "max": 1234}],
    "12": "infooo",
    "fatal2": "",
}

# (name, sample, mapping_set, mapping, expected_number,
#  expected_text_or_None, overwrite_text) — severity_test.go:148-429.
NAMED_CASES = [
    ("unknown", "blah", None, None, 0, "blah", False),
    ("error", "error", None, None, S["ERROR"], "error", False),
    ("error-overwrite-text", "error", None, None, S["ERROR"], "ERROR", True),
    ("error2", "error2", None, None, S["ERROR2"], None, False),
    ("error3", "error3", None, None, S["ERROR3"], None, False),
    ("error4", "error4", None, None, S["ERROR4"], None, False),
    ("error-capitalized", "Error", None, None, S["ERROR"], "Error", False),
    ("error-capitalized-overwrite-text", "Error", None, None, S["ERROR"], "ERROR", True),
    ("error-all-caps", "ERROR", None, None, S["ERROR"], "ERROR", False),
    ("custom-string", "NOOOOOOO", None, {"error": "NOOOOOOO"}, S["ERROR"], "NOOOOOOO", False),
    ("custom-string-overwrite-text", "NOOOOOOO", None, {"error": "NOOOOOOO"}, S["ERROR"], "ERROR", True),
    ("custom-string-caps-key", "NOOOOOOO", None, {"ErRoR": "NOOOOOOO"}, S["ERROR"], None, False),
    ("custom-int", 1234, None, {"error": 1234}, S["ERROR"], "1234", False),
    ("custom-int-overwrite-text", 1234, None, {"error": 1234}, S["ERROR"], "ERROR", True),
    ("mixed-list-string", "ThiS Is BaD", None,
     {"error": ["NOOOOOOO", "this is bad", 1234]}, S["ERROR"], None, False),
    ("custom-float64", 6.0, None, {"error": 6}, S["ERROR"], "6", False),
    ("mixed-list-int", 1234, None,
     {"error": ["NOOOOOOO", "this is bad", 1234]}, S["ERROR"], "1234", False),
    ("numbered-level", "critical", None, {"error2": "critical"}, S["ERROR2"], None, False),
    ("numbered-level-overwrite-text", "critical", None, {"error2": "critical"},
     S["ERROR2"], "ERROR2", True),
    ("override-standard", "error", None, {"error3": ["error"]}, S["ERROR3"], None, False),
    ("level-unfound", "not-in-the-list-but-thats-ok", None,
     {"error4": ["hey!", 1234]}, 0, None, False),
    ("in-range", 123, None, {"error": {"min": 120, "max": 125}}, S["ERROR"], None, False),
    ("in-range-overwrite-text", 123, None, {"error": {"min": 120, "max": 125}},
     S["ERROR"], "ERROR", True),
    ("in-range-min", 120, None, {"error": {"min": 120, "max": 125}}, S["ERROR"], None, False),
    ("in-range-max", 125, None, {"error": {"min": 120, "max": 125}}, S["ERROR"], None, False),
    ("out-of-range-min-minus", 119, None, {"error": {"min": 120, "max": 125}}, 0, None, False),
    ("out-of-range-max-plus", 126, None, {"error": {"min": 120, "max": 125}}, 0, None, False),
    ("range-out-of-order", 123, None, {"error": {"min": 125, "max": 120}}, S["ERROR"], None, False),
    ("Http2xx-hit", 201, None, {"error": "2xx"}, S["ERROR"], None, False),
    ("Http2xx-miss", 301, None, {"error": "2xx"}, 0, None, False),
    ("Http3xx-hit", 301, None, {"error": "3xx"}, S["ERROR"], None, False),
    ("Http4xx-hit", "404", None, {"error": "4xx"}, S["ERROR"], None, False),
    ("Http5xx-hit", 555, None, {"error": "5xx"}, S["ERROR"], None, False),
    ("Http-All", "301", None,
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"}, S["INFO"], None, False),
    ("Http-All-Overwrite-Text", "301", None,
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"}, S["INFO"], "INFO", True),
    ("all-the-things-midrange", 1234, None, ALL_THE_THINGS, S["TRACE2"], None, False),
    ("all-the-things-empty", "", None, ALL_THE_THINGS, S["FATAL2"], None, False),
    ("all-the-things-3xx", "399", None, ALL_THE_THINGS, S["INFO"], None, False),
    ("all-the-things-miss", "miss", None, ALL_THE_THINGS, 0, None, False),
    ("all-the-things-miss-never-overwrite-unknown", "miss", None, ALL_THE_THINGS,
     0, "miss", True),
    ("base-mapping-none", "error", "none", None, 0, None, False),
]


def _arr(sample):
    if isinstance(sample, bool):
        raise AssertionError("no bool samples in the corpus")
    if isinstance(sample, float):
        return pa.array([sample], pa.float64())
    if isinstance(sample, int):
        return pa.array([sample], pa.int64())
    return pa.array([sample], pa.string())


@pytest.mark.parametrize(
    "name,sample,preset,mapping,expected,expected_text,overwrite",
    NAMED_CASES, ids=[c[0] for c in NAMED_CASES])
def test_named_cases(name, sample, preset, mapping, expected,
                     expected_text, overwrite):
    f = SeverityFinder(preset=preset, mapping=mapping,
                       overwrite_text=overwrite)
    num, text = f.find_array(_arr(sample))
    assert num[0].as_py() == expected
    # severity_test.go:554-559: text is fmt.Sprint(sample) unless
    # overwrite_text matched a non-Default severity
    want_text = expected_text if expected_text is not None else str(sample)
    assert text[0].as_py() == want_text


_ENUM_TOKENS = [SEVERITY_TEXT[n].lower() for n in range(1, 25)]


@pytest.mark.parametrize("token", _ENUM_TOKENS)
def test_otlp_sev_cases(token):
    # otlpSevCases (severity_test.go:80-135): every enum token parses
    # under the default mapping in mixed, lower and upper case
    f = SeverityFinder()
    expected = SEVERITY_NUMBER[token.upper()]
    mixed = "".join(c.upper() if i % 2 else c for i, c in enumerate(token))
    num, _ = f.find_array(pa.array([token, token.upper(), mixed]))
    assert num.to_pylist() == [expected] * 3


@pytest.mark.parametrize("alias", _ENUM_TOKENS)
def test_valid_mapping_key_cases(alias):
    # validMappingKeyCases (severity_test.go:36-77): every alias is a
    # legal custom-mapping key
    f = SeverityFinder(mapping={alias: "my_custom_value"})
    num, _ = f.find_array(pa.array(["my_custom_value"]))
    assert num[0].as_py() == SEVERITY_NUMBER[alias.upper()]


def test_otel_preset():
    # TestOtelPreset (severity_test.go:445-514): all 48 keys
    f = SeverityFinder(preset="otel")
    samples, expected = [], []
    for n in range(1, 25):
        samples += [SEVERITY_TEXT[n].lower(), str(n)]
        expected += [n, n]
    num, _ = f.find_array(pa.array(samples))
    assert num.to_pylist() == expected
    # the otel preset has no warning/err aliases (default preset only)
    num, _ = f.find_array(pa.array(["warning", "err"]))
    assert num.to_pylist() == [0, 0]
    f2 = SeverityFinder()  # default preset includes them
    num, _ = f2.find_array(pa.array(["warning", "err", "warning3", "err4"]))
    assert num.to_pylist() == [S["WARN"], S["ERROR"], S["WARN3"], S["ERROR4"]]


def test_build_custom_mapping():
    # TestBuildCustomMapping (severity_test.go:556-597)
    m = build_severity_map(mapping=ALL_THE_THINGS)
    expected = {
        "300": S["INFO"], "301": S["INFO"], "399": S["INFO"],
        "400": S["ERROR3"], "410": S["ERROR3"], "499": S["ERROR3"],
        "500": S["DEBUG4"], "555": S["DEBUG4"], "599": S["DEBUG4"],
        "ttttttracer": S["TRACE2"], "1111": S["TRACE2"],
        "1200": S["TRACE2"], "1234": S["TRACE2"],
        "infooo": S["INFO4"], "": S["FATAL2"],
    }
    for k, v in expected.items():
        assert m[k] == v, k


def test_non_whole_float_errors():
    # severity.go:66-68: non-whole floats cannot be severities
    f = SeverityFinder()
    with pytest.raises(ValueError):
        f.find_array(pa.array([6.5]))


def test_invalid_alias_key_and_value_type():
    with pytest.raises(ValueError):
        build_severity_map(mapping={"sev-madeup": "x"})
    with pytest.raises(TypeError):
        build_severity_map(mapping={"error": {"not": "a-range"}})


def test_bytes_values_and_samples():
    # parseableValues []byte branch + find []byte branch
    m = build_severity_map(mapping={"warn2": b"BytesVal"})
    assert m["bytesval"] == S["WARN2"]
    f = SeverityFinder(mapping={"warn2": b"BytesVal"})
    num, text = f.find_array(pa.array([b"bytesVAL"], pa.binary()))
    assert num[0].as_py() == S["WARN2"] and text[0].as_py() == "bytesVAL"


def test_severity_parser_stage_config_surface(ray_session):
    # the stanza operator shape end-to-end over a Dataset
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.parse import (
        SeverityParserStage,
    )

    t = pa.table({"lvl": ["warning", "err3", "nope", "404"]})
    st = SeverityParserStage("lvl", mapping={"fatal": "4xx"},
                             overwrite_text=True)
    out = st.apply(ray.data.from_arrow(t)).to_pandas()
    assert list(out["severity_number"]) == [S["WARN"], S["ERROR3"], 0, S["FATAL"]]
    assert list(out["severity_text"]) == ["WARN", "ERROR3", "nope", "FATAL"]
