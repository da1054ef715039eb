"""Port of the stanza time-parser test corpora against
TimeParserStage: the gotime+strptime layout pairs from
pkg/stanza/operator/parser/timeparser/parser_test.go:150-131 (every
case runs through BOTH layout flavors and must land on the same UTC
instant), the epoch table (parser_test.go:270-430), SetTimestampYear
(timeutils/parser_test.go:39-84) and ValidateGotime
(timeutils/parser_test.go:86-126)."""

from datetime import datetime, timezone

import pandas as pd
import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.stages.timeparse import (
    TimeParserStage,
    gotime_to_pandas,
    validate_gotime,
)


def _utc(y, mo, d, h, mi, s, ns=0, off_min=0):
    """expected wall time (y..ns) at a fixed UTC offset -> naive UTC."""
    t = datetime(y, mo, d, h, mi, s, ns // 1000, tzinfo=timezone.utc)
    return pd.Timestamp(t).tz_localize(None) - pd.Timedelta(minutes=off_min) \
        + pd.Timedelta(nanoseconds=ns % 1000)


def run1(sample, layout, layout_type, **kw):
    st = TimeParserStage("t", layout, layout_type=layout_type,
                         on_error="propagate", **kw)
    if isinstance(sample, bytes):
        arr = pa.array([sample], pa.binary())
    elif isinstance(sample, bool):
        raise AssertionError
    elif isinstance(sample, int):
        arr = pa.array([sample], pa.int64())
    elif isinstance(sample, float):
        arr = pa.array([sample], pa.float64())
    else:
        arr = pa.array([sample], pa.string())
    out = st.fn(pa.table({"t": arr}))
    return pd.Timestamp(out["timestamp"][0].as_py())


# (name, sample, expected-naive-UTC, gotime layout, strptime layout)
# — parser_test.go:150-131. MST=-0700, HST=-1000 (fixed zones).
FORMATTED_CASES = [
    ("unix-utc", "Mon Jan 2 15:04:05 UTC 2006",
     _utc(2006, 1, 2, 15, 4, 5),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("unix-mst", "Mon Jan 2 15:04:05 MST 2006",
     _utc(2006, 1, 2, 15, 4, 5, off_min=-7 * 60),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("unix-hst", "Mon Jan 2 15:04:05 HST 2006",
     _utc(2006, 1, 2, 15, 4, 5, off_min=-10 * 60),
     "Mon Jan 2 15:04:05 MST 2006", "%a %b %e %H:%M:%S %Z %Y"),
    ("almost-unix", "Mon Jan 02 15:04:05 MST 2006",
     _utc(2006, 1, 2, 15, 4, 5, off_min=-7 * 60),
     "Mon Jan 02 15:04:05 MST 2006", "%a %b %d %H:%M:%S %Z %Y"),
    ("opendistro", "2020-06-09T15:39:58",
     _utc(2020, 6, 9, 15, 39, 58),
     "2006-01-02T15:04:05", "%Y-%m-%dT%H:%M:%S"),
    ("postgres", "2019-11-05 10:38:35.118 HST",
     _utc(2019, 11, 5, 10, 38, 35, 118_000_000, off_min=-10 * 60),
     "2006-01-02 15:04:05.999 MST", "%Y-%m-%d %H:%M:%S.%L %Z"),
    ("ibm-mq", "3/4/2018 11:52:29",
     _utc(2018, 3, 4, 11, 52, 29),
     "1/2/2006 15:04:05", "%q/%g/%Y %H:%M:%S"),
    ("cassandra", "2019-11-27T09:34:32.901-1000",
     _utc(2019, 11, 27, 9, 34, 32, 901_000_000, off_min=-10 * 60),
     "2006-01-02T15:04:05.999-0700", "%Y-%m-%dT%H:%M:%S.%L%z"),
    ("oracle", "2019-10-15T10:42:01.900436-10:00",
     _utc(2019, 10, 15, 10, 42, 1, 900_436_000, off_min=-10 * 60),
     "2006-01-02T15:04:05.999999-07:00", "%Y-%m-%dT%H:%M:%S.%f%j"),
    ("oracle-listener", "22-JUL-2019 15:16:13",
     _utc(2019, 7, 22, 15, 16, 13),
     "02-Jan-2006 15:04:05", "%d-%b-%Y %H:%M:%S"),
    ("k8s", "2019-03-08T18:41:12.152531115Z",
     _utc(2019, 3, 8, 18, 41, 12, 152_531_115),
     "2006-01-02T15:04:05.999999999Z", "%Y-%m-%dT%H:%M:%S.%sZ"),
    ("jetty", "05/Aug/2019:20:38:46 +0000",
     _utc(2019, 8, 5, 20, 38, 46),
     "02/Jan/2006:15:04:05 -0700", "%d/%b/%Y:%H:%M:%S %z"),
    ("esxi", "2020-12-16T21:43:28.391Z",
     _utc(2020, 12, 16, 21, 43, 28, 391_000_000),
     "2006-01-02T15:04:05.999Z", "%Y-%m-%dT%H:%M:%S.%LZ"),
]


@pytest.mark.parametrize("name,sample,expected,gotime,strp",
                         FORMATTED_CASES, ids=[c[0] for c in FORMATTED_CASES])
def test_formatted_both_flavors(name, sample, expected, gotime, strp):
    assert run1(sample, gotime, "gotime") == expected, "gotime"
    assert run1(sample, strp, "strptime") == expected, "strptime"


# (name, sample, layout, expected epoch-ns) — parser_test.go:270-430
EPOCH_CASES = [
    ("s-default-string", "1136214245", "s", 1136214245 * 10**9),
    ("s-default-bytes", b"1136214245", "s", 1136214245 * 10**9),
    ("s-default-int", 1136214245, "s", 1136214245 * 10**9),
    ("s-default-float", 1136214245.0, "s", 1136214245 * 10**9),
    ("ms-default-string", "1136214245123", "ms", 1136214245 * 10**9 + 123 * 10**6),
    ("ms-default-int", 1136214245123, "ms", 1136214245 * 10**9 + 123 * 10**6),
    ("ms-default-float", 1136214245123.0, "ms", 1136214245 * 10**9 + 123 * 10**6),
    ("us-default-string", "1136214245123456", "us", 1136214245 * 10**9 + 123456 * 10**3),
    ("us-default-int", 1136214245123456, "us", 1136214245 * 10**9 + 123456 * 10**3),
    ("us-default-float", 1136214245123456.0, "us", 1136214245 * 10**9 + 123456 * 10**3),
    ("ns-default-string", "1136214245123456789", "ns", 1136214245123456789),
    ("ns-default-int", 1136214245123456789, "ns", 1136214245123456789),
    ("s.ms-default-string", "1136214245.123", "s.ms", 1136214245 * 10**9 + 123 * 10**6),
    ("s.ms-default-int", 1136214245, "s.ms", 1136214245 * 10**9),  # drops subseconds
    ("s.ms-default-float", 1136214245.123, "s.ms", 1136214245 * 10**9 + 123 * 10**6),
    ("s.us-default-string", "1136214245.123456", "s.us", 1136214245 * 10**9 + 123456 * 10**3),
    ("s.us-default-float", 1136214245.123456, "s.us", 1136214245 * 10**9 + 123456 * 10**3),
    ("s.ns-default-string", "1136214245.123456789", "s.ns", 1136214245123456789),
    # the subsecond field is a literal integer count of the unit
    # (time.go:239-248): "1.1" at s.ms is 1 MILLISECOND
    ("s.ms-literal-subsec", "1136214245.1", "s.ms", 1136214245 * 10**9 + 1 * 10**6),
]


@pytest.mark.parametrize("name,sample,layout,expected_ns",
                         EPOCH_CASES, ids=[c[0] for c in EPOCH_CASES])
def test_epoch(name, sample, layout, expected_ns):
    got = run1(sample, layout, "epoch")
    assert got.value == expected_ns


def test_set_timestamp_year():
    # timeutils/parser_test.go:39-84
    def at(now, sample):
        return run1(sample, "%b %d %H:%M:%S", "strptime",
                    now=now)

    # Normal: June 16 with now=June 16 2020 -> 2020
    assert at(datetime(2020, 6, 16, 3, 31, 34), "Jun 16 03:31:34") == \
        pd.Timestamp(2020, 6, 16, 3, 31, 34)
    # FutureOneDay: Jan 17 with now=Jan 16 -> same year
    assert at(datetime(2020, 1, 16, 3, 31, 34), "Jan 17 03:31:34") == \
        pd.Timestamp(2020, 1, 17, 3, 31, 34)
    # FutureEightDays: Jan 24 with now=Jan 16 -> previous year
    assert at(datetime(2020, 1, 16, 3, 31, 34), "Jan 24 03:31:34") == \
        pd.Timestamp(2019, 1, 24, 3, 31, 34)
    # RolloverYear: Dec 31 with now=Jan 1 2020 -> 2019
    assert at(datetime(2020, 1, 1, 3, 31, 34), "Dec 31 03:31:34") == \
        pd.Timestamp(2019, 12, 31, 3, 31, 34)


def test_validate_gotime():
    validate_gotime("2006-01-02 15:04:05.999999")
    validate_gotime("2006-01-02 15:04:05,999999")
    with pytest.raises(ValueError, match="must be preceded"):
        validate_gotime("2006-01-02 15:04:05:999999")


def test_bad_location_fails_loud():
    # TestParseGoTimeBadLocation (timeutils/parser_test.go:14-17)
    with pytest.raises(ValueError, match="failed to load location BST"):
        run1("02 Jan 06 15:04 BST", "02 Jan 06 15:04 MST", "gotime")


def test_gotime_translation_table():
    assert gotime_to_pandas("2006-01-02T15:04:05.999Z") == "%Y-%m-%dT%H:%M:%S.%fZ"
    assert gotime_to_pandas("Mon Jan 2 15:04:05 MST 2006") == \
        "%a %b %d %H:%M:%S %Z %Y"
    assert gotime_to_pandas("1/2/2006 3:04 PM -07:00") == \
        "%m/%d/%Y %I:%M %p %z"


def test_invalid_layout_type_and_epoch_layout():
    with pytest.raises(ValueError):
        TimeParserStage("t", "s", layout_type="bogus")
    with pytest.raises(ValueError):
        TimeParserStage("t", "hours", layout_type="epoch")


def test_on_error_modes():
    t = pa.table({"t": ["2020-01-01T00:00:00", "not a time"]})
    st = TimeParserStage("t", "%Y-%m-%dT%H:%M:%S", on_error="send")
    out = st.fn(t)
    assert out["timestamp"].null_count == 1
    st = TimeParserStage("t", "%Y-%m-%dT%H:%M:%S", on_error="drop")
    assert st.fn(t).num_rows == 1
    st = TimeParserStage("t", "%Y-%m-%dT%H:%M:%S", on_error="propagate")
    with pytest.raises(ValueError, match="not a time"):
        st.fn(t)


def test_explicit_location():
    # GetLocation: explicit location converts local wall time to UTC
    got = run1("2020-06-09 15:39:58", "%Y-%m-%d %H:%M:%S", "strptime",
               location="America/New_York")  # EDT = UTC-4 in June
    assert got == pd.Timestamp(2020, 6, 9, 19, 39, 58)


def test_stage_over_dataset(ray_session):
    import ray.data

    t = pa.table({"t": ["2019-03-08T18:41:12.152531115Z"] * 3})
    st = TimeParserStage("t", "2006-01-02T15:04:05.999999999Z",
                         layout_type="gotime")
    out = st.apply(ray.data.from_arrow(t)).to_pandas()
    assert list(out["timestamp"])[0] == pd.Timestamp(
        2019, 3, 8, 18, 41, 12, 152531) + pd.Timedelta(nanoseconds=115)


def test_yaml_chain_time_and_severity(ray_session):
    # the stanza YAML operator-chain surface drives both round-4
    # config additions end-to-end
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        pipeline_from_yaml,
    )

    yaml_text = """
operators:
  - type: time_parser
    parse_from: t
    layout_type: gotime
    layout: "2006-01-02T15:04:05.999Z"
  - type: severity_parser
    parse_from: lvl
    mapping:
      fatal: "5xx"
    overwrite_text: true
"""
    t = pa.table({"t": ["2020-12-16T21:43:28.391Z"], "lvl": ["502"]})
    out = pipeline_from_yaml(yaml_text)(ray.data.from_arrow(t)).to_pandas()
    assert out["timestamp"][0] == pd.Timestamp(2020, 12, 16, 21, 43, 28, 391000)
    assert out["severity_number"][0] == 21 and out["severity_text"][0] == "FATAL"


# ---------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=4_102_444_800))  # 1970..2100
def test_epoch_seconds_roundtrip(sec):
    st_ = TimeParserStage("t", "s", layout_type="epoch")
    out = st_.fn(pa.table({"t": pa.array([sec], pa.int64())}))
    assert out["timestamp"][0].as_py() == datetime.utcfromtimestamp(sec)


@settings(max_examples=60, deadline=None)
@given(st.datetimes(min_value=datetime(1970, 1, 2),
                    max_value=datetime(2099, 12, 31)))
def test_strftime_strptime_roundtrip(dt):
    # render with pyarrow strftime at second resolution, parse back
    # through the strptime path: must round-trip exactly
    import pyarrow.compute as pc

    dt = dt.replace(microsecond=0)
    secs = pa.array([dt], pa.timestamp("s"))
    s = pc.strftime(secs, format="%Y-%m-%dT%H:%M:%S")
    st_ = TimeParserStage("t", "%Y-%m-%dT%H:%M:%S", layout_type="strptime",
                          on_error="propagate")
    out = st_.fn(pa.table({"t": s}))
    assert out["timestamp"][0].as_py() == dt


@settings(max_examples=40, deadline=None)
@given(st.datetimes(min_value=datetime(1970, 1, 2),
                    max_value=datetime(2099, 12, 31)),
       st.sampled_from(["ms", "us"]))
def test_epoch_subsecond_string_roundtrip(dt, unit):
    dt = dt.replace(microsecond=123456 if unit == "us" else 123000)
    epoch = int(dt.replace(tzinfo=timezone.utc).timestamp())
    digits = {"ms": 3, "us": 6}[unit]
    frac = dt.microsecond // (1000 if unit == "ms" else 1)
    sample = f"{epoch}.{frac:0{digits}d}"
    st_ = TimeParserStage("t", f"s.{unit}", layout_type="epoch")
    out = st_.fn(pa.table({"t": [sample]}))
    assert out["timestamp"][0].as_py() == dt
