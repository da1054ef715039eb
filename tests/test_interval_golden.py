"""intervalprocessor golden tests ported
(processor/intervalprocessor/testdata/*/): newest-by-event-time wins,
out-of-order datapoints are ignored, and delta / non-monotonic / (by
config) gauge metrics PASS THROUGH the interval aggregation untouched.

The reference splits the stream per metric type (processor.go: delta
and non-monotonic sums are forwarded immediately, never stored); the
columnar composition is a ``ds.filter`` split — eligible rows feed
``last_value_per_window``, pass-through rows flow unchanged — which is
what the collector YAML loader's interval + filter chain expresses."""

import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.window import last_value_per_window


def _metric_ds(rows):
    # golden timeUnixNano values carried as microseconds: the engine's
    # binary ts-packing uses timestamp[us], and only the ORDER of the
    # stamps matters to these vectors
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts_nano"], unit="us")
    return ray.data.from_pandas(df).repartition(2)


def test_basic_aggregation_newest_wins_out_of_order_ignored():
    # testdata/basic_aggregation: datapoints at ts 50/20/80 with values
    # 333/222/444 -> ONE datapoint (80, 444); the out-of-order 20 is
    # ignored even though it arrived second
    ds = _metric_ds({
        "metric": ["cumulative.monotonic.sum"] * 3,
        "aaa": ["bbb"] * 3,
        "ts_nano": [50, 20, 80],
        "value": [333.0, 222.0, 444.0],
    })
    out = last_value_per_window(ds, ["metric", "aaa"], "ts", "value",
                                window="hour").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["last_value"] == 444.0


def test_gauges_are_aggregated_newest_not_max():
    # testdata/gauges_are_aggregated: values 345/258/178 at ts 50/20/80
    # -> (80, 178): newest by TIME wins, not the max VALUE — a
    # discriminating vector (178 is the smallest)
    ds = _metric_ds({
        "metric": ["test.gauge"] * 3,
        "ts_nano": [50, 20, 80],
        "value": [345.0, 258.0, 178.0],
    })
    out = last_value_per_window(ds, ["metric"], "ts", "value",
                                window="hour").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["last_value"] == 178.0


def test_delta_and_nonmonotonic_pass_through():
    # testdata/all_delta_metrics_are_passed_through +
    # non_monotonic_sums_are_passed_through: those metrics never enter
    # the aggregation state (absent from the interval flush); the
    # eligible cumulative monotonic series still aggregates
    ds = _metric_ds({
        "metric": ["delta.sum", "nonmono.sum", "cum.mono", "cum.mono"],
        "temporality": ["delta", "cumulative", "cumulative", "cumulative"],
        "monotonic": [True, False, True, True],
        "ts_nano": [50, 50, 50, 80],
        "value": [333.0, 333.0, 333.0, 444.0],
    })
    eligible = ds.filter(
        lambda r: r["temporality"] == "cumulative" and r["monotonic"])
    passed = ds.filter(
        lambda r: not (r["temporality"] == "cumulative" and r["monotonic"]))
    agg = last_value_per_window(eligible, ["metric"], "ts", "value",
                                window="hour").to_pandas()
    assert list(agg["metric"]) == ["cum.mono"] and agg.iloc[0]["last_value"] == 444.0
    p = passed.to_pandas()
    assert sorted(p["metric"]) == ["delta.sum", "nonmono.sum"]
    assert list(p["value"]) == [333.0, 333.0]  # untouched
