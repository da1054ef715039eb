"""routingconnector logs golden tests ported verbatim
(connector/routingconnector/logs_test.go TestLogsConnectorDetailed,
resource/log/mixed contexts; request/* cases are connection-metadata
routing — out of scope for a finite-table engine, documented ⛔).

Input is plogutiltest.NewLogs("AB", "CD", "EF") flattened columnar:
2 resources (resourceA/B) x 2 scopes (scopeC/D) x 2 logs (logE/F) =
8 rows. In the flattened model a resource-context route is a
record-level condition over the resource column — all rows of a
matching resource share its attributes, so claim granularity is
identical. Expected per-sink row sets transcribed from the test table.
"""

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages.route import Route, Router


def _input() -> pa.Table:
    rows = {"resourceName": [], "scopeName": [], "body": []}
    for r in "AB":
        for s in "CD":
            for b in "EF":
                rows["resourceName"].append(f"resource{r}")
                rows["scopeName"].append(f"scope{s}")
                rows["body"].append(f"log{b}")
    return pa.table(rows)


def _route(cond, sink):
    return Route(condition=cond, sink=sink, action="move")


def _run(routes, default):
    ds = ray.data.from_arrow(_input()).repartition(3)
    out = Router(routes, default_sink=default).apply(ds).to_pandas()
    sinks = {}
    for _, r in out.iterrows():
        sinks.setdefault(r["sink"], set()).add(
            (r["resourceName"], r["scopeName"], r["body"]))
    return sinks


def _logs(resources="", scopes="", bodies=""):
    """plogutiltest.NewLogs triple set."""
    return {(f"resource{r}", f"scope{s}", f"log{b}")
            for r in resources for s in scopes for b in bodies}


IS_RES_A = ("==", col("resourceName"), "resourceA")
IS_RES_B = ("==", col("resourceName"), "resourceB")
IS_RES_X = ("==", col("resourceName"), "resourceX")
IS_RES_Y = ("==", col("resourceName"), "resourceY")
IS_SCOPE_C = ("==", col("scopeName"), "scopeC")
IS_SCOPE_D = ("==", col("scopeName"), "scopeD")
IS_LOG_E = ("==", col("body"), "logE")
IS_LOG_F = ("==", col("body"), "logF")
IS_LOG_X = ("==", col("body"), "logX")
IS_LOG_Y = ("==", col("body"), "logY")
ALL = _logs("AB", "CD", "EF")


def test_resource_all_match_first_only():
    s = _run([_route(True, "0"), _route(IS_RES_Y, "1")], "D")
    assert s == {"0": ALL}


def test_resource_all_match_last_only():
    s = _run([_route(IS_RES_X, "0"), _route(True, "1")], "D")
    assert s == {"1": ALL}


def test_resource_all_match_only_once():
    # first-match-wins: the catch-all claims every resource before the
    # A-or-B route sees any
    s = _run([_route(True, "0"),
              _route(("or", IS_RES_A, IS_RES_B), "1")], "D")
    assert s == {"0": ALL}


def test_resource_each_matches_one():
    s = _run([_route(IS_RES_A, "0"), _route(IS_RES_B, "1")], "D")
    assert s == {"0": _logs("A", "CD", "EF"), "1": _logs("B", "CD", "EF")}


def test_resource_some_match_with_default():
    s = _run([_route(IS_RES_X, "0"), _route(IS_RES_B, "1")], "D")
    assert s == {"1": _logs("B", "CD", "EF"), "D": _logs("A", "CD", "EF")}


def test_resource_some_match_without_default():
    s = _run([_route(IS_RES_X, "0"), _route(IS_RES_B, "1")], None)
    assert s == {"1": _logs("B", "CD", "EF")}


def test_resource_match_none_with_default():
    s = _run([_route(IS_RES_X, "0"), _route(IS_RES_Y, "1")], "D")
    assert s == {"D": ALL}


def test_resource_match_none_without_default():
    s = _run([_route(IS_RES_X, "0"), _route(IS_RES_Y, "1")], None)
    assert s == {}


def test_log_all_match_first_only():
    s = _run([_route(True, "0"), _route(IS_LOG_Y, "1")], "D")
    assert s == {"0": ALL}


def test_log_all_match_last_only():
    s = _run([_route(IS_LOG_X, "0"), _route(True, "1")], "D")
    assert s == {"1": ALL}


def test_log_all_match_only_once():
    s = _run([_route(True, "0"),
              _route(("or", IS_LOG_E, IS_LOG_F), "1")], "D")
    assert s == {"0": ALL}


def test_log_each_matches_one():
    s = _run([_route(IS_LOG_E, "0"), _route(IS_LOG_F, "1")], "D")
    assert s == {"0": _logs("AB", "CD", "E"), "1": _logs("AB", "CD", "F")}


def test_log_some_match_with_default():
    s = _run([_route(IS_LOG_X, "0"), _route(IS_LOG_F, "1")], "D")
    assert s == {"1": _logs("AB", "CD", "F"), "D": _logs("AB", "CD", "E")}


def test_log_some_match_without_default():
    s = _run([_route(IS_LOG_X, "0"), _route(IS_LOG_F, "1")], None)
    assert s == {"1": _logs("AB", "CD", "F")}


def test_log_match_none_with_default():
    s = _run([_route(IS_LOG_X, "0"), _route(IS_LOG_Y, "1")], "D")
    assert s == {"D": ALL}


def test_log_match_none_without_default():
    s = _run([_route(IS_LOG_X, "0"), _route(IS_LOG_Y, "1")], None)
    assert s == {}


def test_log_with_resource_condition():
    # a log-context route conditioned on the lower (resource) context
    s = _run([_route(IS_RES_B, "0"), _route(IS_LOG_Y, "1")], "D")
    assert s == {"0": _logs("B", "CD", "EF"), "D": _logs("A", "CD", "EF")}


def test_log_with_scope_condition():
    s = _run([_route(IS_SCOPE_C, "0"), _route(IS_LOG_Y, "1")], "D")
    assert s == {"0": _logs("AB", "C", "EF"), "D": _logs("AB", "D", "EF")}


def test_log_with_resource_and_scope_conditions():
    s = _run([_route(("and", IS_RES_B, IS_SCOPE_D), "0"),
              _route(IS_LOG_Y, "1")], "D")
    assert s == {"0": _logs("B", "D", "EF"),
                 "D": _logs("A", "CD", "EF") | _logs("B", "C", "EF")}


def test_mixed_match_resource_then_logs():
    s = _run([_route(IS_RES_A, "0"), _route(IS_LOG_E, "1")], "D")
    assert s == {"0": _logs("A", "CD", "EF"), "1": _logs("B", "CD", "E"),
                 "D": _logs("B", "CD", "F")}


def test_mixed_match_logs_then_resource():
    s = _run([_route(IS_LOG_E, "0"), _route(IS_RES_B, "1")], "D")
    assert s == {"0": _logs("AB", "CD", "E"), "1": _logs("B", "CD", "F"),
                 "D": _logs("A", "CD", "F")}
