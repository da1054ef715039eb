"""otlpjsonconnector golden tests ported
(connector/otlpjsonconnector/testdata/logsToLogs/): the embedded
OTLP/JSON payload from input-log.yaml explodes into the flat record
output-log.yaml describes; the invalid-trace-id payload from
input-invalid-log.yaml fails strict unmarshalling and emits nothing."""

import pandas as pd
import pyarrow as pa
import ray.data

from opentelemetry_collector_contrib_ray.stages.otlpjson import OtlpJsonExplode

# testdata/logsToLogs/input-log.yaml body, verbatim
VALID = ('{"resourceLogs":[{"resource":{"attributes":[{"key":"resource-attr",'
         '"value":{"stringValue":"resource-attr-val-1"}}]},"scopeLogs":[{'
         '"scope":{},"logRecords":[{"timeUnixNano":"1581452773000000789",'
         '"severityNumber":9,"severityText":"Info","body":{"stringValue":'
         '"This is a log message"},"attributes":[{"key":"app","value":'
         '{"stringValue":"server"}},{"key":"instance_num","value":'
         '{"intValue":"1"}}],"droppedAttributesCount":1,"traceId":'
         '"08040201000000000000000000000000","spanId":"0102040800000000"}]}]}]}')
# input-invalid-log.yaml: trace id with invalid length -> whole
# payload errors, zero records
INVALID = VALID.replace("08040201000000000000000000000000", "0804")


def _explode(bodies):
    ds = ray.data.from_arrow(pa.table({"body": pa.array(bodies, pa.string())}))
    return OtlpJsonExplode(
        body_col="body",
        resource_attributes={"resource-attr": "string"},
        record_attributes={"app": "string", "instance_num": "int64"},
    ).apply(ds).to_pandas()


def test_valid_payload_explodes_to_flat_record():
    out = _explode([VALID])
    assert len(out) == 1
    r = out.iloc[0]
    assert r["resource-attr"] == "resource-attr-val-1"
    assert r["app"] == "server" and r["instance_num"] == 1
    assert r["body"] == "This is a log message"
    assert r["severity_text"] == "Info" and r["severity_number"] == 9
    assert r["trace_id"] == "08040201000000000000000000000000"
    assert r["span_id"] == "0102040800000000"
    assert r["ts"] == pd.Timestamp(1581452773000000789, unit="ns")


def test_invalid_trace_id_drops_whole_payload():
    out = _explode([INVALID, VALID, "not json", ""])
    # only the valid payload survives; the invalid-id payload, the
    # unparseable body and the empty body all emit nothing
    assert len(out) == 1 and out.iloc[0]["app"] == "server"


def test_multi_record_payload_explodes_per_record():
    two = VALID.replace(
        '"logRecords":[{', '"logRecords":[{"severityNumber":5,'
        '"severityText":"Debug","body":{"stringValue":"first"}},{')
    out = _explode([two])
    assert len(out) == 2
    assert sorted(out["body"]) == ["This is a log message", "first"]
