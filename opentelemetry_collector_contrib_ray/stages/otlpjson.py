"""otlpjsonconnector — explode embedded OTLP/JSON documents.

Reference semantics (connector/otlpjsonconnector/connector.go,
logs_connector.go): each consumed log record's BODY is expected to be
a complete OTLP/JSON export payload; the connector unmarshals it and
re-emits the EMBEDDED records (their own resource attributes, scope,
record attributes, severity, body, trace/span ids). A body that fails
strict unmarshalling (testdata/logsToLogs/input-invalid-log.yaml: a
trace id with invalid length) produces an error and NO records.

Columnar model: one output row per embedded log record, flattened —
resource attributes and record attributes become columns (requested
via typed mappings so the schema is static), standard fields land as
``body`` / ``severity_text`` / ``severity_number`` / ``ts`` /
``trace_id`` / ``span_id``. The per-document Python json parse is
inherent (OTLP/JSON is schema-dynamic); everything downstream is
columnar.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
import pyarrow as pa
import ray.data

_STD_FIELDS = ("body", "severity_text", "severity_number", "ts",
               "trace_id", "span_id")


def _attr_map(attrs: list | None) -> dict[str, Any]:
    out = {}
    for a in attrs or []:
        v = a.get("value") or {}
        if "stringValue" in v:
            out[a["key"]] = v["stringValue"]
        elif "intValue" in v:
            out[a["key"]] = int(v["intValue"])
        elif "doubleValue" in v:
            out[a["key"]] = float(v["doubleValue"])
        elif "boolValue" in v:
            out[a["key"]] = bool(v["boolValue"])
        else:
            out[a["key"]] = None
    return out


def _valid_hex_id(s: str | None, nibbles: int) -> bool:
    """pdata strict unmarshal: ids are fixed-length hex (or absent/
    empty); an invalid length fails the WHOLE payload."""
    if not s:
        return True
    if len(s) != nibbles:
        return False
    try:
        int(s, 16)
        return True
    except ValueError:
        return False


class OtlpJsonExplode:
    """``resource_attributes`` / ``record_attributes``: {name: arrow
    type alias} mappings defining which embedded attributes become
    columns (absent -> null). Malformed payloads emit nothing."""

    def __init__(
        self,
        body_col: str = "body",
        resource_attributes: dict[str, str] | None = None,
        record_attributes: dict[str, str] | None = None,
    ):
        def types(m):
            return {k: pa.type_for_alias(v) if isinstance(v, str) else v
                    for k, v in (m or {}).items()}

        self.body_col = body_col
        self.res_attrs = types(resource_attributes)
        self.rec_attrs = types(record_attributes)
        overlap = (set(self.res_attrs) | set(self.rec_attrs)) & set(_STD_FIELDS)
        if overlap:
            raise ValueError(f"attribute names collide with standard "
                             f"output fields: {sorted(overlap)}")

    def fn(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in
                                 (*self.res_attrs, *self.rec_attrs, *_STD_FIELDS)}

        def emit_payload(doc: dict) -> list[dict]:
            rows = []
            for rl in doc.get("resourceLogs") or []:
                res = _attr_map((rl.get("resource") or {}).get("attributes"))
                for sl in rl.get("scopeLogs") or []:
                    for lr in sl.get("logRecords") or []:
                        tid = lr.get("traceId")
                        sid = lr.get("spanId")
                        if not _valid_hex_id(tid, 32) or not _valid_hex_id(sid, 16):
                            raise ValueError("invalid id length")
                        rec = _attr_map(lr.get("attributes"))
                        ts = lr.get("timeUnixNano")
                        rows.append({
                            **{k: res.get(k) for k in self.res_attrs},
                            **{k: rec.get(k) for k in self.rec_attrs},
                            "body": (lr.get("body") or {}).get("stringValue"),
                            "severity_text": lr.get("severityText"),
                            "severity_number": lr.get("severityNumber"),
                            "ts": int(ts) if ts is not None else None,
                            "trace_id": tid or None,
                            "span_id": sid or None,
                        })
            return rows

        for s in batch[self.body_col].to_pylist():
            try:
                payload_rows = emit_payload(json.loads(s))
            except (TypeError, ValueError, AttributeError):
                continue  # strict unmarshal failure: whole payload dropped
            for r in payload_rows:
                for k, v in r.items():
                    cols[k].append(v)

        typed = {}
        for k, t in (*self.res_attrs.items(), *self.rec_attrs.items()):
            typed[k] = pa.array(cols[k], type=t)
        typed["body"] = pa.array(cols["body"], pa.string())
        typed["severity_text"] = pa.array(cols["severity_text"], pa.string())
        typed["severity_number"] = pa.array(cols["severity_number"], pa.int64())
        typed["ts"] = pa.array(
            [pd.Timestamp(v, unit="ns") if v is not None else None
             for v in cols["ts"]], pa.timestamp("ns"))
        typed["trace_id"] = pa.array(cols["trace_id"], pa.string())
        typed["span_id"] = pa.array(cols["span_id"], pa.string())
        return pa.table(typed)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
