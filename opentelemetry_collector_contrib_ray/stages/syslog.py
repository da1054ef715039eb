"""Syslog parser — RFC 5424 + RFC 3164 + raw ("none" protocol),
vectorized.

Reference semantics: pkg/stanza/operator/parser/syslog/parser.go
(go-syslog v4 machines + postprocess severity mapping) and its
canonical table tests (syslogtest/data.go). Covered here:

  * protocol rfc5424 / rfc3164 / none;
  * allow_skip_pri_header: a row not starting with ``<`` parses
    without the PRI header and its priority/severity/facility fields
    stay null (parser.go:117-133, shouldSkipPriorityValues);
  * enable_octet_counting: strip the RFC 6587 ``NNN `` frame prefix
    (parser.go:25-30, octetCountingPrefixRegex);
  * non_transparent_framing_trailer: strip a trailing LF / NUL
    (parser.go:186-189);
  * severity: syslog level 0-7 -> stanza entry severity numbers
    [Fatal..Debug] = [21,19,18,17,13,10,9,5] and texts
    emerg/alert/crit/err/warning/notice/info/debug
    (parser.go:365-385);
  * facility_text: go-syslog facility keywords (note 9="cron",
    15="cron2" — syslogtest/data.go RFC3164SkipPriPresent expects
    facility 15 -> "cron2");
  * none protocol: message passed through; a LEADING valid PRI
    (<=191) is decoded, anything else leaves all fields null
    (parser.go:277-300 parseRaw);
  * on_error send/drop per ON_ERROR_VALUES.

Execution shape: one ``pc.extract_regex`` per batch for the protocol
grammar, numpy for PRI math, pandas ``to_datetime`` (vectorized C) for
timestamps. Structured data is emitted as a deterministic JSON string
(sorted ids/params); its params are extracted with a compiled regex
over only the rows that HAVE structured data.

Known vectorization limit (documented): RFC 5424 SD values containing
an escaped ``\\]`` terminate the SD match early — the go-syslog state
machine accepts them. Such rows fall into the on_error path rather
than mis-parsing.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import register
from .parse import ON_ERROR_VALUES

# go-syslog v4 facility keywords (facility.go); index = facility code
FACILITY_KEYWORDS = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "logaudit", "logalert",
    "cron2", "local0", "local1", "local2", "local3", "local4", "local5",
    "local6", "local7",
]

SEVERITY_TEXT = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]
# stanza entry severities: Fatal, Error3, Error2, Error, Warn, Info2, Info, Debug
SEVERITY_NUMBER = np.array([21, 19, 18, 17, 13, 10, 9, 5], dtype=np.int8)

_RFC5424_RE = (
    r"^(?:<(?P<pri>\d{1,3})>)?(?P<version>\d{1,2}) "
    r"(?P<ts>-|\S+) (?P<hostname>-|\S+) (?P<appname>-|\S+) "
    r"(?P<proc_id>-|\S+) (?P<msg_id>-|\S+) "
    r"(?P<sd>-|(?:\[[^\]]*\])+)"
    r"(?: (?P<message>(?s:.*)))?$"
)

_RFC3164_RE = (
    r"^(?:<(?P<pri>\d{1,3})>)?"
    r"(?P<ts>[A-Z][a-z]{2} [ \d]?\d \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) "
    r"(?P<tag>[^:\[\s]+)(?:\[(?P<proc_id>\d+)\])?: ?"
    r"(?P<message>(?s:.*))$"
)

_OCTET_PREFIX = r"^[1-9]\d*\s"
_SD_PARAM = re.compile(r'(?P<k>[^\s=\]]+)="(?P<v>(?:[^"\\]|\\.)*)"')
_SD_GROUP = re.compile(r"\[(?P<id>[^\s\]]+)(?P<params>[^\]]*)\]")


def _iso_ts_us(arr: pa.Array) -> pa.Array:
    """ISO8601 string -> timestamp[us, UTC]: Arrow's native cast (C++)
    on the hot path; pandas ISO8601 fallback only when a value Arrow
    cannot parse slips through the shape regex (e.g. lowercase 't')."""
    try:
        return pc.cast(arr, pa.timestamp("us", tz="UTC"), safe=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        ts = pd.to_datetime(pd.Series(arr.to_pandas()), format="ISO8601",
                            errors="coerce", utc=True)
        return pa.Array.from_pandas(ts).cast(pa.timestamp("us", tz="UTC"),
                                             safe=False)


def _sd_to_json(sd: str | None) -> str | None:
    """One SD string -> deterministic JSON (sorted ids and params).
    Only called for rows whose sd is present and not '-'."""
    if sd is None or sd == "-" or sd == "":
        return None
    out: dict[str, dict[str, str]] = {}
    for g in _SD_GROUP.finditer(sd):
        params = {
            m.group("k"): m.group("v").replace('\\"', '"').replace("\\\\", "\\").replace("\\]", "]")
            for m in _SD_PARAM.finditer(g.group("params"))
        }
        out[g.group("id")] = params
    return json.dumps(out, sort_keys=True, separators=(",", ":"))


@register("syslog_parser")
class SyslogParser:
    """One vectorized map_batches per protocol grammar. Output columns
    (null where absent): priority, facility, facility_text, severity,
    severity_text, severity_number, version, timestamp (UTC), hostname,
    appname, proc_id, msg_id, message, structured_data (JSON string).
    """

    def __init__(
        self,
        protocol: str = "rfc5424",
        parse_from: str = "text",
        on_error: str = "send",
        allow_skip_pri_header: bool = False,
        enable_octet_counting: bool = False,
        non_transparent_framing_trailer: str | None = None,  # "LF" | "NUL"
        location: str = "UTC",
        rfc3164_year: int = 2026,
    ):
        if protocol not in ("rfc5424", "rfc3164", "none"):
            raise ValueError("protocol must be rfc5424 | rfc3164 | none")
        if on_error not in ON_ERROR_VALUES:
            raise ValueError(f"on_error must be one of {ON_ERROR_VALUES}")
        self.protocol = protocol
        self.parse_from = parse_from
        self.on_error = on_error
        self.allow_skip_pri = allow_skip_pri_header
        self.octet_counting = enable_octet_counting
        self.trailer = non_transparent_framing_trailer
        self.location = location
        self.year = rfc3164_year

    # ---------------------------------------------------------- helpers

    def _preframe(self, src: pa.Array) -> pa.Array:
        """RFC 6587 framing: strip octet-count prefix / trailing
        LF/NUL trailer."""
        if self.octet_counting:
            src = pc.replace_substring_regex(src, pattern=_OCTET_PREFIX,
                                             replacement="", max_replacements=1)
        if self.trailer == "LF":
            src = pc.replace_substring_regex(src, pattern=r"\n$", replacement="")
        elif self.trailer == "NUL":
            src = pc.replace_substring_regex(src, pattern="\x00$", replacement="")
        return src

    def _pri_columns(self, pri_str: pa.Array, had_pri: np.ndarray) -> dict[str, pa.Array]:
        """priority/facility/severity family from the PRI capture.
        ``had_pri`` rows without a valid 0-191 PRI get nulls."""
        # regex caps PRI at 3 digits so the cast cannot overflow
        pri_np = pc.cast(pri_str, pa.int64(), safe=False).to_numpy(zero_copy_only=False)
        pri_np = np.asarray(pri_np, dtype=np.int64)
        valid = had_pri & (pri_np <= 191)
        prii = np.where(valid, pri_np, 0)
        sev = prii % 8
        fac = prii // 8
        fac_text = np.array(FACILITY_KEYWORDS, dtype=object)[np.clip(fac, 0, 23)]
        sev_text = np.array(SEVERITY_TEXT, dtype=object)[sev]
        sev_num = SEVERITY_NUMBER[sev]
        mask = pa.array(valid)

        def m(arr, typ):
            return pc.if_else(mask, pa.array(arr, typ), pa.nulls(len(valid), typ))

        return {
            "priority": m(prii, pa.int64()),
            "facility": m(fac, pa.int64()),
            "facility_text": m(fac_text, pa.string()),
            "severity": m(sev, pa.int64()),
            "severity_text": m(sev_text, pa.string()),
            "severity_number": m(sev_num, pa.int8()),
        }

    @staticmethod
    def _pri_present(res: pa.StructArray, ok_np) -> tuple[pa.Array, "np.ndarray"]:
        """extract_regex yields EMPTY STRINGS (not nulls) for an
        unmatched optional group — present means non-empty."""
        pri_str = pc.fill_null(pc.struct_field(res, "pri"), "")
        had = (pc.greater(pc.utf8_length(pri_str), 0).to_numpy(zero_copy_only=False)
               & ok_np)
        return pc.if_else(pc.equal(pri_str, ""), pa.scalar("0", pa.string()), pri_str), had

    @staticmethod
    def _dash_null(arr: pa.Array) -> pa.Array:
        return pc.if_else(pc.equal(pc.fill_null(arr, "-"), "-"),
                          pa.nulls(len(arr), pa.string()), arr)

    # ---------------------------------------------------------- kernels

    def fn(self, batch: pa.Table) -> pa.Table:
        src = batch[self.parse_from]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = self._preframe(src)
        if self.protocol == "none":
            return self._fn_none(batch, src)
        if self.protocol == "rfc5424":
            return self._fn_5424(batch, src)
        return self._fn_3164(batch, src)

    def _finish(self, batch: pa.Table, cols: dict[str, pa.Array], ok: pa.Array) -> pa.Table:
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        if self.on_error.startswith("drop"):
            return batch.filter(ok)
        return batch

    def _fn_none(self, batch: pa.Table, src: pa.Array) -> pa.Table:
        n = len(src)
        # leading <PRI> decoded when valid; message always passes through
        pri_struct = pc.extract_regex(src, pattern=r"^<(?P<pri>\d{1,3})>")
        had = pri_struct.is_valid().to_numpy(zero_copy_only=False)
        pri_str = pc.struct_field(pri_struct, "pri")
        cols = self._pri_columns(pc.fill_null(pri_str, "0"), had)
        cols["message"] = src
        ok = pa.array(np.ones(n, dtype=bool))
        return self._finish(batch, cols, ok)

    def _fn_5424(self, batch: pa.Table, src: pa.Array) -> pa.Table:
        res = pc.extract_regex(src, pattern=_RFC5424_RE)
        ok = res.is_valid()
        ok_np = ok.to_numpy(zero_copy_only=False)
        pri_str, had_pri = self._pri_present(res, ok_np)
        if not self.allow_skip_pri:
            # a missing PRI is a parse error unless skipping is allowed
            ok = pc.and_(ok, pa.array(had_pri))
            ok_np = ok.to_numpy(zero_copy_only=False)
        cols = self._pri_columns(pri_str, had_pri)
        cols["version"] = pc.cast(pc.struct_field(res, "version"), pa.int64(), safe=False)
        ts_str = self._dash_null(pc.struct_field(res, "ts"))
        cols["timestamp"] = _iso_ts_us(ts_str)
        for f in ("hostname", "appname", "proc_id", "msg_id"):
            cols[f] = self._dash_null(pc.struct_field(res, f))
        sd_raw = pc.struct_field(res, "sd")
        sd_np = sd_raw.to_pandas()
        has_sd = sd_np.notna() & (sd_np != "-")
        sd_json = pd.Series([None] * len(sd_np), dtype=object)
        if has_sd.any():
            sd_json[has_sd] = sd_np[has_sd].map(_sd_to_json)
        cols["structured_data"] = pa.array(sd_json, pa.string())
        cols["message"] = pc.struct_field(res, "message")
        # null out every field on failed rows (send keeps the row)
        for k, v in cols.items():
            cols[k] = pc.if_else(ok, v, pa.nulls(len(ok), v.type))
        return self._finish(batch, cols, ok)

    def _fn_3164(self, batch: pa.Table, src: pa.Array) -> pa.Table:
        res = pc.extract_regex(src, pattern=_RFC3164_RE)
        ok = res.is_valid()
        ok_np = ok.to_numpy(zero_copy_only=False)
        pri_str, had_pri = self._pri_present(res, ok_np)
        if not self.allow_skip_pri:
            ok = pc.and_(ok, pa.array(had_pri))
        cols = self._pri_columns(pri_str, had_pri)
        # "Jan  2" -> "Jan 2"; add the configured year (go-syslog v4
        # defaults RFC3164 to the current year; deterministic here)
        ts_str = pc.replace_substring_regex(
            pc.fill_null(pc.struct_field(res, "ts"), ""), pattern=r"\s+", replacement=" ")
        ts = pd.to_datetime(
            str(self.year) + " " + pd.Series(ts_str.to_pandas()),
            format="%Y %b %d %H:%M:%S", errors="coerce",
        )
        ts = ts.dt.tz_localize(self.location).dt.tz_convert("UTC")
        cols["timestamp"] = pa.Array.from_pandas(ts).cast(pa.timestamp("us", tz="UTC"), safe=False)
        cols["hostname"] = pc.struct_field(res, "hostname")
        cols["appname"] = pc.struct_field(res, "tag")
        cols["proc_id"] = pc.struct_field(res, "proc_id")
        cols["message"] = pc.struct_field(res, "message")
        for k, v in cols.items():
            cols[k] = pc.if_else(ok, v, pa.nulls(len(ok), v.type))
        return self._finish(batch, cols, ok)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
