"""time_parser — the stanza time-parsing helper, vectorized.

Reference semantics:
  * layout_type "strptime": ctime-style directives translated to Go
    layouts in the reference (internal/coreinternal/timeutils/internal/
    ctimefmt/ctimefmt.go:31-70); here they translate to pandas
    ``to_datetime`` directives (same directive family) with the
    Go-flavored extras (%L %s %e %g %o %q %l %P %i %j %k %w %D %x %F
    %T %X %r %R %c) expanded.
  * layout_type "gotime": Go reference-time layouts ("2006-01-02
    15:04:05.999 MST") tokenized longest-first into the same directive
    set (time.Parse semantics).
  * layout_type "epoch": layouts s / ms / us / ns / s.ms / s.us /
    s.ns over string, integer or float columns
    (pkg/stanza/operator/helper/time.go:225-296, incl. the literal
    "subseconds are an integer count of the layout's unit" rule and
    float truncation via int64()).

Zone handling (timeutils/parser.go:101-147 + GetLocation:64-81):
  * an explicit %z offset (or Z) is applied and the result converted
    to UTC;
  * a %Z abbreviation is resolved through the IANA database
    (zoneinfo) per the reference's LoadLocation correction — "UTC"
    is UTC, "MST"/"HST"/... resolve to their fixed zones, unknown
    abbreviations fail with "failed to load location <zone>";
  * a layout ending in literal 'Z' implies UTC;
  * otherwise the configured ``location`` applies (the engine's
    default location is UTC — a flat-table engine has no ambient
    time.Local).

Year inference (timeutils/parser.go:163-181 SetTimestampYear): when
the layout carries no year directive, the current year is assumed,
rolled back one year if the result lands more than 7 days in the
future. ``now`` is injectable for determinism.

All timestamps come out as timestamp[ns] (naive, UTC).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from . import register

# ---------------------------------------------------------------- layouts

# ctime directive -> pandas to_datetime directive(s)
# (ctimefmt.go:31-70; zone-offset flavors %z %w %i %j %k all parse as %z)
_CTIME_TO_PANDAS = {
    "%Y": "%Y", "%y": "%y",
    "%m": "%m", "%o": "%m", "%q": "%m",
    "%b": "%b", "%h": "%b", "%B": "%B",
    "%d": "%d", "%e": "%d", "%g": "%d",
    "%a": "%a", "%A": "%A",
    "%H": "%H", "%l": "%I", "%I": "%I",
    "%p": "%p", "%P": "%p",
    "%M": "%M", "%S": "%S",
    "%L": "%f", "%f": "%f", "%s": "%f",
    "%Z": "%Z", "%z": "%z",
    "%w": "%z", "%i": "%z", "%j": "%z", "%k": "%z",
    "%D": "%m/%d/%Y", "%x": "%m/%d/%Y", "%F": "%Y-%m-%d",
    "%T": "%H:%M:%S", "%X": "%H:%M:%S",
    "%r": "%I:%M:%S %p", "%R": "%H:%M",
    "%n": "\n", "%t": "\t", "%%": "%",
    "%c": "%a %b %d %H:%M:%S %Y",
}

# Go reference-time tokens, longest-first (time/format.go layout
# constants), -> pandas directives. "Z0700"/"Z07:00" are the ISO zone
# directives; a bare trailing "Z" is a literal and means UTC.
_GOTIME_TOKENS = [
    ("2006", "%Y"), ("January", "%B"), ("Monday", "%A"),
    ("Jan", "%b"), ("Mon", "%a"),
    ("Z07:00:00", "%z"), ("Z070000", "%z"), ("Z07:00", "%z"), ("Z0700", "%z"),
    ("-07:00:00", "%z"), ("-070000", "%z"), ("-07:00", "%z"), ("-0700", "%z"),
    ("-07", "%z"),
    ("MST", "%Z"), ("PM", "%p"), ("pm", "%p"),
    ("15", "%H"), ("01", "%m"), ("02", "%d"), ("03", "%I"),
    ("04", "%M"), ("05", "%S"), ("06", "%y"),
    ("_2", "%d"), ("_1", "%m"),
    ("1", "%m"), ("2", "%d"), ("3", "%I"), ("4", "%M"), ("5", "%S"),
]

_FRAC_RE = re.compile(r"([.,])(0+|9+)")
_INVALID_GOTIME_FRAC = re.compile(r"[^.,9]9+")


def validate_gotime(layout: str) -> None:
    """ValidateGotime (timeutils/parser.go:188-194)."""
    m = _INVALID_GOTIME_FRAC.search(layout)
    if m:
        raise ValueError(
            f"invalid fractional seconds directive: '{m.group(0)}'. "
            "must be preceded with '.' or ','")


def gotime_to_pandas(layout: str) -> str:
    """Go reference-time layout -> pandas format string."""
    validate_gotime(layout)
    # fraction -> placeholder first, so the literal-% escape below
    # doesn't double it
    layout = _FRAC_RE.sub(lambda m: m.group(1) + "\x01", layout)
    out = []
    i = 0
    while i < len(layout):
        if layout[i] == "%":  # literal % must survive as %%
            out.append("%%")
            i += 1
            continue
        for tok, directive in _GOTIME_TOKENS:
            if layout.startswith(tok, i):
                out.append(directive)
                i += len(tok)
                break
        else:
            out.append(layout[i])
            i += 1
    return "".join(out).replace("\x01", "%f")


def strptime_to_pandas(layout: str) -> str:
    """ctime layout -> pandas format string (unknown directives fail
    loud like strptime.Validate)."""
    out = []
    i = 0
    while i < len(layout):
        if layout[i] == "%":
            d = layout[i:i + 2]
            if d not in _CTIME_TO_PANDAS:
                raise ValueError(f"invalid strptime directive {d!r}")
            out.append(_CTIME_TO_PANDAS[d])
            i += 2
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


# ------------------------------------------------- %Z abbreviation path

# pandas-format directive -> permissive regex (for locating the %Z
# zone substring inside each value)
_DIRECTIVE_RE = {
    "%Y": r"\d{4}", "%y": r"\d{2}", "%m": r"\d{1,2}", "%d": r"\d{1,2}",
    "%H": r"\d{1,2}", "%I": r"\d{1,2}", "%M": r"\d{1,2}", "%S": r"\d{1,2}",
    "%f": r"\d{1,9}",
    "%z": r"(?:Z|[+-]\d{2}:?\d{2}(?::?\d{2})?|[+-]\d{2})",
    "%a": r"[A-Za-z]+", "%A": r"[A-Za-z]+", "%b": r"[A-Za-z]+",
    "%B": r"[A-Za-z]+", "%p": r"[AaPp]\.?[Mm]\.?",
    "%Z": r"([A-Za-z][A-Za-z0-9+\-/_]{0,31})",
    "%%": r"%",
}


def _format_to_regex(fmt: str) -> re.Pattern:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            d = fmt[i:i + 2]
            out.append(_DIRECTIVE_RE.get(d, re.escape(d)))
            i += 2
        else:
            out.append(re.escape(fmt[i]))
            i += 1
    return re.compile("^" + "".join(out) + "$")


def _zone_to_utc_offset(zone: str, sample_ts: pd.Series) -> pd.Series:
    """Resolve a zone abbreviation per the reference's LoadLocation
    correction (timeutils/parser.go:128-147): the abbreviation must
    itself be an IANA zone name; its (possibly DST-aware) offset at
    each timestamp converts local wall time to UTC."""
    if zone in ("UTC", "GMT", "Z", ""):
        return sample_ts
    try:
        from zoneinfo import ZoneInfo

        tz = ZoneInfo(zone)
    except Exception:
        raise ValueError(f"failed to load location {zone}")
    return (sample_ts.dt.tz_localize(tz, nonexistent="shift_forward",
                                     ambiguous=True)
            .dt.tz_convert("UTC").dt.tz_localize(None))


# ---------------------------------------------------------------- stage


@register("time_parser")
class TimeParserStage:
    """The stanza ``time_parser`` operator
    (pkg/stanza/operator/parser/timeparser/parser.go:1-26 over
    helper/time.go) as a vectorized map_batches stage."""

    def __init__(
        self,
        parse_from: str,
        layout: str,
        layout_type: str = "strptime",
        location: str | None = None,
        out_col: str = "timestamp",
        on_error: str = "send",
        now: datetime | None = None,
    ):
        if layout_type not in ("strptime", "gotime", "epoch"):
            raise ValueError(
                f"unsupported layout_type {layout_type!r}; "
                "valid values are 'strptime', 'gotime', and 'epoch'")
        self.parse_from = parse_from
        self.layout = layout
        self.layout_type = layout_type
        self.out_col = out_col
        self.on_error = on_error
        self.now = now

        if layout_type == "epoch":
            if layout not in ("s", "ms", "us", "ns", "s.ms", "s.us", "s.ns"):
                raise ValueError(
                    f"invalid `layout` for `epoch` type: {layout!r}")
            self.fmt = None
            self.has_zone = False
        else:
            self.fmt = (gotime_to_pandas(layout) if layout_type == "gotime"
                        else strptime_to_pandas(layout))
            self.has_zone = "%Z" in self.fmt
            self.has_offset = "%z" in self.fmt
            self.has_year = any(d in self.fmt for d in ("%Y", "%y"))
            self._zone_re = _format_to_regex(self.fmt) if self.has_zone else None
            # GetLocation (timeutils/parser.go:64-81): explicit
            # location > trailing-'Z' layout > default (UTC here)
            if location:
                from zoneinfo import ZoneInfo

                self.location = ZoneInfo(location)
            elif layout.endswith("Z") and not self.has_zone:
                self.location = timezone.utc
            else:
                self.location = None  # engine-default: UTC

    # ----------------------------------------------------------- epoch

    def _parse_epoch(self, col: pa.Array) -> pd.Series:
        layout = self.layout
        t = col.type
        unit_ns = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}
        sub_ns = {"s.ms": 10**6, "s.us": 10**3, "s.ns": 1}
        if layout in unit_ns:
            if pa.types.is_string(t) or pa.types.is_binary(t):
                vals = pc.cast(pc.cast(col, pa.string()), pa.int64())
            elif pa.types.is_floating(t):
                # getEpochStamp float branch: int64(v) truncation
                vals = pc.cast(pc.trunc(col), pa.int64(), safe=False)
            else:
                vals = pc.cast(col, pa.int64())
            ns = pc.multiply_checked(vals, unit_ns[layout])
            return pd.Series(ns.to_numpy(zero_copy_only=False)
                             .astype("datetime64[ns]"))
        # s.ms / s.us / s.ns
        if pa.types.is_string(t) or pa.types.is_binary(t):
            s = pc.cast(col, pa.string())
            parts = pc.split_pattern(s, ".")
            ok = pc.equal(pc.list_value_length(parts), 2)
            if not pc.all(pc.fill_null(ok, True)).as_py():
                bad = pc.filter(s, pc.invert(pc.fill_null(ok, True)))
                raise ValueError(
                    f"invalid value '{bad[0].as_py()}' for layout '{layout}'")
            sec = pc.cast(pc.list_element(parts, 0), pa.int64())
            # the subsecond field is a literal integer COUNT of the
            # layout's unit (time.go:239-248): "5.1" at s.ms is 1 ms
            sub = pc.cast(pc.list_element(parts, 1), pa.int64())
            ns = pc.add_checked(pc.multiply_checked(sec, 10**9),
                                pc.multiply_checked(sub, sub_ns[layout]))
        elif pa.types.is_floating(t):
            # getEpochStamp float branch: %.3f/%.6f/%.9f rendering ==
            # rounding the fraction to the layout's precision
            digits = {"s.ms": 3, "s.us": 6, "s.ns": 9}[layout]
            f = col.to_numpy(zero_copy_only=False)
            sec = np.floor(f).astype("int64")
            sub = np.rint((f - sec) * 10**digits).astype("int64")
            ns = sec * 10**9 + sub * sub_ns[layout]
            ns = pa.array(ns)
        else:
            # int branch: "%d.0" — subseconds dropped
            sec = pc.cast(col, pa.int64())
            ns = pc.multiply_checked(sec, 10**9)
        return pd.Series(ns.to_numpy(zero_copy_only=False)
                         .astype("datetime64[ns]"))

    # ------------------------------------------------------- formatted
    # stays pandas: Arrow's strptime has no %z/%Z support and no
    # per-value mixed-offset handling, both required by the Go layout
    # semantics this mirrors (gotime %Z excision, location localize)

    def _parse_formatted(self, col: pa.Array) -> pd.Series:
        s = pd.Series(pc.cast(col, pa.string()).to_pandas())
        if self.has_zone:
            return self._parse_with_zone(s)
        ts = pd.to_datetime(s, format=self.fmt, errors="coerce", utc=self.has_offset)
        if self.has_offset:
            ts = ts.dt.tz_localize(None)
        elif self.location is not None and self.location is not timezone.utc:
            ts = (ts.dt.tz_localize(self.location, nonexistent="shift_forward",
                                    ambiguous=True)
                  .dt.tz_convert("UTC").dt.tz_localize(None))
        return ts

    def _parse_with_zone(self, s: pd.Series) -> pd.Series:
        # locate the %Z abbreviation in each value via the
        # format-derived regex, strip it, parse the remainder once,
        # then apply each distinct zone's offset (vectorized per
        # distinct zone — log streams carry one or two)
        zone_fmt = self.fmt.replace("%Z", "\x00")
        extracted = s.str.extract(self._zone_re, expand=False)
        matched = extracted.notna()

        def _excise(m: re.Match) -> str:
            # replace exactly the zone GROUP's span, not its first
            # textual occurrence (a zone like "Sun" could also appear
            # as a weekday earlier in the value)
            return m.string[:m.start(1)] + "\x00" + m.string[m.end(1):]

        stripped = s.str.replace(self._zone_re, _excise, regex=True)
        ts = pd.to_datetime(stripped.where(matched),
                            format=zone_fmt, errors="coerce")
        out = pd.Series(pd.NaT, index=s.index, dtype="datetime64[ns]")
        for zone in extracted[matched].unique():
            rows = (extracted == zone) & ts.notna()
            if rows.any():
                out[rows] = _zone_to_utc_offset(str(zone), ts[rows])
        return out

    # ----------------------------------------------------------- entry

    def fn(self, batch: pa.Table) -> pa.Table:
        col = batch[self.parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.layout_type == "epoch":
            ts = self._parse_epoch(col)
        else:
            ts = self._parse_formatted(col)
            if not self.has_year:
                ts = self._set_timestamp_year(ts)
        ok = ts.notna().to_numpy()
        arr = pa.Array.from_pandas(ts, type=pa.timestamp("ns"))
        batch = batch.append_column(self.out_col, arr)
        if self.on_error.startswith("drop"):
            return batch.filter(pa.array(ok))
        if self.on_error == "propagate" and not ok.all():
            bad = batch[self.parse_from][int(np.argmin(ok))].as_py()
            raise ValueError(f"time parse failed for {bad!r} "
                             f"with layout {self.layout!r}")
        return batch

    def _set_timestamp_year(self, ts: pd.Series) -> pd.Series:
        """SetTimestampYear (timeutils/parser.go:163-181): pandas
        defaults a yearless parse to 1900; re-anchor to the current
        year, minus one if >7 days in the future."""
        now = self.now or datetime.now(timezone.utc).replace(tzinfo=None)
        now = pd.Timestamp(now)
        this_year = ts + pd.DateOffset(years=now.year - 1900)
        rolled = this_year - pd.DateOffset(years=1)
        return this_year.where(this_year <= now + pd.Timedelta(days=7), rolled)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds.map_batches(self.fn, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
