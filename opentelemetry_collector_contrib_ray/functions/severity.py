"""Severity mapping — vectorized equivalent of the stanza severity parser.

Mirrors the 25-level enum (reference: pkg/stanza/entry/severity.go:11-52;
Default=0, Trace=1..Trace4=4, Debug=5..8, Info=9..12, Warn=13..16,
Error=17..20, Fatal=21..24), the default token table including aliases
``warning``->Warn and ``err``->Error (reference:
pkg/stanza/operator/helper/severity_builder.go:18-106), and HTTP
range expansion where a mapping value like ``"4xx"`` expands to the
integer range 400..499 (severity_builder.go:199-206).

The vectorized apply is a dictionary-encode + take: tokens are
lower-cased, looked up via ``pc.index_in`` against the precomputed
token table, and mapped to severity numbers with ``pc.take`` — no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# number -> canonical text (severity.go:54-80)
_LEVELS = ["DEFAULT"]
for _base in ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]:
    _LEVELS += [_base, _base + "2", _base + "3", _base + "4"]

SEVERITY_TEXT: list[str] = _LEVELS  # index == severity number, 0..24

SEVERITY_NUMBER: dict[str, int] = {t: i for i, t in enumerate(SEVERITY_TEXT)}


def default_token_map() -> dict[str, int]:
    """The stanza default preset (severity_builder.go:64-88).

    Keys are lower-case tokens; values are severity numbers 0..24.
    Includes numeric-string aliases ("9" -> Info) and the
    warning/err aliases.
    """
    m: dict[str, int] = {}
    for num, text in enumerate(SEVERITY_TEXT):
        m[text.lower()] = num
        m[str(num)] = num
    for i in range(4):
        suffix = "" if i == 0 else str(i + 1)
        m["warning" + suffix] = SEVERITY_NUMBER["WARN" + ("" if i == 0 else str(i + 1))]
        m["err" + suffix] = SEVERITY_NUMBER["ERROR" + ("" if i == 0 else str(i + 1))]
    return m


class SeverityMapper:
    """Precompiled token->severity and int-range->severity tables.

    ``range_map`` entries use the reference's HTTP shorthand: mapping
    ``{"error": "5xx"}`` assigns Error to integer values 500..599
    (severity_builder.go:199-206 expands 2xx..5xx the same way).
    """

    def __init__(
        self,
        token_map: dict[str, int] | None = None,
        range_map: dict[str, str | tuple[int, int]] | None = None,
    ):
        self.token_map = dict(default_token_map() if token_map is None else token_map)
        # Expand ranges into (lo, hi_inclusive, severity) triples.
        self.ranges: list[tuple[int, int, int]] = []
        for sev_token, rng in (range_map or {}).items():
            sev = self.token_map[sev_token.lower()]
            if isinstance(rng, str) and rng.lower().endswith("xx"):
                base = int(rng[0]) * 100
                self.ranges.append((base, base + 99, sev))
            else:
                lo, hi = rng  # type: ignore[misc]
                self.ranges.append((int(lo), int(hi), sev))
        self.ranges.sort()
        self._tokens = pa.array(list(self.token_map.keys()), type=pa.string())
        self._numbers = pa.array(list(self.token_map.values()), type=pa.int8())

    def map_tokens(self, tokens: pa.ChunkedArray | pa.Array) -> pa.Array:
        """Vectorized token -> severity_number (int8; 0/Default for misses)."""
        low = pc.utf8_lower(pc.cast(tokens, pa.string()))
        idx = pc.index_in(low, value_set=self._tokens)
        nums = pc.take(self._numbers, idx)
        return pc.fill_null(nums, 0)

    def map_ints(self, values: pa.ChunkedArray | pa.Array) -> pa.Array:
        """Vectorized integer -> severity_number via the range table."""
        vals = pc.cast(values, pa.int64())
        out = pa.nulls(len(vals), pa.int8())
        for lo, hi, sev in self.ranges:
            hit = pc.and_(pc.greater_equal(vals, lo), pc.less_equal(vals, hi))
            out = pc.if_else(pc.fill_null(hit, False), pa.scalar(sev, pa.int8()), out)
        return pc.fill_null(out, 0)

    @staticmethod
    def number_to_text(numbers: pa.ChunkedArray | pa.Array) -> pa.Array:
        """severity_number -> canonical severity_text (severity.go:54-80)."""
        table = pa.array(SEVERITY_TEXT, type=pa.string())
        idx = pc.cast(numbers, pa.int32())
        return pc.take(table, idx)


HTTP_RANGE_MAP = {"info": "2xx", "info2": "3xx", "warn": "4xx", "error": "5xx"}


def http_status_severity() -> SeverityMapper:
    """ParseSeverity-style HTTP mapping (reference:
    pkg/ottl/ottlfuncs/func_parse_severity.go:15-75 range criteria):
    2xx->INFO, 3xx->INFO2, 4xx->WARN, 5xx->ERROR."""
    return SeverityMapper(range_map=HTTP_RANGE_MAP)


def np_severity_from_level(levels: np.ndarray) -> np.ndarray:
    """Pure-numpy oracle-side helper: level token array -> number array."""
    tm = default_token_map()
    return np.array([tm.get(str(x).lower(), 0) for x in levels], dtype=np.int8)


# --------------------------------------------------------------------
# Full stanza severity CONFIG surface (severity_builder.go:107-226):
# preset selection, user mapping folding (alias keys; str / int /
# bytes / list / {"min","max"} range values; "2xx".."5xx" shorthand),
# and the find() input semantics (severity.go:46-88) vectorized.

def _alias_table() -> dict[str, int]:
    """The "otel"/"aliases" builtin (severity_builder.go:22-73):
    trace..fatal4 plus numeric strings "1".."24"."""
    m: dict[str, int] = {}
    for num in range(1, 25):
        m[SEVERITY_TEXT[num].lower()] = num
        m[str(num)] = num
    return m


def builtin_mapping(preset: str | None) -> dict[str, int]:
    """getBuiltinMapping (severity_builder.go:18-88): "none" -> empty,
    "otel"/"aliases" -> the alias table, anything else (the default
    preset) -> aliases + warning*/err* extras."""
    if preset == "none":
        return {}
    if preset in ("otel", "aliases"):
        return _alias_table()
    m = _alias_table()
    for i in range(4):
        suf = "" if i == 0 else str(i + 1)
        m["warning" + suf] = m["warn" + suf]
        m["err" + suf] = m["error" + suf]
    return m


_MAX_RANGE_WIDTH = 1_000_000  # fail loud instead of materializing GBs


def _expand_range(lo: int, hi: int) -> list[str]:
    """expandRange (severity_builder.go:190-200): inclusive, swapped
    if out of order, materialized as decimal strings."""
    if lo > hi:
        lo, hi = hi, lo
    if hi - lo + 1 > _MAX_RANGE_WIDTH:
        raise ValueError(f"severity range {lo}..{hi} too wide")
    return [str(i) for i in range(lo, hi + 1)]


def _parseable_values(value) -> list[str]:
    """parseableValues (severity_builder.go:202-226)."""
    if isinstance(value, bool):
        raise TypeError(f"type {type(value).__name__} cannot be parsed as a severity")
    if isinstance(value, int):
        return [str(value)]
    if isinstance(value, bytes):
        return [value.decode().lower()]
    if isinstance(value, str):
        if value in ("2xx", "3xx", "4xx", "5xx"):
            base = int(value[0]) * 100
            return _expand_range(base, base + 99)
        return [value.lower()]
    if isinstance(value, dict) and "min" in value and "max" in value \
            and isinstance(value["min"], int) and isinstance(value["max"], int):
        return _expand_range(value["min"], value["max"])
    raise TypeError(f"type {type(value).__name__} cannot be parsed as a severity")


def build_severity_map(preset: str | None = None,
                       mapping: dict | None = None) -> dict[str, int]:
    """SeverityConfig.Build (severity_builder.go:122-161): start from
    the preset's builtin table, then fold the user mapping — keys are
    severity aliases (validated case-insensitively against the alias
    table), values are parseable-value shapes."""
    aliases = _alias_table()
    out = builtin_mapping(preset)
    for key, unknown in (mapping or {}).items():
        k = str(key).lower()
        if k not in aliases:
            raise ValueError(f"unknown severity alias {key!r}")
        sev = aliases[k]
        values = unknown if isinstance(unknown, list) else [unknown]
        for v in values:
            for token in _parseable_values(v):
                out[token] = sev
    return out


class SeverityFinder:
    """Vectorized severityMap.find (severity.go:46-88) + the Parse
    overwrite_text rule (severity.go:33-40)."""

    def __init__(self, preset: str | None = None, mapping: dict | None = None,
                 overwrite_text: bool = False):
        self.map = build_severity_map(preset, mapping)
        self.overwrite_text = overwrite_text
        self._tokens = pa.array(list(self.map.keys()), type=pa.string())
        self._numbers = pa.array(list(self.map.values()), type=pa.int8())

    def find_array(self, values: pa.Array | pa.ChunkedArray
                   ) -> tuple[pa.Array, pa.Array]:
        """-> (severity_number int8, severity_text string).

        String input looks up lowercased and keeps the original text;
        int input stringifies; float input must be whole (severity.go:
        66-75 — non-whole raises); bytes decode to string. Misses get
        Default(0) with the stringified input as text. With
        overwrite_text, matched rows get the canonical enum text and
        Default rows keep the input text (severity.go:36-38)."""
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        t = values.type
        if pa.types.is_floating(t):
            as_int = pc.cast(values, pa.int64(), safe=False)
            whole = pc.equal(pc.cast(as_int, pa.float64()), values)
            if not pc.all(pc.fill_null(whole, True)).as_py():
                raise ValueError(
                    "float severity values must be whole numbers")
            text = pc.cast(as_int, pa.string())
        elif pa.types.is_integer(t):
            text = pc.cast(values, pa.string())
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            text = pc.cast(values, pa.string())
        else:
            text = pc.cast(values, pa.string())
        low = pc.utf8_lower(text)
        idx = pc.index_in(low, value_set=self._tokens)
        num = pc.fill_null(pc.take(self._numbers, idx), 0)
        if self.overwrite_text:
            canon = SeverityMapper.number_to_text(num)
            text = pc.if_else(pc.equal(num, 0), text, canon)
        return num, text
