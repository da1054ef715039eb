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
