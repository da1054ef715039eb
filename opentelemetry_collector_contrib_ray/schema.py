"""Canonical schemas and constants for the transcript log pipeline.

The input table matches BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])``.

The embedded ``text`` layout (FIXTURES.md F1a) mirrors the reference's
apache-CLF regex benchmark line
(reference: pkg/stanza/operator/parser/regex/benchmark_test.go:22-36)::

    LEVEL [YYYY-mm-dd HH:MM:SS] role@tool status=NNN dur=F.FFms :: payload
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Named-capture parse regex for the turn text (RE2-compatible: works
# identically in pyarrow.compute.extract_regex and DuckDB regexp_extract).
# regex_parser requires >=1 named group (reference:
# pkg/stanza/operator/parser/regex/config.go:64-75).
TEXT_REGEX = (
    r"^(?P<level>[A-Z]+) \[(?P<time>[^\]]+)\] "
    r"(?P<actor>[a-z]+)@(?P<tool_tag>[^ ]+) "
    r"status=(?P<status>\d+) dur=(?P<dur>[\d.]+)ms :: (?P<payload>.*)$"
)

# Groups produced by TEXT_REGEX, in order.
TEXT_REGEX_GROUPS = ["level", "time", "actor", "tool_tag", "status", "dur", "payload"]

# strptime layout of the embedded time field (reference time_parser
# 'strptime' layout_type, pkg/stanza/operator/helper/time.go:24-34).
TEXT_TIME_FORMAT = "%Y-%m-%d %H:%M:%S"

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "editor", "browser", "python"]
