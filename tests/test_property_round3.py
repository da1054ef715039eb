"""Property tests over the round-3 vectorized editors: Luhn, glob
translation, duration parsing, snake/camel case — each against a
straightforward pure-Python reference. Kernel-level, no Ray."""

import fnmatch
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.stages.transform import Statement


def run(editor, args, tbl):
    return Statement(editor, args)(tbl)


def luhn_ref(s: str):
    # NB: str.isdigit() is True for "²" etc. — ASCII digits only,
    # matching the engine's [0-9] regex
    if not re.fullmatch(r"[0-9]{1,19}", s or ""):
        return False
    total = 0
    for i, ch in enumerate(reversed(s)):
        d = int(ch)
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(
    st.text(alphabet="0123456789", min_size=0, max_size=22),
    st.text(max_size=10)), min_size=1, max_size=40))
def test_luhn_matches_reference(vals):
    t = pa.table({"c": pa.array(vals, pa.string())})
    out = run("is_valid_luhn", {"target": "o", "src": "c"}, t)
    assert out["o"].to_pylist() == [luhn_ref(v) for v in vals]


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab*?x.[]()\\", max_size=8),
       st.lists(st.text(alphabet="abx.", max_size=8), min_size=1, max_size=20))
def test_glob_matches_fnmatch(pattern, vals):
    # our glob: * and ? only, everything else literal — fnmatchcase
    # agrees whenever the pattern has no [] character classes
    if "[" in pattern or "]" in pattern:
        return
    t = pa.table({"s": pa.array(vals, pa.string())})
    out = run("replace_match", {"target": "s", "pattern": pattern,
                                "replacement": "HIT"}, t)
    got = out["s"].to_pylist()
    for v, g in zip(vals, got):
        want = "HIT" if fnmatch.fnmatchcase(v, pattern) else v
        assert g == want, (pattern, v)


DUR = re.compile(r"^(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?(?:(\d+)ms)?$")


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 99), st.integers(0, 99), st.integers(0, 99),
       st.booleans(), st.booleans(), st.booleans())
def test_duration_matches_manual(h, m, s, use_h, use_m, use_s):
    txt = (f"{h}h" if use_h else "") + (f"{m}m" if use_m else "") + \
        (f"{s}s" if use_s else "")
    t = pa.table({"d": pa.array([txt], pa.string())})
    out = run("duration", {"target": "o", "src": "d"}, t)
    got = out["o"].to_pylist()[0]
    if not (use_h or use_m or use_s):
        assert got is None  # empty string parses as no duration? "" matches
        return
    want = (h * 3600 if use_h else 0) + (m * 60 if use_m else 0) + \
        (s if use_s else 0)
    assert got == float(want), txt


def snake_ref(s: str) -> str:
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", s)
    s = re.sub(r"[\s\-]+", "_", s)
    return s.lower()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           max_codepoint=127),
    max_size=16), min_size=1, max_size=20))
def test_snake_case_stable(vals):
    t = pa.table({"s": pa.array(vals, pa.string())})
    out = run("convert_case", {"target": "o", "src": "s", "case": "snake"}, t)
    assert out["o"].to_pylist() == [snake_ref(v) for v in vals]
    # idempotence: snaking a snake_case string is a no-op
    t2 = pa.table({"s": out["o"]})
    out2 = run("convert_case", {"target": "o", "src": "s", "case": "snake"}, t2)
    assert out2["o"].to_pylist() == out["o"].to_pylist()
