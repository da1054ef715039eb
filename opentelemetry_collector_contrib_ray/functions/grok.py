"""Grok pattern compiler — ExtractGrokPatterns for the Ray engine.

Reference: pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:39-99
(elastic go-grok with custom pattern definitions). We compile
``%{PATTERN:field}`` / ``%{PATTERN:field:type}`` expressions into a
single RE2 regex with named capture groups, which then runs through
the same vectorized ``pc.extract_regex`` path as regex_parser — and
identically inside the DuckDB oracle (both are RE2).

Built-in library: the commonly used subset of the upstream grok base
patterns (logstash-patterns-core), written WITHOUT capture groups so
expansions can nest; callers may pass ``definitions`` to add custom
patterns exactly like the reference's ``pattern_definitions`` arg.
"""

from __future__ import annotations

import re

BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"%{BASE10NUM}",
    "POSINT": r"\b[1-9]\d*\b",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"0[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9])|(?:[12]\d)|(?:3[01])|[1-9]",
    "HOUR": r"2[0123]|[01]?\d",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]\d|60)(?:[:.,]\d+)?",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?"
    ),
    "LOGLEVEL": (
        r"[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
        r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
        r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?"
    ),
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (
        r"(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})(?:\.(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})){3}"
    ),
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'',
    # URI family (go-grok / logstash aws patterns — the reference's
    # ExtractGrokPatterns ships these; ELB_URI appears in its tests,
    # pkg/ottl/ottlfuncs/func_extract_grok_patterns_test.go:63)
    "USER": r"[a-zA-Z0-9._-]+",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "IPORHOST": r"(?:%{IPV4}|%{HOSTNAME})",
    "ELB_URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "ELB_URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "ELB_URIHOST": r"%{IPORHOST:url.domain}(?::%{POSINT:url.port:int})?",
    "ELB_URI": (
        r"%{URIPROTO:url.scheme}://(?:%{USER:url.username}(?::[^@]*)?@)?"
        r"(?:%{ELB_URIHOST})?(?:%{ELB_URIPATH:url.path}"
        r"(?:\?%{ELB_URIQUERY:url.query})?)?"
    ),
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")

GROK_TYPES = {"int": "int64", "long": "int64", "float": "float64", "double": "float64"}


def compile_grok(
    expression: str, definitions: dict[str, str] | None = None, _depth: int = 0
) -> tuple[str, dict[str, str]]:
    """Expand a grok expression -> (RE2 regex, field -> arrow type alias).

    ``%{NAME}`` expands non-capturing; ``%{NAME:field}`` expands to a
    named group; ``%{NAME:field:type}`` also records the cast.
    """
    if _depth > 16:
        raise ValueError("grok pattern recursion too deep")
    lib = dict(BASE_PATTERNS)
    if definitions:
        lib.update(definitions)
    types: dict[str, str] = {}

    def sub(m: re.Match) -> str:
        name, field, typ = m.group(1), m.group(2), m.group(3)
        try:
            body = lib[name]
        except KeyError:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body, inner_types = compile_grok(body, definitions, _depth + 1)
        types.update(inner_types)
        if field:
            if typ:
                types[mangle_grok_field(field)] = GROK_TYPES.get(typ, "string")
            return f"(?P<{mangle_grok_field(field)}>{body})"
        return f"(?:{body})"

    out = _GROK_REF.sub(sub, expression)
    return out, types


def mangle_grok_field(field: str) -> str:
    """ECS-style dotted field names (url.domain) are not valid regex
    group names — mangle for the engine, demangle on output."""
    return field.replace(".", "_DOT_")


def demangle_grok_field(field: str) -> str:
    return field.replace("_DOT_", ".")
