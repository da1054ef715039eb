"""Tiny predicate/value DSL compiled to Arrow compute.

The reference's predicate surfaces — stanza ``if``/router/filter
expressions (expr-lang, pkg/stanza/operator/helper/expr_string.go) and
OTTL ``where`` conditions (pkg/ottl/LANGUAGE.md boolean expressions)
— become s-expression tuples compiled once into vectorized
``fn(pa.Table) -> pa.BooleanArray`` closures. No per-row evaluation.

Spec grammar (nested tuples/lists)::

    ("==", col("status"), 200)
    ("and", ("==", col("role"), "tool"), ("!=", col("tool"), ""))
    ("or", p, q)   ("not", p)
    (">", col("dur"), 100.0)   also >=, <, <=, !=
    ("in", col("level"), ["ERROR", "FATAL"])
    ("match", col("text"), r"^ERROR")        # IsMatch / regexp
    ("is_null", col("x")) / ("not_null", col("x"))
    True / False                              # literal predicate

Values: ``col("name")`` references a column; anything else is a
literal scalar. Comparisons against null yield null, which is treated
as no-match (``fill_null(False)``) exactly like OTTL error_mode=ignore
condition errors -> no-match (connector/routingconnector/config.go
error handling; pkg/ottl/config.go ErrorMode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc

Predicate = Callable[[pa.Table], pa.Array]


@dataclass(frozen=True)
class Col:
    name: str


def col(name: str) -> Col:
    return Col(name)


def resolve_col(tbl: pa.Table, name: str):
    """A Col reference: exact column first, else the longest column
    prefix with the rest as struct-field steps — the columnar read for
    nested paths (attributes["foo"]["bar"] -> struct column foo,
    field bar). Dotted COLUMN names (http.method) keep priority."""
    if name in tbl.column_names:
        c = tbl[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        head = ".".join(parts[:i])
        if head not in tbl.column_names:
            continue
        c = tbl[head]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        for f in parts[i:]:
            if not pa.types.is_struct(c.type):
                raise KeyError(
                    f"{name!r}: {head!r} is not a struct at field {f!r}")
            c = pc.struct_field(c, f)
            head += "." + f
        return c
    raise KeyError(f'Field "{name}" does not exist in schema')


def _value(tbl: pa.Table, v: Any, n: int):
    if isinstance(v, Col):
        # a missing attribute reads as nil in OTTL conditions
        # (`where attributes["absent"] == nil` must be TRUE, e2e
        # corpus) — an all-null column, never a KeyError
        try:
            return resolve_col(tbl, v.name)
        except KeyError:
            return pa.nulls(n)
    if isinstance(v, dict) and "__converter__" in v:
        # a converter call inside a condition (where UnixMicro(time) > 0):
        # evaluate the editor into a scratch column, compare on that
        from .stages.transform import Statement

        out = Statement(v["__converter__"],
                        {**v["args"], "target": "__cond__"})(tbl)
        c = out["__cond__"]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return v  # scalar literal; Arrow kernels broadcast


_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "<": pc.less,
    "<=": pc.less_equal,
}


def compile_predicate(spec: Any) -> Predicate:
    """Compile a spec into a vectorized mask function (nulls->False)."""

    fn = _compile(spec)

    def masked(tbl: pa.Table) -> pa.Array:
        m = fn(tbl)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return pc.fill_null(pc.cast(m, pa.bool_()), False)

    return masked


def _compile(spec: Any) -> Predicate:
    if spec is True or spec is None:
        return lambda tbl: pa.array([True] * tbl.num_rows)
    if spec is False:
        return lambda tbl: pa.array([False] * tbl.num_rows)
    op, *args = spec
    if op in _CMP:
        lhs, rhs = args
        k = _CMP[op]
        return lambda tbl: k(_value(tbl, lhs, tbl.num_rows), _value(tbl, rhs, tbl.num_rows))
    if op == "and":
        subs = [_compile(a) for a in args]
        def f_and(tbl):
            m = subs[0](tbl)
            for s in subs[1:]:
                m = pc.and_kleene(m, s(tbl))
            return m
        return f_and
    if op == "or":
        subs = [_compile(a) for a in args]
        def f_or(tbl):
            m = subs[0](tbl)
            for s in subs[1:]:
                m = pc.or_kleene(m, s(tbl))
            return m
        return f_or
    if op == "not":
        sub = _compile(args[0])
        return lambda tbl: pc.invert(pc.fill_null(pc.cast(sub(tbl), pa.bool_()), False))
    if op == "in":
        c, values = args
        vs = pa.array(values)
        return lambda tbl: pc.is_in(_value(tbl, c, tbl.num_rows), value_set=vs)
    if op == "match":
        c, pattern = args
        return lambda tbl: pc.match_substring_regex(_value(tbl, c, tbl.num_rows), pattern=pattern)
    if op == "is_null":
        c = args[0]
        return lambda tbl: pc.is_null(_value(tbl, c, tbl.num_rows))
    if op == "not_null":
        c = args[0]
        return lambda tbl: pc.is_valid(_value(tbl, c, tbl.num_rows))
    if op == "typecheck":
        # OTTL IsString/IsDouble/IsBool/IsInt/IsMap/IsList over a
        # column: the Arrow column type is uniform, so the per-row
        # answer is is_valid(col) & (column type matches) — a null row
        # models pdata's nil value, which every Is* rejects
        c, kind = args
        checks = {"string": pa.types.is_string,
                  "double": pa.types.is_floating,
                  "bool": pa.types.is_boolean,
                  "int": pa.types.is_integer,
                  "map": lambda t: pa.types.is_struct(t) or pa.types.is_map(t),
                  "list": pa.types.is_list}
        chk = checks[kind]

        def f_type(tbl):
            v = _value(tbl, c, tbl.num_rows)
            if not chk(v.type):
                return pa.array([False] * tbl.num_rows)
            return pc.is_valid(v)

        return f_type
    if op == "isempty":
        # OTTL IsEmpty: "" / empty list / empty map; null -> False
        c = args[0]

        def f_empty(tbl):
            v = _value(tbl, c, tbl.num_rows)
            if pa.types.is_string(v.type):
                return pc.equal(pc.utf8_length(v), 0)
            if pa.types.is_list(v.type) or pa.types.is_map(v.type):
                return pc.equal(pc.list_value_length(v), 0)
            if pa.types.is_struct(v.type):  # fixed schema: empty iff
                return pa.array([False] * tbl.num_rows)  # no fields, never here
            return pa.array([False] * tbl.num_rows)

        return f_empty
    raise ValueError(f"unknown predicate op {op!r}")
