"""Textual OTTL statement front-end — parse the reference's statement
strings into this engine's Statement dicts.

The reference's transformprocessor takes statements as TEXT
(pkg/ottl/parser.go grammar; e2e corpus in pkg/ottl/e2e/e2e_test.go):

    set(attributes["test"], "pass") where body == "operationA"
    delete_key(attributes, "http.method")
    keep_matching_keys(attributes, "^http")
    set(attributes["sha"], SHA256(attributes["user"]))

A reference user should be able to paste those statements unchanged,
so this module implements a recursive-descent parser for the
columnar-expressible SUBSET and compiles each statement to the
registry's editor dicts (stages/transform.Statement):

  * paths: ``attributes["k"]``, ``resource.attributes["k"]``,
    ``body``, ``cache["k"]`` and bare names — all map to COLUMNS
    (``body`` -> the ``body`` column; attribute keys -> their name);
  * editors: set, delete_key(s), delete/keep_matching_keys, keep_keys,
    truncate_all, replace_match/pattern(+hash Function), append,
    limit, flatten, merge_maps, delete_index;
  * converters as set() values: the case/trim/prefix families,
    Concat, Substring, Split, Format (%0Nd widths), the hash family
    (SHA1/256/512, MD5, FNV, Murmur3Hash(128), XXH3, XXH128), the
    encode family (Base64*, Hex, Decode), the XML family (Parse*,
    Get/Remove/InsertXML, ConvertAttributes/TextToElementsXML), the
    time family (Year..Weekday, Unix*, Duration units, FormatTime,
    TruncateTime), the collection family (Sort, Keys, Values, Index,
    Len, SliceToMap shapes), Reduce with the OTTL lambda grammar,
    Coalesce, casts (Int/Double/String), and named arguments;
  * literal converter args FOLD at compile time (the reference
    evaluates literal getters per row; here they are constants), and
    NESTED converter calls in path position chain through scratch
    columns (Sort(Split(path, "|")));
  * where-clauses: ==, !=, <, <=, >, >=, and/or/not (with parens),
    IsMatch, the Is* type predicates, IsEmpty, converter calls as
    comparison operands, nil, true/false, string/number literals.

Nested STRING indexing (``attributes["a"]["b"]``) reads through
struct columns and writes flat dotted columns (exact-name priority on
read keeps the two coherent). Unsupported syntax (integer/dynamic
path indices, arithmetic in paths, multi-context paths) raises
``OTTLParseError`` naming the offending token — fail loud, never
mis-compile.
"""

from __future__ import annotations

import re
from typing import Any

from .expr import Col
from .stages.transform import Statement


class OTTLParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<hex>0x[0-9a-fA-F]+)
  | (?P<number>-?\d+\.\d+|-?\d+)
  | (?P<op>==|!=|<=|>=|=>|<|>|\(|\)|\[|\]|\{|\}|,|\.|:|\+|\*|-|=)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise OTTLParseError(f"unexpected character {s[i]!r} at {i} in {s!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            # `Len(x) - 1` must lex as op('-') number(1), not
            # number(-1): a '-' after a value-ending token is binary
            if kind == "number" and m.group().startswith("-") and out and (
                    out[-1][0] in ("name", "string", "number", "hex")
                    or out[-1][1] in (")", "]")):
                out.append(("op", "-"))
                out.append(("number", m.group()[1:]))
            else:
                out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def _unescape(s: str) -> str:
    """OTTL string-literal unescape: a backslash quotes the next
    character (the corpus exercises \\\\ and \\" only)."""
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


class _IDBytes(bytes):
    """A folded SpanID/TraceID/ProfileID value: compares/sets as the
    hex string, renders via String() as pdata's byte-list JSON."""

    @property
    def hex_str(self) -> str:
        return self.hex()


# pdata SeverityNumber enum (plog/severity_number.go): TRACE=1..FATAL4=24
_SEVERITY_ENUM = {
    f"SEVERITY_NUMBER_{name}{suffix}": base + off
    for base, name in ((1, "TRACE"), (5, "DEBUG"), (9, "INFO"),
                       (13, "WARN"), (17, "ERROR"), (21, "FATAL"))
    for off, suffix in enumerate(["", "2", "3", "4"])
}


def _is_literal(v: Any) -> bool:
    """True when a parsed value is a pure literal (no paths, no
    unfolded converters) — the shapes that fold at compile time."""
    if isinstance(v, Col):
        return False
    if isinstance(v, dict):
        if "__converter__" in v or "__lambda__" in v or "__kwarg__" in v \
                or "__arith__" in v or "__table_width__" in v:
            return False
        return all(_is_literal(x) for x in v.values())
    if isinstance(v, list):
        return all(_is_literal(x) for x in v)
    return True


def _cmp_fold(op: str, left: Any, right: Any) -> bool:
    if op == "==":
        return left == right
    if op == "!=":
        return left != right
    if op == "<":
        return left < right
    if op == "<=":
        return left <= right
    if op == ">":
        return left > right
    return left >= right


def _go_scalar_str(v: Any) -> str:
    """pcommon.Value.AsString for a folded scalar/collection."""
    import json as _json

    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return _json.dumps(v, separators=(",", ":"))
    return str(v)


def _parse_key_value_literal(text: str, delim: str, pair_delim: str) -> dict:
    """parseutils.ParseKeyValuePairs for a literal string: split on
    pair_delim outside single/double quotes (the default " " splits on
    WHITESPACE RUNS like strings.Fields, so newlines work), then on
    the first delim; quoted values keep embedded delimiters, drop the
    quotes, and strip surrounding spaces; an unterminated quote fails
    loud (func_parse_key_value_test.go vectors)."""
    pairs, cur = [], []
    quote = None  # the active quote char, or None
    ws_mode = pair_delim == " "
    i = 0
    while i < len(text):
        ch = text[i]
        if quote is None and ch in ('"', "'"):
            quote = ch
            cur.append(ch)
            i += 1
            continue
        if quote is not None:
            if ch == quote:
                quote = None
            cur.append(ch)
            i += 1
            continue
        if ws_mode and ch in " \t\n\r":
            pairs.append("".join(cur))
            cur = []
            while i < len(text) and text[i] in " \t\n\r":
                i += 1
            continue
        if not ws_mode and text.startswith(pair_delim, i):
            pairs.append("".join(cur))
            cur = []
            i += len(pair_delim)
            continue
        cur.append(ch)
        i += 1
    if quote is not None:
        raise OTTLParseError(f"ParseKeyValue: unterminated quote in {text!r}")
    pairs.append("".join(cur))
    out = {}
    for pr in pairs:
        if not pr:
            continue
        k, sep, v = pr.partition(delim)
        if not sep:
            raise OTTLParseError(f"ParseKeyValue: no delimiter in {pr!r}")
        v = v.strip()
        if len(v) >= 2 and v[0] == v[-1] and v[0] in ('"', "'"):
            v = v[1:-1].strip()
        out[k.strip()] = v
    return out


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _tokenize(text)
        self.pos = 0
        # scratch-column statements produced by NESTED converter calls
        # (Sort(Split(path, "|"))): inner call -> temp column first
        self._pre: list[Statement] = []
        self._tmp_n = 0
        # >0 while parsing a lambda body: nested-converter coercion is
        # disabled there (the lambda analyzers pattern-match the raw
        # converter dicts, and lambda params are not real columns)
        self._lambda_depth = 0

    def _as_col(self, v: Any) -> Col:
        """A converter argument where a path is required: paths pass
        through; a nested converter call evaluates into a scratch
        column via a prerequisite statement (dropped after)."""
        if isinstance(v, Col):
            return v
        if isinstance(v, dict) and "__converter__" in v:
            self._tmp_n += 1
            tmp = f"__ottl_tmp{self._tmp_n}__"
            self._pre.append(Statement(v["__converter__"],
                                       {"target": tmp, **v["args"]}))
            return Col(tmp)
        raise OTTLParseError(
            f"expected a path or converter call, got {v!r}: {self.text!r}")

    def _as_col_any(self, v: Any) -> Col:
        """Like _as_col but also materializes LITERALS into a scratch
        column (for editors whose other argument is per-row)."""
        if _is_literal(v):
            self._tmp_n += 1
            tmp = f"__ottl_tmp{self._tmp_n}__"
            self._pre.append(Statement("set", {"target": tmp, "value": v}))
            return Col(tmp)
        return self._as_col(v)

    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val: str) -> None:
        kind, tok = self.next()
        if tok != val:
            raise OTTLParseError(f"expected {val!r}, got {tok!r} in {self.text!r}")

    # ---------------------------------------------------------- values

    def parse_value(self) -> Any:
        """literal | path | Converter(args...), with postfix
        ``[index]`` reads into call results and literal collections."""
        v = self._parse_value_base()
        while self.peek()[1] == "[" and not isinstance(v, Col):
            v = self._apply_index(v)
        return v

    def _parse_value_base(self) -> Any:
        kind, tok = self.peek()
        if kind == "string":
            self.next()
            return _unescape(tok[1:-1])
        if kind == "number":
            self.next()
            return float(tok) if "." in tok else int(tok)
        if kind == "hex":
            self.next()
            return _IDBytes(bytes.fromhex(
                tok[2:] if len(tok) % 2 == 0 else "0" + tok[2:]))
        if kind == "name":
            if tok == "nil":
                self.next()
                return None
            if tok in ("true", "false"):
                self.next()
                return tok == "true"
            if tok in _SEVERITY_ENUM:
                self.next()
                return _SEVERITY_ENUM[tok]
            if self.toks[self.pos + 1][1] == "=" \
                    and self.toks[self.pos + 2][1] != "=":
                # named argument: name=value (flatten depth=1, ParseCSV
                # headerDelimiter="|", append values=[...])
                self.next()
                self.next()
                return {"__kwarg__": tok, "value": self.parse_value()}
            # converter call or path
            if self.toks[self.pos + 1][1] == "(" and tok[0].isupper():
                return self.parse_converter()
            return self.parse_path()
        if tok == "[":
            return self.parse_list()
        if tok == "{":
            return self.parse_map()
        if tok == "(":
            return self.parse_lambda()
        raise OTTLParseError(f"unexpected {tok!r} in value position in {self.text!r}")

    def _apply_index(self, v: Any) -> Any:
        """Postfix [index] on a non-path value: folds literal
        collections, chains converter results through list_index, and
        compiles <literal collection>[path] to a value_map lookup."""
        self.expect("[")
        idx = self.parse_value()
        self.expect("]")
        if isinstance(v, list) and isinstance(idx, int):
            if not 0 <= idx < len(v):
                raise OTTLParseError(f"index {idx} out of range: {self.text!r}")
            return v[idx]
        if isinstance(v, dict) and "__converter__" not in v \
                and isinstance(idx, str):
            if idx not in v:
                raise OTTLParseError(f"key {idx!r} not in map: {self.text!r}")
            return v[idx]
        if isinstance(v, (list, dict)) and _is_literal(v) and isinstance(idx, Col):
            # Split("a|b", "|")[attributes["i"]]: a per-row lookup into
            # a folded collection — the value_map editor
            mapping = dict(enumerate(v)) if isinstance(v, list) else dict(v)
            return {"__converter__": "value_map",
                    "args": {"mapping": mapping, "src": idx.name,
                             "default_keep": False}}
        if isinstance(v, dict) and "__converter__" in v and isinstance(idx, int):
            tmp = self._as_col(v)
            return {"__converter__": "list_index",
                    "args": {"src": tmp.name, "index": idx}}
        raise OTTLParseError(
            f"unsupported index shape {idx!r} in {self.text!r}")

    def _parse_operand(self) -> Any:
        """A value with optional binary + - * arithmetic. Literal
        operands fold (incl. datetime-datetime -> seconds); non-literal
        operands become an {'__arith__'} node for the few consumers
        that accept one (value expressions, delete_index forms)."""
        import datetime as _dt

        left = self.parse_value()
        while self.peek()[1] in ("+", "-", "*"):
            _, op = self.next()
            right = self.parse_value()
            if _is_literal(left) and _is_literal(right):
                if isinstance(left, _dt.datetime) and isinstance(right, _dt.datetime):
                    if op != "-":
                        raise OTTLParseError(f"bad time arithmetic: {self.text!r}")
                    left = (left - right).total_seconds()
                else:
                    left = {"+": lambda a, b: a + b,
                            "-": lambda a, b: a - b,
                            "*": lambda a, b: a * b}[op](left, right)
            else:
                left = {"__arith__": (op, left, right)}
        return left

    def parse_map(self) -> dict:
        """{"k": value, ...} literal (Reduce sources in the e2e corpus)."""
        self.expect("{")
        out = {}
        while self.peek()[1] != "}":
            k, key = self.next()
            if k != "string":
                raise OTTLParseError(f"map keys must be strings: {self.text!r}")
            self.expect(":")
            out[key[1:-1]] = self.parse_value()
            if self.peek()[1] == ",":
                self.next()
        self.expect("}")
        return out

    def parse_lambda(self) -> dict:
        """(acc, k, v) => body — the OTTL lambda shape. Body grammar:
        a condition (comparisons / Is* predicates, for Filter/All/Any/
        Find/When), or value | value (+|*) value (for Reduce/MapEach/
        Eval), where each value is a name, literal, or converter call."""
        self.expect("(")
        params = []
        while self.peek()[1] != ")":
            _, nm = self.next()
            params.append(nm)
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        self.expect("=>")
        save, save_pre, save_tmp = self.pos, len(self._pre), self._tmp_n
        self._lambda_depth += 1
        try:
            cond = self.parse_condition()
            if self.peek()[1] in (")", ","):
                self._lambda_depth -= 1
                return {"__lambda__": params, "body": ("cond", cond)}
        except OTTLParseError:
            pass
        self.pos, self._tmp_n = save, save_tmp
        del self._pre[save_pre:]
        try:
            left = self.parse_value()
            if self.peek()[1] in ("+", "*"):
                _, arith = self.next()
                right = self.parse_value()
                return {"__lambda__": params,
                        "body": ("arith", arith, left, right)}
            return {"__lambda__": params, "body": ("value", left)}
        finally:
            self._lambda_depth -= 1

    def parse_list(self) -> list:
        self.expect("[")
        items = []
        while self.peek()[1] != "]":
            items.append(self.parse_value())
            if self.peek()[1] == ",":
                self.next()
        self.expect("]")
        return items

    def parse_path(self) -> Col:
        """attributes["k"] | resource.attributes["k"] | cache["k"] |
        body | bare_name — all to a column reference."""
        kind, tok = self.next()
        segments = [tok]
        while self.peek()[1] == ".":
            self.next()
            _, nxt = self.next()
            segments.append(nxt)
        # resource.attributes / span.attributes etc: the context prefix
        # vanishes in the columnar model; a plain dotted name
        # (http.method) IS the column name
        contexts = {"resource", "instrumentation_scope", "span", "spanevent",
                    "log", "metric", "datapoint", "scope"}
        if segments[0] in contexts:
            base = segments[-1]
        else:
            base = ".".join(segments)
        if self.peek()[1] == "[":
            # chained string keys become a dotted reference: reads
            # resolve through struct columns (expr.resolve_col — exact
            # column name first, then struct-field steps), writes
            # create the flat dotted column, which later reads find by
            # the exact-name priority. Non-string indices (list
            # positions, dynamic keys) stay unsupported — fail loud.
            keys = []
            while self.peek()[1] == "[":
                self.next()
                k, key = self.next()
                if k == "number" and "." not in key and keys:
                    # a trailing integer index READS one list element
                    # (attributes["slices"][2]); deeper chains and
                    # write targets stay unsupported — fail loud
                    self.expect("]")
                    if self.peek()[1] == "[":
                        raise OTTLParseError(
                            f"indexing past a list element is unsupported: {self.text!r}")
                    return {"__converter__": "list_index",
                            "args": {"src": ".".join(keys), "index": int(key)}}
                if k != "string":
                    raise OTTLParseError(
                        f"only string keys are supported in paths, got {key!r} in {self.text!r}")
                self.expect("]")
                keys.append(_unescape(key[1:-1]))
            return Col(".".join(keys))
        return Col(base)

    # ------------------------------------------------------- converters

    _CONVERTER_EDITORS = {
        "Upper": ("upper", "src"), "Lower": ("lower", "src"),
        "Trim": ("trim", "src"), "Len": ("len", "src"),
        "SHA1": ("sha1", "src"), "SHA256": ("sha256", "src"),
        "SHA512": ("sha512", "src"), "MD5": ("md5_hex", "src"),
        "FNV": ("fnv64a", "src"), "Murmur3Hash": ("murmur3", "src"),
        "Murmur3Hash128": ("murmur3_128", "src"),
        "XXH3": ("xxh3", "src"), "XXH128": ("xxh128", "src"),
        "Base64Encode": ("base64_encode", "src"),
        "Hex": ("hex_encode", "src"),
        "ParseXML": ("parse_xml", "src"),
        "ParseSimplifiedXML": ("parse_simplified_xml", "src"),
        "Keys": ("keys", "src"), "Values": ("values", "src"),
        "Duration": ("duration", "src"), "Log": ("log", "src"),
        "IsValidLuhn": ("is_valid_luhn", "src"),
        "ToKeyValueString": ("to_key_value_string", "src"),
    }

    _TIME_CONVERTERS = {"Year", "Month", "Day", "Hour", "Minute",
                        "Second", "Millisecond", "Microsecond",
                        "Nanosecond", "Weekday"}
    _CASE_CONVERTERS = {"ToUpperCase": "upper", "ToLowerCase": "lower",
                        "ToSnakeCase": "snake", "ToCamelCase": "camel"}
    _DUR_UNIT_CONVERTERS = {"Hours": "hours", "Minutes": "minutes",
                            "Seconds": "seconds",
                            "Milliseconds": "milliseconds",
                            "Microseconds": "microseconds",
                            "Nanoseconds": "nanoseconds"}
    _UNIX_CONVERTERS = {"UnixSeconds": "seconds", "UnixMilli": "milliseconds",
                        "UnixMicro": "microseconds", "UnixNano": "nanoseconds"}
    _PREFIX_CONVERTERS = {"TrimPrefix": ("trim_prefix", "prefix"),
                          "TrimSuffix": ("trim_suffix", "suffix"),
                          "HasPrefix": ("has_prefix", "prefix"),
                          "HasSuffix": ("has_suffix", "suffix")}

    @staticmethod
    def _fold1(editor: str, args: dict, lit: Any, src_key: str = "src"):
        """Evaluate a converter over a LITERAL argument at compile time
        (the reference evaluates literal getters per row; in a columnar
        engine that is a constant, so fold it once) by running the
        editor on a one-row table."""
        import pyarrow as _pa

        from .stages.transform import Statement as _St

        tbl = _pa.table({"__lit__": [lit]})
        out = _St(editor, {**args, src_key: "__lit__",
                           "target": "__out__"})(tbl)
        return out["__out__"][0].as_py()

    # converters whose result type is statically known (for folding
    # Is*-predicates over converter calls, e.g. IsString(UUID()))
    _RESULT_TYPES = {"uuid": "string", "uuid7": "string", "sha256": "string",
                     "sha1": "string", "sha512": "string", "md5_hex": "string",
                     "concat": "string", "format": "string"}

    def parse_converter(self) -> dict:
        """Returns {'__converter__': editor_name, 'args': {...}} for
        the compile step to attach a target."""
        _, name = self.next()
        if name == "When":
            return self._parse_when()
        self.expect("(")
        args: list[Any] = []
        while self.peek()[1] != ")":
            args.append(self._parse_operand())
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        if name == "Concat" and len(args) == 2 and _is_literal(args[0]) \
                and isinstance(args[0], list) and isinstance(args[1], str):
            # all-literal Concat folds (the corpus nests it as a
            # pattern/glob argument everywhere)
            return args[1].join(_go_scalar_str(p) for p in args[0])
        if name == "Now":
            # the reference evaluates Now() per row; the only corpus
            # shapes are Now()-Now() comparisons, where a compile-time
            # fold is observably equivalent
            from datetime import datetime, timezone

            return datetime.now(timezone.utc)
        if name == "Bool":
            if len(args) == 1 and _is_literal(args[0]):
                v = args[0]
                if isinstance(v, bool):
                    return v
                if isinstance(v, (int, float)):
                    return v != 0
                if v in ("1", "t", "T", "TRUE", "true", "True"):
                    return True
                if v in ("0", "f", "F", "FALSE", "false", "False"):
                    return False
                raise OTTLParseError(f"Bool({v!r}) unparseable: {self.text!r}")
            return {"__converter__": "to_bool",
                    "args": {"src": self._as_col(args[0]).name}}
        if name in ("SpanID", "TraceID", "ProfileID"):
            width = {"SpanID": 8, "TraceID": 16, "ProfileID": 16}[name]
            if len(args) != 1:
                raise OTTLParseError(f"{name}(id) expected: {self.text!r}")
            v = args[0]
            if isinstance(v, _IDBytes):
                raw = v.rjust(width, b"\0")
            elif isinstance(v, str):
                raw = bytes.fromhex(v)
            else:
                raise OTTLParseError(f"{name} takes hex: {self.text!r}")
            if len(raw) != width:
                raise OTTLParseError(
                    f"{name} must be {width} bytes: {self.text!r}")
            # pdata IDs live as hex-string columns in the flat model;
            # ProfileID keeps bytes for the String() byte-list render
            return _IDBytes(raw) if name == "ProfileID" else raw.hex()
        if name in ("IsString", "IsDouble", "IsBool", "IsInt",
                    "IsMap", "IsList"):
            # value-position type predicates (func_is_*.go return bool
            # VALUES): in the typed columnar model the column type
            # decides, per-row null -> false (a nil pdata value is not
            # of any type)
            if len(args) != 1:
                raise OTTLParseError(f"{name}(value) expected: {self.text!r}")
            v = args[0]
            if _is_literal(v):
                want = {"IsString": str, "IsDouble": float, "IsBool": bool,
                        "IsInt": int, "IsMap": dict, "IsList": list}[name]
                if want is int:
                    return isinstance(v, int) and not isinstance(v, bool)
                if want is float:
                    return isinstance(v, float)
                return isinstance(v, want)
            if isinstance(v, dict) and "__converter__" in v:
                rt = self._RESULT_TYPES.get(v["__converter__"])
                if rt is not None:
                    return {"IsString": rt == "string"}.get(name, False)                         if name == "IsString" else False
                v = self._as_col(v)
            if isinstance(v, Col):
                return {"__converter__": "is_type",
                        "args": {"src": v.name,
                                 "want": {"IsString": "string",
                                          "IsDouble": "double",
                                          "IsBool": "bool", "IsInt": "int",
                                          "IsMap": "map",
                                          "IsList": "list"}[name]}}
            raise OTTLParseError(f"{name}(value) expected: {self.text!r}")
        if name == "IsEmpty":
            if len(args) != 1:
                raise OTTLParseError(f"IsEmpty(x) expected: {self.text!r}")
            if _is_literal(args[0]):
                return isinstance(args[0], (str, list, dict)) and len(args[0]) == 0
            v = self._as_col(args[0])
            return {"__converter__": "is_empty", "args": {"src": v.name}}
        if name in ("IsMap", "IsList", "IsString", "IsBool", "IsDouble", "IsInt") \
                and len(args) == 1 and _is_literal(args[0]):
            want = {"IsMap": dict, "IsList": list, "IsString": str,
                    "IsBool": bool, "IsDouble": float, "IsInt": int}[name]
            if want in (int, bool):  # bool is an int subclass — exact
                return type(args[0]) is want
            return isinstance(args[0], want)
        if name == "ContainsValue" and len(args) == 2 and _is_literal(args[0]) \
                and isinstance(args[0], list) and _is_literal(args[1]):
            return args[1] in args[0]
        if name == "Len" and len(args) == 1 and isinstance(args[0], Col) \
                and args[0].name == "attributes":
            # Len(attributes) = width of the attribute set (a value-
            # expression shape; tables have a fixed column count)
            return {"__table_width__": True}
        if name == "Hex" and len(args) == 1 and isinstance(args[0], dict) \
                and ("__arith__" in args[0] or "__table_width__" in args[0]):
            return {"__hex_lazy__": args[0]}
        if name == "ParseSeverity":
            if len(args) != 2 or not isinstance(args[0], Col) \
                    or not _is_literal(args[1]) or not isinstance(args[1], dict):
                raise OTTLParseError(
                    f"ParseSeverity(path, criteria-map) expected: {self.text!r}")
            return {"__converter__": "parse_severity_custom",
                    "args": {"src": args[0].name, "mapping": args[1]}}
        if name == "ExtractGrokPatterns" and args and isinstance(args[0], str):
            from .functions.grok import compile_grok, demangle_grok_field

            pattern = args[1] if len(args) > 1 else ""
            if not isinstance(pattern, str):
                raise OTTLParseError(
                    f"ExtractGrokPatterns pattern must fold: {self.text!r}")
            regex, types = compile_grok(pattern)
            m = re.search(regex, args[0])
            if m is None:
                return {}
            out = {}
            for k, v in m.groupdict().items():
                if v is None:
                    continue
                t = types.get(k)
                if t == "int64":
                    v = int(v)
                elif t == "float64":
                    v = float(v)
                out[demangle_grok_field(k)] = v
            return out
        if name == "Eval":
            if len(args) != 2 or not isinstance(args[0], dict) \
                    or "__lambda__" not in args[0] or not isinstance(args[1], list):
                raise OTTLParseError(f"Eval(lambda, [args]) expected: {self.text!r}")
            return self._fold_eval(args[0], args[1])
        if name in ("Filter", "All", "Any", "Find", "MapEach", "MapKeys"):
            return self._compile_collection_lambda(name, args)
        if name == "Base64Encode" and len(args) == 2:
            # 2-arg variant: encoding name (base64-url etc) per
            # func_base64encode.go — must run before the generic
            # single-arg converter table
            if not isinstance(args[0], str) or not isinstance(args[1], str):
                raise OTTLParseError(
                    f"Base64Encode(str, encoding) literals expected: {self.text!r}")
            import base64 as _b64

            raw = args[0].encode()
            if args[1] in ("base64-url", "base64url"):
                return _b64.urlsafe_b64encode(raw).decode()
            if args[1] in ("base64", "base64-std"):
                return _b64.b64encode(raw).decode()
            raise OTTLParseError(f"unknown base64 variant {args[1]!r}: {self.text!r}")
        if name == "Hex" and len(args) == 1 and \
                isinstance(args[0], (bool, int, float)) and not isinstance(args[0], str):
            # func_hex.go: big-endian bytes of the value (bool -> one
            # byte, int -> 8 bytes, double -> IEEE-754 8 bytes)
            import struct as _struct

            v = args[0]
            if isinstance(v, bool):
                return "01" if v else "00"
            if isinstance(v, float):
                return _struct.pack(">d", v).hex()
            return _struct.pack(">q", v).hex()
        if name == "ToKeyValueString" and args and isinstance(args[0], dict) \
                and "__converter__" not in args[0] and "__lambda__" not in args[0]:
            # folded-map input: render directly (func_to_key_value_string.go;
            # sortOutput=true in the corpus -> key order); values with the
            # delimiters get quoted like the reference
            delim = args[1] if len(args) > 1 else "="
            pair_delim = args[2] if len(args) > 2 else " "
            sort_out = args[3] if len(args) > 3 else False
            items = sorted(args[0].items()) if sort_out else list(args[0].items())

            def _rend(v):
                # reference token rule (func_to_key_value_string.go):
                # escape quotes, wrap when a delimiter is embedded
                v = _go_scalar_str(v).replace('"', '\\"')
                return f'"{v}"' if (delim in v or pair_delim in v) else v

            return pair_delim.join(f"{_rend(k)}{delim}{_rend(v)}"
                                   for k, v in items)
        if name == "IsValidLuhn" and len(args) == 1 \
                and isinstance(args[0], int) and not isinstance(args[0], bool):
            return self._fold1("is_valid_luhn", {}, str(args[0]))
        if name == "URL":
            if len(args) != 1:
                raise OTTLParseError(f"URL(uri) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("url_semconv", {}, args[0])
            return {"__converter__": "url_semconv",
                    "args": {"src": self._as_col(args[0]).name}}
        if name == "Unix":
            # Unix(seconds[, nanoseconds]) -> timestamp
            if not args or len(args) > 2:
                raise OTTLParseError(f"Unix(sec[, nsec]) expected: {self.text!r}")
            nanos = args[1] if len(args) > 1 else 0
            if isinstance(args[0], int) and isinstance(nanos, int):
                from datetime import datetime, timezone

                return datetime.fromtimestamp(args[0], tz=timezone.utc) \
                    .replace(tzinfo=None) + __import__("datetime").timedelta(
                        microseconds=nanos / 1000)
            return {"__converter__": "from_unix",
                    "args": {"src": self._as_col(args[0]).name,
                             "nanos": nanos}}
        if name in ("Keys", "Values") and len(args) == 1 \
                and _is_literal(args[0]) and isinstance(args[0], dict):
            # fold in python (the editor path would stringify mixed-
            # type values; Go keeps the original types)
            return (list(args[0].keys()) if name == "Keys"
                    else list(args[0].values()))
        if name in self._CONVERTER_EDITORS:
            editor, src_key = self._CONVERTER_EDITORS[name]
            if len(args) != 1:
                raise OTTLParseError(f"{name}() takes one argument: {self.text!r}")
            if isinstance(args[0], dict) and "__converter__" in args[0]:
                args = [self._as_col(args[0])]  # nested call
            if isinstance(args[0], Col):
                return {"__converter__": editor, "args": {src_key: args[0].name}}
            if isinstance(args[0], (str, int, float, bool, list)) or (
                    isinstance(args[0], dict) and "__converter__" not in args[0]
                    and "__lambda__" not in args[0]):
                return self._fold1(editor, {}, args[0], src_key)
            raise OTTLParseError(f"{name}() takes a path or literal: {self.text!r}")
        if name in ("UUID", "UUIDv7"):
            if args:
                raise OTTLParseError(f"{name}() takes no arguments: {self.text!r}")
            # the zero-arg UUIDv7 exists only inside Is*-typechecks in
            # the corpus (folded by _RESULT_TYPES); the engine's uuid7
            # editor takes a timestamp source instead
            return {"__converter__": "uuid" if name == "UUID" else "uuid7",
                    "args": {}}
        if name == "Concat":
            # parts may include converter calls — the editor evaluates
            # them per batch (lambda bodies need the RAW dicts here for
            # shape detection, so no scratch-column rewrite)
            if len(args) != 2 or not isinstance(args[0], list) \
                    or not isinstance(args[1], (str, Col)):
                raise OTTLParseError(f"Concat([parts], sep) expected: {self.text!r}")
            parts = [self._as_col(p)
                     if isinstance(p, dict) and "__converter__" in p
                     and not self._lambda_depth else p
                     for p in args[0]]
            return {"__converter__": "concat", "args": {"parts": parts, "sep": args[1]}}
        if name == "Substring":
            if len(args) not in (3, 4):
                raise OTTLParseError(f"Substring(path, start, len[, utf8Safe]) expected: {self.text!r}")
            extra = {"utf8_safe": bool(args[3])} if len(args) == 4 else {}
            if isinstance(args[0], dict) and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if isinstance(args[0], str):
                return self._fold1("substring",
                                   {"start": args[1], "length": args[2], **extra},
                                   args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"Substring(path, start, len) expected: {self.text!r}")
            return {"__converter__": "substring",
                    "args": {"src": args[0].name, "start": args[1],
                             "length": args[2], **extra}}
        if name == "Sort":
            order = args[1] if len(args) > 1 else "asc"
            if isinstance(args[0], list):  # literal list: fold with
                # func_sort.go's common-type rule: all-numeric sorts
                # numerically; any string/bool sorts by AsString
                vals = args[0]
                numeric = all(isinstance(v, (int, float))
                              and not isinstance(v, bool) for v in vals)
                key = (None if numeric else _go_scalar_str)
                return sorted(vals, key=key, reverse=(order == "desc"))
            src = self._as_col(args[0])  # path or nested converter
            return {"__converter__": "list_sort", "args": {"src": src.name, "order": order}}
        if name in ("Int", "Double", "String"):
            if len(args) == 1 and isinstance(args[0], _IDBytes):
                # String(ProfileID(0x..)) renders pdata's byte-list form
                if name != "String":
                    raise OTTLParseError(f"{name} over an ID: {self.text!r}")
                return "[" + ",".join(str(b) for b in args[0]) + "]"
            if len(args) == 1 and _is_literal(args[0]) \
                    and isinstance(args[0], (list, dict)):
                if name != "String":
                    raise OTTLParseError(f"{name} over a collection: {self.text!r}")
                return _go_scalar_str(args[0])  # String([1,2,3]) -> "[1,2,3]"
            if len(args) == 1 and not isinstance(args[0], (Col, dict, list)):
                v = args[0]  # literal: fold like the reference's getters
                if name == "Int":
                    return int(v)
                if name == "Double":
                    return float(v)
                return ("true" if v else "false") if isinstance(v, bool) else str(v)
            if name == "String":
                # the pdata AsString rendering handles nested columns
                src = self._as_col(args[0])
                return {"__converter__": "stringify", "args": {"src": src.name}}
            to = {"Int": "int64", "Double": "float64"}[name]
            src = self._as_col(args[0])
            return {"__converter__": "cast", "args": {"src": src.name, "to": to}}
        if name in self._TIME_CONVERTERS:
            import datetime as _dtmod

            if len(args) == 1 and isinstance(args[0], _dtmod.datetime):
                # Hour(Time("12", "%H")) — folded Time literal
                d = args[0]
                if name == "Weekday":  # Go: Sunday=0
                    return (d.weekday() + 1) % 7
                part = name.lower()
                if part in ("year", "month", "day", "hour", "minute", "second"):
                    return getattr(d, part)
                return {"millisecond": d.microsecond // 1000,
                        "microsecond": d.microsecond,
                        "nanosecond": d.microsecond * 1000}[part]
            if len(args) == 1 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "time_extract",
                    "args": {"src": args[0].name, "part": name.lower()}}
        if name in self._DUR_UNIT_CONVERTERS:
            # Hours(Duration-string path): parse + convert in one step
            unit = self._DUR_UNIT_CONVERTERS[name]
            if len(args) == 1 and isinstance(args[0], str):
                return self._fold1("duration", {"unit": unit}, args[0])
            if len(args) == 1 and isinstance(args[0], (int, float)):
                # an already-folded Duration(...) literal, in seconds
                from .stages.transform import Statement as _St

                return float(args[0]) * _St._DUR_UNIT[unit]
            if len(args) == 1 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "duration",
                    "args": {"src": args[0].name, "unit": unit}}
        if name in self._UNIX_CONVERTERS:
            if len(args) == 1 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "unix",
                    "args": {"src": args[0].name,
                             "unit": self._UNIX_CONVERTERS[name]}}
        if name in self._PREFIX_CONVERTERS:
            editor, key = self._PREFIX_CONVERTERS[name]
            if len(args) == 2 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 2 or not isinstance(args[0], Col) \
                    or not isinstance(args[1], (str, Col)):
                raise OTTLParseError(f"{name}(path, string) expected: {self.text!r}")
            return {"__converter__": editor,
                    "args": {"src": args[0].name, key: args[1]}}
        if name in self._CASE_CONVERTERS:
            if len(args) != 1:
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            if isinstance(args[0], dict) and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if isinstance(args[0], str):
                return self._fold1("convert_case",
                                   {"case": self._CASE_CONVERTERS[name]}, args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "convert_case",
                    "args": {"src": args[0].name,
                             "case": self._CASE_CONVERTERS[name]}}
        if name == "GetXML":
            if len(args) != 2:
                raise OTTLParseError(f"GetXML(path, xpath) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("get_xml", {"xpath": args[1]}, args[0])
            return {"__converter__": "get_xml",
                    "args": {"src": args[0].name, "xpath": args[1]}}
        if name == "RemoveXML":
            if len(args) != 2:
                raise OTTLParseError(f"RemoveXML(path, xpath) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("remove_xml", {"xpath": args[1]}, args[0])
            return {"__converter__": "remove_xml",
                    "args": {"src": args[0].name, "xpath": args[1]}}
        if name == "InsertXML":
            if len(args) != 3:
                raise OTTLParseError(f"InsertXML(path, xpath, sub) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("insert_xml", {"xpath": args[1],
                                                  "sub_document": args[2]}, args[0])
            return {"__converter__": "insert_xml",
                    "args": {"src": args[0].name, "xpath": args[1],
                             "sub_document": args[2]}}
        if name == "ExtractPatterns":
            # literal source folds to a struct-like dict of named groups
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(
                    f"ExtractPatterns(x, pattern) expected: {self.text!r}")
            if isinstance(args[0], str):
                m = re.search(args[1], args[0])
                return {k: v for k, v in (m.groupdict() if m else {}).items()}
            raise OTTLParseError(
                f"ExtractPatterns over paths: use the extract_patterns editor: {self.text!r}")
        if name == "Index":
            # func_index.go: substring position over string literals,
            # element position over a list path (-1 when absent); the
            # needle may itself be a path/converter (per-row value)
            if len(args) == 2 and isinstance(args[0], str) and isinstance(args[1], str):
                return args[0].find(args[1])
            if len(args) == 2 and isinstance(args[0], Col):
                needle = args[1]
                if isinstance(needle, dict) and "__converter__" in needle:
                    needle = self._as_col(needle)
                return {"__converter__": "list_position",
                        "args": {"src": args[0].name, "value": needle}}
            raise OTTLParseError(f"Index(list_or_str, value) expected: {self.text!r}")
        if name == "Coalesce":
            # func_coalesce.go: first non-nil of a list of getters
            if len(args) != 1 or not isinstance(args[0], list):
                raise OTTLParseError(f"Coalesce([values]) expected: {self.text!r}")
            return {"__converter__": "coalesce",
                    "args": {"sources": args[0]}}
        if name == "ParseInt":
            # func_parse_int.go (strconv.ParseInt): literal fold;
            # base 0 auto-detects 0x/0o/0b prefixes like Go
            if len(args) == 2 and isinstance(args[0], str) and isinstance(args[1], int):
                return int(args[0], args[1])
            raise OTTLParseError(f"ParseInt(str, base) literals expected: {self.text!r}")
        if name == "FormatTime":
            if len(args) != 2 or not isinstance(args[0], Col) or not isinstance(args[1], str):
                raise OTTLParseError(f"FormatTime(path, fmt) expected: {self.text!r}")
            return {"__converter__": "format_time",
                    "args": {"src": args[0].name, "format": args[1]}}
        if name == "TruncateTime":
            # second arg is a (folded) Duration in seconds; map the
            # reference's common granularities to floor_temporal units
            if len(args) != 2 or not isinstance(args[0], Col) \
                    or not isinstance(args[1], (int, float)):
                raise OTTLParseError(
                    f"TruncateTime(path, Duration(...)) expected: {self.text!r}")
            units = {1.0: "second", 60.0: "minute", 3600.0: "hour",
                     86400.0: "day", 1e-3: "millisecond", 1e-6: "microsecond"}
            unit = units.get(float(args[1]))
            if unit is not None:  # common granularities: temporal kernel
                return {"__converter__": "truncate_time",
                        "args": {"src": args[0].name, "unit": unit}}
            # arbitrary durations (time.Time.Truncate allows any):
            # epoch-nanos floor
            return {"__converter__": "truncate_time",
                    "args": {"src": args[0].name,
                             "nanos": int(round(float(args[1]) * 1e9))}}
        if name == "ConvertCase":
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(f"ConvertCase(path, case) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("convert_case", {"case": args[1]}, args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"ConvertCase(path, case) expected: {self.text!r}")
            return {"__converter__": "convert_case",
                    "args": {"src": args[0].name, "case": args[1]}}
        if name == "Split":
            if len(args) != 2 or not isinstance(args[1], (str, Col)):
                raise OTTLParseError(f"Split(path, sep) expected: {self.text!r}")
            if isinstance(args[0], str) and isinstance(args[1], str):
                return self._fold1("split", {"sep": args[1]}, args[0])
            if isinstance(args[0], dict) and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"Split(path, sep) expected: {self.text!r}")
            return {"__converter__": "split",
                    "args": {"src": args[0].name, "sep": args[1]}}
        if name == "IsMatch":
            # value-position IsMatch (func_is_match.go returns a bool
            # VALUE; the where-clause fast path lives in
            # _parse_comparison)
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(
                    f"IsMatch(value, pattern) expected: {self.text!r}")
            if isinstance(args[0], str):
                import re as _re

                return bool(_re.search(args[1], args[0]))
            if isinstance(args[0], dict) and "__converter__" in args[0] \
                    and not self._lambda_depth:
                args[0] = self._as_col(args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(
                    f"IsMatch target must be a path or string: {self.text!r}")
            return {"__converter__": "is_match",
                    "args": {"src": args[0].name, "pattern": args[1]}}
        if name == "IsRootSpan":
            # func_is_root_span.go: span.ParentSpanID().IsEmpty() —
            # in the flat span model the parent id is a hex-string
            # column, so "empty" = null / "" / all-zero hex.
            if args:
                raise OTTLParseError(
                    f"IsRootSpan takes no arguments: {self.text!r}")
            return {"__converter__": "is_root_span",
                    "args": {"src": "parent_span_id"}}
        if name == "IsInCIDR":
            if len(args) == 2 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"IsInCIDR(path, cidr) expected: {self.text!r}")
            return {"__converter__": "is_in_cidr",
                    "args": {"src": args[0].name, "cidr": args[1]}}
        if name == "ContainsValue":
            if len(args) == 2 and isinstance(args[0], dict) \
                    and "__converter__" in args[0] and not self._lambda_depth:
                args[0] = self._as_col(args[0])  # nested call
            if len(args) != 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"ContainsValue(path, value) expected: {self.text!r}")
            return {"__converter__": "contains_value",
                    "args": {"src": args[0].name, "value": args[1]}}
        if name == "ParseKeyValue":
            # func_parse_key_value.go over a literal: fold to a map.
            # Values may be quoted (pair/kv delimiters inside quotes
            # are literal), like the reference's parseutils splitter.
            if not args or not isinstance(args[0], str):
                raise OTTLParseError(
                    f"ParseKeyValue(str[, delim[, pair_delim]]) expected: {self.text!r}")
            delim = args[1] if len(args) > 1 else "="
            pair_delim = args[2] if len(args) > 2 else " "
            return _parse_key_value_literal(args[0], delim, pair_delim)
        if name == "ParseJSON":
            if len(args) != 1 or not isinstance(args[0], str):
                raise OTTLParseError(f"ParseJSON(str literal) expected: {self.text!r}")
            import json as _json

            return _json.loads(args[0])
        if name == "ParseCSV":
            # ParseCSV(row, header, delim=",", headerDelimiter=",", mode)
            if len(args) < 2 or not all(isinstance(a, str) for a in args[:2]):
                raise OTTLParseError(f"ParseCSV(row, header, ...) expected: {self.text!r}")
            pos = [a for a in args[2:] if not isinstance(a, dict) or "__kwarg__" not in a]
            kw = {a["__kwarg__"]: a["value"] for a in args[2:]
                  if isinstance(a, dict) and "__kwarg__" in a}
            delim = pos[0] if len(pos) > 0 else kw.get("delimiter", ",")
            hdelim = pos[1] if len(pos) > 1 else kw.get("headerDelimiter", delim)
            import csv as _csv
            import io as _io

            vals = next(_csv.reader(_io.StringIO(args[0]), delimiter=delim))
            headers = args[1].split(hdelim)
            if len(vals) != len(headers):
                raise OTTLParseError(
                    f"ParseCSV: {len(vals)} fields != {len(headers)} headers: {self.text!r}")
            return dict(zip(headers, vals))
        if name == "Time":
            # func_time.go (ctimefmt): literal fold via strptime — the
            # reference's %-directives match python's for the common set
            if len(args) != 2 or not all(isinstance(a, str) for a in args):
                raise OTTLParseError(f"Time(str, fmt) literals expected: {self.text!r}")
            from datetime import datetime as _dt

            return _dt.strptime(args[0], args[1])
        if name == "UserAgent":
            # func_useragent.go over a literal: fold by running the
            # useragent editor on a one-row table and collecting the
            # prefix columns into the semconv attribute map
            if len(args) == 1 and isinstance(args[0], str):
                import pyarrow as _pa

                from .stages.transform import Statement as _St

                tbl = _pa.table({"__lit__": [args[0]]})
                out = _St("useragent", {"src": "__lit__",
                                        "prefix": "user_agent."})(tbl)
                return {"user_agent.original": args[0],
                        "user_agent.name": out["user_agent.name"][0].as_py(),
                        "user_agent.version": out["user_agent.version"][0].as_py(),
                        "os.name": out["user_agent.os"][0].as_py()}
            if len(args) == 1 and isinstance(args[0], Col):
                return {"__converter__": "useragent",
                        "args": {"src": args[0].name}}
            raise OTTLParseError(f"UserAgent(x) expected: {self.text!r}")
        if name == "Base64Decode":
            # func_base64decode.go returns a STRING (deprecated alias
            # of Decode(x, "base64")); the binary-returning
            # base64_decode editor stays engine-internal
            if len(args) != 1:
                raise OTTLParseError(f"Base64Decode(x) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("decode", {"encoding": "base64"}, args[0])
            return {"__converter__": "decode",
                    "args": {"src": args[0].name, "encoding": "base64"}}
        if name == "Decode":
            if len(args) != 2 or not isinstance(args[1], (str, Col)):
                raise OTTLParseError(f"Decode(path, encoding) expected: {self.text!r}")
            if isinstance(args[0], str) and isinstance(args[1], str):
                return self._fold1("decode", {"encoding": args[1]}, args[0])
            src = self._as_col_any(args[0])
            return {"__converter__": "decode",
                    "args": {"src": src.name, "encoding": args[1]}}
        if name == "CommunityID":
            if len(args) >= 4 and all(_is_literal(a) for a in args):
                # all-literal call (the corpus's golden vectors): run
                # the editor over a one-row table and fold
                import pyarrow as _pa

                from .stages.transform import Statement as _St

                tbl = _pa.table({"__sip__": [args[0]], "__sp__": [args[1]],
                                 "__dip__": [args[2]], "__dp__": [args[3]]})
                a = {"src_ip": "__sip__", "src_port": "__sp__",
                     "dst_ip": "__dip__", "dst_port": "__dp__",
                     "target": "__out__"}
                if len(args) > 4:
                    a["proto"] = args[4]
                if len(args) > 5:
                    a["seed"] = args[5]
                return _St("community_id", a)(tbl)["__out__"][0].as_py()
            if len(args) < 4 or not all(isinstance(a, Col) for a in args[:4]):
                raise OTTLParseError(
                    f"CommunityID(sip, sport, dip, dport[, proto, seed]) expected: {self.text!r}")
            a = {"src_ip": args[0].name, "src_port": args[1].name,
                 "dst_ip": args[2].name, "dst_port": args[3].name}
            if len(args) > 4:
                a["proto"] = args[4]
            if len(args) > 5:
                a["seed"] = args[5]
            return {"__converter__": "community_id", "args": a}
        if name == "Format":
            if len(args) != 2 or not isinstance(args[0], str) or not isinstance(args[1], list):
                raise OTTLParseError(f"Format(fmt, [args]) expected: {self.text!r}")
            return {"__converter__": "format",
                    "args": {"fmt": args[0], "args": args[1]}}
        if name == "ConvertAttributesToElementsXML":
            xpath = args[1] if len(args) > 1 else None
            if isinstance(args[0], str):  # literal doc: fold at compile
                from .stages.transform import attrs_to_elements_xml

                return attrs_to_elements_xml(args[0], xpath)
            return {"__converter__": "convert_attrs_xml",
                    "args": {"src": args[0].name, "xpath": xpath}}
        if name == "ConvertTextToElementsXML":
            xpath = args[1] if len(args) > 1 else None
            elem = args[2] if len(args) > 2 else "value"
            if isinstance(args[0], str):
                from .stages.transform import text_to_elements_xml

                return text_to_elements_xml(args[0], xpath, elem)
            return {"__converter__": "convert_text_xml",
                    "args": {"src": args[0].name, "xpath": xpath,
                             "element_name": elem}}
        if name == "SliceToMap":
            # func_slice_to_map.go: list -> map, keyed by a field path
            # ([keys]), by the element index (no keys), with optional
            # [value] extraction; literal lists fold to index-keyed maps
            if len(args) >= 1 and _is_literal(args[0]) and isinstance(args[0], list):
                return {str(i): v for i, v in enumerate(args[0])}
            if not args or not isinstance(args[0], Col):
                raise OTTLParseError(
                    f"SliceToMap(path[, [key]][, [value]]) expected: {self.text!r}")
            a: dict[str, Any] = {"src": args[0].name}
            for slot, field in (("key_field", 1), ("value_field", 2)):
                if len(args) > field:
                    fv = args[field]
                    if not (isinstance(fv, list) and len(fv) == 1
                            and isinstance(fv[0], str)):
                        raise OTTLParseError(
                            f"SliceToMap {slot} must be a one-string list: {self.text!r}")
                    a[slot] = fv[0]
            return {"__converter__": "slice_to_map", "args": a}
        if name == "Reduce":
            if len(args) != 3 or not isinstance(args[2], dict) \
                    or "__lambda__" not in args[2]:
                raise OTTLParseError(
                    f"Reduce(source, seed, (acc, k, v) => ...) expected: {self.text!r}")
            return self._compile_reduce(args[0], args[1], args[2])
        raise OTTLParseError(f"unsupported converter {name}() in {self.text!r}")

    # --------------------------------------------- When / Eval / lambdas

    def _parse_when(self) -> dict:
        """When(() => condition, then, otherwise) — func_when.go; the
        condition compiles through the predicate DSL, the branches are
        literals, paths, or nested converters (scratch columns)."""
        self.expect("(")
        lam = self.parse_lambda()
        if lam["__lambda__"] or lam["body"][0] != "cond":
            raise OTTLParseError(
                f"When first arg must be a () => condition lambda: {self.text!r}")
        self.expect(",")
        then = self.parse_value()
        self.expect(",")
        otherwise = self.parse_value()
        self.expect(")")
        if isinstance(then, dict) and "__converter__" in then:
            then = self._as_col(then)
        if isinstance(otherwise, dict) and "__converter__" in otherwise:
            otherwise = self._as_col(otherwise)
        return {"__converter__": "when",
                "args": {"condition": lam["body"][1],
                         "then": then, "otherwise": otherwise}}

    def _fold_eval(self, lam: dict, vals: list):
        """func_eval.go over a LITERAL argument list: bind lambda
        params to the literals and fold the body at compile time."""
        params = lam["__lambda__"]
        if len(params) != len(vals):
            raise OTTLParseError(
                f"Eval: {len(params)} params != {len(vals)} args: {self.text!r}")
        binding = {p: v for p, v in zip(params, vals) if p != "_"}

        def subst(node):
            if isinstance(node, Col) and node.name in binding:
                return binding[node.name]
            if isinstance(node, dict) and "__converter__" in node:
                # converter over a bound param: substitute into its
                # src and fold by running the editor on one row
                a = dict(node["args"])
                src = a.pop("src", None)
                if src in binding:
                    return self._fold1(node["__converter__"], a, binding[src])
                raise OTTLParseError(
                    f"Eval body converter must apply to a param: {self.text!r}")
            if isinstance(node, list):
                return [subst(x) for x in node]
            return node

        kind = lam["body"][0]
        if kind == "value":
            return subst(lam["body"][1])
        if kind == "cond":
            op, *rest = lam["body"][1]
            if op in ("==", "!=", "<", "<=", ">", ">="):
                return _cmp_fold(op, subst(rest[0]), subst(rest[1]))
        raise OTTLParseError(f"unsupported Eval body: {self.text!r}")

    _LAMBDA_OPS = {"==", "!=", "<", "<=", ">", ">="}

    def _compile_collection_lambda(self, name: str, args: list) -> Any:
        """Filter / All / Any / Find / MapEach / MapKeys with the OTTL
        lambda grammar. Slice predicates compile to the vectorized
        list_* kernels; map(key) predicates are SCHEMA constants in the
        columnar model and fold to struct selections; literal sources
        fold entirely at compile time."""
        if len(args) < 2 or not isinstance(args[1], dict) \
                or "__lambda__" not in args[1]:
            raise OTTLParseError(f"{name}(source, lambda) expected: {self.text!r}")
        source, lam = args[0], args[1]
        params = lam["__lambda__"]
        if len(params) != 2:
            raise OTTLParseError(
                f"{name} lambda must take (key_or_index, value): {self.text!r}")
        kparam, vparam = params
        body = lam["body"]

        def pred_of(b):
            """(which_param, op, literal) from a comparison body."""
            if b[0] != "cond":
                return None
            cond = b[1]
            if not (isinstance(cond, tuple) and cond[0] in self._LAMBDA_OPS):
                return None
            op, left, right = cond
            if isinstance(left, Col) and _is_literal(right):
                which = ("key" if left.name == kparam and kparam != "_"
                         else "value" if left.name == vparam and vparam != "_"
                         else None)
                return (which, op, right) if which else None
            return None

        def is_kv_concat(b, kp=None, vp=None):
            """Concat([<k-or-String(i)>, sep, String(v)], '') shape ->
            the separator, or None."""
            kp, vp = kp or kparam, vp or vparam
            if b[0] != "value" or not isinstance(b[1], dict) \
                    or b[1].get("__converter__") != "concat":
                return None
            parts, sep = b[1]["args"]["parts"], b[1]["args"]["sep"]
            if sep != "" or len(parts) != 3 or not isinstance(parts[1], str):
                return None
            def is_param_render(x, nm):
                if isinstance(x, Col) and x.name == nm:
                    return True
                return (isinstance(x, dict)
                        and x.get("__converter__") in ("cast", "stringify")
                        and x["args"].get("src") == nm)
            if is_param_render(parts[0], kp) and is_param_render(parts[2], vp):
                return parts[1]
            return None

        # ---- literal sources fold in python ----
        if _is_literal(source) and isinstance(source, (list, dict)):
            items = (list(enumerate(source)) if isinstance(source, list)
                     else list(source.items()))
            pred = pred_of(body)
            def match(k, v):
                which, op, lit = pred
                return _cmp_fold(op, k if which == "key" else v, lit)
            if name in ("Filter", "All", "Any", "Find"):
                if pred is None:
                    raise OTTLParseError(
                        f"unsupported {name} lambda: {self.text!r}")
                hits = [(k, v) for k, v in items if match(k, v)]
                if name == "Filter":
                    return ([v for _, v in hits] if isinstance(source, list)
                            else dict(hits))
                if name == "All":
                    return len(hits) == len(items)
                if name == "Any":
                    return bool(hits)
                if not hits:
                    return None
                if len(args) > 2:  # mapped Find
                    raise OTTLParseError(
                        f"mapped Find over literals unsupported: {self.text!r}")
                return hits[0][1]
            if name == "MapEach":
                b = body
                if b[0] == "value" and isinstance(b[1], dict) \
                        and "__converter__" not in b[1]:
                    # (_, v) => {"k": v} literal-map body
                    out = []
                    for _, v in items:
                        out.append({mk: (v if isinstance(mv, Col)
                                         and mv.name == vparam else mv)
                                    for mk, mv in b[1].items()})
                    return out
                sep = is_kv_concat(b)
                if sep is not None:
                    return [f"{k}{sep}{_go_scalar_str(v)}" for k, v in items]
            raise OTTLParseError(f"unsupported {name} lambda: {self.text!r}")

        if not isinstance(source, Col):
            raise OTTLParseError(
                f"{name} source must be a path or literal: {self.text!r}")

        # ---- path sources: runtime-dispatch editors ----
        if name == "MapKeys":
            # (k, _) => Concat(["prefix", k], "") — a schema rename
            if body[0] == "value" and isinstance(body[1], dict) \
                    and body[1].get("__converter__") == "concat":
                parts, sep = body[1]["args"]["parts"], body[1]["args"]["sep"]
                if sep == "" and len(parts) == 2 and isinstance(parts[0], str) \
                        and isinstance(parts[1], Col) and parts[1].name == kparam:
                    return {"__converter__": "struct_rename",
                            "args": {"src": source.name, "prefix": parts[0]}}
            raise OTTLParseError(
                f"MapKeys supports constant-prefix renames only (per-row "
                f"key names are not columnar): {self.text!r}")
        if name == "MapEach":
            sep = is_kv_concat(body)
            if sep is None:
                raise OTTLParseError(
                    f"unsupported MapEach lambda: {self.text!r}")
            return {"__converter__": "ottl_map_each",
                    "args": {"src": source.name, "sep": sep}}
        pred = pred_of(body)
        if pred is None or pred[0] is None:
            raise OTTLParseError(f"unsupported {name} lambda: {self.text!r}")
        which, op, lit = pred
        a = {"src": source.name, "param": which, "op": op, "value": lit}
        if name == "Find" and len(args) > 2:
            mlam = args[2]
            if not (isinstance(mlam, dict) and "__lambda__" in mlam):
                raise OTTLParseError(f"Find mapper must be a lambda: {self.text!r}")
            msep = is_kv_concat(mlam["body"], *mlam["__lambda__"])
            if msep is None:
                raise OTTLParseError(
                    f"unsupported Find mapper lambda: {self.text!r}")
            a["mapped_sep"] = msep
        editor = {"Filter": "ottl_filter", "All": "ottl_all",
                  "Any": "ottl_any", "Find": "ottl_find"}[name]
        return {"__converter__": editor, "args": a}

    # ------------------------------------------------------------ Reduce

    def _compile_reduce(self, source, seed, lam):
        """func_reduce.go through the textual front-end: recognize the
        accumulator shapes the columnar engine can vectorize (numeric
        fold, value concat, key-value concat). Literal sources fold at
        compile time; path sources become list_reduce /
        map_reduce_concat editors."""
        params = lam["__lambda__"]
        if len(params) != 3:
            raise OTTLParseError(
                f"Reduce lambda must take (acc, key, value): {self.text!r}")
        acc_n, key_n, val_n = params
        body = lam["body"]

        def is_param(x, nm):
            return isinstance(x, Col) and x.name == nm

        def is_val_expr(x):
            # v | Int(v) | Double(v) | String(v)
            if is_param(x, val_n):
                return True
            return (isinstance(x, dict)
                    and x.get("__converter__") in ("cast", "stringify")
                    and x["args"].get("src") == val_n)

        kind = None
        if body[0] == "arith" and is_param(body[2], acc_n) and is_val_expr(body[3]):
            kind = ("numeric", {"+": "sum", "*": "product"}[body[1]])
        elif body[0] == "value" and isinstance(body[1], dict) \
                and body[1].get("__converter__") == "concat":
            parts = body[1]["args"]["parts"]
            sep = body[1]["args"]["sep"]
            # only sep=="" folds to a segment concat (acc is a running
            # prefix, so a non-empty sep would also separate acc from
            # each appended piece — not expressible as one join)
            if sep == "" and len(parts) >= 2 and is_param(parts[0], acc_n):
                rest = parts[1:]
                if len(rest) <= 2 and is_val_expr(rest[0]) and \
                        all(isinstance(r, str) for r in rest[1:]):
                    kind = ("list_concat", "",
                            rest[1] if len(rest) > 1 else "")
                elif len(rest) == 4 and is_param(rest[0], key_n) \
                        and isinstance(rest[1], str) and is_val_expr(rest[2]) \
                        and isinstance(rest[3], str):
                    kind = ("kv_concat", rest[1], rest[3])
        if kind is None:
            raise OTTLParseError(
                f"unsupported Reduce accumulator shape: {self.text!r}")

        if isinstance(source, (list, dict)):  # literal: fold now
            if kind[0] == "numeric":
                items = source.values() if isinstance(source, dict) else source
                acc = seed
                for v in items:
                    acc = acc + v if kind[1] == "sum" else acc * v
                return acc
            if kind[0] == "list_concat":
                if not isinstance(source, list):
                    raise OTTLParseError(
                        f"value-concat Reduce needs a list source: {self.text!r}")
                _, _, suffix = kind
                return str(seed) + "".join(str(v) + suffix for v in source)
            if not isinstance(source, dict):
                raise OTTLParseError(
                    f"key-value Reduce needs a map source: {self.text!r}")
            _, kv_sep, entry_sep = kind
            return str(seed) + "".join(
                f"{k}{kv_sep}{v}{entry_sep}" for k, v in source.items())

        if not isinstance(source, Col):
            raise OTTLParseError(f"Reduce source must be a path or literal: {self.text!r}")
        if kind[0] == "numeric":
            return {"__converter__": "list_reduce",
                    "args": {"src": source.name, "op": kind[1], "seed": seed}}
        if kind[0] == "list_concat":
            return {"__converter__": "list_reduce",
                    "args": {"src": source.name, "op": "concat", "seed": seed,
                             "sep": kind[1], "suffix": kind[2]}}
        return {"__converter__": "map_reduce_concat",
                "args": {"src": source.name, "kv_sep": kind[1],
                         "entry_sep": kind[2], "seed": str(seed)}}

    # ------------------------------------------------------- conditions

    def parse_condition(self) -> Any:
        return self._parse_or()

    def _parse_or(self) -> Any:
        left = self._parse_and()
        while self.peek() == ("name", "or"):
            self.next()
            left = ("or", left, self._parse_and())
        return left

    def _parse_and(self) -> Any:
        left = self._parse_not()
        while self.peek() == ("name", "and"):
            self.next()
            left = ("and", left, self._parse_not())
        return left

    def _parse_not(self) -> Any:
        if self.peek() == ("name", "not"):
            self.next()
            return ("not", self._parse_not())
        if self.peek()[1] == "(":
            self.next()
            c = self.parse_condition()
            self.expect(")")
            return c
        return self._parse_comparison()

    _TYPE_PREDICATES = {"IsString": "string", "IsDouble": "double",
                        "IsBool": "bool", "IsInt": "int",
                        "IsMap": "map", "IsList": "list"}

    def _parse_comparison(self) -> Any:
        if self.peek() == ("name", "IsMatch"):
            self.next()
            self.expect("(")
            target = self.parse_value()
            self.expect(",")
            pattern = self.parse_value()  # string literal OR a folded
            self.expect(")")              # converter (Concat(...))
            if not isinstance(pattern, str):
                raise OTTLParseError(f"IsMatch pattern must fold to a string: {self.text!r}")
            if isinstance(target, str):  # literal: fold now
                return bool(re.search(pattern, target))
            if not isinstance(target, Col):
                raise OTTLParseError(f"IsMatch target must be a path or string: {self.text!r}")
            return ("match", target, pattern)
        kind0, tok0 = self.peek()
        if kind0 == "name" and tok0 in self._TYPE_PREDICATES \
                and self.toks[self.pos + 1][1] == "(":
            self.next()
            self.expect("(")
            v = self.parse_value()
            self.expect(")")
            want = self._TYPE_PREDICATES[tok0]
            if isinstance(v, Col):
                return ("typecheck", v, want)
            if isinstance(v, dict) and "__converter__" in v:
                # IsString(UUID()): the converter's result type is
                # statically known — fold to a constant
                got = self._RESULT_TYPES.get(v["__converter__"])
                if got is None:
                    raise OTTLParseError(
                        f"cannot type-check {v['__converter__']}: {self.text!r}")
                return got == want
            got = {str: "string", float: "double", bool: "bool",
                   int: "int", dict: "map", list: "list"}.get(type(v))
            return got == want  # literal: constant condition
        if kind0 == "name" and tok0 == "IsEmpty" \
                and self.toks[self.pos + 1][1] == "(":
            self.next()
            self.expect("(")
            v = self.parse_value()
            self.expect(")")
            if isinstance(v, Col):
                return ("isempty", v)
            if isinstance(v, (str, list, dict)):
                return len(v) == 0
            raise OTTLParseError(f"IsEmpty over unsupported literal: {self.text!r}")
        left = self._parse_operand()
        if self.peek()[1] not in ("==", "!=", "<", "<=", ">", ">="):
            # a bare boolean term: folded literal (ContainsValue over
            # literals) or a BOOL-RETURNING converter call — anything
            # else must fail so lambda bodies fall through to the
            # value grammar
            if isinstance(left, bool):
                return left
            if isinstance(left, dict) \
                    and left.get("__converter__") in self._BOOL_CONVERTERS:
                return ("==", left, True)
            raise OTTLParseError(
                f"expected comparison after {left!r} in {self.text!r}")
        _, op = self.next()
        if op == "==" and self.peek() == ("name", "nil"):
            self.next()
            return ("is_null", left)
        if op == "!=" and self.peek() == ("name", "nil"):
            self.next()
            return ("not_null", left)
        right = self._parse_operand()
        if _is_literal(left) and _is_literal(right):
            # both sides folded (Time(..) - Time(..) < Duration(..)):
            # a constant condition
            try:
                return _cmp_fold(op, left, right)
            except TypeError:
                raise OTTLParseError(
                    f"cannot compare {left!r} and {right!r}: {self.text!r}")
        return (op, left, right)

    _BOOL_CONVERTERS = {"contains_value", "is_in_cidr", "is_valid_luhn",
                        "to_bool", "has_prefix", "has_suffix", "is_empty",
                        "is_root_span", "is_match",
                        "list_any", "list_all", "ottl_any", "ottl_all"}

    # ------------------------------------------------------- statements

    def parse_statement(self) -> Statement:
        if self.peek()[0] == "eof":
            raise OTTLParseError("empty statement")
        _, editor = self.next()
        self.expect("(")
        args: list[Any] = []
        # first arg may be a bare context name (attributes) for
        # delete_key/flatten-style editors
        while self.peek()[1] != ")":
            args.append(self._parse_operand())
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        where = None
        if self.peek() == ("name", "where"):
            self.next()
            where = self.parse_condition()
        st = self._compile(editor, args, where)
        if self._pre:
            from .stages.transform import ChainStatement

            drop = [p.args["target"] for p in self._pre]
            return ChainStatement(self._pre + [st], drop=drop)
        return st

    def _make_map_spec(self, v: dict) -> dict:
        """Parsed map literal with paths/converters -> make_map spec
        (leaves ['lit', x] / ['col', name] / ['map', {...}])."""
        spec = {}
        for k, x in v.items():
            if isinstance(x, Col):
                spec[k] = ["col", x.name]
            elif isinstance(x, dict) and "__converter__" in x:
                spec[k] = ["col", self._as_col(x).name]
            elif isinstance(x, dict):
                spec[k] = ["map", self._make_map_spec(x)]
            elif _is_literal(x):
                spec[k] = ["lit", x]
            else:
                raise OTTLParseError(
                    f"unsupported map value {x!r}: {self.text!r}")
        return spec

    @staticmethod
    def _split_kwargs(args: list[Any]) -> tuple[list[Any], dict[str, Any]]:
        pos = [a for a in args
               if not (isinstance(a, dict) and "__kwarg__" in a)]
        kw = {a["__kwarg__"]: a["value"] for a in args
              if isinstance(a, dict) and "__kwarg__" in a}
        return pos, kw

    @staticmethod
    def _is_ctx(v: Any) -> bool:
        """True when the editor's first arg is the whole attribute set
        (`attributes` / `resource.attributes` with no key) rather than
        a nested map path."""
        return isinstance(v, Col) and v.name == "attributes"

    def _compile(self, editor: str, args: list[Any], where: Any) -> Statement:
        if editor == "set":
            if len(args) != 2:
                raise OTTLParseError(f"set(path, value) expected: {self.text!r}")
            v = args[1]
            if self._is_ctx(args[0]):
                # set(attributes, {literal map}): replace the whole set
                if not (_is_literal(v) and isinstance(v, dict)):
                    raise OTTLParseError(
                        f"set(attributes, ...) takes a literal map: {self.text!r}")
                return Statement("set_all", {"literal": v}, where)
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"set(path, value) expected: {self.text!r}")
            target = args[0].name
            if isinstance(v, dict) and "__converter__" in v:
                return Statement(v["__converter__"],
                                 {"target": target, **v["args"]}, where)
            if isinstance(v, Col):
                return Statement("copy", {"src": v.name, "dst": target}, where)
            if isinstance(v, dict) and not _is_literal(v):
                # map literal with paths/converters inside -> make_map
                return Statement("make_map",
                                 {"target": target,
                                  "spec": self._make_map_spec(v)}, where)
            if isinstance(v, (dict, list)) and not _is_literal(v):
                raise OTTLParseError(f"unsupported set value: {self.text!r}")
            try:  # heterogeneous literal collections are not columnar
                if isinstance(v, (dict, list)):
                    import pyarrow as _pa

                    _pa.array([v])
            except Exception as e:
                raise OTTLParseError(
                    f"literal not representable as one Arrow type "
                    f"({e}): {self.text!r}")
            return Statement("set", {"target": target, "value": v}, where)
        if editor == "delete_key":
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(f"delete_key(ctx, key) expected: {self.text!r}")
            if not self._is_ctx(args[0]):
                return Statement("struct_delete_keys",
                                 {"target": args[0].name, "src": args[0].name,
                                  "keys": [args[1]]}, where)
            return Statement("delete_keys", {"keys": [args[1]]}, where)
        if editor == "delete_matching_keys":
            if not self._is_ctx(args[0]):
                return Statement("struct_delete_matching",
                                 {"target": args[0].name, "src": args[0].name,
                                  "pattern": args[1]}, where)
            return Statement("delete_matching_keys", {"pattern": args[1]}, where)
        if editor == "keep_matching_keys":
            if not self._is_ctx(args[0]):
                return Statement("struct_keep_matching",
                                 {"target": args[0].name, "src": args[0].name,
                                  "pattern": args[1]}, where)
            return Statement("keep_matching_keys", {"pattern": args[1]}, where)
        if editor == "keep_keys":
            if len(args) != 2 or not isinstance(args[1], list):
                raise OTTLParseError(f"keep_keys(ctx, [keys]) expected: {self.text!r}")
            if not self._is_ctx(args[0]):
                return Statement("struct_keep_keys",
                                 {"target": args[0].name, "src": args[0].name,
                                  "keys": list(args[1])}, where)
            return Statement("keep_keys", {"keys": list(args[1])}, where)
        if editor == "stringify_all":
            return Statement("stringify_all", {"keys": None}, where)
        if editor == "replace_all_patterns":
            # replace_all_patterns(attributes, "key"|"value", re, repl)
            if len(args) != 4 or not all(isinstance(a, str) for a in args[1:]):
                raise OTTLParseError(
                    f"replace_all_patterns(ctx, mode, re, repl) expected: {self.text!r}")
            return Statement("replace_all_patterns",
                             {"mode": args[1], "pattern": args[2],
                              "replacement": args[3]}, where)
        if editor == "truncate_all":
            # truncate_all(attributes, N): keys=None = every string col
            return Statement("truncate_all", {"keys": None, "limit": args[1]}, where)
        if editor == "replace_match":
            if len(args) != 3 or not isinstance(args[0], Col):
                raise OTTLParseError(f"replace_match(path, glob, repl) expected: {self.text!r}")
            return Statement("replace_match",
                             {"target": args[0].name, "pattern": args[1],
                              "replacement": args[2]}, where)
        if editor == "replace_all_matches":
            # replace_all_matches(attributes, glob, repl)
            if len(args) != 3:
                raise OTTLParseError(f"replace_all_matches(ctx, glob, repl) expected: {self.text!r}")
            return Statement("replace_all_matches",
                             {"pattern": args[1], "replacement": args[2],
                              "keys": None}, where)
        if editor == "replace_pattern":
            if len(args) not in (3, 4) or not isinstance(args[0], Col):
                raise OTTLParseError(f"replace_pattern(path, re, repl[, Fn]) expected: {self.text!r}")
            repl = args[2]
            if len(args) == 4:
                # optional hash Function (func_replace_pattern.go:67-92):
                # fn applies to the EXPANDED replacement per match; with
                # no $-backrefs that is a constant, foldable here — the
                # backref form would need per-match hashing (unsupported)
                fn = args[3]
                if not isinstance(fn, Col) or fn.name not in self._CONVERTER_EDITORS:
                    raise OTTLParseError(
                        f"replace_pattern function must name a converter: {self.text!r}")
                if "$" in repl:
                    raise OTTLParseError(
                        "replace_pattern with a Function and $-backrefs needs "
                        f"per-match hashing — unsupported: {self.text!r}")
                ed, _ = self._CONVERTER_EDITORS[fn.name]
                repl = self._fold1(ed, {}, repl)
            return Statement("replace_pattern",
                             {"target": args[0].name, "pattern": args[1],
                              "replacement": repl}, where)
        if editor == "flatten":
            # flatten(attributes[, "prefix"][, depth=N][,
            # resolveConflicts=true]) | flatten(attributes["k"])
            pos, kw = self._split_kwargs(args)
            extra = {}
            if "depth" in kw:
                extra["depth"] = int(kw["depth"])
            if "resolveConflicts" in kw:
                extra["resolve_conflicts"] = bool(kw["resolveConflicts"])
            if self._is_ctx(pos[0]):
                if len(pos) > 1:
                    extra["prefix"] = pos[1]
                return Statement("flatten_all", extra, where)
            if not isinstance(pos[0], Col):
                raise OTTLParseError(f"flatten(path) expected: {self.text!r}")
            return Statement("struct_flatten",
                             {"target": pos[0].name, "src": pos[0].name,
                              **extra}, where)
        if editor == "append":
            pos, kw = self._split_kwargs(args)
            if not pos or not isinstance(pos[0], Col):
                raise OTTLParseError(f"append(path, value|values=[..]) expected: {self.text!r}")
            a: dict = {"target": pos[0].name}
            if "values" in kw:
                a["values"] = kw["values"]
            elif len(pos) == 2:
                a["value"] = pos[1]
            else:
                raise OTTLParseError(f"append needs a value: {self.text!r}")
            return Statement("append", a, where)
        if editor == "delete_index":
            # delete_index(path, i | Len(path)-1 | Index(path, v)
            #              [, endIndex=N])
            pos, kw = self._split_kwargs(args)
            if len(pos) != 2 or not isinstance(pos[0], Col):
                raise OTTLParseError(
                    f"delete_index(path, index) expected: {self.text!r}")
            src = pos[0].name
            a = {"target": src, "src": src}
            idx = pos[1]
            if isinstance(idx, int):
                a["index"] = idx
                if "endIndex" in kw:
                    a["end_index"] = int(kw["endIndex"])
            elif isinstance(idx, dict) and "__arith__" in idx:
                op, left, right = idx["__arith__"]
                if not (op == "-" and isinstance(right, int)
                        and isinstance(left, dict)
                        and left.get("__converter__") in ("len", "list_len")
                        and left["args"].get("src") == src):
                    raise OTTLParseError(
                        f"delete_index arithmetic must be Len(same)-k: {self.text!r}")
                a["from_len"] = -right
            elif isinstance(idx, dict) \
                    and idx.get("__converter__") == "list_position" \
                    and idx["args"].get("src") == src:
                a["position_of"] = idx["args"]["value"]
            else:
                raise OTTLParseError(
                    f"unsupported delete_index index: {self.text!r}")
            return Statement("delete_index", a, where)
        if editor == "merge_maps":
            # merge_maps(target_map, source, strategy); with the whole
            # attribute set as target the source's keys become columns
            if len(args) != 3 or not isinstance(args[2], str):
                raise OTTLParseError(
                    f"merge_maps(target, source, strategy) expected: {self.text!r}")
            src = args[1]
            if self._is_ctx(args[0]):
                if isinstance(src, Col):
                    return Statement("merge_into",
                                     {"src": src.name, "strategy": args[2]},
                                     where)
                if _is_literal(src) and isinstance(src, dict):
                    import pyarrow as _pa

                    for v in src.values():  # fail loud on heterogeneous
                        try:
                            _pa.array([v])
                        except Exception as e:
                            raise OTTLParseError(
                                f"merge_maps literal not representable as "
                                f"one Arrow type ({e}): {self.text!r}")
                    return Statement("merge_into",
                                     {"literal": src, "strategy": args[2]},
                                     where)
                raise OTTLParseError(
                    f"merge_maps source must be a map path or literal: {self.text!r}")
            if not isinstance(args[0], Col) or not isinstance(src, Col):
                raise OTTLParseError(
                    f"merge_maps(target, source, strategy) expected: {self.text!r}")
            return Statement("merge_maps", {"target": args[0].name,
                                            "src": src.name,
                                            "strategy": args[2]}, where)
        if editor == "limit":
            # limit(attributes, max, ["priority", ...]) — whole set;
            # nested-path variant keeps the struct editor
            if len(args) < 2:
                raise OTTLParseError(f"limit(path, max, [prio]) expected: {self.text!r}")
            prio = args[2] if len(args) > 2 else []
            if self._is_ctx(args[0]):
                return Statement("limit_table",
                                 {"max_keys": args[1], "priority_keys": prio},
                                 where)
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"limit(path, max, [prio]) expected: {self.text!r}")
            return Statement("limit", {"src": args[0].name,
                                       "max_keys": args[1],
                                       "priority_keys": prio}, where)
        raise OTTLParseError(f"unsupported editor {editor!r} in {self.text!r}")


def parse_statement(text: str) -> Statement:
    """One OTTL statement string -> a compiled Statement."""
    p = _Parser(text)
    st = p.parse_statement()
    if p.peek()[0] != "eof":
        raise OTTLParseError(f"trailing tokens after statement: {text!r}")
    return st


def parse_statements(texts: list[str]) -> list[Statement]:
    return [parse_statement(t) for t in texts]


class ValueExpression:
    """ParseValueExpression (pkg/ottl/parser.go ValueExpression /
    e2e_test.go Test_e2e_ottl_value_expressions): a standalone value
    expression evaluated against a table. ``eval(tbl)`` returns a
    python scalar for folded expressions and a list (one value per
    row) for path/converter expressions."""

    def __init__(self, node: Any, pre: list):
        self.node = node
        self._pre = pre

    def eval(self, tbl) -> Any:
        for st in self._pre:
            tbl = st(tbl)

        def ev(node):
            if isinstance(node, Col):
                from .expr import resolve_col

                return resolve_col(tbl, node.name).to_pylist()
            if isinstance(node, dict):
                if "__table_width__" in node:
                    return tbl.num_columns
                if "__arith__" in node:
                    op, l, r = node["__arith__"]
                    lv, rv = ev(l), ev(r)
                    if isinstance(lv, list) or isinstance(rv, list):
                        raise ValueError("arithmetic over columns: use a statement")
                    return {"+": lv + rv, "-": lv - rv, "*": lv * rv}[op]
                if "__hex_lazy__" in node:
                    import struct as _struct

                    return _struct.pack(">q", int(ev(node["__hex_lazy__"]))).hex()
                if "__converter__" in node:
                    from .stages.transform import Statement as _St

                    out = _St(node["__converter__"],
                              {**node["args"], "target": "__vx__"})(tbl)
                    return out["__vx__"].to_pylist()
            return node  # folded literal

        return ev(self.node)


def parse_value_expression(text: str) -> ValueExpression:
    """One OTTL value-expression string -> a table evaluator."""
    p = _Parser(text)
    node = p._parse_operand()
    if p.peek()[0] != "eof":
        raise OTTLParseError(f"trailing tokens after expression: {text!r}")
    return ValueExpression(node, p._pre)


def parse_condition_text(text: str) -> Any:
    """One OTTL/stanza-expr condition string -> the engine's predicate
    tuple DSL (expr.py). Used by the filterprocessor config (OTTL
    conditions) and stanza ``if:``/router ``expr:`` strings."""
    p = _Parser(text)
    cond = p.parse_condition()
    if p.peek()[0] != "eof":
        raise OTTLParseError(f"trailing tokens after condition: {text!r}")
    return cond


def filter_from_ottl(conditions: list[str], drop: bool = True):
    """filterprocessor config shape: records matching ANY condition
    are dropped (logs: log_record: [...] semantics,
    processor/filterprocessor README)."""
    from .stages.transform import FilterStage

    conds = [parse_condition_text(c) for c in conditions]
    combined = conds[0]
    for c in conds[1:]:
        combined = ("or", combined, c)
    return FilterStage(condition=combined, mode="drop" if drop else "keep")


def transform_from_ottl(texts: list[str], error_mode: str = "ignore"):
    """The transformprocessor entry point: OTTL statement strings ->
    one fused TransformStage."""
    from .stages.transform import TransformStage

    return TransformStage(parse_statements(texts), error_mode=error_mode)
