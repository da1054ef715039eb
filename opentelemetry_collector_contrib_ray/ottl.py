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
  | (?P<number>-?\d+\.\d+|-?\d+)
  | (?P<op>==|!=|<=|>=|=>|<|>|\(|\)|\[|\]|\{|\}|,|\.|:|\+|\*|=)
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
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def _parse_key_value_literal(text: str, delim: str, pair_delim: str) -> dict:
    """parseutils.ParseKeyValuePairs for a literal string: split on
    pair_delim outside double quotes, then on the first delim; quoted
    values keep embedded delimiters and drop the quotes."""
    pairs, cur, inq = [], [], False
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == '"':
            inq = not inq
            cur.append(ch)
            i += 1
            continue
        if not inq and text.startswith(pair_delim, i):
            pairs.append("".join(cur))
            cur = []
            i += len(pair_delim)
            continue
        cur.append(ch)
        i += 1
    pairs.append("".join(cur))
    out = {}
    for pr in pairs:
        if not pr:
            continue
        k, sep, v = pr.partition(delim)
        if not sep:
            raise OTTLParseError(f"ParseKeyValue: no delimiter in {pr!r}")
        v = v.strip()
        if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
            v = v[1:-1]
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
        """literal | path | Converter(args...)"""
        kind, tok = self.peek()
        if kind == "string":
            self.next()
            return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        if kind == "number":
            self.next()
            return float(tok) if "." in tok else int(tok)
        if kind == "name":
            if tok == "nil":
                self.next()
                return None
            if tok in ("true", "false"):
                self.next()
                return tok == "true"
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
        """(acc, k, v) => body — the OTTL lambda shape Reduce takes.
        Body grammar recognized: value | value (+|*) value, where each
        value is a name, literal, or converter call."""
        self.expect("(")
        params = []
        while self.peek()[1] != ")":
            _, nm = self.next()
            params.append(nm)
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
        self.expect("=>")
        left = self.parse_value()
        if self.peek()[1] in ("+", "*"):
            _, arith = self.next()
            right = self.parse_value()
            return {"__lambda__": params,
                    "body": ("arith", arith, left, right)}
        return {"__lambda__": params, "body": ("value", left)}

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
                if k != "string":
                    raise OTTLParseError(
                        f"only string keys are supported in paths, got {key!r} in {self.text!r}")
                self.expect("]")
                keys.append(key[1:-1])
            return Col(".".join(keys))
        return Col(base)

    # ------------------------------------------------------- converters

    _CONVERTER_EDITORS = {
        "Upper": ("upper", "src"), "Lower": ("lower", "src"),
        "Trim": ("trim", "src"), "Len": ("len", "src"),
        "SHA1": ("sha1", "src"), "SHA256": ("sha256", "src"),
        "SHA512": ("sha512", "src"), "MD5": ("md5_hex", "src"),
        "FNV": ("hash", "src"), "Murmur3Hash": ("murmur3", "src"),
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

    def parse_converter(self) -> dict:
        """Returns {'__converter__': editor_name, 'args': {...}} for
        the compile step to attach a target."""
        _, name = self.next()
        self.expect("(")
        args: list[Any] = []
        while self.peek()[1] != ")":
            args.append(self.parse_value())
            if self.peek()[1] == ",":
                self.next()
        self.expect(")")
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
                v = str(v)
                return f'"{v}"' if (delim in v or pair_delim in v) else v

            return pair_delim.join(f"{k}{delim}{_rend(v)}" for k, v in items)
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
        if name == "UUID":
            if args:
                raise OTTLParseError(f"UUID() takes no arguments: {self.text!r}")
            return {"__converter__": "uuid", "args": {}}
        if name == "Concat":
            if len(args) != 2 or not isinstance(args[0], list) or not isinstance(args[1], str):
                raise OTTLParseError(f"Concat([parts], sep) expected: {self.text!r}")
            return {"__converter__": "concat", "args": {"parts": args[0], "sep": args[1]}}
        if name == "Substring":
            if len(args) != 3:
                raise OTTLParseError(f"Substring(path, start, len) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("substring",
                                   {"start": args[1], "length": args[2]}, args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"Substring(path, start, len) expected: {self.text!r}")
            return {"__converter__": "substring",
                    "args": {"src": args[0].name, "start": args[1], "length": args[2]}}
        if name == "Sort":
            order = args[1] if len(args) > 1 else "asc"
            if isinstance(args[0], list):  # literal list: fold
                return sorted(args[0], reverse=(order == "desc"))
            src = self._as_col(args[0])  # path or nested converter
            return {"__converter__": "list_sort", "args": {"src": src.name, "order": order}}
        if name in ("Int", "Double", "String"):
            if len(args) == 1 and not isinstance(args[0], (Col, dict, list)):
                v = args[0]  # literal: fold like the reference's getters
                if name == "Int":
                    return int(v)
                if name == "Double":
                    return float(v)
                return ("true" if v else "false") if isinstance(v, bool) else str(v)
            to = {"Int": "int64", "Double": "float64", "String": "str"}[name]
            return {"__converter__": "cast", "args": {"src": args[0].name, "to": to}}
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
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "duration",
                    "args": {"src": args[0].name, "unit": unit}}
        if name in self._UNIX_CONVERTERS:
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
            return {"__converter__": "unix",
                    "args": {"src": args[0].name,
                             "unit": self._UNIX_CONVERTERS[name]}}
        if name in self._PREFIX_CONVERTERS:
            editor, key = self._PREFIX_CONVERTERS[name]
            if len(args) != 2 or not isinstance(args[0], Col) or not isinstance(args[1], str):
                raise OTTLParseError(f"{name}(path, string) expected: {self.text!r}")
            return {"__converter__": editor,
                    "args": {"src": args[0].name, key: args[1]}}
        if name in self._CASE_CONVERTERS:
            if len(args) != 1:
                raise OTTLParseError(f"{name}(path) expected: {self.text!r}")
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
            # element position over a list path (-1 when absent)
            if len(args) == 2 and isinstance(args[0], str) and isinstance(args[1], str):
                return args[0].find(args[1])
            if len(args) == 2 and isinstance(args[0], Col):
                return {"__converter__": "list_position",
                        "args": {"src": args[0].name, "value": args[1]}}
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
            if unit is None:
                raise OTTLParseError(
                    f"TruncateTime: unsupported granularity {args[1]}: {self.text!r}")
            return {"__converter__": "truncate_time",
                    "args": {"src": args[0].name, "unit": unit}}
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
            if len(args) != 2:
                raise OTTLParseError(f"Split(path, sep) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("split", {"sep": args[1]}, args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"Split(path, sep) expected: {self.text!r}")
            return {"__converter__": "split",
                    "args": {"src": args[0].name, "sep": args[1]}}
        if name == "IsInCIDR":
            if len(args) != 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"IsInCIDR(path, cidr) expected: {self.text!r}")
            return {"__converter__": "is_in_cidr",
                    "args": {"src": args[0].name, "cidr": args[1]}}
        if name == "ContainsValue":
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
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(f"Decode(path, encoding) expected: {self.text!r}")
            if isinstance(args[0], str):
                return self._fold1("decode", {"encoding": args[1]}, args[0])
            if not isinstance(args[0], Col):
                raise OTTLParseError(f"Decode(path, encoding) expected: {self.text!r}")
            return {"__converter__": "decode",
                    "args": {"src": args[0].name, "encoding": args[1]}}
        if name == "CommunityID":
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
            # func_slice_to_map.go: list<struct> keyed by a field path
            if len(args) >= 2 and isinstance(args[0], Col) \
                    and isinstance(args[1], list) and len(args[1]) == 1 \
                    and isinstance(args[1][0], str):
                return {"__converter__": "slice_to_map",
                        "args": {"src": args[0].name,
                                 "key_field": args[1][0]}}
            raise OTTLParseError(
                f"SliceToMap(path, [key_field]) expected: {self.text!r}")
        if name == "Reduce":
            if len(args) != 3 or not isinstance(args[2], dict) \
                    or "__lambda__" not in args[2]:
                raise OTTLParseError(
                    f"Reduce(source, seed, (acc, k, v) => ...) expected: {self.text!r}")
            return self._compile_reduce(args[0], args[1], args[2])
        raise OTTLParseError(f"unsupported converter {name}() in {self.text!r}")

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
            return (isinstance(x, dict) and x.get("__converter__") == "cast"
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
            k, pat = self.next()
            if k != "string":
                raise OTTLParseError(f"IsMatch pattern must be a string: {self.text!r}")
            self.expect(")")
            # unescape like parse_value does for every other string
            pattern = pat[1:-1].replace('\\"', '"').replace("\\\\", "\\")
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
        left = self.parse_value()
        kind, op = self.next()
        if op == "==" and self.peek() == ("name", "nil"):
            self.next()
            return ("is_null", left)
        if op == "!=" and self.peek() == ("name", "nil"):
            self.next()
            return ("not_null", left)
        if op not in ("==", "!=", "<", "<=", ">", ">="):
            raise OTTLParseError(f"expected comparison, got {op!r} in {self.text!r}")
        right = self.parse_value()
        return (op, left, right)

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
            args.append(self.parse_value())
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

    def _compile(self, editor: str, args: list[Any], where: Any) -> Statement:
        if editor == "set":
            if len(args) != 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"set(path, value) expected: {self.text!r}")
            target = args[0].name
            v = args[1]
            if isinstance(v, dict) and "__converter__" in v:
                return Statement(v["__converter__"],
                                 {"target": target, **v["args"]}, where)
            if isinstance(v, Col):
                return Statement("copy", {"src": v.name, "dst": target}, where)
            return Statement("set", {"target": target, "value": v}, where)
        if editor == "delete_key":
            # delete_key(attributes, "k")
            if len(args) != 2 or not isinstance(args[1], str):
                raise OTTLParseError(f"delete_key(ctx, key) expected: {self.text!r}")
            return Statement("delete_keys", {"keys": [args[1]]}, where)
        if editor == "delete_matching_keys":
            return Statement("delete_matching_keys", {"pattern": args[1]}, where)
        if editor == "keep_matching_keys":
            return Statement("keep_matching_keys", {"pattern": args[1]}, where)
        if editor == "keep_keys":
            if len(args) != 2 or not isinstance(args[1], list):
                raise OTTLParseError(f"keep_keys(ctx, [keys]) expected: {self.text!r}")
            return Statement("keep_keys", {"keys": list(args[1])}, where)
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
            if len(args) != 1 or not isinstance(args[0], Col):
                raise OTTLParseError(f"flatten(path) expected: {self.text!r}")
            return Statement("flatten", {"src": args[0].name}, where)
        if editor == "append":
            if len(args) != 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"append(path, value) expected: {self.text!r}")
            return Statement("append", {"target": args[0].name,
                                        "value": args[1]}, where)
        if editor == "delete_index":
            # delete_index(path, i) — the endIndex/converter-index
            # variants stay unsupported (fail loud)
            if len(args) != 2 or not isinstance(args[0], Col) \
                    or not isinstance(args[1], int):
                raise OTTLParseError(
                    f"delete_index(path, int) expected: {self.text!r}")
            return Statement("delete_index",
                             {"target": args[0].name, "src": args[0].name,
                              "index": args[1]}, where)
        if editor == "merge_maps":
            # merge_maps(target_map, source_map, "insert"|"update"|"upsert")
            if len(args) != 3 or not isinstance(args[0], Col) \
                    or not isinstance(args[1], Col) or not isinstance(args[2], str):
                raise OTTLParseError(
                    f"merge_maps(target, source, strategy) expected: {self.text!r}")
            return Statement("merge_maps", {"target": args[0].name,
                                            "src": args[1].name,
                                            "strategy": args[2]}, where)
        if editor == "limit":
            # limit(attributes_struct, max, ["priority", ...])
            if len(args) < 2 or not isinstance(args[0], Col):
                raise OTTLParseError(f"limit(path, max, [prio]) expected: {self.text!r}")
            prio = args[2] if len(args) > 2 else []
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
