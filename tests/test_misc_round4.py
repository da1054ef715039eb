"""Round-4 continuation additions: IsRootSpan (func_is_root_span.go)
over the flat span model."""

import pyarrow as pa

from opentelemetry_collector_contrib_ray.ottl import (
    parse_statement,
    transform_from_ottl,
)
from opentelemetry_collector_contrib_ray.stages.transform import Statement


def spans_table():
    # func_is_root_span_test.go: all-zero parent id -> root,
    # any nonzero byte -> not root. Flat-model additions: null and ""
    # also mean "no parent" (pdata can't express those; a flat table
    # can, and both read as root).
    return pa.table({
        "span_id": ["a1" * 8, "b2" * 8, "c3" * 8, "d4" * 8],
        "parent_span_id": ["0" * 16, "01" + "0" * 14, None, ""],
        "name": ["s0", "s1", "s2", "s3"],
    })


def test_is_root_span_editor():
    out = Statement("is_root_span",
                    {"target": "o", "src": "parent_span_id"})(spans_table())
    assert out["o"].to_pylist() == [True, False, True, True]


def test_is_root_span_textual_set():
    stage = transform_from_ottl(
        ['set(root, IsRootSpan())'], error_mode="propagate")
    out = stage.fn(spans_table())
    assert out["root"].to_pylist() == [True, False, True, True]


def test_is_root_span_where_predicate():
    stage = transform_from_ottl(
        ['set(name, "root-span") where IsRootSpan()'],
        error_mode="propagate")
    out = stage.fn(spans_table())
    assert out["name"].to_pylist() == ["root-span", "s1",
                                       "root-span", "root-span"]


def test_is_root_span_rejects_args():
    import pytest

    from opentelemetry_collector_contrib_ray.ottl import OTTLParseError

    with pytest.raises(OTTLParseError):
        parse_statement('set(x, IsRootSpan(span_id))')


def test_nested_converter_composition():
    # the reference allows arbitrary converter nesting (getters
    # compose); the textual front-end materializes inner calls into
    # scratch columns, dropped after the statement
    import hashlib

    t = pa.table({"eid": ["41", "42"], "s": ["foo.bar", "baz.qux"]})
    stage = transform_from_ottl([
        'set(h16, Substring(MD5(eid), 0, 16))',
        'set(up_trim, Upper(TrimSuffix(s, ".bar")))',
        'set(joined, Concat([SHA256(eid), Upper(s)], "|"))',
        'set(yy, Year(Unix(Int(eid))))',
        'set(pre, HasPrefix(Lower(s), "foo"))',
        'set(snake, ToSnakeCase(Upper(s)))',
    ], error_mode="propagate")
    out = stage.fn(t)
    assert out["h16"][0].as_py() == hashlib.md5(b"41").hexdigest()[:16]
    assert out["up_trim"].to_pylist() == ["FOO", "BAZ.QUX"]
    assert out["joined"][0].as_py() == \
        hashlib.sha256(b"41").hexdigest() + "|FOO.BAR"
    assert out["yy"].to_pylist() == [1970, 1970]
    assert out["pre"].to_pylist() == [True, False]
    # scratch columns do not leak into the output schema
    assert not [c for c in out.column_names if c.startswith("__ottl_tmp")]


def test_filelog_header(ray_session, tmp_path):
    # fileconsumer/internal/header/reader.go: leading pattern-matching
    # lines are consumed, metadata regexes upsert into the file's
    # attributes (later lines overwrite), attrs attach to every entry
    import ray.data

    from opentelemetry_collector_contrib_ray.sources.rawtext import (
        read_log_lines_with_header,
    )

    (tmp_path / "a.log").write_text(
        "#env=stage\n#env=prod\n#region=us-east\n"
        "line one\nline two\n# not a header anymore\n")
    (tmp_path / "b.log").write_text("#env=dev\npayload\n")
    ds = read_log_lines_with_header(
        str(tmp_path / "*.log"), r"^#",
        [r"^#env=(?P<env>.*)", r"^#region=(?P<region>.*)"],
        attr_keys=["env", "region"])
    df = ds.to_pandas().sort_values(["path", "line_no"]).reset_index(drop=True)
    a = df[df["path"].str.endswith("a.log")]
    # upsert: the second #env line overwrote the first
    assert set(a["env"]) == {"prod"} and set(a["region"]) == {"us-east"}
    # header ends at the first non-matching line; later '#' lines are
    # ordinary entries
    assert list(a["line"]) == ["line one", "line two",
                               "# not a header anymore"]
    b = df[df["path"].str.endswith("b.log")]
    assert set(b["env"]) == {"dev"} and b["region"].isna().all()
    assert list(b["line"]) == ["payload"]


def test_filelog_header_no_match_is_no_header(ray_session, tmp_path):
    # a first line that does not match the pattern means NO header
    import ray.data

    from opentelemetry_collector_contrib_ray.sources.rawtext import (
        read_log_lines_with_header,
    )

    (tmp_path / "c.log").write_text("plain\n#env=prod\n")
    ds = read_log_lines_with_header(
        str(tmp_path / "*.log"), r"^#", [r"^#env=(?P<env>.*)"],
        attr_keys=["env"])
    df = ds.to_pandas()
    assert list(df["line"]) == ["plain", "#env=prod"]
    assert df["env"].isna().all()


def test_uri_parser_request_uri_shapes():
    # parseutils.ParseURI (uri.go:22-127) via parser/uri TestProcess:
    # absolute, userinfo, relative, bare-query, and rejection shapes.
    # Flat-model: query is the raw string, absent components null.
    from opentelemetry_collector_contrib_ray.stages.parse import UriParser

    t = pa.table({"u": [
        "https://google.com:443/path?user=dev",        # TestProcess default
        "http://admin:pw@host.example:8080/a/b?x=1&x=2",
        "/relative/path?q=1",                          # ParseRequestURI relative
        "?user=dev&env=stage",                         # bare query (uri.go:25-31)
        "invalid",                                     # ParseRequestURI error
        "",                                            # empty -> error
        "sp://x/y#frag",                               # fragment dropped (urlToMap)
    ]})
    out = UriParser("u", on_error="send").fn(t)
    rows = out.to_pylist()
    assert rows[0]["scheme"] == "https" and rows[0]["host"] == "google.com" \
        and rows[0]["port"] == "443" and rows[0]["path"] == "/path" \
        and rows[0]["query"] == "user=dev" and rows[0]["user"] is None
    assert rows[1]["user"] == "admin" and rows[1]["host"] == "host.example" \
        and rows[1]["port"] == "8080" and rows[1]["query"] == "x=1&x=2"
    assert rows[2]["scheme"] is None and rows[2]["host"] is None \
        and rows[2]["path"] == "/relative/path" and rows[2]["query"] == "q=1"
    assert rows[3]["path"] is None and rows[3]["query"] == "user=dev&env=stage"
    assert rows[6]["scheme"] == "sp" and rows[6]["path"] == "/y" \
        and rows[6]["query"] is None

    dropped = UriParser("u", on_error="drop").fn(t)
    # "invalid" and "" are rejected like ParseRequestURI
    assert dropped.num_rows == 5


def test_csv_parser_quote_modes():
    # parser/csv/parser_test.go: empty field, comma-in-quotes,
    # quotes-in-quotes (doubled escape), tab delimiter, field-count
    # mismatch error, lazy quotes, ignore quotes, dynamic
    # header_attribute
    from opentelemetry_collector_contrib_ray.stages.parse import CsvParser

    hdr = ["name", "address", "age", "phone", "position"]
    t = pa.table({"b": [
        "stanza,Evergreen,,555-5555,agent",
        'stanza,"Evergreen,49508",1,555-5555,agent',
        '"bob ""the man""",Evergreen,1,555-5555,agent',
    ]})
    out = CsvParser("b", header=hdr).fn(t).to_pylist()
    assert out[0]["age"] == "" and out[0]["name"] == "stanza"
    assert out[1]["address"] == "Evergreen,49508"
    assert out[2]["name"] == 'bob "the man"'

    # parse-failure-num-fields-mismatch: 3 fields vs 4-field header
    t2 = pa.table({"b": ["1,400,555-555-5555"]})
    assert CsvParser("b", header="name,age,height,number",
                     on_error="drop").fn(t2).num_rows == 0

    # parse-with-lazy-quotes: bare quotes in an unquoted field
    t3 = pa.table({"b": ['stanza "log parser",1,6ft,5']})
    o3 = CsvParser("b", header="name,age,height,number",
                   lazy_quotes=True).fn(t3).to_pylist()
    assert o3[0]["name"] == 'stanza "log parser"'
    o4 = CsvParser("b", header="name,age,height,number",
                   ignore_quotes=True).fn(t3).to_pylist()
    assert o4[0]["name"] == 'stanza "log parser"'

    # header_attribute: per-row dynamic headers, union schema
    t5 = pa.table({"b": ["stanza dev,1,400,555-555-5555", "x,y"],
                   "Fields": ["name,age,height,number", "a,b"]})
    o5 = CsvParser("b", header_attribute="Fields").fn(t5).to_pylist()
    assert o5[0]["name"] == "stanza dev" and o5[0].get("a") is None
    assert o5[1]["a"] == "x" and o5[1].get("name") is None

    # tab delimiter with delimiter-joined header string
    t6 = pa.table({"b": ["stanza\tEvergreen\t1\t555-5555\tagent"]})
    o6 = CsvParser("b", header="name\taddress\tage\tphone\tposition",
                   delimiter="\t").fn(t6).to_pylist()
    assert o6[0]["address"] == "Evergreen"


def test_csv_parser_build_failures():
    # config.go:76-78 + delimiter validation + missing header
    from opentelemetry_collector_contrib_ray.stages.parse import CsvParser

    import pytest as _pt
    with _pt.raises(ValueError, match="only one of"):
        CsvParser("b", header="a,b", lazy_quotes=True, ignore_quotes=True)
    with _pt.raises(ValueError, match="single character"):
        CsvParser("b", header="a,b", delimiter=";;")
    with _pt.raises(ValueError, match="missing required field"):
        CsvParser("b")
    with _pt.raises(ValueError, match="missing field delimiter"):
        CsvParser("b", header="nodelimiter")


# ---------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st

_field = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs"),
                           blacklist_characters="\r\n"),
    max_size=12)


@settings(max_examples=60, deadline=None)
@given(st.lists(_field, min_size=2, max_size=5))
def test_csv_writer_roundtrip_property(fields):
    # serialize with Python's csv.writer (RFC-4180, doubled quotes),
    # parse with CsvParser strict mode: must round-trip exactly
    import csv as _csv
    import io as _io

    from opentelemetry_collector_contrib_ray.stages.parse import CsvParser

    buf = _io.StringIO()
    _csv.writer(buf, lineterminator="").writerow(fields)
    row = buf.getvalue()
    header = [f"c{i}" for i in range(len(fields))]
    out = CsvParser("b", header=header, on_error="propagate").fn(
        pa.table({"b": [row]}))
    got = [out[f"c{i}"][0].as_py() for i in range(len(fields))]
    assert got == fields


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(["http", "https", "ftp", "sp-x"]),
       st.text(alphabet="abcdefghij.-", min_size=1, max_size=10),
       st.integers(min_value=1, max_value=65535) | st.none(),
       st.text(alphabet="abc/0123", max_size=8),
       st.text(alphabet="abc=&123", max_size=8))
def test_uri_parser_vs_urllib_property(scheme, host, port, path, query):
    # urllib.parse is the cross-implementation oracle for the absolute
    # shapes our regex accepts
    from urllib.parse import urlsplit

    from opentelemetry_collector_contrib_ray.stages.parse import UriParser

    host = host.strip(".-") or "h"
    uri = f"{scheme}://{host}"
    if port:
        uri += f":{port}"
    if path:
        uri += "/" + path.lstrip("/")
    if query:
        uri += "?" + query
    out = UriParser("u", on_error="propagate").fn(pa.table({"u": [uri]}))
    row = out.to_pylist()[0]
    ref = urlsplit(uri)
    assert row["scheme"] == ref.scheme
    assert row["host"] == ref.hostname
    assert row["port"] == (str(ref.port) if ref.port else None)
    assert (row["path"] or "") == ref.path
    assert (row["query"] or "") == ref.query


def test_is_match_value_position():
    # func_is_match.go: IsMatch returns a bool VALUE (not only a
    # where-clause predicate); nil input -> nil
    t = pa.table({"level": ["ERROR", "INFO", None]})
    out = transform_from_ottl(
        ['set(is_err, IsMatch(level, "^ERROR$"))'],
        error_mode="propagate").fn(t)
    assert out["is_err"].to_pylist() == [True, False, None]


def test_unquote_strconv_semantics():
    # transformer/unquote/transformer_test.go over strconv.Unquote:
    # double/back quotes unquote; single quotes only for one char;
    # bare values are errors (unchanged under send, raise under
    # propagate)
    from opentelemetry_collector_contrib_ray.stages.transform import Statement

    t = pa.table({"b": ['"val"', "`val`", "'v'", "'val'", "val",
                        '"a\\tb"', None]})
    out = Statement("unquote", {"target": "b"})(t)
    assert out["b"].to_pylist() == ["val", "val", "v", "'val'", "val",
                                    "a\tb", None]
    import pytest as _pt
    with _pt.raises(ValueError, match="invalid syntax"):
        Statement("unquote", {"target": "b", "on_error": "propagate"})(
            pa.table({"b": ["val"]}))
    with _pt.raises(ValueError, match="invalid syntax"):
        Statement("unquote", {"target": "b", "on_error": "propagate"})(
            pa.table({"b": ["'val'"]}))


def test_sanitize_utf8_run_coalescing():
    # transformer/sanitizeutf8/transformer_test.go: each RUN of
    # invalid bytes becomes ONE U+FFFD (Go strings.ToValidUTF8), not
    # one per byte
    from opentelemetry_collector_contrib_ray.stages.transform import Statement

    t = pa.table({"b": pa.array([
        b"This is a normal string",
        b"This is an invalid utf8 string \xfe",
        b"This is an invalid utf8 string \xfe\xfe",
        b"This is an invalid utf8 string \xfe and another \xfe",
        "caf\xe9".encode("utf-8"),  # valid multi-byte stays
    ], pa.binary())})
    out = Statement("sanitize_utf8", {"target": "b"})(t)
    assert out["b"].to_pylist() == [
        "This is a normal string",
        "This is an invalid utf8 string �",
        "This is an invalid utf8 string �",
        "This is an invalid utf8 string � and another �",
        "caf\xe9",
    ]


def test_assign_keys_reference_vectors():
    # transformer/assignkeys/transformer_test.go: the 5-element input
    # list becomes a struct keyed origin/sev/msg/count/isBool
    # (homogeneous string list — the Arrow adaptation of the Go
    # mixed-type slice, values AsString); mismatched length -> null
    from opentelemetry_collector_contrib_ray.stages.transform import Statement

    keys = ["origin", "sev", "msg", "count", "isBool"]
    t = pa.table({"input": pa.array([
        ["body", "INFO", "started agent", "42", "true"],
        ["attribute", "INFO", "started agent", "42", "true"],
        ["too", "short"],
    ])})
    out = Statement("assign_keys",
                    {"target": "out", "src": "input", "keys": keys})(t)
    rows = out["out"].to_pylist()
    assert rows[0] == {"origin": "body", "sev": "INFO",
                       "msg": "started agent", "count": "42",
                       "isBool": "true"}
    assert rows[1]["origin"] == "attribute"
    assert rows[2] is None  # per-row error like OnError=drop's trigger
    # missing keys config is a build error (transformer_test.go
    # assign_keys_missing_keys)
    import pytest as _pt
    with _pt.raises(TypeError):
        Statement("assign_keys", {"target": "out", "src": "input"})(t)


def test_regex_replace_stage_reference_vectors():
    # transformer/regexreplace/transformer_test.go: regex replace,
    # no-match pass-through, and the ansi_control_sequences preset
    from opentelemetry_collector_contrib_ray.stages.transform import (
        RegexReplaceStage,
    )

    t = pa.table({"body": ["a__b__c", "{a}{b}{c}", "asdf", "\x1b[mred"]})
    out = RegexReplaceStage("body", regex="__", replace_with=",").fn(t)
    assert out["body"][0].as_py() == "a,b,c"
    out = RegexReplaceStage("body", regex="[{}]", replace_with="").fn(t)
    assert out["body"][1].as_py() == "abc"
    out = RegexReplaceStage("body", regex="x", replace_with="y").fn(t)
    assert out["body"][2].as_py() == "asdf"  # no match -> unchanged
    out = RegexReplaceStage("body",
                            regex_name="ansi_control_sequences").fn(t)
    assert out["body"][3].as_py() == "red"
    import pytest as _pt
    with _pt.raises(ValueError, match="either regex or regex_name"):
        RegexReplaceStage("body")
    with _pt.raises(ValueError, match="either regex or regex_name"):
        RegexReplaceStage("body", regex="a", regex_name="ansi_control_sequences")
    with _pt.raises(ValueError, match="is unknown"):
        RegexReplaceStage("body", regex_name="nope")


def test_type_predicates_value_position():
    # func_is_string.go etc. return bool VALUES; typed-column model:
    # the Arrow type decides, null rows are false
    t = pa.table({"s": ["a", None], "n": [1, 2], "f": [1.5, None]})
    out = transform_from_ottl([
        'set(s_is, IsString(s))',
        'set(n_is, IsInt(n))',
        'set(f_is, IsDouble(f))',
        'set(cross, IsString(n))',
        'set(lit, IsInt(5))',
        'set(lit2, IsInt(true))',  # Go: a bool is not an int
    ], error_mode="propagate").fn(t)
    assert out["s_is"].to_pylist() == [True, False]
    assert out["n_is"].to_pylist() == [True, True]
    assert out["f_is"].to_pylist() == [True, False]
    assert out["cross"].to_pylist() == [False, False]
    assert out["lit"].to_pylist() == [True, True]
    assert out["lit2"].to_pylist() == [False, False]


def test_redaction_full_surface():
    # processor/redactionprocessor config surface
    # (config.go:31-92 + processor.go maskValue:385-414)
    import hashlib

    from opentelemetry_collector_contrib_ray.stages.attributes import Redaction

    t = pa.table({
        "safe_attribute": ["harmless but suspicious 4111111111111112", "x"],
        "name": ["placed order", "n"],
        "credit_card": ["4111111111111111", "nope"],
        "drop_me": ["gone", "gone"],
        "ignored_secret": ["4111111111111111", "y"],
    })
    # allowed keys fail closed + ignored keys pass untouched +
    # blocked value masking + allowed_values exemption + key pattern
    r = Redaction(
        allowed_keys=["safe_attribute", "name", "credit_card"],
        ignored_keys=["ignored_secret"],
        blocked_value_patterns=[r"4[0-9]{12}(?:[0-9]{3})?"],
        allowed_values=[r".*4111111111111112.*"],
        blocked_key_patterns=[r".*credit.*"],
        summary="debug",
    )
    out = r.fn(t)
    rows = out.to_pylist()
    # drop_me deleted; ignored_secret kept verbatim
    assert "drop_me" not in out.column_names
    assert rows[0]["ignored_secret"] == "4111111111111111"
    # allowed_values exempts the whole value
    assert rows[0]["safe_attribute"].endswith("4111111111111112")
    # key pattern masks the WHOLE value
    assert rows[0]["credit_card"] == "****" and rows[1]["credit_card"] == "****"
    # summary columns
    assert rows[0]["redaction.masked.count"] == 1
    assert rows[0]["redaction.masked.keys"] == "credit_card"
    assert rows[0]["redaction.redacted.count"] == 1
    assert rows[0]["redaction.redacted.keys"] == "drop_me"

    # hash_function: each match replaced by its digest
    r2 = Redaction(allow_all_keys=True,
                   blocked_value_patterns=[r"4[0-9]{15}"],
                   hash_function="md5")
    out2 = r2.fn(pa.table({"cc": ["call 4111111111111111 now", "z"]}))
    want = hashlib.md5(b"4111111111111111").hexdigest()
    assert out2["cc"].to_pylist() == [f"call {want} now", "z"]

    # fail-closed allow list + bad configs raise
    import pytest as _pt
    with _pt.raises(ValueError, match="fails closed"):
        Redaction()
    with _pt.raises(ValueError, match="hash_function"):
        Redaction(allow_all_keys=True, hash_function="crc32")


def test_scope_name_parser(ray_session):
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.parse import ScopeNameParser

    t = pa.table({"logger": ["my.logger", None]})
    out = ScopeNameParser("logger").apply(ray.data.from_arrow(t)).to_pandas()
    assert list(out["scope_name"].fillna("-")) == ["my.logger", "-"]


def test_adjacent_edges_gate_parity(ray_session):
    """adjacent_edges_presorted: driver-merge path (below the edge
    gate) and distributed-groupby path (gate=0) must agree exactly."""
    from datetime import datetime, timedelta

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_contrib_ray.stages.servicegraph import (
        adjacent_edges_presorted,
    )

    T0 = datetime(2024, 1, 1)
    rows = []
    for c in range(8):
        conv = f"c{c:03d}"
        for i in range(9):
            role = "user" if i % 2 == 0 else "assistant"
            tool = ["search", "db", "llm", "edit"][i % 4]
            rows.append((conv, i, role, tool,
                         T0 + timedelta(seconds=c * 100 + 3 * i)))
    t = pa.table({"conv_id": pa.array([r[0] for r in rows]),
                  "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
                  "role": pa.array([r[2] for r in rows]),
                  "tool": pa.array([r[3] for r in rows]),
                  "ts": pa.array([r[4] for r in rows], pa.timestamp("us"))})
    # blocks cut mid-conversation to force boundary pairs
    blocks = [t.slice(0, 13), t.slice(13, 11), t.slice(24, 1),
              t.slice(25, 20), t.slice(45)]
    ds = rd.from_arrow(blocks)
    kw = dict(client_role="user", server_role="assistant",
              role_col="role", ts_col="ts", edge_dim="tool")
    a = adjacent_edges_presorted(ds, "conv_id", "turn_idx", **kw) \
        .to_pandas().sort_values("tool").reset_index(drop=True)
    b = adjacent_edges_presorted(ds, "conv_id", "turn_idx",
                                 broadcast_edge_limit=0, **kw) \
        .to_pandas().sort_values("tool").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a["n_calls"].sum() == 8 * 4  # 4 user->assistant pairs per conv


def test_service_graph_virtual_nodes(ray_session):
    """servicegraphconnector virtual-node feature gate goldens
    (testdata/virtual-node-label-{client,server}-*.yaml +
    extra-dimensions-queue-db peer resolution): an unpaired client
    span becomes an edge to the first-present peer attribute (else
    "unknown") with virtual_node=server; an unpaired ROOT server span
    becomes an edge from the virtual client "user" with
    virtual_node=client; non-root unpaired server spans drop like the
    reference's expired half-edges; paired spans keep latency."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.stages.servicegraph import (
        service_graph_edges_virtual,
    )

    t0 = pd.Timestamp("2025-02-09T16:00:00")
    client = ray.data.from_arrow(pa.table({
        "trace_id": pa.array(["t1", "t2", "t3"]),
        "span_id": pa.array(["a0", "b0", "c0"]),
        "svc": pa.array(["foo-server", "svcA", "db-caller"]),
        "peer.service": pa.array([None, None, None], pa.string()),
        "db.name": pa.array([None, None, "mydb"], pa.string()),
        "ts": pa.array([t0] * 3, pa.timestamp("us")),
    }))
    server = ray.data.from_arrow(pa.table({
        "trace_id": pa.array(["t2", "t9", "t8"]),
        "span_id": pa.array(["b0", "z0", "y0"]),
        "svc": pa.array(["svcB", "bar-requester", "ignored-nonroot"]),
        "is_root": pa.array([False, True, False]),
        "ts": pa.array([t0 + pd.Timedelta(microseconds=1500)] * 3, pa.timestamp("us")),
    }))
    out = service_graph_edges_virtual(
        client, server, ["trace_id", "span_id"],
        client_svc_col="svc", server_svc_col="svc",
        peer_attr_cols=["peer.service", "db.name"],
        server_is_root_col="is_root",
    ).to_pandas()
    rows = {(r["client"], r["server"], r["connection_type"], r["virtual_node"]):
            (int(r["n_calls"]), r["latency_us_sum"])
            for _, r in out.iterrows()}
    # virtual-node-label-server golden: unpaired client -> unknown
    assert rows[("foo-server", "unknown", "virtual_node", "server")][0] == 1
    # extra-dimensions flavor: peer attribute resolves the server name
    assert rows[("db-caller", "mydb", "virtual_node", "server")][0] == 1
    # virtual-node-label-client golden: unpaired root server -> "user"
    assert rows[("user", "bar-requester", "virtual_node", "client")][0] == 1
    # paired edge keeps latency; non-root unpaired server dropped
    n, lat = rows[("svcA", "svcB", "", "")]
    assert n == 1 and lat == 1500
    assert len(rows) == 4
