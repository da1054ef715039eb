"""Config-file front-end — stanza-style YAML operator chains.

The reference's filelog receiver wires its parse chain from a YAML
``operators:`` list (pkg/stanza/pipeline/config.go; e.g.
receiver/filelogreceiver/README.md examples). A reference user's
operator YAML maps directly onto this engine's stage registry
(stages/__init__.py — registry names intentionally match the stanza
``type:`` strings: regex_parser, json_parser, recombine, router, ...).

Extras on top of plain pass-through:
  * ``type: transform`` with ``statements:`` given as STRINGS parses
    them through the textual OTTL front-end (ottl.py) — the
    transformprocessor config shape;
  * unknown types raise with the known-type list (fail loud).
"""

from __future__ import annotations

from typing import Any, Callable

import ray.data

from ..stages import build_stage, registered_types


_STANZA_FIELD_PREFIXES = ("attributes.", "resource.", "body.")


def _stanza_field(name: str) -> str:
    """entry.Field -> flat column: the flat model stores attributes,
    resource fields and parsed body keys as top-level columns, so the
    stanza domain prefix drops (SURVEY §1.1 flattening note)."""
    for p in _STANZA_FIELD_PREFIXES:
        if name.startswith(p):
            return name[len(p):]
    return name


# stanza transformer operator -> one transform-statement editor
# (pkg/stanza/operator/transformer/{add,copy,move,remove,retain,
# flatten,unquote,sanitizeutf8,assignkeys}/config.go shapes), so a
# reference operator chain pastes unchanged
def _stanza_transformer_statement(cfg: dict[str, Any]) -> dict[str, Any] | None:
    t = cfg.get("type")
    f = _stanza_field
    if t == "add":
        v = cfg.get("value")
        if isinstance(v, str) and v.startswith("EXPR("):
            raise ValueError(
                "add with an EXPR() value: use a transform statement "
                "(set with an expression) — the flat loader keeps add "
                "literal-only")
        return {"editor": "set", "args": {"target": f(cfg["field"]), "value": v}}
    if t == "copy":
        return {"editor": "copy", "args": {"src": f(cfg["from"]), "dst": f(cfg["to"])}}
    if t == "move":
        return {"editor": "rename", "args": {"src": f(cfg["from"]), "dst": f(cfg["to"])}}
    if t == "remove":
        return {"editor": "delete_keys", "args": {"keys": [f(cfg["field"])]}}
    if t == "retain":
        return {"editor": "keep_keys",
                "args": {"keys": [f(x) for x in cfg["fields"]]}}
    if t == "flatten":
        return {"editor": "flatten", "args": {"src": f(cfg["field"])}}
    if t == "unquote":
        return {"editor": "unquote", "args": {"target": f(cfg["field"])}}
    if t == "sanitize_utf8":
        return {"editor": "sanitize_utf8", "args": {"target": f(cfg["field"])}}
    if t == "assign_keys":
        fld = f(cfg["field"])
        return {"editor": "assign_keys",
                "args": {"target": fld, "src": fld, "keys": cfg["keys"]}}
    return None


def _normalize(cfg: dict[str, Any]) -> Any:
    cfg = dict(cfg)
    stanza_stmt = _stanza_transformer_statement(cfg)
    if stanza_stmt is not None:
        return {"type": "transform", "statements": [stanza_stmt]}
    if cfg.get("type") == "transform":
        stmts = cfg.get("statements") or []
        if stmts and all(isinstance(s, str) for s in stmts):
            from ..ottl import parse_statements

            cfg["statements"] = parse_statements(stmts)
    elif cfg.get("type") == "router":
        # stanza router routes carry expr STRINGS (transformer/router):
        #   routes: [{expr: 'level == "ERROR"', sink: errors}]
        from ..ottl import parse_condition_text

        routes = []
        for r in cfg.get("routes") or []:
            r = dict(r)
            cond = r.pop("expr", None) or r.get("condition")
            if isinstance(cond, str):
                r["condition"] = parse_condition_text(cond)
            routes.append(r)
        cfg["routes"] = routes
    elif cfg.get("type") == "filter" and isinstance(cfg.get("condition"), str):
        from ..ottl import parse_condition_text

        cfg["condition"] = parse_condition_text(cfg["condition"])
    return cfg


def pipeline_from_config(operators: list[dict[str, Any]]) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    stages = [build_stage(_normalize(op)) for op in operators]

    def apply(ds: ray.data.Dataset) -> ray.data.Dataset:
        for s in stages:
            ds = s.apply(ds)
        return ds

    return apply


def logs_transform(operators: list[dict[str, Any]]) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """logstransformprocessor (processor/logstransformprocessor): run
    a stanza operator chain as a mid-pipeline processor. Identical to
    the receiver-side chain loader — the reference embeds the same
    stanza pipeline type; here both are ``pipeline_from_config``."""
    return pipeline_from_config(operators)


def pipeline_from_yaml(text_or_path: str) -> Callable[[ray.data.Dataset], ray.data.Dataset]:
    """Accepts YAML text or a path to a YAML file with either a
    top-level ``operators:`` list (stanza receiver shape) or a bare
    list of operator configs."""
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = yaml.safe_load(text_or_path)
    if isinstance(cfg, dict):
        operators = cfg.get("operators")
        if operators is None:
            raise ValueError(
                f"config must contain an 'operators:' list; got keys {sorted(cfg)}")
    elif isinstance(cfg, list):
        operators = cfg
    else:
        raise ValueError(f"config must be a mapping or list, got {type(cfg).__name__}")
    unknown = [op.get("type") for op in operators if op.get("type") not in registered_types()]
    if unknown:
        raise ValueError(f"unknown operator types {unknown}; known: {registered_types()}")
    return pipeline_from_config(operators)


# ----------------------------------------------------- collector config

def _base_type(name: str) -> str:
    """Collector component names are "type" or "type/instance"."""
    return name.split("/", 1)[0]


def _build_receiver(name: str, cfg: dict[str, Any]):
    """-> () -> ray.data.Dataset. Supported receivers:

    * ``filelog`` (receiver/filelogreceiver): include globs,
      encoding, multiline.line_start_pattern, header.pattern +
      header.metadata_regexes, and the stanza ``operators:`` chain —
      all mapped onto sources/rawtext + the operator registry;
    * ``parquet`` (engine-native): {path} -> read_parquet — the
      flat-table analog of OTLP ingest for data already columnar.
    """
    from ..sources import rawtext

    t = _base_type(name)
    if t == "parquet":
        path = cfg["path"]
        cols = cfg.get("columns")  # prune at the read — only the
        # named columns leave storage
        return lambda: ray.data.read_parquet(path, columns=cols)
    if t != "filelog":
        raise ValueError(f"unsupported receiver {name!r}; "
                         "supported: filelog, parquet")
    include = cfg.get("include")
    if not include:
        raise ValueError("filelog receiver requires 'include'")
    paths: list[str] = []
    import glob as _glob

    for pat in include:
        paths.extend(sorted(_glob.glob(pat)))
    # fileconsumer matcher exclude globs (filelogreceiver README):
    # files matched by include are dropped when any exclude matches
    excluded: set[str] = set()
    for pat in cfg.get("exclude") or []:
        excluded.update(_glob.glob(pat))
    if excluded:
        paths = [p for p in paths if p not in excluded]
    if not paths:
        raise ValueError(f"filelog include matched no files: {include}")
    encoding = cfg.get("encoding", "utf-8")
    multiline = cfg.get("multiline") or {}
    header = cfg.get("header") or {}

    def read() -> ray.data.Dataset:
        if header:
            ds = rawtext.read_log_lines_with_header(
                paths, header["pattern"],
                header.get("metadata_regexes")
                or [op.get("regex") for op in
                    header.get("metadata_operators", [])],
                encoding=encoding,
                attr_keys=header.get("attr_keys"))
        elif multiline.get("line_start_pattern"):
            ds = rawtext.read_multiline_entries(
                paths, multiline["line_start_pattern"], encoding=encoding)
        else:
            ds = rawtext.read_log_lines(paths, encoding=encoding)
        ops = cfg.get("operators")
        if ops:
            ds = pipeline_from_config(ops)(ds)
        return ds

    return read


class _Chain:
    """Wrap a ds->ds callable in the .apply() stage shape."""

    def __init__(self, apply_fn):
        self.apply = apply_fn


def _build_processor(name: str, cfg: dict[str, Any]):
    """-> stage with .apply(). Supported processor types: transform,
    filter, attributes, resource, redaction, probabilistic_sampler,
    logstransform (each the engine stage documented in SURVEY §2.4)."""
    t = _base_type(name)
    if t == "transform":
        from ..ottl import transform_from_ottl

        stmts: list[str] = []
        # the flat table model makes log/trace/metric contexts the
        # same surface — accept all three statement sections
        for section in ("log_statements", "trace_statements",
                        "metric_statements"):
            for grp in cfg.get(section, []):
                if isinstance(grp, str):
                    stmts.append(grp)
                else:
                    stmts.extend(grp.get("statements", []))
        return transform_from_ottl(stmts,
                                   error_mode=cfg.get("error_mode", "ignore"))
    if t == "filter":
        from ..ottl import parse_condition_text
        from ..stages.transform import FilterStage

        lcfg = cfg.get("logs") or cfg.get("metrics") or cfg.get("traces") or {}
        if "include" in lcfg or "exclude" in lcfg:
            # legacy match_properties shape (internal/filter/
            # filterlog/filterlog.go NewSkipExpr): skip = NOT(include
            # match) OR exclude match — include checked first; see
            # _legacy_log_match for the per-group semantics
            drop = None
            if lcfg.get("include"):
                drop = ("not", _legacy_log_match(lcfg["include"]))
            if lcfg.get("exclude"):
                e = _legacy_log_match(lcfg["exclude"])
                drop = e if drop is None else ("or", drop, e)
            return FilterStage(drop, mode="drop")
        cond_strs = (lcfg.get("log_record", [])
                     + cfg.get("traces", {}).get("span", [])
                     + cfg.get("metrics", {}).get("datapoint", []))
        conds = [parse_condition_text(c) for c in cond_strs]
        if not conds:
            raise ValueError("filter processor requires logs.log_record "
                             "or logs.include/exclude")
        cond = conds[0]
        for c in conds[1:]:  # filterprocessor ORs its conditions
            cond = ("or", cond, c)
        return FilterStage(cond, mode="drop")
    if t in ("attributes", "resource"):
        from ..stages.attributes import AttributesProcessor

        # processor-level include/exclude gate (attributesprocessor
        # config.go:23 embeds MatchConfig): actions touch only records
        # that match include AND do not match exclude
        return AttributesProcessor(cfg["actions"],
                                   match_condition=_match_config_gate(cfg))
    if t == "redaction":
        from ..stages.attributes import Redaction

        return Redaction(cfg.get("allowed_keys"),
                         blocked_value_patterns=cfg.get("blocked_values"),
                         mask=cfg.get("mask", "****"),
                         allow_all_keys=cfg.get("allow_all_keys", False),
                         blocked_key_patterns=cfg.get("blocked_key_patterns"),
                         ignored_keys=cfg.get("ignored_keys"),
                         ignored_key_patterns=cfg.get("ignored_key_patterns"),
                         allowed_values=cfg.get("allowed_values"),
                         hash_function=cfg.get("hash_function", ""),
                         summary=cfg.get("summary", "silent"))
    if t == "probabilistic_sampler":
        # config.go:34-76: mode hash_seed (default) | proportional |
        # equalizing — the consistent OTEP-235 modes take the sampling
        # randomness from a trace-id-like column
        mode = cfg.get("mode", "hash_seed")
        if mode == "hash_seed":
            from ..stages.sample import ProbabilisticSampler

            return ProbabilisticSampler(cfg["sampling_percentage"],
                                        key=cfg["from_attribute"],
                                        hash_seed=cfg.get("hash_seed", 0))
        from ..stages.sample import ConsistentSampler

        return ConsistentSampler(
            mode, cfg["sampling_percentage"],
            randomness_src=cfg.get("from_attribute", "trace_id"),
            fail_closed=cfg.get("fail_closed", False),
            priority_src=cfg.get("sampling_priority"))
    if t == "logstransform":
        return _Chain(logs_transform(cfg["operators"]))
    if t in ("batch", "memory_limiter"):
        # explicit NO-OPs (documented): batching is the Ray Data
        # streaming executor's job (block sizing / backpressure) and
        # memory limiting is the object-store spill policy — accepting
        # these keeps real collector configs paste-able
        return _Chain(lambda ds: ds)
    if t == "logdedup":
        from ..stages.dedup import dedup_windowed

        return _Chain(lambda ds: dedup_windowed(
            ds, cfg["id_field"], cfg["ts_field"],
            exclude_fields=cfg.get("exclude_fields"),
            window=cfg.get("interval", "hour")))
    if t == "groupbyattrs":
        from ..stages.reshape import group_by_attrs

        return _Chain(lambda ds: group_by_attrs(ds, cfg["keys"]))
    if t in ("cumulativetodelta", "deltatocumulative", "deltatorate"):
        from ..stages import scan

        fn = {"cumulativetodelta": scan.keyed_delta,
              "deltatocumulative": scan.keyed_cumsum,
              "deltatorate": scan.keyed_rate}[t]
        return _Chain(lambda ds: fn(
            ds, cfg["key_field"], cfg.get("ts_field", "ts"),
            cfg["value_field"]))
    if t == "cardinality_guardian":
        from ..stages.cardinality import cardinality_guard

        return _Chain(lambda ds: cardinality_guard(
            ds, cfg["field"], cfg["max_values"],
            overflow_value=cfg.get("overflow_value", "__overflow__")))
    if t == "genai":
        from ..stages.genai import genai_normalizer

        return genai_normalizer(cfg["sources"])
    if t == "resourcedetection":
        from ..stages.resourcedetect import apply_resource, detect_resource

        resource = detect_resource(cfg.get("detectors", ["env"]))
        return _Chain(lambda ds: apply_resource(
            ds, resource, override=cfg.get("override", False)))
    if t == "schema":
        # schemaprocessor: versioned rename chain (the flat-model
        # subset of OTel schema-file changesets)
        from ..stages.schema import SchemaTranslation, schema_convert

        tr = SchemaTranslation(family=cfg.get("family", "default"),
                               versions=cfg["versions"],
                               metric_versions=cfg.get("metric_versions") or {})
        return _Chain(lambda ds: schema_convert(
            ds, tr, source=cfg["source"], target=cfg["target"],
            migrate_from=cfg.get("migrate_from"),
            metric_name_col=cfg.get("metric_name_column", "metric")))
    if t == "metricstarttime":
        from ..stages.starttime import metric_start_time

        return _Chain(lambda ds: metric_start_time(
            ds, cfg["key_fields"], cfg.get("ts_field", "ts"),
            cfg["value_field"],
            strategy=cfg.get("strategy", "true_reset_point")))
    if t == "metricsgeneration":
        # metricsgenerationprocessor 'calculate': new = m1 <op> m2
        from ..stages.transform import TransformStage

        from ..expr import Col

        ops = {"add": "add", "subtract": "sub", "multiply": "mul",
               "divide": "div"}
        stmts = []
        for r in cfg.get("rules", []):
            if r.get("type", "calculate") != "calculate":
                raise ValueError(
                    "metricsgeneration loader subset supports "
                    f"type: calculate only (got {r.get('type')!r})")
            stmts.append({"editor": "arith",
                          "args": {"target": r["name"],
                                   "op": ops[r["operation"]],
                                   "a": Col(r["metric1"]),
                                   "b": Col(r["metric2"])}})
        return TransformStage(stmts, error_mode="ignore")
    if t == "interval":
        from ..stages.window import last_value_per_window

        return _Chain(lambda ds: last_value_per_window(
            ds, cfg["key_fields"], cfg.get("ts_field", "ts"),
            cfg["value_field"], window=cfg.get("interval", "hour")))
    if t == "metricstransform":
        from ..stages.aggregate import aggregate_labels

        action = cfg.get("action", "aggregate_labels")
        if action != "aggregate_labels":
            raise ValueError(
                "metricstransform loader subset supports "
                f"aggregate_labels only (got {action!r})")
        return _Chain(lambda ds: aggregate_labels(
            ds, cfg["label_set"], cfg["value_field"],
            aggregation_type=cfg.get("aggregation_type", "sum")))
    if t == "tail_sampling":
        from ..stages.tailpolicy import tail_sample_policies

        pols = [_translate_tail_policy(p) for p in cfg["policies"]]
        return _Chain(lambda ds: tail_sample_policies(
            ds, cfg.get("group_key", "trace_id"),
            cfg.get("ts_field", "ts"), pols))
    if t == "lookup":
        # processor/lookupprocessor (processor.go:46; README config):
        # source + ordered lookups, silent miss unless a default is
        # given. Flat-model subset: source.type parquet|csv|inline,
        # lookup key = a stream column (OTTL attributes["k"] paths
        # reduce to the column name), destination columns renamed from
        # the source table's value columns.
        from ..stages.enrich import LookupEnrich

        src = cfg["source"]
        tbl = _load_table_source(src)
        key_column = src.get("key_column", "key")
        stages = []
        for lk in cfg["lookups"]:
            key_col = _ottl_path_to_column(lk["key"])
            fields: dict[str, Any] = {}
            renames: dict[str, str] = {key_column: "key"}
            for a in lk["attributes"]:
                dest = a["destination"]
                renames[a.get("source_column", dest)] = dest
                fields[dest] = a.get("default")
            lt = tbl.rename_columns(
                [renames.get(c, c) for c in tbl.column_names])
            stages.append(LookupEnrich(
                lt.select(["key", *fields]), [key_col], fields))

        def apply_lookups(ds, stages=stages):
            for s in stages:
                ds = s.apply(ds)
            return ds
        return _Chain(apply_lookups)
    if t == "geoip":
        # processor/geoipprocessor README shape (providers + context +
        # attributes); the concrete provider here is the engine's
        # file-backed CIDR table (stages/geoip.py) rather than a
        # MaxMind mmdb: providers.cidr_file.database_path points at a
        # parquet/csv with a `cidr` column + payload columns.
        from ..stages.geoip import cidr_to_ranges, geoip_enrich

        prov = cfg.get("providers") or {}
        if "cidr_file" not in prov:
            raise ValueError(
                "geoip loader requires providers.cidr_file.database_path "
                "(file-backed CIDR provider; maxmind mmdb is out of scope)")
        db = _load_table_source(prov["cidr_file"],
                                path_key="database_path")
        ranges = cidr_to_ranges(db)
        attrs = cfg.get("attributes") or ["client.address"]
        ip_col = attrs[0]  # loader subset: first attribute is the IP col
        payload = cfg.get("payload_columns") or [
            c for c in db.column_names if c != "cidr"]
        return _Chain(lambda ds: geoip_enrich(ds, ip_col, ranges, payload))
    if t == "unroll":
        # processor/unrollprocessor (processor.go:37-56): one row per
        # list element, parent fields repeated. The flat model names
        # the column explicitly (`field`); recursive nesting is out of
        # scope and fails loud like the rest of the loader.
        from ..stages.reshape import unroll

        if cfg.get("recursive"):
            raise ValueError("unroll loader subset: recursive: true is "
                             "not supported (flat lists only)")
        return _Chain(lambda ds: unroll(
            ds, cfg["field"], out_col=cfg.get("out_field"),
            split_pattern=cfg.get("split_pattern"),
            keep_cols=cfg.get("keep_cols")))
    if t == "span":
        # processor/spanprocessor (span.go:121; README name/status
        # shape). `status.where` is an engine extension: the flat
        # model applies set-status behind an OTTL condition.
        from ..ottl import parse_condition_text
        from ..stages.spanrename import SpanProcessor

        nm = cfg.get("name") or {}
        ta = nm.get("to_attributes") or {}
        st = cfg.get("status") or {}
        return SpanProcessor(
            name_col=cfg.get("name_column", "name"),
            from_attributes=nm.get("from_attributes"),
            separator=nm.get("separator", ""),
            to_attributes=ta.get("rules"),
            keep_original_name=ta.get("keep_original_name", False),
            break_after_match=ta.get("break_after_match", False),
            status_code=st.get("code"),
            status_description=st.get("description", ""),
            status_where=(parse_condition_text(st["where"])
                          if st.get("where") else None),
            match_condition=_match_config_gate(cfg))
    if t == "drain":
        # processor/drainprocessor README (merge_threshold,
        # masking_rules, body_field, template_attribute). Default =
        # the reference's per-record CLUSTER template via two-pass
        # Drain (stages/templates.assign_templates: distributed mine,
        # broadcast final templates, vectorized tag); mode: masking
        # keeps the cheaper single-pass masked-text column.
        masks = [(r["pattern"], r["replacement"])
                 for r in cfg.get("masking_rules", [])] or None
        body = cfg.get("body_field") or "text"
        attr = cfg.get("template_attribute", "log.record.template")
        if cfg.get("mode", "drain") == "masking":
            from ..stages.templates import add_template_column

            return _Chain(lambda ds: add_template_column(
                ds, text_col=body, out=attr, masks=masks))
        from ..stages.templates import assign_templates

        return _Chain(lambda ds: assign_templates(
            ds, text_col=body, out=attr,
            sim_threshold=cfg.get("merge_threshold", 0.5), masks=masks))
    if t == "dynamic_sampling":
        # processor/dynamicsamplingprocessor README rules shape:
        # ordered first-match rules, each with OTTL conditions and a
        # sampler. trace_timeout/decision_delay/num_traces vanish on a
        # finite table (group completeness is exact, SURVEY §2.5).
        from ..ottl import parse_condition_text
        from ..stages.dynsample import SamplingRule, dynamic_sample

        rules = []
        for r in cfg["rules"]:
            s = r.get("sampler") or {"type": "always_sample"}
            stype = s.get("type", "always_sample")
            if stype == "always_sample":
                sampler, rate, target = "deterministic", 1, 0
            elif stype in ("probabilistic", "deterministic"):
                pct = s.get("sampling_percentage")
                rate = (max(1, int(round(100.0 / pct))) if pct
                        else int(s.get("rate", 1)))
                sampler, target = "deterministic", 0
            elif stype in ("throughput", "ema_dynamic"):
                sampler, rate = "throughput", 1
                target = int(s.get("goal_traces")
                             or s.get("target_keep", 0))
            else:
                raise ValueError(f"unknown sampler type {stype!r}")
            rules.append(SamplingRule(
                name=r["name"],
                conditions=[parse_condition_text(c)
                            for c in r.get("conditions", [])],
                sampler=sampler, rate=rate, target_keep=target))
        return _Chain(lambda ds: dynamic_sample(
            ds, cfg.get("trace_key", "trace_id"), rules,
            seed=cfg.get("hash_seed", 0),
            strategy=cfg.get("strategy", "broadcast")))
    if t == "k8sattributes":
        # processor/k8sattributesprocessor README shape
        # (pod_association + extract.metadata/labels/annotations); the
        # watcher becomes a file-backed pod snapshot table
        # (stages/k8sattributes.py module docstring).
        from ..stages.k8sattributes import K8sAttributes

        snap = _load_table_source(cfg["snapshot"])
        ex = cfg.get("extract") or {}
        return K8sAttributes(
            snap,
            pod_association=cfg.get("pod_association"),
            metadata=ex.get("metadata"),
            labels=ex.get("labels"),
            annotations=ex.get("annotations"))
    if t == "aws_ecs_attributes":
        # processor/awsecsattributesprocessor README shape
        # (container_id.sources + attributes regex allowlist +
        # cache_ttl); the Docker/ECS-endpoint metadata cache becomes a
        # file-backed container snapshot table (stages/awsecs.py
        # module docstring).
        from ..stages.awsecs import AwsEcsAttributes

        snap = _load_table_source(cfg["snapshot"])
        return AwsEcsAttributes(
            snap,
            sources=(cfg.get("container_id") or {}).get("sources") or [],
            attributes=cfg.get("attributes"),
            cache_ttl=int(cfg.get("cache_ttl", 300)))
    if t == "groupbytrace":
        # processor/groupbytraceprocessor: buffer and re-emit all spans
        # of one trace together. Finite-table analog: cluster the
        # stream by trace key (a range sort makes every trace
        # contiguous within blocks); wait_duration/num_traces are
        # buffering knobs with no finite-table meaning and are accepted
        # but ignored.
        key = cfg.get("trace_key", "trace_id")
        return _Chain(lambda ds: ds.sort([key]))
    raise ValueError(
        f"unsupported processor {name!r}; supported: transform, filter, "
        "attributes, resource, redaction, probabilistic_sampler, "
        "logstransform, logdedup, groupbyattrs, cumulativetodelta, "
        "deltatocumulative, deltatorate, interval, metricstransform, "
        "cardinality_guardian, genai, metricstarttime, metricsgeneration, "
        "schema, resourcedetection, lookup, geoip, unroll, span, drain, "
        "dynamic_sampling, groupbytrace, k8sattributes, "
        "aws_ecs_attributes, "
        "tail_sampling, batch (no-op), "
        "memory_limiter (no-op)")


def _match_config_gate(cfg: dict[str, Any]):
    """The embedded MatchConfig gate shared by the attributes and span
    processors (filterconfig.MatchConfig): None when neither include
    nor exclude is configured, else the predicate
    include-match AND NOT exclude-match."""
    match = None
    if cfg.get("include"):
        match = _legacy_log_match(cfg["include"])
    if cfg.get("exclude"):
        e = ("not", _legacy_log_match(cfg["exclude"]))
        match = e if match is None else ("and", match, e)
    return match


def _legacy_log_match(props: dict[str, Any]):
    """Legacy filterprocessor match_properties -> predicate spec.

    Semantics (internal/filter/filterlog/filterlog.go Eval +
    filtermatcher/attributematcher.go:84-110): ALL configured groups
    must match; within ``log_bodies`` / ``log_severity_texts`` ANY
    entry matches (filterset OR); each listed resource/record
    attribute must be PRESENT and match (an absent key never matches);
    ``log_severity_number`` matches severity >= min, with
    ``match_undefined`` deciding undefined (0/null) severities.
    ``match_type`` strict = exact equality, regexp = RE2 (applied to
    string values; non-string exact values always compare equal-typed,
    attributematcher.go:104-109). The flattened columnar model reads
    resource and record attributes from the same row."""
    from ..expr import col as _c
    from ..functions.severity import SEVERITY_NUMBER

    mt = props.get("match_type", "strict")

    def one(colname, v):
        if mt == "regexp" and isinstance(v, str):
            return ("match", _c(colname), v)
        return ("==", _c(colname), v)

    def any_of(colname, values):
        p = one(colname, values[0])
        for v in values[1:]:
            p = ("or", p, one(colname, v))
        return p

    groups = []
    # span-side properties (filterconfig: Services match
    # resource.attributes["service.name"], SpanNames the span name) —
    # flat-model column defaults
    if props.get("span_names"):
        groups.append(any_of("name", props["span_names"]))
    if props.get("services"):
        groups.append(any_of("service.name", props["services"]))
    if props.get("metric_names"):  # filterconfig.go:102-105
        groups.append(any_of("metric", props["metric_names"]))
    if props.get("log_bodies"):
        groups.append(any_of("body", props["log_bodies"]))
    if props.get("log_severity_texts"):
        groups.append(any_of("severity_text", props["log_severity_texts"]))
    sn = props.get("log_severity_number")
    if sn:
        min_v = sn.get("min", "TRACE")
        min_num = (int(min_v) if isinstance(min_v, int)
                   else SEVERITY_NUMBER[str(min_v).upper()])
        p = (">=", _c("severity_number"), min_num)
        if sn.get("match_undefined"):
            p = ("or", p, ("or", ("is_null", _c("severity_number")),
                           ("==", _c("severity_number"), 0)))
        groups.append(p)
    for key in ("resource_attributes", "record_attributes", "attributes"):
        for a in props.get(key) or []:
            groups.append(one(a["key"], a.get("value")))
    if not groups:
        raise ValueError(
            'at least one of "log_bodies", "log_severity_texts", '
            '"log_severity_number", "resource_attributes" or '
            '"record_attributes" must be specified')  # config.go:131
    pred = groups[0]
    for g in groups[1:]:
        pred = ("and", pred, g)
    return pred


def _load_table_source(src: dict[str, Any], path_key: str = "path"):
    """A small-side table for lookup/geoip providers: parquet or csv
    by file extension, or inline ``rows:`` (a column->values mapping,
    the test-friendly shape)."""
    import pyarrow as pa

    if "rows" in src:
        return pa.table(src["rows"])
    path = src[path_key]
    if str(path).endswith(".csv"):
        from pyarrow import csv as pacsv

        return pacsv.read_csv(path)
    import pyarrow.parquet as pq

    return pq.read_table(path)


def _ottl_path_to_column(key: str) -> str:
    """Reduce the lookupprocessor's OTTL key paths to flat columns:
    log.attributes["user.id"] / span.attributes["x"] /
    resource.attributes["x"] -> the quoted name; bare names pass
    through."""
    import re

    m = re.match(r'^(?:log|span|datapoint|resource)\.attributes\["([^"]+)"\]$',
                 key)
    if m:
        return m.group(1)
    m = re.match(r'^attributes\["([^"]+)"\]$', key)
    if m:
        return m.group(1)
    return key


def _translate_tail_policy(p: dict) -> dict:
    """tailsamplingprocessor policy YAML ({name, type, <type>: {...}},
    config.go:312-330) -> the engine's flat policy dicts
    (stages/tailpolicy module docstring). ``rate_allocation`` percent
    entries translate to per-sub max_spans_per_second against the
    composite's max_total_spans_per_second."""
    t = p["type"]
    body = p.get(t)
    if body is None:
        body = {k: v for k, v in p.items() if k not in ("name", "type")}
    out = {"type": t}
    if t == "and":
        subs = body.get("and_sub_policy") or body.get("sub_policies") or []
        out["sub_policies"] = [_translate_tail_policy(s) for s in subs]
    elif t == "composite":
        subs = body.get("composite_sub_policy") or body.get("sub_policies") or []
        out["sub_policies"] = [_translate_tail_policy(s) for s in subs]
        total = body.get("max_total_spans_per_second")
        if total is not None:
            out["max_total_spans_per_second"] = total
        for alloc in body.get("rate_allocation", []):
            for s, ts in zip(subs, out["sub_policies"]):
                if s.get("name") == alloc["policy"]:
                    ts["max_spans_per_second"] = int(
                        total * alloc["percent"] / 100)
    elif t == "drop":
        subs = body.get("drop_sub_policy") or []
        if "sub_policy" in body:
            subs = [body["sub_policy"]]
        ts = [_translate_tail_policy(s) for s in subs]
        out["sub_policy"] = (ts[0] if len(ts) == 1
                             else {"type": "and", "sub_policies": ts})
    else:
        out.update(body)
    return out


def _build_exporter(name: str, cfg: dict[str, Any]):
    """-> (ds) -> output path. ``file`` (fileexporter analog) writes
    partitioned Parquet under ``path`` — the engine-native sink format
    (the reference writes JSON/proto lines; Parquet is the columnar
    equivalent and what every reader stage here consumes).
    ``awss3`` mirrors exporter/awss3exporter/config.go:27-101."""
    t = _base_type(name)
    if t == "awss3":
        return _build_awss3_exporter(cfg)
    if t != "file":
        raise ValueError(f"unsupported exporter {name!r}; "
                         "supported: file, awss3")
    path = cfg["path"]
    fmt = cfg.get("format", "parquet")
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported file exporter format {fmt!r}")

    partition_by = cfg.get("partition_by")

    def write(ds: ray.data.Dataset) -> str:
        if fmt == "json":
            # the reference fileexporter's JSON-lines shape
            ds.write_json(path)
        elif partition_by:
            # hive-partitioned output: resumable / prunable sinks
            ds.write_parquet(path, partition_cols=partition_by)
        else:
            ds.write_parquet(path)
        return path

    return write


def _build_awss3_exporter(cfg: dict[str, Any]):
    """awss3exporter (exporter/awss3exporter/config.go:27-101):
    s3uploader.{s3_bucket, s3_base_prefix, s3_prefix,
    s3_partition_format (strftime), file_prefix, compression,
    endpoint} + marshaler. ONE writer code path for every
    destination: the object key is
    ``<base>/<base_prefix>/<prefix>/<strftime partition>/`` where
    ``<base>`` is ``s3://<bucket>`` — or, when ``endpoint`` is a
    ``file://`` URI (the reference uses endpoint for
    S3-compatible/localstack targets), that local root standing in
    for the bucket, which exercises the full marshal+partition path
    without AWS. Marshalers: ``parquet`` (engine-native) and
    ``otlp_json`` (JSON lines, the reference's OtlpJSON); others fail
    loud. ``partition_time`` (ISO string, engine extension) pins the
    strftime partition for deterministic tests; default is upload
    time (UTC when s3_partition_timezone is UTC, reference default
    Local)."""
    import datetime as _dt
    import os as _os

    up = cfg.get("s3uploader") or {}
    bucket = up["s3_bucket"]
    endpoint = up.get("endpoint", "")
    if endpoint.startswith("file://"):
        base = _os.path.join(endpoint[len("file://"):], bucket)
    elif endpoint:
        raise ValueError(
            f"unsupported awss3 endpoint {endpoint!r} (s3-compatible "
            "HTTP endpoints need network; use file:// or omit)")
    else:
        base = f"s3://{bucket}"
    parts = [p for p in (up.get("s3_base_prefix", ""),
                         up.get("s3_prefix", "")) if p]
    fmt = up.get("s3_partition_format")
    if fmt:
        when = cfg.get("partition_time")
        if when is not None:
            ts = _dt.datetime.fromisoformat(when)
        elif up.get("s3_partition_timezone", "").upper() == "UTC":
            ts = _dt.datetime.now(_dt.timezone.utc)
        else:
            ts = _dt.datetime.now()
        parts.append(ts.strftime(fmt))
    path = "/".join([base] + parts)
    marshaler = cfg.get("marshaler", "parquet")
    if marshaler not in ("parquet", "otlp_json"):
        raise ValueError(
            f"unsupported marshaler {marshaler!r}; supported: parquet, "
            "otlp_json (otlp_proto/sumo_ic/body are out of scope)")
    compression = up.get("compression") or "zstd"
    file_prefix = up.get("file_prefix", "")

    filename_provider = None
    if file_prefix:
        from ray.data.datasource import FilenameProvider

        class _Prefixed(FilenameProvider):
            def __init__(self, prefix: str, ext: str):
                self._p, self._e = prefix, ext

            def get_filename_for_block(self, block, write_uuid,
                                       task_index, block_index) -> str:
                return (f"{self._p}{write_uuid}_{task_index:06}_"
                        f"{block_index:06}.{self._e}")

        filename_provider = _Prefixed(
            file_prefix, "json" if marshaler == "otlp_json" else "parquet")

    def write(ds: ray.data.Dataset) -> str:
        if marshaler == "otlp_json":
            ds.write_json(path, filename_provider=filename_provider)
        else:
            ds.write_parquet(path, compression=compression,
                             filename_provider=filename_provider)
        return path

    return write


class CollectorPipeline:
    """One service.pipelines.logs entry, compiled to a runnable."""

    def __init__(self, readers, stages, writers):
        self._readers = readers
        self._stages = stages
        self._writers = writers

    def dataset(self) -> ray.data.Dataset:
        """The composed (lazy) stream, before exporters."""
        ds = self._readers[0]()
        for r in self._readers[1:]:
            ds = ds.union(r())
        for s in self._stages:
            ds = s.apply(ds)
        return ds

    def run(self, manifest_root: str | None = None) -> dict[str, str]:
        """Execute and write every exporter; returns name -> path.

        With ``manifest_root``, each exporter commits a lineage entry
        (rows written, wall seconds, output path) to the same atomic
        per-key manifest the flagship uses (state/manifest.py) — and a
        rerun SKIPS exporters whose entries are already committed, the
        per-pipeline resume analog of the flagship's partition skip."""
        import time as _time

        man = None
        if manifest_root is not None:
            from ..state.manifest import Manifest

            man = Manifest(manifest_root)
        ds = self.dataset()
        out: dict[str, str] = {}
        for name, w in self._writers:
            if man is not None and man.is_done(f"exporter:{name}"):
                out[name] = man.entry(f"exporter:{name}")["output"]
                continue
            t0 = _time.perf_counter()
            path = w(ds)
            out[name] = path
            if man is not None:
                rows = None
                try:
                    import glob as _g

                    import pyarrow.parquet as _pq

                    rows = sum(_pq.read_metadata(f).num_rows
                               for f in _g.glob(path + "/**/*.parquet",
                                                recursive=True))
                except Exception:
                    pass
                man.commit(f"exporter:{name}", output=path, metrics={
                    "wall_s": round(_time.perf_counter() - t0, 3),
                    "rows": rows})
        return out


def collector_from_yaml(text_or_path: str) -> dict[str, CollectorPipeline]:
    """An opentelemetry-collector style service config -> runnable
    pipelines. Supported shape (a meaningful subset of the reference's
    config surface; anything else fails loud with the supported list):

    receivers: filelog (include/encoding/multiline/header/operators),
    parquet; processors: transform / filter / attributes / resource /
    redaction / probabilistic_sampler / logstransform; exporters:
    file (Parquet); service.pipelines.<name>: {receivers, processors,
    exporters}.
    """
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            cfg = yaml.safe_load(f)
    else:
        cfg = yaml.safe_load(text_or_path)

    receivers = cfg.get("receivers") or {}
    processors = cfg.get("processors") or {}
    exporters = cfg.get("exporters") or {}
    connectors = cfg.get("connectors") or {}
    pipelines = (cfg.get("service") or {}).get("pipelines") or {}
    if not pipelines:
        raise ValueError("config requires service.pipelines")

    # routing connector (connector/routingconnector): a component that
    # is an EXPORTER of one pipeline and a RECEIVER of others. The
    # upstream pipeline's stream gets a Router stage (ordered
    # condition table -> `sink` column = target pipeline name); each
    # downstream pipeline reads its slice. Downstream branches filter
    # the shared lazy stream independently (each branch re-executes
    # the upstream read — for a single fused write of all sinks use
    # pipelines/flagship's write-audit-publish path instead).
    routing_sources: dict[str, Any] = {}
    rr_index: dict[tuple[str, str], int] = {}
    rr_cache: dict[str, list] = {}

    def _routing_reader(conn_name: str, pipe_name: str):
        if _base_type(conn_name) in (
                "count", "sum", "spanmetrics", "exceptions", "servicegraph",
                "signaltometrics", "signal_to_metrics", "slowsql",
                "metricsaslogs", "otlpjson"):
            return lambda: routing_sources[conn_name]()
        if _base_type(conn_name) == "roundrobin":
            from ..stages.reshape import round_robin

            n = sum(1 for k in rr_index if k[0] == conn_name)

            def read_rr() -> ray.data.Dataset:
                if conn_name not in rr_cache:
                    rr_cache[conn_name] = round_robin(
                        routing_sources[conn_name](), n)
                return rr_cache[conn_name][rr_index[(conn_name, pipe_name)]]
            return read_rr

        def read() -> ray.data.Dataset:
            import pyarrow.compute as _pc

            ds = routing_sources[conn_name]()
            return ds.map_batches(
                lambda b: b.filter(
                    _pc.equal(b["sink"], pipe_name)).drop_columns(["sink"]),
                batch_format="pyarrow", zero_copy_batch=True,
                batch_size=None)
        return read

    out: dict[str, CollectorPipeline] = {}
    # first pass: pipelines that EXPORT to a routing connector define
    # that connector's source stream
    for pname, p in pipelines.items():
        routed = [e for e in p.get("exporters", []) if e in connectors]
        for conn in routed:
            ccfg = connectors[conn]
            if _base_type(conn) == "roundrobin":
                # roundrobinconnector: split the upstream stream evenly
                # across its downstream pipelines (YAML order). The
                # split materializes once (cached) so each branch does
                # not recompute the upstream.
                downstream = [q for q, qq in pipelines.items()
                              if conn in qq.get("receivers", [])]
                for i, q in enumerate(downstream):
                    rr_index[(conn, q)] = i

                def make_rr_source(p=p, n=len(downstream)):
                    def src() -> ray.data.Dataset:
                        return _compose(p)
                    return src
                routing_sources[conn] = make_rr_source()
                continue
            if _base_type(conn) == "exceptions":
                # connector/exceptionsconnector: count exception-shaped
                # rows per dimension set in the downstream pipeline
                from ..ottl import parse_condition_text as _pct2
                from ..stages.exceptions import exception_metrics

                cond = _pct2(ccfg["condition"])
                dims = [(d["name"], d.get("default"))
                        for d in ccfg.get("dimensions", [])]

                def make_exc_source(p=p, cond=cond, dims=dims):
                    def src() -> ray.data.Dataset:
                        return exception_metrics(_compose(p),
                                                 condition=cond, dims=dims)
                    return src
                routing_sources[conn] = make_exc_source()
                continue
            if _base_type(conn) == "spanmetrics":
                # connector/spanmetricsconnector (config.go:43-121):
                # explicit-bounds duration histogram per dimension set.
                # Loader subset: histogram buckets + call counts per
                # dimensions over a duration column.
                import numpy as _np

                from ..stages.aggregate import grouped_count_sum

                dims = [d["name"] for d in ccfg.get("dimensions", [])]
                dur_col = ccfg.get("duration_column", "dur")
                bounds = ccfg.get("histogram", {}).get("explicit", {})                     .get("buckets") or [2, 4, 6, 8, 10, 50, 100, 250,
                                        500, 1000]
                bounds = [float(x) for x in bounds]

                def make_span_source(p=p, dims=dims, dur_col=dur_col,
                                     bounds=bounds):
                    def _bucketize(b):
                        import pyarrow as _pa

                        dur = b[dur_col].to_numpy(zero_copy_only=False)
                        idx = _np.digitize(dur, bounds, right=True)
                        return b.append_column(
                            "bucket", _pa.array(idx.astype("int64")))

                    def src() -> ray.data.Dataset:
                        ds = _compose(p).map_batches(
                            _bucketize, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
                        return grouped_count_sum(
                            ds, dims + ["bucket"],
                            sum_cols={dur_col: "duration_sum"},
                            count_name="call_count")
                    return src
                routing_sources[conn] = make_span_source()
                continue
            if _base_type(conn) in ("count", "sum"):
                # count/sum connector (connector/countconnector
                # config.go:20-64): consume the upstream stream, emit
                # the grouped metric table to the downstream pipeline.
                # Loader subset: one metric definition per connector.
                defs = ccfg.get("logs") or ccfg.get("spans") or {}
                if len(defs) != 1:
                    raise ValueError(
                        "count/sum connectors support exactly one metric "
                        f"definition in this loader (got {sorted(defs)})")
                from ..ottl import parse_condition_text as _pct
                from ..stages.aggregate import MetricDef, run_metric_def

                (mname, mc), = defs.items()
                d = MetricDef(
                    name=mname,
                    agg=_base_type(conn),
                    source=mc.get("source_attribute"),
                    conditions=[_pct(c) for c in mc.get("conditions", [])],
                    dims=[(a["key"], a.get("default_value"))
                          for a in mc.get("attributes", [])],
                )

                def make_metric_source(p=p, d=d):
                    def src() -> ray.data.Dataset:
                        return run_metric_def(_compose(p), d)
                    return src
                routing_sources[conn] = make_metric_source()
                continue
            if _base_type(conn) == "servicegraph":
                # connector/servicegraphconnector: pair client/server
                # spans on (trace_id, span_id)-like keys and emit edge
                # metrics. Flat-model config: kind_field splits the
                # upstream into the two sides (each side filters the
                # shared lazy stream — the upstream re-executes per
                # side, same documented behavior as routing branches).
                from ..stages.servicegraph import service_graph_edges

                kf = ccfg.get("kind_field", "kind")
                cv = ccfg.get("client_value", "client")
                sv = ccfg.get("server_value", "server")
                # YAML 1.1 parses a bare `on:` key as boolean True —
                # accept both spellings
                on = ccfg.get("on") or ccfg.get(True) or ccfg["join_on"]
                dims = ccfg["dimensions"]

                def make_sg_source(p=p, kf=kf, cv=cv, sv=sv, on=on,
                                   dims=dims, ccfg=ccfg):
                    def src() -> ray.data.Dataset:
                        import pyarrow.compute as _pc

                        up = _compose(p)

                        def side(v):
                            return up.map_batches(
                                lambda b, v=v: b.filter(
                                    _pc.equal(b[kf], v)),
                                batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
                        return service_graph_edges(
                            side(cv), side(sv), on=on, edge_dims=dims,
                            client_ts=ccfg.get("client_ts", "ts"),
                            server_ts=ccfg.get("server_ts", "ts"),
                            guard_empty=ccfg.get("guard_empty", False))
                    return src
                routing_sources[conn] = make_sg_source()
                continue
            if _base_type(conn) in ("signaltometrics", "signal_to_metrics"):
                # connector/signaltometricsconnector: grouped count +
                # sums per attribute set. Loader subset: one metric
                # table per connector (dimensions + optional sums).
                from ..stages.aggregate import grouped_count_sum

                def make_stm_source(p=p, ccfg=ccfg):
                    def src() -> ray.data.Dataset:
                        return grouped_count_sum(
                            _compose(p), ccfg["dimensions"],
                            sum_cols=ccfg.get("sum_columns"),
                            count_name=ccfg.get("count_name", "n"))
                    return src
                routing_sources[conn] = make_stm_source()
                continue
            if _base_type(conn) == "slowsql":
                # connector/slowsqlconnector: traces -> slow-SQL logs
                from ..stages.convertlogs import slow_sql_logs

                def make_sql_source(p=p, ccfg=ccfg):
                    def src() -> ray.data.Dataset:
                        return slow_sql_logs(
                            _compose(p),
                            duration_col=ccfg["duration_column"],
                            threshold=ccfg["threshold"],
                            db_system_col=ccfg["db_system_column"],
                            db_statement_col=ccfg["db_statement_column"],
                            db_systems=ccfg["db_systems"],
                            service_col=ccfg.get("service_column"),
                            span_name_col=ccfg.get("span_name_column"),
                            dims=ccfg.get("dimensions"))
                    return src
                routing_sources[conn] = make_sql_source()
                continue
            if _base_type(conn) == "metricsaslogs":
                # connector/metricsaslogsconnector: one log per
                # datapoint
                from ..stages.convertlogs import metrics_as_logs

                def make_mal_source(p=p, ccfg=ccfg):
                    def src() -> ray.data.Dataset:
                        return metrics_as_logs(
                            _compose(p),
                            name_col=ccfg["name_column"],
                            value_col=ccfg["value_column"],
                            metric_type=ccfg.get("metric_type", "gauge"),
                            unit=ccfg.get("unit", ""),
                            description=ccfg.get("description", ""),
                            keep_cols=ccfg.get("keep_columns"))
                    return src
                routing_sources[conn] = make_mal_source()
                continue
            if _base_type(conn) == "otlpjson":
                # connector/otlpjsonconnector. Two shapes:
                #   * with `fields`: parse a JSON-lines body column into
                #     typed columns (stages/parse.JsonParser) — the
                #     props-blob convenience mode;
                #   * without `fields`: the REAL connector semantics —
                #     each body is a complete OTLP/JSON export payload,
                #     exploded into its embedded records
                #     (stages/otlpjson.OtlpJsonExplode; malformed
                #     payloads emit nothing, per the reference's strict
                #     unmarshal).
                if "fields" in ccfg:
                    from ..stages.parse import JsonParser

                    def make_oj_source(p=p, ccfg=ccfg):
                        def src() -> ray.data.Dataset:
                            return JsonParser(
                                parse_from=ccfg.get("parse_from", "body"),
                                fields=ccfg["fields"],
                                on_error=ccfg.get("on_error", "send"),
                            ).apply(_compose(p))
                        return src
                else:
                    from ..stages.otlpjson import OtlpJsonExplode

                    def make_oj_source(p=p, ccfg=ccfg):
                        def src() -> ray.data.Dataset:
                            return OtlpJsonExplode(
                                body_col=ccfg.get("parse_from", "body"),
                                resource_attributes=ccfg.get(
                                    "resource_attributes"),
                                record_attributes=ccfg.get(
                                    "record_attributes"),
                            ).apply(_compose(p))
                        return src
                routing_sources[conn] = make_oj_source()
                continue
            if _base_type(conn) != "routing":
                raise ValueError(
                    f"unsupported connector {conn!r}; supported: routing, "
                    "count, sum, spanmetrics, exceptions, roundrobin, "
                    "servicegraph, signaltometrics, slowsql, metricsaslogs, "
                    "otlpjson")
            from ..ottl import parse_condition_text
            from ..stages.route import Router

            for e in ccfg.get("table", []):
                if len(e.get("pipelines", [])) != 1:
                    raise ValueError(
                        "routing table entries must target exactly one "
                        "pipeline in this loader (got "
                        f"{e.get('pipelines')!r})")
            table = [{"condition": parse_condition_text(
                          e.get("condition") or e.get("statement")),
                      "sink": e["pipelines"][0]}
                     for e in ccfg.get("table", [])]
            default = (ccfg.get("default_pipelines") or ["__dropped__"])[0]
            router = Router(table, default_sink=default)

            def make_source(p=p, router=router):
                def src() -> ray.data.Dataset:
                    ds = _compose(p)
                    return router.apply(ds)
                return src
            routing_sources[conn] = make_source()

    def _compose(p) -> ray.data.Dataset:
        readers = []
        for r in p["receivers"]:
            if r in connectors:
                continue  # handled by _routing_reader below
            readers.append(_build_receiver(r, receivers[r]))
        ds = readers[0]()
        for rd in readers[1:]:
            ds = ds.union(rd())
        for pr in p.get("processors", []):
            ds = _build_processor(pr, processors[pr]).apply(ds)
        return ds

    for pname, p in pipelines.items():
        readers = []
        for r in p["receivers"]:
            if r in connectors:
                readers.append(_routing_reader(r, pname))
            else:
                readers.append(_build_receiver(r, receivers[r]))
        stages = [_build_processor(pr, processors[pr])
                  for pr in p.get("processors", [])]
        writers = [(e, _build_exporter(e, exporters[e]))
                   for e in p.get("exporters", []) if e not in connectors]
        out[pname] = CollectorPipeline(readers, stages, writers)
    return out
