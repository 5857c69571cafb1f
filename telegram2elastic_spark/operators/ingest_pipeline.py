"""ES ingest pipelines (`PUT _ingest/pipeline` + `_simulate`).

The reference writes Telegram messages through output sinks that apply
per-field transformations before indexing (output/elasticsearch.py's
projection maps, telegram2elastic.py's coercions); Elasticsearch itself
adds the ingest-pipeline layer — an ordered list of declarative
processors every document passes through before it hits the index.
This module re-expresses that layer Spark-first: a pipeline definition
(the same JSON shape ES accepts) COMPILES to a chain of built-in column
expressions — one narrow map-only projection, whole-stage codegen, no
UDFs — so at 100 TB an ingest pipeline costs exactly one scan.

Supported processors (the commonly-used pure-transform subset):

  set        {field, value | copy_from}        literal, column copy, or
             mustache template — "a {{col}} b" compiles to one concat
             (the ES template-snippet contract)
  rename     {field, target_field}
  remove     {field}
  lowercase / uppercase / trim  {field, target_field?}
  gsub       {field, pattern, replacement, target_field?}   regex replace
  split      {field, separator, target_field?}              regex split
  join       {field, separator, target_field?}
  substring  {field, start, end?, target_field?}  (ES script analogue)
  convert    {field, type, target_field?}   string|long|double|boolean;
             unparseable values become NULL (ES ignore_failure contract)
  date       {field, target_field='@timestamp', output_format?}  ISO parse
  dissect    {field, pattern}   %{key} fields split by literal separators
  grok       {field, pattern}   %{PATTERN:name[:type]} named extraction
  kv         {field, field_split, value_split, target_keys}  key=value
             extraction; target_keys pins the output schema (Spark needs
             static columns — the ES include_keys contract)
  csv        {field, target_fields, separator=','}  positional split;
             missing trailing fields become NULL
  append     {field, value}     array append
  fingerprint {fields, target_field='fingerprint'}  sha256 hex over the
             '|'-joined field values (the ES fingerprint processor)

`grok`/`dissect` compile to ONE regex evaluated once per named capture
(both engines run the compiled pattern; the built-in grok vocabulary
below sticks to constructs Java regex and RE2 interpret identically —
no backrefs, no lookaround).

`simulate_pipeline(corpus, processors)` is the `_simulate` verb: run
the pipeline and return the transformed docs.  The DuckDB oracle
(`simulate_pipeline_sql`) compiles the SAME definition into a chain of
CTEs — one per processor — using `SELECT * EXCLUDE/REPLACE`, so every
processor's semantics are pinned relationally.

Reference parity: output/elasticsearch.py:40-66 (per-field projection
before indexing) and telegram2elastic.py:29-60 (type coercions); the
pipeline surface itself is ES-internal machinery the reference
outsources, like the rest of the query DSL.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE

# Grok vocabulary: identical semantics under Java regex and RE2.
GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "YEAR": r"\d{4}",
    "MONTHNUM": r"0[1-9]|1[0-2]",
    "HOSTNAME": r"[A-Za-z0-9._-]+",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "PATH": r"[^\s?#]*",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")


def compile_grok(pattern: str) -> tuple[str, list[tuple[str, str]]]:
    """-> (regex with one numbered group per named capture,
    [(name, type)]).  Unnamed pattern refs match without capturing;
    unknown pattern names raise (the ES error contract).

    ES grok is "regex with %{} macros": the text BETWEEN refs is itself
    regex (so `^` anchors, `\\.` escapes) — it passes through verbatim,
    unlike dissect, whose separators are literal."""
    fields: list[tuple[str, str]] = []
    out: list[str] = []
    last = 0
    for m in _GROK_REF.finditer(pattern):
        out.append(pattern[last : m.start()])
        pat, name, typ = m.group(1), m.group(2), m.group(3)
        if pat not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{pat}}}")
        if name:
            fields.append((name, typ or "string"))
            out.append(f"({GROK_PATTERNS[pat]})")
        else:
            out.append(f"(?:{GROK_PATTERNS[pat]})")
        last = m.end()
    out.append(pattern[last:])
    return "".join(out), fields


def compile_dissect(pattern: str) -> tuple[str, list[str]]:
    """ES dissect: %{key} fields separated by literal text.  Compiles to
    an anchored regex — every field is lazy (.*?) except a trailing one,
    which is greedy — reproducing dissect's leftmost-literal splitting."""
    parts = re.split(r"%\{(\w*)\}", pattern)
    # parts = [lit0, key1, lit1, key2, lit2, ...]
    keys = [k for k in parts[1::2] if k]
    out = ["^"]
    for i, seg in enumerate(parts):
        if i % 2 == 0:
            out.append(re.escape(seg))
        elif seg:
            is_last_field = i == len(parts) - 2 and not parts[-1]
            out.append("(.*)" if is_last_field else "(.*?)")
        else:
            out.append(".*?")
    out.append("$")
    return "".join(out), keys


_CAST_TYPES = {
    "string": "string",
    "long": "bigint",
    "integer": "bigint",
    "double": "double",
    "float": "double",
    "boolean": "boolean",
}


_TMPL_REF = re.compile(r"\{\{(\w+)\}\}")


def _template_parts(value: str) -> list[tuple[bool, str]]:
    """Mustache template -> [(is_column, text)] segments; a plain string
    (no {{refs}}) returns a single literal segment."""
    parts: list[tuple[bool, str]] = []
    last = 0
    for m in _TMPL_REF.finditer(value):
        if m.start() > last:
            parts.append((False, value[last : m.start()]))
        parts.append((True, m.group(1)))
        last = m.end()
    if last < len(value) or not parts:
        parts.append((False, value[last:]))
    return parts


def _kv_regex(key: str, field_split: str, value_split: str) -> str:
    """Anchored-at-boundary extraction regex for one kv key; identical
    semantics under Java regex and RE2 (no lookaround)."""
    fs, vs, k = re.escape(field_split), re.escape(value_split), re.escape(key)
    return f"(?:^|{fs}){k}{vs}([^{fs}]*)"


def _one(proc: dict) -> tuple[str, dict]:
    if not isinstance(proc, dict) or len(proc) != 1:
        raise ValueError(f"processor must be a single-key object: {proc!r}")
    return next(iter(proc.items()))


def apply_pipeline(corpus: DataFrame, processors: list[dict]) -> DataFrame:
    """Compile + apply the processor chain.  Returns the transformed
    DataFrame (all surviving columns); one narrow projection per
    processor, collapsed by Catalyst into a single map stage."""
    df = corpus
    for proc in processors:
        kind, p = _one(proc)
        f = p.get("field")
        tgt = p.get("target_field", f)
        if kind == "set":
            if "copy_from" in p:
                src = F.col(p["copy_from"])
            elif isinstance(p["value"], str) and _TMPL_REF.search(p["value"]):
                src = F.concat(
                    *[
                        F.col(t) if is_col else F.lit(t)
                        for is_col, t in _template_parts(p["value"])
                    ]
                )
            else:
                src = F.lit(p["value"])
            df = df.withColumn(p["field"], src)
        elif kind == "rename":
            df = df.withColumnRenamed(f, p["target_field"])
        elif kind == "remove":
            df = df.drop(f)
        elif kind == "lowercase":
            df = df.withColumn(tgt, F.lower(F.col(f)))
        elif kind == "uppercase":
            df = df.withColumn(tgt, F.upper(F.col(f)))
        elif kind == "trim":
            df = df.withColumn(tgt, F.trim(F.col(f)))
        elif kind == "gsub":
            df = df.withColumn(
                tgt, F.regexp_replace(F.col(f), p["pattern"], p["replacement"])
            )
        elif kind == "split":
            df = df.withColumn(tgt, F.split(F.col(f), p["separator"]))
        elif kind == "join":
            df = df.withColumn(tgt, F.array_join(F.col(f), p["separator"]))
        elif kind == "substring":
            start = int(p.get("start", 0))
            if "end" in p:
                df = df.withColumn(
                    tgt,
                    F.substring(F.col(f), start + 1, int(p["end"]) - start),
                )
            else:
                df = df.withColumn(
                    tgt, F.substring(F.col(f), start + 1, 2**31 - 1)
                )
        elif kind == "convert":
            df = df.withColumn(
                tgt, F.col(f).try_cast(_CAST_TYPES[p["type"]])
            )
        elif kind == "date":
            df = df.withColumn(
                p.get("target_field", "@timestamp"),
                F.try_to_timestamp(F.col(f)),
            )
        elif kind == "dissect":
            rx, keys = compile_dissect(p["pattern"])
            matched = F.col(f).rlike(rx)
            for gi, key in enumerate(keys, start=1):
                df = df.withColumn(
                    key,
                    F.when(matched, F.regexp_extract(F.col(f), rx, gi)),
                )
        elif kind == "grok":
            rx, fields = compile_grok(p["pattern"])
            matched = F.col(f).rlike(rx)
            gi = 0
            for name, typ in fields:
                gi += 1
                c: Column = F.when(
                    matched, F.regexp_extract(F.col(f), rx, gi)
                )
                if typ in ("int", "long"):
                    c = c.cast("bigint")
                elif typ == "float":
                    c = c.cast("double")
                df = df.withColumn(name, c)
        elif kind == "kv":
            for key in p["target_keys"]:
                rx = _kv_regex(key, p["field_split"], p["value_split"])
                df = df.withColumn(
                    key,
                    F.when(
                        F.col(f).rlike(rx), F.regexp_extract(F.col(f), rx, 1)
                    ),
                )
        elif kind == "csv":
            arr = F.split(F.col(f), re.escape(p.get("separator", ",")))
            for i, name in enumerate(p["target_fields"]):
                df = df.withColumn(name, F.get(arr, i))
        elif kind == "append":
            df = df.withColumn(f, F.array_append(F.col(f), F.lit(p["value"])))
        elif kind == "fingerprint":
            joined = F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit(""))
                    for c in p["fields"]
                ],
            )
            df = df.withColumn(
                p.get("target_field", "fingerprint"), F.sha2(joined, 256)
            )
        else:
            raise ValueError(f"unsupported processor {kind!r}")
    return df


def simulate_pipeline(
    corpus: DataFrame,
    processors: list[dict],
    cols: list[str] | None = None,
    limit: int = 100,
) -> DataFrame:
    """`_ingest/pipeline/_simulate`: run the pipeline, return the first
    `limit` transformed docs (doc order).  `cols` trims the output."""
    df = apply_pipeline(corpus, processors)
    if cols:
        df = df.select("doc_id", *[c for c in cols if c != "doc_id"])
    return df.orderBy("doc_id").limit(int(limit))


# --- DuckDB oracle -------------------------------------------------------------


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _proc_sql(proc: dict, cols: set[str]) -> str:
    """SELECT list for one processor CTE (DuckDB EXCLUDE/REPLACE).
    `cols` is the column set flowing INTO this processor — the oracle
    tracks schema evolution driver-side (mutated in place here), exactly
    like withColumn replaces-or-appends on the Spark side."""
    kind, p = _one(proc)
    f = p.get("field")
    tgt = p.get("target_field", f)

    def put(expr: str, target: str) -> str:
        if target in cols:
            return f"* REPLACE ({expr} AS {target})"
        cols.add(target)
        return f"*, {expr} AS {target}"

    if kind == "set":
        if "copy_from" in p:
            return put(p["copy_from"], p["field"])
        v = p["value"]
        if isinstance(v, str) and _TMPL_REF.search(v):
            segs = [
                (t if is_col else f"'{_sq(t)}'")
                for is_col, t in _template_parts(v)
            ]
            return put("(" + " || ".join(segs) + ")", p["field"])
        lit = f"'{_sq(v)}'" if isinstance(v, str) else repr(v)
        return put(lit, p["field"])
    if kind == "rename":
        cols.discard(f)
        cols.add(p["target_field"])
        return f"* EXCLUDE ({f}), {f} AS {p['target_field']}"
    if kind == "remove":
        cols.discard(f)
        return f"* EXCLUDE ({f})"
    if kind == "lowercase":
        return put(f"lower({f})", tgt)
    if kind == "uppercase":
        return put(f"upper({f})", tgt)
    if kind == "trim":
        return put(f"trim({f})", tgt)
    if kind == "gsub":
        return put(
            f"regexp_replace({f}, '{_sq(p['pattern'])}', "
            f"'{_sq(p['replacement'])}', 'g')",
            tgt,
        )
    if kind == "split":
        return put(f"regexp_split_to_array({f}, '{_sq(p['separator'])}')", tgt)
    if kind == "join":
        return put(f"list_aggr({f}, 'string_agg', '{_sq(p['separator'])}')", tgt)
    if kind == "substring":
        start = int(p.get("start", 0))
        if "end" in p:
            return put(f"{f}[{start + 1}:{int(p['end'])}]", tgt)
        return put(f"{f}[{start + 1}:]", tgt)
    if kind == "convert":
        return put(f"TRY_CAST({f} AS {_CAST_TYPES[p['type']]})", tgt)
    if kind == "date":
        return put(
            f"TRY_CAST({f} AS TIMESTAMP)", p.get("target_field", "@timestamp")
        )
    if kind in ("dissect", "grok"):
        if kind == "dissect":
            rx, keys = compile_dissect(p["pattern"])
            fields = [(key, "string") for key in keys]
        else:
            rx, fields = compile_grok(p["pattern"])
        replaces, appends = [], []
        for gi, (name, typ) in enumerate(fields, start=1):
            e = (
                f"CASE WHEN regexp_matches({f}, '{_sq(rx)}') THEN "
                f"regexp_extract({f}, '{_sq(rx)}', {gi}) END"
            )
            if typ in ("int", "long"):
                e = f"TRY_CAST({e} AS BIGINT)"
            elif typ == "float":
                e = f"TRY_CAST({e} AS DOUBLE)"
            if name in cols:
                replaces.append(f"{e} AS {name}")
            else:
                cols.add(name)
                appends.append(f"{e} AS {name}")
        sel = "*"
        if replaces:
            sel += " REPLACE (" + ", ".join(replaces) + ")"
        if appends:
            sel += ", " + ", ".join(appends)
        return sel
    if kind == "kv":
        exprs = []
        for key in p["target_keys"]:
            rx = _sq(_kv_regex(key, p["field_split"], p["value_split"]))
            e = (
                f"CASE WHEN regexp_matches({f}, '{rx}') THEN "
                f"regexp_extract({f}, '{rx}', 1) END"
            )
            if key in cols:
                exprs.append(("r", f"{e} AS {key}"))
            else:
                cols.add(key)
                exprs.append(("a", f"{e} AS {key}"))
        sel = "*"
        reps = [x for t, x in exprs if t == "r"]
        apps = [x for t, x in exprs if t == "a"]
        if reps:
            sel += " REPLACE (" + ", ".join(reps) + ")"
        if apps:
            sel += ", " + ", ".join(apps)
        return sel
    if kind == "csv":
        sep = _sq(p.get("separator", ","))
        exprs = []
        for i, name in enumerate(p["target_fields"], start=1):
            e = f"string_split({f}, '{sep}')[{i}]"
            if name in cols:
                exprs.append(("r", f"{e} AS {name}"))
            else:
                cols.add(name)
                exprs.append(("a", f"{e} AS {name}"))
        sel = "*"
        reps = [x for t, x in exprs if t == "r"]
        apps = [x for t, x in exprs if t == "a"]
        if reps:
            sel += " REPLACE (" + ", ".join(reps) + ")"
        if apps:
            sel += ", " + ", ".join(apps)
        return sel
    if kind == "append":
        v = p["value"]
        lit = f"'{_sq(v)}'" if isinstance(v, str) else repr(v)
        return put(f"list_append({f}, {lit})", f)
    if kind == "fingerprint":
        joined = ", ".join(
            f"COALESCE(CAST({c} AS VARCHAR), '')" for c in p["fields"]
        )
        return put(
            f"sha256(concat_ws('|', {joined}))",
            p.get("target_field", "fingerprint"),
        )
    raise ValueError(f"unsupported processor {kind!r}")


def simulate_pipeline_sql(
    processors: list[dict], cols: list[str] | None = None, limit: int = 100
) -> str:
    ctes = [CORPUS_CTE.strip()]
    prev = "corpus"
    schema = {
        "doc_id", "url", "warc_ts", "html", "text", "lang", "source",
        "n_chars",
    }
    for i, proc in enumerate(processors):
        ctes.append(f"p{i} AS (SELECT {_proc_sql(proc, schema)} FROM {prev})")
        prev = f"p{i}"
    proj = "*"
    if cols:
        proj = ", ".join(["doc_id"] + [c for c in cols if c != "doc_id"])
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT {proj} FROM {prev} ORDER BY doc_id LIMIT {int(limit)}"
    )
