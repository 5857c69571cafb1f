"""Projection operators: output-map translation, sender struct, rule cascade.

The reference's projection layer is an `exec`-based per-row eval of
user-config expression strings (eval_map telegram2elastic.py:169-175,
async_exec :156-166).  Security/scale rebuild: the output map is a
*declarative* dict `{field_path: SQL expression}` translated driver-side
into `select()` Column expressions — Catalyst sees through it (pruning,
pushdown), nothing is exec'd on executors, and nested dotted paths become
struct columns exactly like DottedPathDict (telegram2elastic.py:58-84)
built nested dicts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE


def apply_output_map(df: DataFrame, output_map: dict[str, str]) -> DataFrame:
    """{dotted.path: sql_expr} -> select with nested structs.

    `{"sender.username": "upper(lang)", "id": "doc_id"}` yields columns
    `id` and `sender: struct<username>`.  Paths group by their head
    segment; each group becomes one named_struct (recursively).
    """
    tree: dict = {}
    for path, expr in output_map.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = F.expr(expr)

    def build(node) -> F.Column:
        if isinstance(node, dict):
            return F.struct(
                *[build(v).alias(k) for k, v in sorted(node.items())]
            )
        return node

    return df.select(*[build(v).alias(k) for k, v in sorted(tree.items())])


# Default output map — the analogue of the reference default projection
# (telegram2elastic.py:346-353: id, date, sender, chat, message) on corpus
# columns.  Flat paths so the DuckDB oracle compares scalar columns.
DEFAULT_OUTPUT_MAP = {
    "id": "doc_id",
    "date": "date_format(warc_ts, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")",
    "chat": "source",
    "message": "text",
    "sender_username": "concat('site', cast(doc_id % 1000 as string))",
    "lang": "lang",
}


def default_projection(corpus: DataFrame) -> DataFrame:
    return apply_output_map(corpus, DEFAULT_OUTPUT_MAP).orderBy("id")


DEFAULT_PROJECTION_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT source AS chat,
       strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS date,
       doc_id AS id,
       lang,
       text AS message,
       'site' || CAST(doc_id % 1000 AS VARCHAR) AS sender_username
FROM corpus ORDER BY id
"""


def sender_struct(corpus: DataFrame) -> DataFrame:
    """P2: 3-way CASE sender builder (telegram2elastic.py:322-341) —
    User-like rows get username/first/last, Channel-like rows get the
    title as firstName, deleted users get the 'Deleted User' default
    (:324-329).  Row class is derived deterministically from doc_id."""
    cls = (F.col("doc_id") % 3).cast("int")
    return corpus.select(
        "doc_id",
        F.when(cls == 0, F.concat(F.lit("user_"), F.col("doc_id").cast("string")))
        .when(cls == 1, F.lit(""))  # channel: no username
        .otherwise(F.lit(""))  # deleted user: empty username
        .alias("username"),
        F.when(cls == 0, F.initcap(F.col("lang")))
        .when(cls == 1, F.concat(F.lit("Channel "), F.col("source")))
        .otherwise(F.lit("Deleted"))
        .alias("first_name"),
        F.when(cls == 0, F.upper(F.col("source")))
        .when(cls == 1, F.lit(""))
        .otherwise(F.lit("User"))
        .alias("last_name"),
    ).orderBy("doc_id")


SENDER_STRUCT_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'user_' || CAST(doc_id AS VARCHAR)
            ELSE '' END AS username,
       CASE WHEN doc_id % 3 = 0 THEN upper(substr(lang, 1, 1)) || substr(lang, 2)
            WHEN doc_id % 3 = 1 THEN 'Channel ' || source
            ELSE 'Deleted' END AS first_name,
       CASE WHEN doc_id % 3 = 0 THEN upper(source)
            WHEN doc_id % 3 = 1 THEN ''
            ELSE 'User' END AS last_name
FROM corpus ORDER BY doc_id
"""


# --- F4: first-match-wins rule cascade ---------------------------------------
# Rules match on (lang exact-or-regex, source set, size limit) with a
# match-all default — the shape of MediaConfiguration.get_rule
# (telegram2elastic.py:302-310; matchers :191-270).  Each rule carries an
# optional per-rule option with global fallback (get_with_fallback
# :272-286) -> coalesce(rule_val, global_val, default).

RULES = [
    # (name, lang_regex, sources, max_chars, download_opt)
    ("tiny_en", "en", ["src0", "src1", "src2"], 200, True),
    ("regex_langs", "e.|fr", None, 400, None),  # regex variant (*_re, :255-270)
    ("big_docs", None, None, None, False),  # match-all default rule
]
GLOBAL_DOWNLOAD = True


def rule_cascade(corpus: DataFrame) -> DataFrame:
    """First matching rule index + resolved per-rule option w/ fallback."""
    whens = None
    for i, (name, lang_re, sources, max_chars, _) in enumerate(RULES):
        pred = F.lit(True)
        if lang_re is not None:
            pred = pred & F.col("lang").rlike(f"^(?:{lang_re})$")
        if sources is not None:
            pred = pred & F.col("source").isin(sources)
        if max_chars is not None:
            pred = pred & (F.col("n_chars") <= max_chars)
        whens = (
            F.when(pred, F.lit(i)) if whens is None else whens.when(pred, F.lit(i))
        )
    rule_idx = whens
    rule_name = None
    download = None
    for i, (name, _, _, _, dl) in enumerate(RULES):
        rn = F.when(rule_idx == i, F.lit(name))
        dl_col = F.when(
            rule_idx == i,
            F.lit(dl) if dl is not None else F.lit(GLOBAL_DOWNLOAD),
        )
        rule_name = rn if rule_name is None else F.coalesce(rule_name, rn)
        download = dl_col if download is None else F.coalesce(download, dl_col)
    return corpus.select(
        "doc_id",
        rule_idx.cast("int").alias("rule_idx"),
        rule_name.alias("rule_name"),
        download.alias("download"),
    ).orderBy("doc_id")


def rule_cascade_sql() -> str:
    conds = []
    for i, (name, lang_re, sources, max_chars, dl) in enumerate(RULES):
        preds = ["TRUE"]
        if lang_re is not None:
            preds.append(f"regexp_matches(lang, '^(?:{lang_re})$')")
        if sources is not None:
            ss = ", ".join(f"'{s}'" for s in sources)
            preds.append(f"source IN ({ss})")
        if max_chars is not None:
            preds.append(f"n_chars <= {max_chars}")
        conds.append((i, name, " AND ".join(preds), dl))
    idx_case = "CASE " + " ".join(
        f"WHEN {p} THEN {i}" for i, _, p, _ in conds
    ) + " END"
    name_case = "CASE rule_idx " + " ".join(
        f"WHEN {i} THEN '{n}'" for i, n, _, _ in conds
    ) + " END"
    dl_case = "CASE rule_idx " + " ".join(
        f"WHEN {i} THEN {str(dl if dl is not None else GLOBAL_DOWNLOAD).upper()}"
        for i, _, _, dl in conds
    ) + " END"
    return f"""
WITH {CORPUS_CTE.strip()},
matched AS (
  SELECT doc_id, CAST({idx_case} AS INTEGER) AS rule_idx
  FROM corpus
)
SELECT doc_id, rule_idx,
       {name_case} AS rule_name,
       {dl_case} AS download
FROM matched ORDER BY doc_id
"""
