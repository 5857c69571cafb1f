"""ES parent/child join field: `has_child` and `has_parent` queries.

The web corpus has a natural join field: every page belongs to a SITE
(its url host — the same derivation collapse.py uses).  Site documents
are virtual (the aggregate of their pages), exactly how an ES join field
keeps parents and children in one index routed to the same shard — here
the same groupBy key.

* `has_child_topk` — ES `has_child` { query: match(terms), score_mode }:
  return PARENT (site) hits whose children match, scored by the
  sum/max/avg of matching children's BM25 scores, with min_children
  support.  Shape: the match set is scored once (relational BM25 — the
  engine's oracle-exact scorer), then ONE hash aggregate on host; the
  host axis is |sites|-sized.  At index scale the match set comes from
  the compressed index instead (postings-bounded, see collapse.py's
  per-salt variant) — the aggregate shape is identical.

* `has_parent_page` — ES `has_parent` { parent_filter }: return CHILD
  (page) hits whose parent passes a parent-level predicate (a site
  aggregate — total stored chars over the site).  Shape: one hash
  aggregate builds the qualifying parent set (|sites| rows), broadcast
  semi-join back to pages, bounded page of results.  No ES-style
  global-ordinals memory: the parent set is an explicit tiny relation.

Reference analogue: the reference groups messages under their chat/
archive exactly like pages under a site (models.py archive_id natural
key); chat-level rollups serving message pages are the has_parent
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
from .bm25 import B, K1, SCORE_DECIMALS, bm25_scores
from .collapse import HOST_SQL, host_col


def has_child_topk(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    score_mode: str = "sum",
    min_children: int = 1,
) -> DataFrame:
    """Top-k (host, score, n_children) parents by aggregated child
    relevance; score_mode in {sum, max, avg} (ES score modes; `none`
    would order by host)."""
    agg = {
        "sum": F.round(F.sum("score"), SCORE_DECIMALS),
        "max": F.round(F.max("score"), SCORE_DECIMALS),
        "avg": F.round(F.avg("score"), SCORE_DECIMALS),
    }[score_mode]
    return (
        bm25_scores(corpus, terms)
        .withColumn("host", host_col())
        .groupBy("host")
        .agg(
            agg.alias("score"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .filter(F.col("n_children") >= int(min_children))
        .orderBy(F.desc("score"), F.asc("host"))
        .limit(k)
    )


def has_child_topk_sql(
    terms: list[str],
    k: int = 10,
    score_mode: str = "sum",
    min_children: int = 1,
) -> str:
    ts = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    agg = {"sum": "sum(score)", "max": "max(score)", "avg": "avg(score)"}[
        score_mode
    ]
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, url, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({ts}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, dl.url,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN tdf ON tf.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf.doc_id, dl.url
)
SELECT {HOST_SQL} AS host,
       round({agg}, {SCORE_DECIMALS}) AS score,
       count(*) AS n_children
FROM scored
GROUP BY 1
HAVING count(*) >= {int(min_children)}
ORDER BY score DESC, host ASC
LIMIT {k}
"""


def has_parent_page(
    corpus: DataFrame,
    min_site_chars: int = 310,
    limit: int = 20,
) -> DataFrame:
    """Child pages whose parent site's total stored chars exceed the bar:
    (doc_id, url, site_chars), doc_id order, bounded page."""
    sites = (
        corpus.withColumn("host", host_col())
        .groupBy("host")
        .agg(F.sum("n_chars").alias("site_chars"))
        .filter(F.col("site_chars") > int(min_site_chars))
    )
    return (
        corpus.withColumn("host", host_col())
        .join(F.broadcast(sites), "host")
        .select("doc_id", "url", "site_chars")
        .orderBy("doc_id")
        .limit(limit)
    )


def has_parent_page_sql(min_site_chars: int = 310, limit: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
pages AS (SELECT doc_id, url, n_chars, {HOST_SQL} AS host FROM corpus),
sites AS (
  SELECT host, CAST(sum(n_chars) AS BIGINT) AS site_chars
  FROM pages GROUP BY host
  HAVING sum(n_chars) > {int(min_site_chars)}
)
SELECT p.doc_id, p.url, s.site_chars
FROM pages p JOIN sites s ON p.host = s.host
ORDER BY p.doc_id
LIMIT {limit}
"""


def parent_id_page(
    corpus: DataFrame, site: int = 42, limit: int = 20
) -> DataFrame:
    """ES `parent_id` query: children of ONE given parent — here the
    pages of site<N> (the join-field parent key).  The predicate is an
    equality on the derived host, which Catalyst folds into the scan
    (url LIKE pushdown shape); bounded page in doc_id order."""
    host = f"site{int(site)}.example"
    return (
        corpus.withColumn("host", host_col())
        .filter(F.col("host") == host)
        .select("doc_id", "url")
        .orderBy("doc_id")
        .limit(limit)
    )


def parent_id_page_sql(site: int = 42, limit: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id, url FROM corpus
WHERE {HOST_SQL} = 'site{int(site)}.example'
ORDER BY doc_id
LIMIT {int(limit)}
"""


def children_agg(
    corpus: DataFrame, small: int = 250, large: int = 400
) -> DataFrame:
    """ES `children` aggregation: a PARENT-scope terms bucketing (site
    size class over the join field) that descends into the CHILD scope
    per bucket — child doc counts and child-level metrics, which a
    parent-only aggregation cannot see.

    Shape: the parent axis is one hash aggregate (|sites| rows), its
    size-class labels broadcast back onto the children (the ES
    global-ordinals join, here an explicit broadcast hash join — no
    shuffle of the child side), then one hash aggregate on the class
    label.  At 10^12 children the only shuffle is the |sites|-keyed
    parent rollup.  Reference analogue: chat-level classes over message
    children (models.py archive_id grouping)."""
    sites = (
        corpus.withColumn("host", host_col())
        .groupBy("host")
        .agg(F.sum("n_chars").alias("site_chars"))
    )
    classed = sites.withColumn(
        "size_class",
        F.when(F.col("site_chars") < int(small), "small")
        .when(F.col("site_chars") < int(large), "medium")
        .otherwise("large"),
    )
    return (
        corpus.withColumn("host", host_col())
        .join(F.broadcast(classed.select("host", "size_class")), "host")
        .groupBy("size_class")
        .agg(
            F.countDistinct("host").alias("n_sites"),
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").cast("bigint").alias("child_chars"),
            F.round(F.avg("n_chars"), 5).alias("avg_page_chars"),
        )
        .orderBy("size_class")
    )


def children_agg_sql(small: int = 250, large: int = 400) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
pages AS (SELECT doc_id, n_chars, {HOST_SQL} AS host FROM corpus),
sites AS (
  SELECT host, sum(n_chars) AS site_chars FROM pages GROUP BY host
),
classed AS (
  SELECT host,
         CASE WHEN site_chars < {int(small)} THEN 'small'
              WHEN site_chars < {int(large)} THEN 'medium'
              ELSE 'large' END AS size_class
  FROM sites
)
SELECT c.size_class,
       count(DISTINCT p.host) AS n_sites,
       count(*) AS n_pages,
       CAST(sum(p.n_chars) AS BIGINT) AS child_chars,
       round(avg(p.n_chars), 5) AS avg_page_chars
FROM pages p JOIN classed c ON p.host = c.host
GROUP BY 1
ORDER BY 1
"""


def parent_agg(corpus: DataFrame) -> DataFrame:
    """ES `parent` aggregation (the mirror of `children_agg`): a
    CHILD-scope terms bucketing (page language) that ascends to the
    PARENT scope per bucket — distinct-site counts and site-level
    metrics that a child-scope aggregation cannot see (a site's page
    count / stored chars are parent attributes, identical for every
    child that maps to it, so they must be counted ONCE per parent per
    bucket).

    Shape: the scope hop is ONE (lang, host) distinct (hash aggregate
    with map-side partials — output is bounded by |langs| x |sites|,
    not by pages); the parent rollup is ONE host-keyed hash aggregate
    (|sites| rows); the hop joins the rollup with a broadcast hash
    join (the rollup is the small side at any corpus size with a
    bounded site inventory — the ES global-ordinals lookup, made
    explicit); the final aggregate runs on the tiny language axis.  At
    10^12 children nothing ever shuffles the child rows twice.
    Reference analogue: chat-level attributes surfaced under message
    facets (models.py archive_id natural key)."""
    pages = corpus.withColumn("host", host_col())
    sites = pages.groupBy("host").agg(
        F.count(F.lit(1)).alias("site_pages"),
        F.sum("n_chars").alias("site_chars"),
    )
    hop = pages.select("lang", "host").distinct()
    return (
        hop.join(F.broadcast(sites), "host")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.sum("site_pages").cast("bigint").alias("parent_pages"),
            F.sum("site_chars").cast("bigint").alias("parent_chars"),
            F.round(F.avg("site_chars"), 5).alias("avg_site_chars"),
        )
        .orderBy(F.desc("n_sites"), "lang")
    )


def parent_agg_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
pages AS (SELECT doc_id, lang, n_chars, {HOST_SQL} AS host FROM corpus),
sites AS (
  SELECT host, count(*) AS site_pages, sum(n_chars) AS site_chars
  FROM pages GROUP BY host
),
hop AS (SELECT DISTINCT lang, host FROM pages)
SELECT h.lang,
       count(*) AS n_sites,
       CAST(sum(s.site_pages) AS BIGINT) AS parent_pages,
       CAST(sum(s.site_chars) AS BIGINT) AS parent_chars,
       round(avg(s.site_chars), 5) AS avg_site_chars
FROM hop h JOIN sites s ON h.host = s.host
GROUP BY h.lang
ORDER BY n_sites DESC, h.lang
"""
