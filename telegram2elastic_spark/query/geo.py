"""ES geo queries: `geo_distance` and `geo_bounding_box`.

The corpus carries no geo field, so page coordinates are DERIVED
deterministically from doc_id (the same pattern the corpus itself uses
for url/warc_ts — corpus.py): a pseudo-random but fixed lat/lon on a
0.01-degree grid.  Both engines derive the identical values from integer
arithmetic, so the only cross-engine float surface is the haversine's
libm calls, absorbed by rounding the emitted distance.

    lat = (doc_id * 7919  % 18000) / 100 - 90      in [-90, 90)
    lon = (doc_id * 104729 % 36000) / 100 - 180    in [-180, 180)

`geo_distance_page` — the ES geo_distance filter + geo-sort: docs within
`radius_km` of a point, ordered by distance.  Scale shape: a cheap
BOUNDING-BOX pre-filter (pure comparisons — sargable, partition-prunable
on a geohash/lat-bucketed layout; ES runs the same bbox fast-phase before
exact distance) cuts the candidate set, then the exact haversine runs
only on survivors; the page is a TakeOrdered.

`geo_bbox_counts` — geo_bounding_box filter + terms agg per lang: one
scan, all predicates pushed down, one hash aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE

EARTH_KM = 6371.0

LAT_SQL = "((doc_id * 7919) % 18000) / 100.0 - 90.0"
LON_SQL = "((doc_id * 104729) % 36000) / 100.0 - 180.0"


def _latlon(df: DataFrame) -> DataFrame:
    # cast to double: Spark parses the /100.0 literal as DECIMAL and would
    # otherwise carry decimal lat/lon into every agg (pandas object dtype);
    # IEEE division is correctly rounded, so the double equals DuckDB's.
    return df.withColumn("lat", F.expr(LAT_SQL).cast("double")).withColumn(
        "lon", F.expr(LON_SQL).cast("double")
    )


def _haversine_col(lat0: float, lon0: float) -> F.Column:
    dphi = F.radians(F.col("lat") - F.lit(lat0)) / 2
    dlmb = F.radians(F.col("lon") - F.lit(lon0)) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(F.lit(lat0)))
        * F.cos(F.radians(F.col("lat")))
        * F.sin(dlmb) * F.sin(dlmb)
    )
    return F.lit(2.0 * EARTH_KM) * F.asin(F.sqrt(a))


def geo_distance_page(
    corpus: DataFrame,
    lat0: float = 48.2,
    lon0: float = 16.4,
    radius_km: float = 3000.0,
    k: int = 20,
) -> DataFrame:
    """(doc_id, url, dist_km) for the k nearest docs within radius_km of
    (lat0, lon0), distance asc, doc_id tie-break."""
    # bbox pre-filter: latitude degrees are ~111.195 km; longitude shrinks
    # by cos(lat) — use the widest cos over the box's lat span (bounded
    # below to keep the box finite near the poles).  The bbox is a
    # SUPERSET of the disc, so the exact haversine below stays the filter.
    dlat = radius_km / 111.195
    # longitude width uses the SMALLEST cos(lat) inside the box's lat span
    # (the latitude furthest from the equator) so the box is a guaranteed
    # superset of the disc; floored near the poles to stay finite
    lat_far = min(89.9, abs(lat0) + dlat)
    coslat = max(0.01, math.cos(math.radians(lat_far)))
    dlon = radius_km / (111.195 * coslat)
    boxed = _latlon(corpus).filter(
        (F.col("lat") >= lat0 - dlat)
        & (F.col("lat") <= lat0 + dlat)
        & (F.col("lon") >= lon0 - dlon)
        & (F.col("lon") <= lon0 + dlon)
    )
    return (
        boxed.withColumn("dist_km", F.round(_haversine_col(lat0, lon0), 3))
        .filter(F.col("dist_km") <= radius_km)
        .select("doc_id", "url", "dist_km")
        .orderBy(F.asc("dist_km"), F.asc("doc_id"))
        .limit(k)
    )


def geo_distance_sql(
    lat0: float = 48.2,
    lon0: float = 16.4,
    radius_km: float = 3000.0,
    k: int = 20,
) -> str:
    hav = (
        f"2.0 * {EARTH_KM} * asin(sqrt("
        f"sin(radians(lat - ({lat0!r})) / 2) * sin(radians(lat - ({lat0!r})) / 2)"
        f" + cos(radians({lat0!r})) * cos(radians(lat))"
        f" * sin(radians(lon - ({lon0!r})) / 2) * sin(radians(lon - ({lon0!r})) / 2)"
        f"))"
    )
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (
  SELECT doc_id, url, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus
),
d AS (SELECT doc_id, url, round({hav}, 3) AS dist_km FROM geo)
SELECT doc_id, url, dist_km
FROM d WHERE dist_km <= {radius_km!r}
ORDER BY dist_km ASC, doc_id ASC
LIMIT {k}
"""


def geo_bbox_counts(
    corpus: DataFrame,
    lat_min: float = -30.0,
    lat_max: float = 45.0,
    lon_min: float = -60.0,
    lon_max: float = 90.0,
) -> DataFrame:
    """(lang, cnt) for docs inside the bounding box — geo_bounding_box
    filter + terms agg, one scan."""
    return (
        _latlon(corpus)
        .filter(
            (F.col("lat") >= lat_min) & (F.col("lat") <= lat_max)
            & (F.col("lon") >= lon_min) & (F.col("lon") <= lon_max)
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang")
    )


def geo_bbox_counts_sql(
    lat_min: float = -30.0,
    lat_max: float = 45.0,
    lon_min: float = -60.0,
    lon_max: float = 90.0,
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (
  SELECT lang, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus
)
SELECT lang, count(*) AS cnt
FROM geo
WHERE lat >= {lat_min!r} AND lat <= {lat_max!r}
  AND lon >= {lon_min!r} AND lon <= {lon_max!r}
GROUP BY lang ORDER BY lang
"""


def geotile_grid(corpus: DataFrame, zoom: int = 3, k: int = 10) -> DataFrame:
    """ES `geotile_grid` aggregation: web-mercator map tiles at `zoom`
    ("z/x/y" keys, the slippy-map scheme ES uses), doc counts, top-k by
    count desc / key asc.  Latitudes clamp to the Mercator bound
    (85.05112878) exactly as ES does.  Grid lat/lon are exact rationals
    while tile boundaries are transcendental, so the floor can never sit
    on a knife's edge — both engines compute identical tiles.  One scan,
    one hash agg on the integer tile key."""
    n = float(1 << zoom)
    lat_c = F.greatest(
        F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col("lat"))
    )
    x = F.floor((F.col("lon") + 180.0) / 360.0 * n)
    x = F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), x)).cast("long")
    # asinh(tan r) written as ln(tan r + sec r): DuckDB has no asinh, and
    # the identical expression must run on both engines
    rad = F.radians(lat_c)
    y = F.floor(
        (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / math.pi) / 2.0 * n
    )
    y = F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), y)).cast("long")
    key = F.concat_ws("/", F.lit(str(zoom)), x.cast("string"), y.cast("string"))
    return (
        _latlon(corpus)
        .select(key.alias("tile"))
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tile"))
        .limit(k)
    )


def geotile_grid_sql(zoom: int = 3, k: int = 10) -> str:
    n = 1 << zoom
    lat_c = "greatest(-85.05112878, least(85.05112878, lat))"
    x = (
        f"least({n - 1}, greatest(0, "
        f"CAST(floor((lon + 180.0) / 360.0 * {float(n)!r}) AS BIGINT)))"
    )
    y = (
        f"least({n - 1}, greatest(0, CAST(floor("
        f"(1.0 - ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
        f" / pi()) / 2.0 * {float(n)!r}"
        f") AS BIGINT)))"
    )
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus)
SELECT '{zoom}' || '/' || CAST({x} AS VARCHAR) || '/' || CAST({y} AS VARCHAR)
           AS tile,
       count(*) AS cnt
FROM geo
GROUP BY 1
ORDER BY cnt DESC, tile ASC
LIMIT {k}
"""


def geo_bounds_centroid(corpus: DataFrame, lang: str | None = "en") -> DataFrame:
    """ES `geo_bounds` + `geo_centroid` metric aggs over the (optionally
    lang-filtered) doc set: bounding box corners (ES top_left = max lat /
    min lon, bottom_right = min lat / max lon) and the centroid as the
    coordinate mean, one row.  One pushed-filter scan, one agg."""
    df = _latlon(corpus)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.agg(
        F.round(F.max("lat"), 6).alias("top_lat"),
        F.round(F.min("lon"), 6).alias("left_lon"),
        F.round(F.min("lat"), 6).alias("bottom_lat"),
        F.round(F.max("lon"), 6).alias("right_lon"),
        F.round(F.avg("lat"), 6).alias("cent_lat"),
        F.round(F.avg("lon"), 6).alias("cent_lon"),
        F.count(F.lit(1)).alias("cnt"),
    )


def geo_bounds_centroid_sql(lang: str | None = "en") -> str:
    where = f"WHERE lang = '{lang}'" if lang is not None else ""
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT lang, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus)
SELECT round(max(lat), 6) AS top_lat,
       round(min(lon), 6) AS left_lon,
       round(min(lat), 6) AS bottom_lat,
       round(max(lon), 6) AS right_lon,
       round(avg(lat), 6) AS cent_lat,
       round(avg(lon), 6) AS cent_lon,
       count(*) AS cnt
FROM geo {where}
"""


def geo_distance_agg(
    corpus: DataFrame,
    lat0: float = 48.2,
    lon0: float = 16.4,
    edges: tuple[float, ...] = (2000.0, 5000.0, 10000.0),
) -> DataFrame:
    """ES `geo_distance` AGGREGATION: bucket every doc by its haversine
    distance from the origin into concentric rings [0,e1), [e1,e2), ...,
    [eN,*) and count per ring.  Every ring is emitted even when empty
    (ES contract), keys in ES's "from-to" format.

    Shape: the distance is map-only; the ring id is a literal when-chain;
    ONE hash agg on a <=len(edges)+1-key space; empty rings come from a
    broadcast literal ring table (rows = rings, never corpus-sized).
    Distances are rounded to 3 decimals BEFORE bucketing — same contract
    as geo_distance_page, so both engines bucket identical values."""
    edges = tuple(float(e) for e in edges)
    if sorted(edges) != list(edges) or len(set(edges)) != len(edges):
        raise ValueError("edges must be strictly increasing")
    bounds = [(0.0, edges[0])] + [
        (edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ] + [(edges[-1], None)]

    def key_of(lo: float, hi: float | None) -> str:
        lo_s = "*" if lo == 0.0 else f"{lo}"
        hi_s = "*" if hi is None else f"{hi}"
        return f"{lo_s}-{hi_s}"

    d = F.round(_haversine_col(lat0, lon0), 3)
    ring = F.lit(len(edges))  # default: beyond the last edge
    for i in range(len(edges) - 1, -1, -1):
        ring = F.when(d < edges[i], F.lit(i)).otherwise(ring)
    counts = (
        _latlon(corpus)
        .select(ring.alias("ring"))
        .groupBy("ring")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = corpus.sparkSession
    rings = spark.createDataFrame(
        [(i, key_of(lo, hi)) for i, (lo, hi) in enumerate(bounds)],
        "ring int, key string",
    )
    return (
        # counts (<= rings rows after the agg) is the broadcastable side;
        # the left side of a left-outer can't build the broadcast table
        rings.join(F.broadcast(counts), "ring", "left")
        .select(
            "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("doc_count")
        )
        .orderBy(F.col("key"))  # deterministic; driver sorts by column anyway
    )


def geo_distance_agg_sql(
    lat0: float = 48.2,
    lon0: float = 16.4,
    edges: tuple[float, ...] = (2000.0, 5000.0, 10000.0),
) -> str:
    edges = tuple(float(e) for e in edges)
    hav = (
        f"2 * {EARTH_KM!r} * asin(sqrt("
        f"sin(radians(lat - ({lat0!r})) / 2) * sin(radians(lat - ({lat0!r})) / 2)"
        f" + cos(radians({lat0!r})) * cos(radians(lat))"
        f" * sin(radians(lon - ({lon0!r})) / 2) * sin(radians(lon - ({lon0!r})) / 2)"
        f"))"
    )
    bounds = [(0.0, edges[0])] + [
        (edges[i], edges[i + 1]) for i in range(len(edges) - 1)
    ] + [(edges[-1], None)]
    ring_rows = ", ".join(
        f"({i}, '{'*' if lo == 0.0 else lo}-{'*' if hi is None else hi}')"
        for i, (lo, hi) in enumerate(bounds)
    )
    case = "CASE " + " ".join(
        f"WHEN d < {e!r} THEN {i}" for i, e in enumerate(edges)
    ) + f" ELSE {len(edges)} END"
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus),
d AS (SELECT round({hav}, 3) AS d FROM geo),
counts AS (SELECT {case} AS ring, count(*) AS cnt FROM d GROUP BY 1),
rings(ring, key) AS (VALUES {ring_rows})
SELECT rings.key, CAST(COALESCE(counts.cnt, 0) AS BIGINT) AS doc_count
FROM rings LEFT JOIN counts ON rings.ring = counts.ring
ORDER BY rings.key
"""


# --- ES geo_line aggregation --------------------------------------------------

def geo_line(corpus: DataFrame, size: int = 10) -> DataFrame:
    """ES `geo_line` aggregation (one line per `lang` bucket): connect
    each bucket's points in `warc_ts` order into a LineString, keeping
    at most `size` points (ES defaults to 250 and reports whether the
    line is `complete`).

    Points are the doc's deterministic coordinates in EXACT integer
    centi-degrees (lat_c = (doc_id*7919) % 18000 - 9000), so the WKT
    string is byte-identical across engines — no float formatting in
    the geometry.

    Scale shape: the per-bucket head is a partitioned window rank (ONE
    shuffle on lang, same as cap_per_host), so no bucket ever
    materializes more than `size` points into the line; totals are a
    second axis-sized hash agg.  sort_array over <= size structs makes
    the collect_list order deterministic."""
    from pyspark.sql.window import Window

    base = corpus.select(
        "lang",
        "doc_id",
        "warc_ts",
        ((F.col("doc_id") * 7919) % 18000 - 9000).cast("long").alias("lat_c"),
        ((F.col("doc_id") * 104729) % 36000 - 18000).cast("long").alias("lon_c"),
    )
    w = Window.partitionBy("lang").orderBy(F.asc("warc_ts"), F.asc("doc_id"))
    head = base.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= int(size)
    )
    pt = F.concat(
        F.col("lon_c").cast("string"), F.lit(" "), F.col("lat_c").cast("string")
    )
    line = head.groupBy("lang").agg(
        F.concat(
            F.lit("LINESTRING("),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", pt.alias("pt")))),
                    lambda s: s["pt"],
                ),
                ", ",
            ),
            F.lit(")"),
        ).alias("line")
    )
    tot = corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("n_points"))
    return (
        line.join(tot, "lang")
        .select(
            "lang",
            "line",
            "n_points",
            (F.col("n_points") <= int(size)).alias("complete"),
        )
        .orderBy("lang")
    )


def geo_line_sql(size: int = 10) -> str:
    from ..corpus import CORPUS_CTE

    return f"""
WITH {CORPUS_CTE.strip()},
base AS (
  SELECT lang, doc_id, warc_ts,
         CAST((doc_id * 7919) % 18000 - 9000 AS BIGINT) AS lat_c,
         CAST((doc_id * 104729) % 36000 - 18000 AS BIGINT) AS lon_c
  FROM corpus
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY warc_ts, doc_id) AS rn
  FROM base
),
line AS (
  SELECT lang,
         'LINESTRING(' || string_agg(
             CAST(lon_c AS VARCHAR) || ' ' || CAST(lat_c AS VARCHAR),
             ', ' ORDER BY rn) || ')' AS line
  FROM ranked WHERE rn <= {int(size)} GROUP BY lang
),
tot AS (SELECT lang, count(*) AS n_points FROM base GROUP BY lang)
SELECT line.lang, line.line, tot.n_points,
       tot.n_points <= {int(size)} AS complete
FROM line JOIN tot ON line.lang = tot.lang
ORDER BY line.lang
"""


# --- ES geo_polygon / geo_shape(polygon) query ---------------------------------

DEFAULT_POLYGON = [
    (10.0, -60.0),
    (70.0, -20.0),
    (55.0, 60.0),
    (-5.0, 40.0),
    (-30.0, -10.0),
]


def _poly_centi(polygon):
    poly = [(int(round(y * 100)), int(round(x * 100))) for y, x in polygon]
    if len(poly) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    for (y1, _), (y2, _) in zip(poly, poly[1:] + poly[:1]):
        if y1 == y2:
            raise ValueError(
                "horizontal polygon edges are not supported (the crossing "
                "test would divide by the edge's latitude span)"
            )
    return poly


def geo_polygon_page(
    corpus: DataFrame,
    polygon: list[tuple[float, float]] | None = None,
    k: int = 50,
) -> DataFrame:
    """ES `geo_polygon` query (= `geo_shape` with a Polygon and
    `relation: intersects` for points): docs whose derived point lies
    inside the simple polygon, by even-odd ray casting.

    EXACT integer arithmetic: points and vertices live in centi-degrees
    (the derived grid is exactly 0.01 deg), and each edge's crossing
    test is the cross-multiplied form of
    `lon < (x2-x1)*(lat-y1)/(y2-y1) + x1` —
    `(lon-x1)*(y2-y1) < (x2-x1)*(lat-y1)`, flipped when y2 < y1 — so
    there is NO division and NO float anywhere; both engines make
    bit-identical inside/outside decisions even for points arbitrarily
    close to an edge.  The polygon is a driver literal, so containment
    compiles to a FIXED sum of per-edge indicators — one codegen\'d map
    over the scan, no UDF, no shuffle before the bounded page.

    Returns (doc_id, lat_c, lon_c) (centi-degrees) of contained docs,
    doc_id asc, limit k."""
    poly = _poly_centi(DEFAULT_POLYGON if polygon is None else polygon)
    lat_c = ((F.col("doc_id") * 7919) % 18000 - 9000).cast("long")
    lon_c = ((F.col("doc_id") * 104729) % 36000 - 18000).cast("long")
    pts = corpus.select(
        "doc_id", lat_c.alias("lat_c"), lon_c.alias("lon_c")
    )
    crossings = None
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        straddles = (F.lit(y1) > F.col("lat_c")) != (
            F.lit(y2) > F.col("lat_c")
        )
        lhs = (F.col("lon_c") - F.lit(x1)) * F.lit(y2 - y1)
        rhs = F.lit(x2 - x1) * (F.col("lat_c") - F.lit(y1))
        side = (lhs < rhs) if y2 > y1 else (lhs > rhs)
        c = F.when(straddles & side, F.lit(1)).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    return (
        pts.filter(crossings % 2 == 1)
        .orderBy("doc_id")
        .limit(int(k))
    )


def geo_polygon_sql(
    polygon: list[tuple[float, float]] | None = None, k: int = 50
) -> str:
    poly = _poly_centi(DEFAULT_POLYGON if polygon is None else polygon)
    edges = []
    for (y1, x1), (y2, x2) in zip(poly, poly[1:] + poly[:1]):
        op = "<" if y2 > y1 else ">"
        edges.append(
            f"(CASE WHEN (({y1} > lat_c) != ({y2} > lat_c)) AND "
            f"((lon_c - ({x1})) * ({y2 - y1}) {op} "
            f"({x2 - x1}) * (lat_c - ({y1}))) THEN 1 ELSE 0 END)"
        )
    total = " + ".join(edges)
    return f"""
WITH {{cte}},
pts AS (
  SELECT doc_id,
         CAST((doc_id * 7919) % 18000 - 9000 AS BIGINT) AS lat_c,
         CAST((doc_id * 104729) % 36000 - 18000 AS BIGINT) AS lon_c
  FROM corpus
)
SELECT doc_id, lat_c, lon_c
FROM pts
WHERE ({total}) % 2 = 1
ORDER BY doc_id
LIMIT {{k}}
""".format(cte=CORPUS_CTE.strip(), k=int(k), total=total)


# --- ES geohash_grid aggregation -----------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_grid(
    corpus: DataFrame, precision: int = 4, k: int = 10
) -> DataFrame:
    """ES `geohash_grid` aggregation: base-32 geohash cells at
    `precision` chars, doc counts, top-k by count desc / hash asc.

    Geohash interleaves longitude and latitude bits MSB-first (lon takes
    the even bit positions, so with 5p total bits lon gets ceil(5p/2)
    and lat floor(5p/2)); interval halving is equivalent to ONE uniform
    quantization per axis followed by bit interleaving, which is how
    both engines compute it here — integer shifts and masks on the
    quantized cells, so after the single float floor the entire encoding
    is exact integer arithmetic (no per-bit float halving to diverge).
    One scan, one hash agg on the geohash key; at 100 TB the key is as
    groupable as any low-cardinality string (4-char geohash = <= 32^4
    cells).

    Reference analogue: ES-side map facets implied by the Kibana serving
    path (README.md:5); geotile_grid's sibling with ES's default cell
    scheme."""
    p = int(precision)
    if not 1 <= p <= 8:
        raise ValueError("precision must be in [1, 8]")
    total = 5 * p
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    df = _latlon(corpus)
    lon_q = F.floor(
        (F.col("lon") + 180.0) / 360.0 * float(1 << lon_bits)
    ).cast("long")
    lat_q = F.floor(
        (F.col("lat") + 90.0) / 180.0 * float(1 << lat_bits)
    ).cast("long")
    lon_q = F.least(F.lit((1 << lon_bits) - 1), lon_q)
    lat_q = F.least(F.lit((1 << lat_bits) - 1), lat_q)
    df = df.select(lon_q.alias("lon_q"), lat_q.alias("lat_q"))
    h = F.lit(0).cast("long")
    for j in range(lon_bits):
        bit = F.shiftright(F.col("lon_q"), lon_bits - 1 - j).bitwiseAND(1)
        h = h + F.shiftleft(bit, total - 1 - 2 * j)
    for j in range(lat_bits):
        bit = F.shiftright(F.col("lat_q"), lat_bits - 1 - j).bitwiseAND(1)
        h = h + F.shiftleft(bit, total - 2 - 2 * j)
    chars = [
        F.substring(
            F.lit(GEOHASH32),
            (F.shiftright(h, 5 * (p - 1 - c)).bitwiseAND(31) + 1).cast(
                "int"
            ),
            1,
        )
        for c in range(p)
    ]
    gh = F.concat(*chars)
    return (
        df.select(gh.alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gh"))
        .limit(int(k))
    )


def geohash_grid_sql(precision: int = 4, k: int = 10) -> str:
    p = int(precision)
    total = 5 * p
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = (
        f"least({(1 << lon_bits) - 1}, CAST(floor((lon + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT))"
    )
    lat_q = (
        f"least({(1 << lat_bits) - 1}, CAST(floor((lat + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT))"
    )
    terms = []
    for j in range(lon_bits):
        terms.append(
            f"(((lon_q >> {lon_bits - 1 - j}) & 1) "
            f"<< {total - 1 - 2 * j})"
        )
    for j in range(lat_bits):
        terms.append(
            f"(((lat_q >> {lat_bits - 1 - j}) & 1) "
            f"<< {total - 2 - 2 * j})"
        )
    hexpr = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH32}', CAST(((h >> {5 * (p - 1 - c)}) & 31) "
        f"AS INTEGER) + 1, 1)"
        for c in range(p)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus),
q AS (SELECT {lon_q} AS lon_q, {lat_q} AS lat_q FROM geo),
hh AS (SELECT {hexpr} AS h FROM q)
SELECT {chars} AS gh, count(*) AS cnt
FROM hh
GROUP BY 1
ORDER BY cnt DESC, gh ASC
LIMIT {int(k)}
"""


# --- ES _search_mvt (vector tile endpoint) ------------------------------------


def search_mvt(
    corpus: DataFrame,
    z: int = 2,
    x: int = 1,
    y: int = 1,
    extent: int = 4096,
    grid_precision: int = 5,
    hits: int = 10,
) -> DataFrame:
    """ES `_search_mvt` (the Kibana-maps serving endpoint): the contents
    of ONE web-mercator tile as two layers — the protobuf envelope is
    presentation, the layers are the relational contract.

    * layer='grid': the `aggs` layer — occupied grid cells at
      2^grid_precision x 2^grid_precision per tile (px, py = cell
      coords), doc counts.
    * layer='hits': the top-`hits` features (doc_id asc, the stable ES
      sort for untyped hit layers), px/py = pixel position within the
      `extent` x `extent` tile.

    Determinism: tile membership and the two floors reuse geotile_grid's
    argument — grid lat/lon are exact rationals while mercator boundaries
    are transcendental, so no floor sits on a knife's edge and both
    engines bin identically.  Scale shape: the tile predicate is a pure
    comparison pushed to the scan (at 10^12 docs a lat/lon- or
    geohash-partitioned layout prunes to the tile's partitions); the grid
    layer is one hash agg over at most 4^grid_precision cells and the
    hits layer a bounded TakeOrdered."""
    n = float(1 << int(z))
    cells = 1 << int(grid_precision)
    df = _latlon(corpus)
    lat_c = F.greatest(
        F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col("lat"))
    )
    rad = F.radians(lat_c)
    xw = (F.col("lon") + 180.0) / 360.0 * n
    yw = (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / math.pi) / 2.0 * n
    df = (
        df.withColumn("xf", xw - float(int(x)))
        .withColumn("yf", yw - float(int(y)))
        .filter(
            (F.col("xf") >= 0.0) & (F.col("xf") < 1.0)
            & (F.col("yf") >= 0.0) & (F.col("yf") < 1.0)
        )
    )
    grid = (
        df.select(
            F.floor(F.col("xf") * cells).cast("long").alias("px"),
            F.floor(F.col("yf") * cells).cast("long").alias("py"),
        )
        .groupBy("px", "py")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("grid").alias("layer"), "px", "py", "cnt",
            F.lit(None).cast("long").alias("doc_id"),
        )
    )
    hit = (
        df.orderBy("doc_id")
        .limit(int(hits))
        .select(
            F.lit("hits").alias("layer"),
            F.floor(F.col("xf") * int(extent)).cast("long").alias("px"),
            F.floor(F.col("yf") * int(extent)).cast("long").alias("py"),
            F.lit(None).cast("long").alias("cnt"),
            "doc_id",
        )
    )
    return grid.unionByName(hit).orderBy(
        "layer", "px", "py", F.asc_nulls_first("doc_id")
    )


def search_mvt_sql(
    z: int = 2,
    x: int = 1,
    y: int = 1,
    extent: int = 4096,
    grid_precision: int = 5,
    hits: int = 10,
) -> str:
    n = float(1 << int(z))
    cells = 1 << int(grid_precision)
    lat_c = "greatest(-85.05112878, least(85.05112878, lat))"
    xw = f"(lon + 180.0) / 360.0 * {n!r}"
    yw = (
        f"(1.0 - ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
        f" / pi()) / 2.0 * {n!r}"
    )
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT doc_id, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus),
tile AS (
  SELECT doc_id, {xw} - {float(int(x))!r} AS xf, {yw} - {float(int(y))!r} AS yf
  FROM geo
),
intile AS (
  SELECT * FROM tile WHERE xf >= 0.0 AND xf < 1.0 AND yf >= 0.0 AND yf < 1.0
),
grid AS (
  SELECT 'grid' AS layer,
         CAST(floor(xf * {cells}) AS BIGINT) AS px,
         CAST(floor(yf * {cells}) AS BIGINT) AS py,
         count(*) AS cnt,
         CAST(NULL AS BIGINT) AS doc_id
  FROM intile GROUP BY 2, 3
),
hit AS (
  SELECT 'hits' AS layer,
         CAST(floor(xf * {int(extent)}) AS BIGINT) AS px,
         CAST(floor(yf * {int(extent)}) AS BIGINT) AS py,
         CAST(NULL AS BIGINT) AS cnt,
         doc_id
  FROM intile ORDER BY doc_id LIMIT {int(hits)}
)
SELECT * FROM grid
UNION ALL
SELECT * FROM hit
ORDER BY layer, px, py, doc_id ASC NULLS FIRST
"""


# --- geo_shape query ------------------------------------------------------------

# Per-doc indexed SHAPE: an envelope around the doc's derived point with
# doc_id-derived half-extents (0.5 .. 5 degrees in centi-degree ints) —
# the same deterministic-derivation contract as LAT_SQL/LON_SQL.
SHAPE_SQL = """
SELECT doc_id,
       ((doc_id * 7919) % 18000 - 9000)
         - (50 + (doc_id % 450))       AS lat_lo,
       ((doc_id * 7919) % 18000 - 9000)
         + (50 + (doc_id % 450))       AS lat_hi,
       ((doc_id * 104729) % 36000 - 18000)
         - (50 + ((doc_id * 31) % 450)) AS lon_lo,
       ((doc_id * 104729) % 36000 - 18000)
         + (50 + ((doc_id * 31) % 450)) AS lon_hi
FROM corpus
"""

GEO_SHAPE_RELATIONS = ("intersects", "within", "contains", "disjoint")


def _doc_envelopes(corpus: DataFrame) -> DataFrame:
    lat_c = (F.col("doc_id") * 7919) % 18000 - 9000
    lon_c = (F.col("doc_id") * 104729) % 36000 - 18000
    hh = F.lit(50) + F.col("doc_id") % 450
    hw = F.lit(50) + (F.col("doc_id") * 31) % 450
    return corpus.select(
        "doc_id",
        (lat_c - hh).cast("long").alias("lat_lo"),
        (lat_c + hh).cast("long").alias("lat_hi"),
        (lon_c - hw).cast("long").alias("lon_lo"),
        (lon_c + hw).cast("long").alias("lon_hi"),
    )


def geo_shape_page(
    corpus: DataFrame,
    envelope: tuple[float, float, float, float] = (40.0, 55.0, 0.0, 30.0),
    relation: str = "intersects",
    k: int = 20,
) -> DataFrame:
    """ES `geo_shape` query over an indexed envelope field: docs whose
    shape stands in `relation` (intersects | within | contains |
    disjoint — the four ES spatial relations) to the query envelope
    (lat_min, lat_max, lon_min, lon_max in degrees).

    Exactness: both doc shapes and the query envelope live in
    centi-degree INTEGERS (the geo_polygon/geo_line contract), so every
    relation is pure integer interval comparison — no floats anywhere,
    bit-identical across engines.  Dateline wrap is out of scope (the
    geo_polygon contract).

    Shape: map-only predicate over derived columns + a bounded
    TakeOrdered page.  On a real layout the envelope would be a doc
    column with min/max zone maps, so the interval tests partition-
    prune exactly like ES's BKD tree leaves skip non-overlapping
    cells.  Reference analogue: none (the reference has no geo); this
    closes the engine's ES geo-query family."""
    if relation not in GEO_SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {GEO_SHAPE_RELATIONS}")
    qlat_lo, qlat_hi = int(round(envelope[0] * 100)), int(round(envelope[1] * 100))
    qlon_lo, qlon_hi = int(round(envelope[2] * 100)), int(round(envelope[3] * 100))
    env = _doc_envelopes(corpus)
    inter = (
        (F.col("lat_lo") <= qlat_hi)
        & (F.col("lat_hi") >= qlat_lo)
        & (F.col("lon_lo") <= qlon_hi)
        & (F.col("lon_hi") >= qlon_lo)
    )
    within = (
        (F.col("lat_lo") >= qlat_lo)
        & (F.col("lat_hi") <= qlat_hi)
        & (F.col("lon_lo") >= qlon_lo)
        & (F.col("lon_hi") <= qlon_hi)
    )
    contains = (
        (F.col("lat_lo") <= qlat_lo)
        & (F.col("lat_hi") >= qlat_hi)
        & (F.col("lon_lo") <= qlon_lo)
        & (F.col("lon_hi") >= qlon_hi)
    )
    pred = {
        "intersects": inter,
        "within": within,
        "contains": contains,
        "disjoint": ~inter,
    }[relation]
    return env.filter(pred).orderBy("doc_id").limit(int(k))


def geo_shape_sql(
    envelope: tuple[float, float, float, float] = (40.0, 55.0, 0.0, 30.0),
    relation: str = "intersects",
    k: int = 20,
) -> str:
    if relation not in GEO_SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {GEO_SHAPE_RELATIONS}")
    qlat_lo, qlat_hi = int(round(envelope[0] * 100)), int(round(envelope[1] * 100))
    qlon_lo, qlon_hi = int(round(envelope[2] * 100)), int(round(envelope[3] * 100))
    inter = (
        f"(lat_lo <= {qlat_hi} AND lat_hi >= {qlat_lo} "
        f"AND lon_lo <= {qlon_hi} AND lon_hi >= {qlon_lo})"
    )
    pred = {
        "intersects": inter,
        "within": (
            f"(lat_lo >= {qlat_lo} AND lat_hi <= {qlat_hi} "
            f"AND lon_lo >= {qlon_lo} AND lon_hi <= {qlon_hi})"
        ),
        "contains": (
            f"(lat_lo <= {qlat_lo} AND lat_hi >= {qlat_hi} "
            f"AND lon_lo <= {qlon_lo} AND lon_hi >= {qlon_hi})"
        ),
        "disjoint": f"NOT {inter}",
    }[relation]
    return f"""
WITH {CORPUS_CTE.strip()},
env AS ({SHAPE_SQL.strip()})
SELECT doc_id, lat_lo, lat_hi, lon_lo, lon_hi
FROM env WHERE {pred}
ORDER BY doc_id
LIMIT {int(k)}
"""


# --- ES 8.3 geo_grid QUERY (filter by a grid cell) ----------------------------


def _geotile_xy(zoom: int) -> tuple[F.Column, F.Column]:
    """Slippy-map tile (x, y) columns over lat/lon (geotile_grid's exact
    arithmetic, exposed for the filter form)."""
    n = float(1 << zoom)
    lat_c = F.greatest(
        F.lit(-85.05112878), F.least(F.lit(85.05112878), F.col("lat"))
    )
    x = F.floor((F.col("lon") + 180.0) / 360.0 * n)
    x = F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), x)).cast("long")
    rad = F.radians(lat_c)
    y = F.floor(
        (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / math.pi) / 2.0 * n
    )
    y = F.least(F.lit(int(n) - 1), F.greatest(F.lit(0), y)).cast("long")
    return x, y


def _geohash_col(precision: int) -> F.Column:
    """Geohash string column over lat/lon (geohash_grid's exact integer
    interleaving, as one composed expression)."""
    p = int(precision)
    total = 5 * p
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = F.least(
        F.lit((1 << lon_bits) - 1),
        F.floor((F.col("lon") + 180.0) / 360.0 * float(1 << lon_bits))
        .cast("long"),
    )
    lat_q = F.least(
        F.lit((1 << lat_bits) - 1),
        F.floor((F.col("lat") + 90.0) / 180.0 * float(1 << lat_bits))
        .cast("long"),
    )
    h = F.lit(0).cast("long")
    for j in range(lon_bits):
        bit = F.shiftright(lon_q, lon_bits - 1 - j).bitwiseAND(1)
        h = h + F.shiftleft(bit, total - 1 - 2 * j)
    for j in range(lat_bits):
        bit = F.shiftright(lat_q, lat_bits - 1 - j).bitwiseAND(1)
        h = h + F.shiftleft(bit, total - 2 - 2 * j)
    chars = [
        F.substring(
            F.lit(GEOHASH32),
            (F.shiftright(h, 5 * (p - 1 - c)).bitwiseAND(31) + 1).cast("int"),
            1,
        )
        for c in range(p)
    ]
    return F.concat(*chars)


def geo_grid_page(corpus: DataFrame, cell: str, k: int = 20) -> DataFrame:
    """ES 8.3 `geo_grid` query: documents whose point falls inside ONE
    grid cell — a geotile ("z/x/y") or a geohash (base-32 string; a
    geohash cell contains a point iff the point's hash at the cell's
    precision EQUALS the cell, so containment needs no decoding).

    Returns (doc_id, url, lat, lon) ordered by doc_id asc, first k.

    Scale shape: the cell predicate is a pure comparison over derived
    columns — one pushed-filter scan + TakeOrdered.  On a grid-bucketed
    layout (partitioned by coarse tile, the ES geo-routing analogue) the
    same predicate becomes partition pruning.
    """
    df = _latlon(corpus)
    if "/" in cell:
        parts = cell.split("/")
        if len(parts) != 3:
            raise ValueError(f"bad geotile cell: {cell!r}")
        zoom, cx, cy = (int(v) for v in parts)
        if not 0 <= zoom <= 29:
            raise ValueError("geotile zoom must be in [0, 29]")
        x, y = _geotile_xy(zoom)
        pred = (x == cx) & (y == cy)
    else:
        c = cell.lower()
        if not c or any(ch not in GEOHASH32 for ch in c) or len(c) > 8:
            raise ValueError(f"bad geohash cell: {cell!r}")
        pred = _geohash_col(len(c)) == c
    # coordinates are centi-degree exact by construction; round the
    # EMITTED values to that grid (Spark derives via DECIMAL, DuckDB via
    # double division — the raw doubles differ in the last ulp)
    return (
        df.filter(pred)
        .select(
            "doc_id", "url",
            F.round("lat", 2).alias("lat"),
            F.round("lon", 2).alias("lon"),
        )
        .orderBy("doc_id")
        .limit(int(k))
    )


def geo_grid_sql(cell: str, k: int = 20) -> str:
    """DuckDB oracle for geo_grid_page — identical derivations."""
    if "/" in cell:
        zoom, cx, cy = (int(v) for v in cell.split("/"))
        n = 1 << zoom
        lat_c = "greatest(-85.05112878, least(85.05112878, lat))"
        x = (
            f"least({n - 1}, greatest(0, "
            f"CAST(floor((lon + 180.0) / 360.0 * {float(n)!r}) AS BIGINT)))"
        )
        y = (
            f"least({n - 1}, greatest(0, CAST(floor("
            f"(1.0 - ln(tan(radians({lat_c})) + 1.0 / cos(radians({lat_c})))"
            f" / pi()) / 2.0 * {float(n)!r}) AS BIGINT)))"
        )
        pred = f"{x} = {cx} AND {y} = {cy}"
        return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT doc_id, url, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus)
SELECT doc_id, url, round(lat, 2) AS lat, round(lon, 2) AS lon FROM geo
WHERE {pred}
ORDER BY doc_id ASC
LIMIT {int(k)}
"""
    c = cell.lower()
    p = len(c)
    total = 5 * p
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    lon_q = (
        f"least({(1 << lon_bits) - 1}, CAST(floor((lon + 180.0) / 360.0 * "
        f"{float(1 << lon_bits)!r}) AS BIGINT))"
    )
    lat_q = (
        f"least({(1 << lat_bits) - 1}, CAST(floor((lat + 90.0) / 180.0 * "
        f"{float(1 << lat_bits)!r}) AS BIGINT))"
    )
    terms = []
    for j in range(lon_bits):
        terms.append(
            f"(((lon_q >> {lon_bits - 1 - j}) & 1) << {total - 1 - 2 * j})"
        )
    for j in range(lat_bits):
        terms.append(
            f"(((lat_q >> {lat_bits - 1 - j}) & 1) << {total - 2 - 2 * j})"
        )
    hexpr = " + ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH32}', CAST(((h >> {5 * (p - 1 - c_)}) & 31) "
        f"AS INTEGER) + 1, 1)"
        for c_ in range(p)
    )
    esc = c.replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
geo AS (SELECT doc_id, url, {LAT_SQL} AS lat, {LON_SQL} AS lon FROM corpus),
q AS (SELECT doc_id, url, lat, lon, {lon_q} AS lon_q, {lat_q} AS lat_q
      FROM geo),
hh AS (SELECT doc_id, url, lat, lon, {hexpr} AS h FROM q)
SELECT doc_id, url, round(lat, 2) AS lat, round(lon, 2) AS lon FROM hh
WHERE ({chars}) = '{esc}'
ORDER BY doc_id ASC
LIMIT {int(k)}
"""
