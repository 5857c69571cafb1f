"""Multimodal columns: opaque binary payloads + typed metadata + decode UDFs.

The reference treats media as bytes flowing to a content-addressed store
(download telegram2elastic.py:490; sha256 keying s3_client.py:100-137;
media_type/mime/size rule checks telegram2elastic.py:191-244).  Here the
binary payload stays IN the table (input_hint: html is binary) and the
media stages are Spark-native:

  * metadata     — pure built-ins (sha2 / length / substring), codegen'd;
  * decode       — Arrow-batched `mapInPandas` (schema, batching and
    partitioning are the real thing); the *codec* inside is a
    deterministic fake because image/audio libraries are not in this
    container — the real decoder drops into `_decode_batch` behind the
    same signature (see `decode_image_real`, which raises
    NotImplementedError until PIL/ffmpeg are present).

Scale notes: binary columns ride Parquet/Arrow untouched (no Python
round-trip until a decode stage is explicitly requested); decode
parallelism is per-partition, sized by spark.sql.files.maxPartitionBytes;
content-dedup before decode (sha256 anti-join) is the 30-45% saving the
reference measured (poc/README.md:296).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int, ok boolean"
)


def media_metadata(corpus: DataFrame) -> DataFrame:
    """Typed metadata for the binary column: size, content hash, hash-prefix
    storage key (media/ab/cd/<sha>, s3_client.py:132-137), kind."""
    sha = F.sha2(F.col("html"), 256)
    return corpus.select(
        "doc_id",
        F.length("html").cast("long").alias("n_bytes"),
        sha.alias("sha256"),
        F.concat(
            F.lit("media/"),
            F.substring(sha, 1, 2),
            F.lit("/"),
            F.substring(sha, 3, 2),
            F.lit("/"),
            sha,
            F.lit(".html"),
        ).alias("storage_key"),
        F.lit("text/html").alias("mime_type"),
    ).orderBy("doc_id")


MEDIA_METADATA_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       octet_length(html) AS n_bytes,
       sha256(CAST(html AS VARCHAR)) AS sha256,
       'media/' || substr(sha256(CAST(html AS VARCHAR)), 1, 2) || '/'
           || substr(sha256(CAST(html AS VARCHAR)), 3, 2) || '/'
           || sha256(CAST(html AS VARCHAR)) || '.html' AS storage_key,
       'text/html' AS mime_type
FROM corpus ORDER BY doc_id
"""


# Reference default media file pattern (telegram2elastic.py:250):
#   "{date[year]}-{date[month]}-{date[day]}_{date[hour]}-{date[minute]}-
#    {date[second]}_{message[id]}_{file[name]}.{file[ext]}"
# with month..second zero-padded to 2 via str.rjust(2, "0")
# (telegram2elastic.py:466-481) and format_map over the
# {date:…, file:…, message:…} dict (:484).
DEFAULT_FILE_PATTERN = (
    "{date[year]}-{date[month]}-{date[day]}"
    "_{date[hour]}-{date[minute]}-{date[second]}"
    "_{message[id]}_{file[name]}.{file[ext]}"
)

_FIELD_RE = re.compile(r"\{(\w+)\[(\w+)\]\}")


def _pattern_fields() -> dict[tuple[str, str], F.Column]:
    """The filename_pattern_map (telegram2elastic.py:465-481) as Spark
    columns over the corpus: message.date -> warc_ts, message.id -> doc_id,
    message.chat_id -> the site number, file name/ext from the url."""
    ts = F.col("warc_ts")
    basename = F.regexp_extract("url", r"([^/]+)$", 1)
    stem = F.regexp_replace(basename, r"\.[^.]*$", "")
    chat_id = (F.col("doc_id") % 1000).cast("string")
    # original_filename fallback: msg{chat_id}-{id} when the file carries
    # no name (telegram2elastic.py:445-448)
    name = F.when(
        stem == "", F.concat(F.lit("msg"), chat_id, F.lit("-"), F.col("doc_id"))
    ).otherwise(stem)
    pad = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731  str.rjust(2,"0")
    return {
        ("date", "year"): F.year(ts).cast("string"),
        ("date", "month"): pad(F.month(ts)),
        ("date", "day"): pad(F.dayofmonth(ts)),
        ("date", "hour"): pad(F.hour(ts)),
        ("date", "minute"): pad(F.minute(ts)),
        ("date", "second"): pad(F.second(ts)),
        ("message", "id"): F.col("doc_id").cast("string"),
        ("message", "chat_id"): chat_id,
        ("file", "name"): name,
        ("file", "ext"): F.lit("html"),
    }


def media_filename(
    corpus: DataFrame, pattern: str = DEFAULT_FILE_PATTERN
) -> DataFrame:
    """P7/C15: the media download filename from the configurable
    `file_pattern` (telegram2elastic.py:484 `format_map`): the pattern's
    `{section[key]}` placeholders compile driver-side into ONE `concat`
    of literal segments and column refs — pure built-ins, codegen'd,
    no Python in the hot path."""
    fields = _pattern_fields()
    parts: list[F.Column] = []
    pos = 0
    for m in _FIELD_RE.finditer(pattern):
        if m.start() > pos:
            parts.append(F.lit(pattern[pos : m.start()]))
        key = (m.group(1), m.group(2))
        if key not in fields:
            raise KeyError(f"unknown pattern field {{{key[0]}[{key[1]}]}}")
        parts.append(fields[key])
        pos = m.end()
    if pos < len(pattern):
        parts.append(F.lit(pattern[pos:]))
    return corpus.select(
        "doc_id", F.concat(*parts).alias("filename")
    ).orderBy("doc_id")


MEDIA_FILENAME_SQL = f"""
WITH {CORPUS_CTE.strip()},
named AS (
  SELECT doc_id, warc_ts,
         regexp_replace(regexp_extract(url, '([^/]+)$', 1),
                        '\\.[^.]*$', '') AS stem
  FROM corpus
)
SELECT doc_id,
       strftime(warc_ts, '%Y-%m-%d_%H-%M-%S') || '_'
         || CAST(doc_id AS VARCHAR) || '_'
         || CASE WHEN stem = ''
                 THEN 'msg' || CAST(doc_id % 1000 AS VARCHAR) || '-'
                      || CAST(doc_id AS VARCHAR)
                 ELSE stem END
         || '.html' AS filename
FROM named ORDER BY doc_id
"""


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder over one Arrow batch.

    Stands in for image decode / resize / frame-sample; derives stable
    pseudo-dimensions from payload size so the pipeline (schema, batch
    shape, partition parallelism) is fully exercised and oracle-checkable.
    """
    n = pdf["html"].map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].astype("int64"),
            "n_bytes": n,
            "fake_width": (n % 640).astype("int32"),
            "fake_height": ((n * 7) % 480).astype("int32"),
            "ok": n > 0,
        }
    )


def decode_media(corpus: DataFrame) -> DataFrame:
    """mapInPandas decode stage: Iterator[pd.DataFrame] -> Iterator — one
    init per task, Arrow batches throughout (no per-row Python)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return (
        corpus.select("doc_id", "html").mapInPandas(fn, DECODE_SCHEMA).orderBy("doc_id")
    )


DECODE_MEDIA_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       octet_length(html) AS n_bytes,
       CAST(octet_length(html) % 640 AS INTEGER) AS fake_width,
       CAST((octet_length(html) * 7) % 480 AS INTEGER) AS fake_height,
       octet_length(html) > 0 AS ok
FROM corpus ORDER BY doc_id
"""


def decode_image_real(corpus: DataFrame) -> DataFrame:
    """The real-decoder slot: identical plan shape, actual image codec.

    Gated behind an import-try per the environment contract (no image
    libraries in this container)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires PIL; the Spark-side plumbing is "
            "decode_media() — swap _decode_batch for a PIL-based kernel"
        ) from e
    raise NotImplementedError("PIL present but real decoder not wired yet")


# --- frame sampling (video-shaped fan-out) ------------------------------------

FRAME_SIZE = 16
FRAME_STRIDE = 32
MAX_FRAMES = 4


def frame_sample(
    corpus: DataFrame,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Frame-sampling stage for video-shaped binary payloads: each doc
    fans out to up to `max_frames` fixed-size byte windows at `stride`
    offsets — the 1->N output shape a real ffmpeg frame sampler has
    (opaque bytes in, one row per sampled frame out), exercised end to
    end with a deterministic windowing rule so the DuckDB oracle pins
    every byte.  mapInPandas with output fan-out: batch in, larger batch
    out, no per-row Python objects beyond the hash call (the real
    sampler drops into the same kernel).  Returns (doc_id, frame_idx,
    off, frame_sha), one row per frame."""
    import hashlib

    fs, st, mf = int(frame_size), int(stride), int(max_frames)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, shas = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["html"]):
                b = bytes(payload)
                n_frames = (
                    min(mf, (len(b) - fs) // st + 1) if len(b) >= fs else 0
                )
                for i in range(n_frames):
                    off = i * st
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    shas.append(
                        hashlib.sha256(b[off : off + fs]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "off": pd.Series(offs, dtype="int64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return (
        corpus.select("doc_id", "html")
        .mapInPandas(
            fn, "doc_id long, frame_idx int, off long, frame_sha string"
        )
        .orderBy("doc_id", "frame_idx")
    )


def frame_sample_sql(
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> str:
    # the html payload is ASCII by construction, so byte windows equal
    # char windows on the VARCHAR cast (the media_metadata hash pattern)
    return f"""
WITH {CORPUS_CTE.strip()},
sized AS (
  SELECT doc_id, CAST(html AS VARCHAR) AS payload,
         octet_length(html) AS n
  FROM corpus
),
framed AS (
  SELECT doc_id, CAST(f.i AS INTEGER) AS frame_idx,
         f.i * {int(stride)} AS off,
         sha256(substring(payload, CAST(f.i * {int(stride)} + 1 AS BIGINT),
                          {int(frame_size)})) AS frame_sha
  FROM sized,
       unnest(range(0, CAST(CASE WHEN n >= {int(frame_size)}
                            THEN least({int(max_frames)},
                                       (n - {int(frame_size)})
                                         // {int(stride)} + 1)
                            ELSE 0 END AS BIGINT))) AS f(i)
)
SELECT doc_id, frame_idx, off, frame_sha FROM framed
ORDER BY doc_id, frame_idx
"""


# --- feature extraction (embedding-shaped output) -----------------------------

FEATURE_DIM = 8


def feature_extract(corpus: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction stage: binary payload -> fixed-dim float vector
    (the CLIP-embedding shape: array<double> out of an Arrow-batched
    kernel).  The kernel is a deterministic fake (md5-derived features,
    oracle-identical in DuckDB); a real encoder replaces the inner
    function behind the same (batch in, doc_id + array out) signature.
    dim <= 8 (one md5 yields 8 16-bit features)."""
    import hashlib

    d = int(dim)
    if not 1 <= d <= 8:
        raise ValueError("dim must be in [1, 8] (one md5 = 8 features)")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["html"]:
                h = hashlib.md5(bytes(payload)).hexdigest()
                feats.append(
                    [
                        round(int(h[j * 4 : j * 4 + 4], 16) / 65535.0, 5)
                        for j in range(d)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "features": pd.Series(feats, dtype="object"),
                }
            )

    return (
        corpus.select("doc_id", "html")
        .mapInPandas(fn, "doc_id long, features array<double>")
        .orderBy("doc_id")
    )


def feature_extract_sql(dim: int = FEATURE_DIM) -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       list_transform(range(0, {int(dim)}),
         j -> round(('0x' || substr(md5(CAST(html AS VARCHAR)),
                                    CAST(j * 4 + 1 AS BIGINT), 4))::BIGINT
                    / 65535.0, 5)) AS features
FROM corpus ORDER BY doc_id
"""
