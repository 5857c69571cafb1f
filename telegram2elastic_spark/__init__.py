"""telegram2elastic_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch rebuild of the capabilities of osintukraine/Telegram2Elastic
(reference at /root/reference, read-only): the reference streams documents
through a configurable projection/enrichment pipeline into Elasticsearch and
answers filtered, ranked searches from the store.  This package owns that
whole path natively on the Spark DataFrame stack:

- ``corpus``      — the Common-Crawl-style input table (url, warc_ts, html,
                    text, lang) per BASELINE.json input_hint, derived
                    deterministically from the driver testdata.
- ``functions``   — tokenizer/normalizer (byte-identical per url), scalar
                    parity helpers (FileSize / TimeInterval), text analysis.
- ``index``       — posting-list construction (salted repartition-by-term),
                    varbyte delta compression with block-max metadata,
                    doc_map / term_dict / segments tables.
- ``query``       — relational BM25 top-k, block-max WAND over compressed
                    postings, and the reference search pipeline
                    (filter -> sort -> count -> offset/limit).
- ``operators``   — training-data pipeline ops: dedup (exact/minhash/simhash/
                    jaccard/embedding), ANN similarity search, multimodal
                    column plumbing, output-map projections.
- ``streaming``   — micro-batch incremental indexing with checkpoint/resume
                    and sorted-merge segment compaction.
"""

__version__ = "0.1.0"
