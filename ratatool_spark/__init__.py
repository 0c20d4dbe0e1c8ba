"""ratatool_spark — a from-scratch PySpark-native analytics engine with the
query/data-processing capabilities of spotify/ratatool (reference studied at
/root/reference, snapshot 2026-05-01), re-expressed Spark-first.

Capabilities (SURVEY.md section 2):
  - sampling: random / deterministic-hash / stratified / uniform, approx or
    exact (``operators.sampler``)
  - diffing: pairwise keyed dataset diff with field-level statistical
    summaries, the "BigDiffy" family (``operators.diffy``)
  - generation: schema-driven random record DataFrames (``generators``)
  - IO: parquet / avro / json sources+sinks with schema extraction, merge and
    output memoization (``sources.io``)
plus the large-scale training-data-pipeline extensions:
  - dedup: exact / minhash-LSH / simhash / ngram-jaccard / embedding-cosine
    (``operators.dedup``)
  - similarity search: brute-force + LSH-bucketed ANN (``operators.similarity``)
  - text analysis: lang-id, quality scoring, token counts, fingerprints
    (``functions.text``)
  - multimodal binary-column plumbing (``operators.multimodal``)
  - streaming: windowed/watermarked event aggregation (``streaming.events``)

Everything is DataFrame/Catalyst-first: plans are declared with pyspark.sql
expressions so predicate pushdown, column pruning, partial aggregation,
broadcast joins and whole-stage codegen all apply; Python UDFs appear only
where semantics genuinely require them (and then vectorized via Arrow).
"""

__version__ = "0.4.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
