"""glad_tiles_pipeline_spark — a from-scratch PySpark-native CDC/incremental-
ingest engine.

Carries the query/data-processing capabilities of the reference
``wri/glad_tiles_pipeline`` (keyed source scan, newest-wins combine,
hierarchical aggregation, idempotent keyed sinks) re-expressed as idiomatic
Spark DataFrame pipelines over a change-event log and a snapshot-versioned
lake table.  See SURVEY.md for the blueprint; BASELINE.json for the
authoritative semantics (north_rule / input_hint).

Layout:
    session     — SparkSession factory with the AQE/Arrow conf set (SURVEY §4.1)
    sources/    — parquet/CSV scans, changelog tail, deterministic generator
    functions/  — vectorized scalar functions (sha256, lang-norm, text, vectors)
    operators/  — dedup (LWW + skew path), merge, doc-dedup, similarity, multimodal
    plans/      — lake-table format (manifest/snapshot/commit), planner, replay oracle
    streaming/  — readStream → foreachBatch exactly-once bridge
"""

__version__ = "0.1.0"
