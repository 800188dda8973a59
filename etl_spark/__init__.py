"""etl_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch with the capabilities of the reference ETL repo
(Infosecurity-LLC/ETL): ordered change-log tail -> dedup -> keyed upsert
with schema evolution, exactly-once, resumable, metered — re-expressed
Spark-first (DataFrame/Catalyst, copy-on-write snapshot lake table),
plus the dataframe operators a large-scale training-data pipeline needs
(dedup families, similarity search, text analysis, multimodal plumbing).

Layout:
  cdc/        the engine core: schema, generator, dedup, evolve, merge,
              lake (snapshot-versioned table w/ atomic commit), runner
  operators/  training-data operators (dedup_text, similarity, textstats,
              multimodal)
  functions/  Arrow-vectorized pandas UDFs (sha256, lang normalization)
  sources/    typed readers for the driver test tables
  plans/      plan-inspection helpers (pushdown / broadcast assertions)
  streaming/  Structured Streaming wrapper (foreachBatch -> same apply)
"""

__version__ = "0.1.0"
