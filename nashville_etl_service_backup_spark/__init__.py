"""PySpark-native analytics/ETL engine with the capabilities of the
reference `shatteredsent/nashville-etl-service-backup` (see SURVEY.md).

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst optimizes (predicate pushdown, column pruning, broadcast joins,
AQE), with Pandas UDFs only where built-ins genuinely cannot express the
semantics (LLM extraction stub, binary document parsing, CRS transform).

Layout
------
- ``session``     SparkSession builder (AQE, UTC, Arrow, tuned shuffle)
- ``schemas``     canonical curated schema + per-source raw schemas
- ``tables``      parquet table loaders for the driver testdata
- ``functions/``  scalar Column-expression builders (dates, text,
                  categorize, cleaning, geo) — reference §2.8 F1–F21
- ``operators/``  composite dataflow operators (serving query, dedup,
                  similarity search, text analysis, pagination)
- ``plans/``      end-to-end plans (canonicalize raw zone → curated,
                  dedup load)
- ``sources/``    ingestion: CSV/JSON with synonym mapping, document
                  binary parsers, REST connector scaffolding
- ``streaming/``  Structured Streaming: raw-zone AvailableNow pipeline,
                  watermarked window aggregations
"""

__version__ = "0.1.0"
