"""drive_health_etl_spark — a PySpark-native event-ingestion ETL + analytics engine.

Re-expresses the capabilities of the reference (DaRealBada/Drive-Health-ETL, a
Node.js Pub/Sub -> Cloud Run -> BigQuery pipeline) as idiomatic Spark:

- ``operators.ingest``   — the full ingest chain (decode -> validate -> sample
  -> normalize -> dedup -> warehouse row) as declarative DataFrame transforms.
- ``operators.dlq``      — DLQ replay / parking-lot routing as a batch job.
- ``streaming``          — the same transforms wrapped in Structured Streaming.
- ``plans``              — the analytic query layer (the SQL the reference
  delegates to BigQuery, generalized to the full relational operator set).
- ``operators.{dedup,similarity,text}`` — LLM-data-pipeline operators over the
  documents/embeddings tables.

Design rules (see SURVEY.md §4): native column expressions over UDFs; Catalyst
does the optimization; only `normalize_phone` crosses the Python boundary.
"""

__version__ = "0.1.0"
