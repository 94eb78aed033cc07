"""debezium_incubator_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of debezium/debezium-incubator.

The reference (/root/reference, archived tombstone of
debezium/debezium-incubator — README.md:13 "low latency data streaming
platform for change data capture") is a CDC *producer*: it tails database
transaction logs and ships change-event streams to Kafka. This engine is
the Spark-first re-expression of that capability surface plus the
consumer-side query layer Debezium itself delegates to downstream systems:

- CDC envelope model + parsing (``cdc/``) — Debezium's
  ``{before, after, source, op, ts_ms}`` envelope as Spark StructTypes,
  batch and Structured Streaming.
- Relational operators (``operators/``) — scans, joins, aggregates,
  window functions, sorts, set ops; all declarative DataFrame/Catalyst.
- Scalar function surface (``functions/``).
- Event/stream analytics (``events/``, ``streaming/``) — tumbling /
  sliding / session windows, watermarks, stateful latest-state fold.
- LLM-data-pipeline operators (``llm/``) — dedup (exact / MinHash-LSH /
  SimHash), similarity search, text analysis, multimodal column plumbing.

Design notes for 100 TB scale are inline per operator; every query is
registered in ``registry`` with a DuckDB oracle SQL twin for differential
verification (SURVEY.md §5).
"""

__version__ = "0.1.0"
