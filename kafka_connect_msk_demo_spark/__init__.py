"""kafka_connect_msk_demo_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / SQL / Structured Streaming)
engine with the query and data-processing capabilities of the reference
streaming-lakehouse demo ``garystafford/kafka-connect-msk-demo``
(see SURVEY.md), plus first-class large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design tenets (enforced throughout):

* **DataFrame-first.** Every operator is declared through the DataFrame /
  SQL API so Catalyst handles predicate pushdown, column pruning, join
  selection, and whole-stage codegen. No RDDs.
* **Deterministic cross-engine arithmetic.** Aggregates that are
  hash-compared against a DuckDB oracle run on exact DECIMAL internally
  and only cast to DOUBLE at the boundary, so results are independent of
  partitioning / accumulation order (critical at 1000-executor scale).
* **Broadcast the small side.** Dimension tables (region/nation and the
  reference's 245-row sales_regions CSV) are always broadcast; fact-fact
  joins shuffle on their keys and rely on AQE for skew.
* **UTC everywhere.** ``spark.sql.session.timeZone=UTC`` pinned in
  :func:`session.get_spark` so event-time windows agree with the oracle.
"""

__version__ = "0.1.0"
