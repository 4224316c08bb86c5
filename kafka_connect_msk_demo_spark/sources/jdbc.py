"""JDBC polling source (S11) — the Kafka Connect JDBC source
connector's incremental modes as a driver-side poll loop.

Reference semantics:

* whole-table whitelist + ``timestamp`` mode on ``last_update``
  (``kafka-connect-image/config/jdbc_source_connector_postgresql_00.json:8-11``),
* ``incrementing`` id and pushed-down custom query
  (``…_02.json:8-11``).

Architecture: predicate generation and offset state are pure Python
(unit-testable with any fetcher); the default fetcher pushes the
predicate into the database via ``spark.read.format("jdbc")`` with a
subquery ``dbtable`` — the DB does the filtering, Spark never scans
rows it has already delivered (exactly the connector's contract).

At scale the poll predicate is also the partitioning handle: pass
``partition_column/num_partitions/bounds`` through ``reader_options``
and each poll becomes a parallel bounded read instead of one task.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcPollState:
    """Connector offset state: highest seen values per mode."""
    last_incrementing: Optional[int] = None
    last_timestamp: Optional[str] = None  # ISO string, DB-comparable


@dataclass
class JdbcPoller:
    """Incremental JDBC source. ``mode`` ∈ {'incrementing', 'timestamp',
    'timestamp+incrementing'} (the connector's three modes)."""

    table: str
    mode: str = "incrementing"
    incrementing_column: str | None = None
    timestamp_column: str | None = None
    state: JdbcPollState = field(default_factory=JdbcPollState)

    def __post_init__(self) -> None:
        if "incrementing" in self.mode and not self.incrementing_column:
            raise ValueError("incrementing mode needs incrementing_column")
        if "timestamp" in self.mode and not self.timestamp_column:
            raise ValueError("timestamp mode needs timestamp_column")

    # -- offset predicate (pure) ------------------------------------------

    def predicate(self) -> str:
        """WHERE clause selecting only rows newer than the stored
        offsets — the exact dedup contract of the connector: strictly
        greater on the incrementing id; timestamp mode uses >= with the
        (ts, id) pair to not lose same-timestamp rows."""
        s = self.state
        if self.mode == "incrementing":
            if s.last_incrementing is None:
                return "1=1"
            return f"{self.incrementing_column} > {s.last_incrementing}"
        if self.mode == "timestamp":
            if s.last_timestamp is None:
                return "1=1"
            return f"{self.timestamp_column} > '{s.last_timestamp}'"
        # timestamp+incrementing: tuple ordering
        if s.last_timestamp is None:
            return "1=1"
        return (f"({self.timestamp_column} > '{s.last_timestamp}' OR "
                f"({self.timestamp_column} = '{s.last_timestamp}' AND "
                f"{self.incrementing_column} > {s.last_incrementing}))")

    def advance(self, batch: DataFrame) -> int:
        """Advance offsets past a delivered batch; returns batch size.
        One tiny aggregate job — the only driver-side action per poll.

        In timestamp+incrementing mode the offset MUST come from the
        single last row in (ts, id) order — column-wise independent
        maxes would fabricate a state like (ts=2, inc=100) from rows
        (ts=1,id=100) and (ts=2,id=5), and a later (ts=2,id=6) would
        fail the tuple predicate and be silently lost. ``max(struct)``
        orders lexicographically by field, exactly the tuple order the
        predicate checks."""
        from pyspark.sql import functions as F
        aggs = [F.count(F.lit(1)).alias("n")]
        if self.mode == "timestamp+incrementing":
            aggs.append(F.max(F.struct(
                F.col(self.timestamp_column).cast("string").alias("ts"),
                F.col(self.incrementing_column).alias("inc"),
            )).alias("last"))
        elif "incrementing" in self.mode:
            aggs.append(F.max(self.incrementing_column).alias("max_inc"))
        elif "timestamp" in self.mode:
            aggs.append(F.max(self.timestamp_column).cast("string")
                        .alias("max_ts"))
        row = batch.agg(*aggs).first()
        if row.n:
            if self.mode == "timestamp+incrementing":
                if row.last is not None and row.last.ts is not None:
                    self.state.last_timestamp = row.last.ts
                    self.state.last_incrementing = row.last.inc
            elif "incrementing" in self.mode:
                if row.max_inc is not None:
                    self.state.last_incrementing = row.max_inc
            elif "timestamp" in self.mode:
                if row.max_ts is not None:
                    self.state.last_timestamp = row.max_ts
        return row.n

    # -- polling -----------------------------------------------------------

    def poll(self, fetch: Callable[[str], DataFrame]) -> DataFrame:
        """One poll: fetch rows matching the offset predicate, advance
        the offsets, return the batch. ``fetch(predicate)`` abstracts
        the transport (JDBC in production, any DataFrame source in
        tests)."""
        batch = fetch(self.predicate())
        self.advance(batch)
        return batch

    def jdbc_fetcher(self, spark: SparkSession, url: str,
                     properties: dict[str, str] | None = None,
                     reader_options: dict[str, str] | None = None
                     ) -> Callable[[str], DataFrame]:
        """Production fetcher: pushes the predicate into the DB as a
        subquery dbtable (the connector's query+WHERE pushdown,
        ``jdbc_source_connector_postgresql_02.json:10``)."""
        def _fetch(predicate: str) -> DataFrame:
            sub = f"(SELECT * FROM {self.table} WHERE {predicate}) AS poll"
            reader = (spark.read.format("jdbc")
                      .option("url", url)
                      .option("dbtable", sub))
            for k, v in (properties or {}).items():
                reader = reader.option(k, v)
            for k, v in (reader_options or {}).items():
                reader = reader.option(k, v)
            return reader.load()
        return _fetch
