"""`sep_events` — a Structured Streaming source replaying the event
feed with offsets: the SEP subscription analog (SURVEY §3.2 EP3).

Reference semantics reproduced ([R: sep-impl/.../SepConsumer.java,
SepModelImpl.java — UNVERIFIED], SURVEY §1.1):
- a *subscription* is a durable named consumer → here the streaming
  query's checkpointLocation (offsets = the replication position);
- delivery is *batched* and *ordered per row key* → micro-batches are
  cut from the feed sorted by (ts, event_id), so any single key's
  events always arrive in order;
- delivery is *at-least-once* → the `redeliver_every` option re-emits
  every Nth event in the following batch (off by default), letting
  downstream `dropDuplicatesWithinWatermark` prove the
  exactly-once recovery that SEP demands of its listeners
  ([R: sep-api/.../EventListener.java — UNVERIFIED]).

Implementation: Spark 4 Python DataSource (pyspark.sql.datasource)
with a SimpleDataSourceStreamReader. The prefetch/replay machinery
(readBetweenOffsets) comes from the Simple reader wrapper; offsets
are row positions in the ts-ordered feed. The feed file is read once
per reader via pyarrow and kept as arrow data on the driver-side
reader (fine for the replay source; the batch path reads the same
parquet distributed).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


class SepEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_size = int(options.get("batch_size", "2500"))
        self.redeliver_every = int(options.get("redeliver_every", "0"))
        self._rows = None  # lazy: loaded on first read

    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            tbl = pq.read_table(self.path)
            df = tbl.to_pandas()
            # ts arrives as datetime64[ns]; per-key order == global
            # (ts, event_id) order.
            df = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
            # The arrow converter on the Spark side requires tz-aware
            # timestamps (it normalizes via astimezone); the feed is UTC.
            df["ts"] = df["ts"].dt.tz_localize("UTC")
            self._rows = list(df.itertuples(index=False, name=None))
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["row"]
        hi = min(lo + self.batch_size, len(rows))
        if hi == lo:
            # Feed exhausted: the offset must not advance and no rows
            # (not even redeliveries) may be emitted.
            return iter(()), {"row": hi}
        batch = list(rows[lo:hi])
        if self.redeliver_every and lo > 0:
            # At-least-once: re-emit a sample of the PREVIOUS batch.
            prev = rows[max(0, lo - self.batch_size) : lo]
            batch.extend(prev[:: self.redeliver_every])
        return iter(batch), {"row": hi}

    def commit(self, end: dict) -> None:
        # The durable position lives in the query checkpoint (Spark
        # persists offsets); nothing to clean up source-side.
        pass


class SepEventsDataSource(DataSource):
    """spark.readStream.format("sep_events").option("path", ...)"""

    @classmethod
    def name(cls) -> str:
        return "sep_events"

    def schema(self):
        return EVENT_SCHEMA

    def simpleStreamReader(self, schema):
        return SepEventsStreamReader(self.options)


def _ensure_package_on_workers(spark) -> None:
    """Ship the hbase_sep_spark package to Spark's Python workers.

    The DataSource class is pickled by reference; the worker (and the
    driver-side python_streaming_source_runner subprocess) must be
    able to import the module — which fails whenever the launching
    process's cwd isn't the repo root. addPyFile of a package zip is
    the standard fix and covers every future task."""
    flag = "spark.hbase_sep_spark.pyfiles.added"
    try:
        if spark.conf.get(flag, "no") == "yes":
            return
    except Exception:  # noqa: BLE001 - conf.get w/ default varies by version
        pass
    import os
    import tempfile
    import zipfile

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pkg_root = os.path.join(repo_root, "hbase_sep_spark")
    zpath = os.path.join(tempfile.gettempdir(), "hbase_sep_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_root):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo_root))
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set(flag, "yes")


def register_sep_source(spark) -> None:
    """Idempotent registration of the sep_events format.

    The DataSource is unpickled inside Spark's
    python_streaming_source_runner subprocess, which does NOT see
    addPyFile-shipped modules (that mechanism only wraps task
    execution). Registering this module for pickle-BY-VALUE makes the
    class fully self-contained on the wire, so registration works no
    matter what the launching process's cwd or sys.path is."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    _ensure_package_on_workers(spark)
    spark.dataSource.register(SepEventsDataSource)
