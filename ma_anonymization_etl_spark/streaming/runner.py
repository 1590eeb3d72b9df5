"""Structured Streaming wrappers — SURVEY.md §2 a5/a6, k5/k7/k9.

Design (SURVEY §5.3): every event operator ships batch-first (group K
batch forms, oracle-checked); this module runs the SAME transforms
through readStream → writeStream.  ``run_to_memory`` executes a
bounded stream with trigger(availableNow) and hands back the memory
sink as a plain DataFrame, which is how the registry exposes
*streaming* executions to the driver's batch-style oracle check: the
stream computes, DuckDB verifies.

Scale notes: file source here stands in for Kafka — swap
``readStream.format("kafka")`` in production; the transform chain is
identical.  Watermarks bound state (late drop k5, dedup k6, stateful
k7); foreachBatch (k9) is the anonymization route applied per
micro-batch with exactly-once parquet output via checkpointing.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from ma_anonymization_etl_spark.session import configure

def stream_events(spark: SparkSession, sf_dir: str, path: str | None = None) -> DataFrame:
    """a5: event-stream source (file source standing in for Kafka).

    The file source requires a *directory*; the corpus ships one file
    per table, so it is staged (copied once) into a scratch dir keyed
    by sf_dir.

    Streaming file sources never infer a schema, and forcing a wrong
    one over the nanos ``ts`` column silently mis-reads values on
    builds where ``nanosAsLong`` is inert — so the schema is probed
    from one cheap batch footer read of the same directory, then the
    stream applies the identical ``normalize_events_ts`` the batch
    path uses.  Batch ≡ stream equality is pinned in
    tests/test_streaming.py.
    """
    from ma_anonymization_etl_spark.sources.io import normalize_events_ts

    configure(spark)
    if path is None:
        src_file = f"{sf_dir.rstrip('/')}/events.parquet"
        key = sf_dir.rstrip("/").replace("/", "_")
        path = os.path.join(tempfile.gettempdir(), "mael_stream_src", key)
        staged = os.path.join(path, "events.parquet")
        if not os.path.exists(staged):
            os.makedirs(path, exist_ok=True)
            # Stage via temp-name + rename: the dir is shared across
            # concurrent engine processes (deliberately — it's a
            # read-only cache), and a plain copy would let another
            # process read a half-written file.  rename() is atomic on
            # POSIX, so readers see either nothing or the full file.
            tmp = os.path.join(path, f".events.{uuid.uuid4().hex}.tmp")
            shutil.copy(src_file, tmp)
            try:
                os.rename(tmp, staged)
            except OSError:
                # POSIX rename replaces an existing target atomically, so
                # a concurrent-stage race cannot raise — anything here is
                # a real failure (permissions, cross-device): clean the
                # temp file and surface it instead of leaving the caller
                # to fail later on an empty staging dir.
                os.unlink(tmp)
                raise
    schema = spark.read.parquet(path).schema  # footer-only, no data scan
    raw = spark.readStream.schema(schema).parquet(path)
    return normalize_events_ts(raw)


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Run a bounded stream (availableNow) into a memory sink; block
    until drained; return the sink table as a normal DataFrame."""
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(qname)


def run_until(df: DataFrame, name: str, output_mode: str, done_fn, timeout_s: float = 120.0) -> DataFrame:
    """Run an unbounded-source stream into a memory sink until
    ``done_fn(sink_df)`` is truthy, then stop the query and return the
    sink.  For sources where trigger(availableNow) can't see the full
    bounded range up front (e.g. Python stream readers, which prefetch
    one micro-batch at a time on the driver)."""
    import time

    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .start()
    )
    sink = df.sparkSession.table(qname)
    deadline = time.monotonic() + timeout_s
    try:
        while not done_fn(sink):
            if time.monotonic() > deadline:
                raise TimeoutError(f"stream {qname} did not drain in {timeout_s}s")
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    return sink


def run_foreach_batch(df: DataFrame, batch_fn, checkpoint: str | None = None) -> None:
    """a6/k9: micro-batch sink — apply ``batch_fn(batch_df, batch_id)``
    per micro-batch with checkpointed exactly-once progress."""
    ckpt = checkpoint or os.path.join(
        tempfile.gettempdir(), "mael_ckpt", uuid.uuid4().hex
    )
    q = (
        df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
