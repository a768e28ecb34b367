"""Stateful streaming exact-dedup: first-seen-wins on content fingerprint.

The batch engine's `exact_dedup` (operators/similarity.py) is the corpus-wide
authority; this operator is its STREAMING complement for the intake path — a
custom stateful operator built on `applyInPandasWithState`, the pattern the
engine uses when Structured Streaming's built-ins (dropDuplicates +
watermark) can't express the semantics we want:

  * `dropDuplicatesWithinWatermark` keeps only a "seen" set and emits bare
    rows; we emit the batch-dedup contract row `(fp, canonical_id, n_dups)`
    so downstream consumers (checkpoint tables, metrics) see the SAME shape
    from both paths;
  * duplicate arrivals keep counting into state (`n_seen`) even though
    append mode can't retract the already-emitted row — the running count is
    exposed to ops tooling via the state store rather than lost;
  * an optional processing-time TTL bounds state: an idle fingerprint is
    evicted after `ttl_minutes`, making the operator a sliding dedup WINDOW
    (re-arrival after eviction re-emits), which is the honest semantic at
    10^12-row scale where unbounded exact state cannot be pinned forever.
    The TTL path requires a CONTINUOUS trigger: measured in this sandbox
    (Spark 4.1), `Trigger.AvailableNow` + `ProcessingTimeTimeout` never
    terminates — the driver keeps scheduling empty micro-batches to service
    pending state timeouts (>1,200 batches observed with no data), even
    after every key has evicted.  `run_streaming_dedup` therefore rejects
    `ttl_minutes` (it is the drain-once path); eviction is exercised under
    `processingTime` in tests/test_streaming.py.

Scale design (1000-executor deployment): state is one `(md5-hex key ->
int64)` entry per distinct fingerprint in the TTL window, hash-partitioned
by fingerprint across executors by the state-store shuffle — no skew (md5
keys are uniform) and no text in state.  Ship config pairs this with the
RocksDB state store (`spark.sql.streaming.stateStore.providerClass` =
RocksDBStateStoreProvider) so state spills off-heap; the sandbox uses the
default HDFS-backed store.  Corpus-scale NEAR-dup stays batch per the north
rule — banding signatures in streaming state would pin O(corpus) bytes that
the per-partition batch checkpoints (io/checkpoint.py) handle better.

Determinism contract (mirrors exact_dedup so the driver oracle can check
it): within one micro-batch, canonical_id = min(id) among the key's rows.
Across micro-batches, first-arrival wins — identical to the batch result
whenever one drain sees the whole corpus (Trigger.AvailableNow over a file
source with no rate limit runs a single batch), which is how the contract
query runs it.

Reference parity note: the reference library (fredo-dedup/JSONSchema.jl) is
batch-only — no streaming surface exists to mirror (SURVEY §2.9); this
module is engine-native intake machinery.
"""

from __future__ import annotations

import tempfile
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jsonschema_jl_spark.operators.textops import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: float | None = None,
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming DataFrame.

    Emits one row per NEWLY-seen normalized-text fingerprint:
    `(fp, canonical_id, n_dups)` where canonical_id/n_dups describe the
    micro-batch in which the key first appeared (min id / row count).
    Later-batch duplicates are suppressed (state) and counted into the
    state store; with `ttl_minutes` set, a fingerprint idle for that long
    is evicted and its next arrival re-emits (sliding dedup window).
    """
    id_type = stream.schema[id_col].dataType.simpleString()
    out_ddl = f"fp string, canonical_id {id_type}, n_dups long"
    ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes is not None else None

    keyed = stream.select(
        fingerprint(F.col(text_col)).alias("fp"), F.col(id_col).alias("id")
    )

    def dedup_fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past TTL: evict so a future arrival re-opens the window
            state.remove()
            return
        n = 0
        best = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf["id"].min()
            best = m if best is None else min(best, m)
        first_seen = not state.exists
        prev = 0 if first_seen else state.get[0]
        state.update((prev + n,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first_seen:
            yield pd.DataFrame(
                {"fp": [key[0]], "canonical_id": [best], "n_dups": [n]}
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_ddl,
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=timeout,
    )


def _drain_to_sink(
    spark: SparkSession,
    deduped: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drain a streaming dedup DataFrame once (Trigger.AvailableNow) into a
    parquet file sink and read back everything emitted so far.  The read-back
    passes the stream's own schema explicitly so a drain that emitted ZERO
    rows (e.g. every arrival gate-rejected, or fully state-suppressed on a
    resumed checkpoint) returns an empty DataFrame with the contract shape
    instead of failing parquet schema inference on an empty sink."""
    q = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(deduped.schema).parquet(sink_dir)


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str,
    checkpoint_dir: str,
    sink_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain `source_dir` once (Trigger.AvailableNow) through the stateful
    dedup into a parquet file sink and return everything emitted so far.
    The file sink (unlike the memory sink) supports checkpoint RECOVERY:
    a second drain with the same `checkpoint_dir` resumes the state store,
    so fingerprints seen in an earlier run stay suppressed, and the sink's
    per-batch commit log keeps replays idempotent
    (tested in tests/test_streaming.py).

    Without `max_files_per_trigger` the file source runs ONE micro-batch,
    making the output deterministic and equal to batch `exact_dedup` —
    the contract query `doc_streaming_dedup` relies on this.

    No `ttl_minutes` here: AvailableNow + ProcessingTimeTimeout never
    terminates (see module docstring) — TTL'd dedup is a continuous-query
    feature, started via `streaming_exact_dedup` + `processingTime`.
    """
    reader = spark.readStream.schema(schema_ddl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    deduped = streaming_exact_dedup(stream, id_col=id_col, text_col=text_col)
    return _drain_to_sink(spark, deduped, sink_dir, checkpoint_dir)


def run_gated_dedup_intake(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str,
    gate_schema: dict,
    checkpoint_dir: str,
    sink_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fmt: str = "parquet",
) -> DataFrame:
    """The north star's intake story in ONE streaming query: the compiled
    validation gate filters malformed arrivals, and survivors flow straight
    into the stateful first-seen-wins dedup — gate and dedup share a single
    micro-batch boundary, one checkpoint, one state store.

    Rows failing the gate never reach dedup state (their fingerprints are
    not burned: a later CORRECTED re-submission of the same content under a
    new id emits normally).  Drains once (AvailableNow, uncapped file
    trigger => one micro-batch, batch-equal output) and returns everything
    the sink holds; re-running with the same checkpoint resumes both the
    source offset log and the dedup state, so only new valid arrivals emit.

    Quarantine of rejects belongs to `run_gated_ingest` (foreachBatch can
    split valid/invalid); this path is the fast lane where rejects are
    dropped and only metrics matter — compose the two in a deployment by
    pointing them at the same arrival directory with separate checkpoints.
    """
    from jsonschema_jl_spark.streaming.ingest import gated_stream

    gated = gated_stream(
        spark, source_dir, schema_ddl, gate_schema, fmt=fmt,
        max_files_per_trigger=None,
    )
    valid = gated.filter(F.col("isvalid")).drop("issue", "isvalid")
    deduped = streaming_exact_dedup(valid, id_col=id_col, text_col=text_col)
    return _drain_to_sink(spark, deduped, sink_dir, checkpoint_dir)


def dedup_documents_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract entry: stream the documents table through the stateful
    dedup in one AvailableNow drain (fresh checkpoint, single micro-batch)
    — output equals batch exact_dedup, so the DuckDB oracle fully value-
    checks the applyInPandasWithState path.

    The streaming file source requires a DIRECTORY (`basePath must be a
    directory`); the testdata table is a single parquet file, so it is
    hard-linked into a temp source dir (no data copy)."""
    import os

    ckpt = tempfile.mkdtemp(prefix="stream_dedup_ckpt_")
    sink = tempfile.mkdtemp(prefix="stream_dedup_sink_")
    src = tempfile.mkdtemp(prefix="stream_dedup_src_")
    table = os.path.join(sf_dir, "documents.parquet")
    link = os.path.join(src, "documents.parquet")
    try:
        os.link(table, link)
    except OSError:  # cross-device: fall back to a copy
        import shutil

        shutil.copy(table, link)
    return run_streaming_dedup(
        spark,
        src,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ckpt,
        sink,
    )
