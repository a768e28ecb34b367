"""Structured Streaming ingest: validation-gated micro-batch intake.

The reference library is purely batch (no streaming anywhere in src/ —
SURVEY §2.9), and the north rule's pipeline is batch with checkpoint/resume,
NOT Structured Streaming.  This module exists for the ENGINE's own intake
path: a production deployment tails an arrival directory (or Kafka topic)
of image+caption records, applies the SAME compiled gate per micro-batch,
and appends valid rows to the corpus table that the batch dedup pipeline
consumes on its next run.

Design points:
  * the gate closure is compiled ONCE on the driver and reused across
    micro-batches — identical semantics to the batch path by construction
    (same apply_gate call);
  * `foreachBatch` is an at-least-once contract (a crash between the sink
    write and the streaming-checkpoint commit replays the batch), so each
    batch writes to its own `batch_id=N` partition directory with overwrite
    mode — a replayed batch rewrites the same directory instead of
    appending, making the sink idempotent and the pipeline effectively
    exactly-once; the dedup pipeline stays batch, triggered per corpus
    snapshot — streaming dedup state at 10^12 rows would pin signatures in
    executor state stores, which the north rule's per-partition batch
    checkpoints handle better;
  * Trigger.AvailableNow drains the backlog and stops — the cron-style
    intake used in tests and small deployments; switch to a processing-time
    trigger for continuous tailing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonschema_jl_spark.gate.gate import apply_gate


def gated_stream(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str,
    gate_schema: dict,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 64,
) -> DataFrame:
    """readStream over an arrival directory with the validation gate
    applied per micro-batch.  Returns the streaming DataFrame with
    `issue`/`isvalid` columns (same contract as batch apply_gate).

    `max_files_per_trigger=None` removes the per-batch file cap so an
    AvailableNow drain runs ONE micro-batch — required when downstream
    stateful operators want batch-equal determinism (streaming/dedup.py)."""
    reader = spark.readStream.format(fmt).schema(schema_ddl)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return apply_gate(reader.load(source_dir), gate_schema)


def run_gated_ingest(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str,
    gate_schema: dict,
    corpus_dir: str,
    checkpoint_dir: str,
    rejects_dir: str | None = None,
    fmt: str = "parquet",
    on_batch: Callable[[DataFrame, int], None] | None = None,
):
    """Drain the arrival directory once (Trigger.AvailableNow): valid rows
    append to the corpus table, rejects (with their issue struct) to the
    quarantine table.  Returns the terminated StreamingQuery.

    foreachBatch replays a batch if the run dies between the sink write and
    the checkpoint commit (at-least-once); writes are made idempotent by
    keying each batch to its own `batch_id=N` partition directory with
    overwrite mode, so a replay rewrites rather than duplicates — the
    corpus the batch dedup pipeline reads is effectively exactly-once."""
    gated = gated_stream(spark, source_dir, schema_ddl, gate_schema, fmt=fmt)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        batch_df.filter(F.col("isvalid")).drop("issue", "isvalid").write.mode(
            "overwrite"
        ).parquet(f"{corpus_dir}/batch_id={batch_id}")
        if rejects_dir is not None:
            batch_df.filter(~F.col("isvalid")).drop("isvalid").write.mode(
                "overwrite"
            ).parquet(f"{rejects_dir}/batch_id={batch_id}")
        if on_batch is not None:
            on_batch(batch_df, batch_id)
        batch_df.unpersist()

    q = (
        gated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
