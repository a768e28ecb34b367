"""Structured Streaming intake: gate semantics identical to batch, valid
rows appended exactly once, rejects quarantined with their issue, resume
from the streaming checkpoint processes only new arrivals."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from jsonschema_jl_spark.streaming import run_gated_ingest

SCHEMA_DDL = "image_id string, w int, h int, fmt string, caption string"
GATE = {
    "type": "object",
    "required": ["image_id", "w", "h", "fmt", "caption"],
    "properties": {
        "w": {"minimum": 1},
        "h": {"minimum": 1},
        "fmt": {"enum": ["png", "jpeg", "webp"]},
        "caption": {"type": "string", "minLength": 3},
    },
}


def _write_arrivals(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA_DDL).coalesce(1).write.mode("append").parquet(path)


def test_gated_ingest_appends_valid_and_quarantines(spark, tmp_path):
    src = str(tmp_path / "arrivals")
    corpus = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    rejects = str(tmp_path / "rejects")

    _write_arrivals(spark, src, [
        ("a", 10, 10, "png", "a good caption"),
        ("b", -1, 10, "png", "bad width"),
        ("c", 10, 10, "bmp", "bad format"),
        ("d", 10, 10, "webp", "another good one"),
    ])
    run_gated_ingest(spark, src, SCHEMA_DDL, GATE, corpus, ckpt, rejects_dir=rejects)

    got = {r.image_id for r in spark.read.parquet(corpus).collect()}
    assert got == {"a", "d"}
    rej = {r.image_id: r.issue.reason for r in spark.read.parquet(rejects).collect()}
    assert rej == {"b": "minimum", "c": "enum"}

    # resume: new arrivals only — the checkpoint must not reprocess a-d
    _write_arrivals(spark, src, [
        ("e", 5, 5, "jpeg", "late but valid"),
        ("f", 5, 5, "png", "x"),  # minLength reject
    ])
    run_gated_ingest(spark, src, SCHEMA_DDL, GATE, corpus, ckpt, rejects_dir=rejects)

    corpus_rows = spark.read.parquet(corpus).collect()
    assert {r.image_id for r in corpus_rows} == {"a", "d", "e"}
    assert len(corpus_rows) == 3  # exactly once: no duplicate appends
    rej2 = {r.image_id for r in spark.read.parquet(rejects).collect()}
    assert rej2 == {"b", "c", "f"}


DOC_DDL = "doc_id bigint, text string"


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, DOC_DDL).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_first_seen_wins_across_runs(spark, tmp_path):
    from jsonschema_jl_spark.streaming import run_streaming_dedup

    src = str(tmp_path / "darr")
    ckpt = str(tmp_path / "dckpt")
    sink = str(tmp_path / "dsink")
    # batch 1: two dups of one text (normalization collapses case/space),
    # one singleton
    _write_docs(spark, src, [
        (7, "Hello  World"),
        (3, "hello world "),
        (9, "unique text"),
    ])
    out1 = run_streaming_dedup(spark, src, DOC_DDL, ckpt, sink,
                               id_col="doc_id", text_col="text")
    got1 = {r.fp: (r.canonical_id, r.n_dups) for r in out1.collect()}
    assert len(got1) == 2
    assert (3, 2) in got1.values()  # min id of the dup pair, both counted
    assert (9, 1) in got1.values()

    # run 2, same checkpoint: a re-arrival of "hello world" must be
    # suppressed by restored state; only the new fingerprint emits
    _write_docs(spark, src, [
        (1, "hello world"),   # dup of a key seen in run 1 (smaller id!)
        (5, "brand new doc"),
    ])
    out2 = run_streaming_dedup(spark, src, DOC_DDL, ckpt, sink,
                               id_col="doc_id", text_col="text")
    got2 = {r.fp: (r.canonical_id, r.n_dups) for r in out2.collect()}
    # sink accumulates: run 1's two rows unchanged (id 1 did NOT re-emit or
    # rewrite its key) + exactly one new fingerprint from run 2
    assert len(got2) == 3
    assert (3, 2) in got2.values() and (9, 1) in got2.values()
    assert (5, 1) in got2.values()


def test_streaming_dedup_matches_batch_exact_dedup(spark, tmp_path):
    from jsonschema_jl_spark.operators.similarity import exact_dedup
    from jsonschema_jl_spark.streaming import run_streaming_dedup

    src = str(tmp_path / "darr2")
    rows = [(i, "doc %d" % (i % 10)) for i in range(40)]
    _write_docs(spark, src, rows)
    batch = {
        (r.fp, r.canonical_id, r.n_dups)
        for r in exact_dedup(spark.read.parquet(src)).collect()
    }
    stream = {
        (r.fp, r.canonical_id, r.n_dups)
        for r in run_streaming_dedup(
            spark, src, DOC_DDL, str(tmp_path / "dckpt2"), str(tmp_path / "dsink2")
        ).collect()
    }
    assert stream == batch
    assert len(stream) == 10


def test_gated_dedup_intake_rejects_do_not_burn_fingerprints(spark, tmp_path):
    # gate -> stateful dedup in ONE streaming query. A row failing the gate
    # must neither emit nor enter dedup state: a later VALID arrival of the
    # same content (new id) emits normally.
    from jsonschema_jl_spark.streaming import run_gated_dedup_intake

    gate = {"type": "object", "properties": {"doc_id": {"minimum": 0}}}
    src = str(tmp_path / "garr")
    ckpt = str(tmp_path / "gckpt")
    sink = str(tmp_path / "gsink")

    _write_docs(spark, src, [
        (-1, "hello"),   # gate reject (doc_id < 0)
        (2, "world"),
        (3, "world "),   # dup of 2 after normalization
    ])
    out1 = run_gated_dedup_intake(spark, src, DOC_DDL, gate, ckpt, sink)
    assert sorted((r.canonical_id, r.n_dups) for r in out1.collect()) == [(2, 2)]

    _write_docs(spark, src, [
        (7, "hello"),    # same content the reject carried — must emit
        (8, "world"),    # dup of a state-held key — suppressed
    ])
    out2 = run_gated_dedup_intake(spark, src, DOC_DDL, gate, ckpt, sink)
    assert sorted((r.canonical_id, r.n_dups) for r in out2.collect()) == [
        (2, 2), (7, 1),
    ]


def test_gated_dedup_intake_all_rejected_returns_empty_contract_shape(spark, tmp_path):
    # a drain in which EVERY arrival is gate-rejected writes zero rows into
    # a fresh file sink; the read-back must return an empty DataFrame with
    # the contract schema, not fail parquet schema inference on an empty dir
    from jsonschema_jl_spark.streaming import run_gated_dedup_intake

    gate = {"type": "object", "properties": {"doc_id": {"minimum": 0}}}
    src = str(tmp_path / "earr")
    ckpt = str(tmp_path / "eckpt")
    sink = str(tmp_path / "esink")

    _write_docs(spark, src, [(-1, "hello"), (-2, "world")])
    out = run_gated_dedup_intake(spark, src, DOC_DDL, gate, ckpt, sink)
    assert out.columns == ["fp", "canonical_id", "n_dups"]
    assert out.count() == 0

    # the checkpoint stays usable: a later valid arrival emits normally
    _write_docs(spark, src, [(5, "hello")])
    out2 = run_gated_dedup_intake(spark, src, DOC_DDL, gate, ckpt, sink)
    assert [(r.canonical_id, r.n_dups) for r in out2.collect()] == [(5, 1)]


def test_streaming_dedup_rocksdb_state_store_parity(spark, tmp_path):
    # ship config pairs the dedup with the RocksDB state store (off-heap
    # state at 10^12-row scale); same results as the default HDFS-backed
    # provider, and checkpoint resume still suppresses seen keys.
    from jsonschema_jl_spark.streaming import run_streaming_dedup

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state"
        ".RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        src = str(tmp_path / "rarr")
        ckpt = str(tmp_path / "rckpt")
        sink = str(tmp_path / "rsink")
        _write_docs(spark, src, [(4, "x y"), (6, "x  y"), (5, "z")])
        out = run_streaming_dedup(spark, src, DOC_DDL, ckpt, sink)
        assert sorted((r.canonical_id, r.n_dups) for r in out.collect()) == [
            (4, 2), (5, 1),
        ]
        _write_docs(spark, src, [(1, "x y"), (2, "w")])  # 1 suppressed
        out2 = run_streaming_dedup(spark, src, DOC_DDL, ckpt, sink)
        assert sorted((r.canonical_id, r.n_dups) for r in out2.collect()) == [
            (2, 1), (4, 2), (5, 1),
        ]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_dedup_ttl_evicts_and_reopens(spark, tmp_path):
    # TTL = sliding dedup window. AvailableNow + ProcessingTimeTimeout never
    # terminates (streaming/dedup.py module docstring), so the TTL path runs
    # as a continuous query: 3 s TTL, emit batch 1, idle past the TTL (keys
    # evict), then a re-arrival of a seen text must RE-emit with its new id.
    import time

    from jsonschema_jl_spark.streaming import streaming_exact_dedup

    src = str(tmp_path / "darr3")
    sink = str(tmp_path / "dsink3")
    _write_docs(spark, src, [(1, "a a"), (2, "a  a"), (3, "b")])
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    q = (
        streaming_exact_dedup(stream, id_col="doc_id", text_col="text",
                              ttl_minutes=0.05)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "dckpt3"))
        .trigger(processingTime="1 second")
        .start()
    )

    def rows():
        try:
            return sorted(
                (r.canonical_id, r.n_dups)
                for r in spark.read.parquet(sink).collect()
            )
        except Exception:  # sink not created yet
            return []

    try:
        deadline = time.time() + 90
        while time.time() < deadline and len(rows()) < 2:
            time.sleep(1)
        assert rows() == [(1, 2), (3, 1)]
        time.sleep(8)  # > TTL while idle: both keys evict
        _write_docs(spark, src, [(9, "a a")])  # seen text, new id
        deadline = time.time() + 90
        while time.time() < deadline and len(rows()) < 3:
            time.sleep(1)
        assert rows() == [(1, 2), (3, 1), (9, 1)]
    finally:
        q.stop()


def test_streaming_gate_matches_batch_verdicts(spark, tmp_path):
    from jsonschema_jl_spark.gate.gate import apply_gate

    src = str(tmp_path / "arr2")
    rows = [
        ("r%d" % i, i - 2, 10, ["png", "gif", "webp"][i % 3], "caption %d" % i)
        for i in range(30)
    ]
    _write_arrivals(spark, src, rows)
    batch_verdicts = {
        r.image_id: r.isvalid
        for r in apply_gate(spark.read.parquet(src), GATE).collect()
    }

    seen: dict = {}

    def on_batch(df, _bid):
        for r in df.select("image_id", "isvalid").collect():
            seen[r.image_id] = r.isvalid

    run_gated_ingest(
        spark, src, SCHEMA_DDL, GATE,
        str(tmp_path / "c2"), str(tmp_path / "k2"), on_batch=on_batch,
    )
    assert seen == batch_verdicts
