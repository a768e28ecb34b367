"""Checkpoint/resume (P13): per-bucket manifests, lineage, metrics, and
config-hash isolation."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from jsonschema_jl_spark.config import DedupConfig
from jsonschema_jl_spark.datagen import generate_images
from jsonschema_jl_spark.io.checkpoint import CheckpointManager, resumable_signatures

CFG = DedupConfig()
N = 500
NB = 4


@pytest.fixture()
def images(spark):
    return generate_images(spark, N, CFG, with_bytes=False, with_malformed=False)


def test_write_resume_and_metrics(spark, images, tmp_path):
    root = str(tmp_path / "ckpt")
    ckpt = CheckpointManager(root, CFG, input_desc="test-images")
    sigs = resumable_signatures(spark, images, ckpt, CFG, n_buckets=NB)
    assert sigs.count() == N
    m = ckpt.metrics()["signatures"]
    assert m["buckets_done"] == NB
    assert m["rows"] == N
    # lineage recorded
    manifest = ckpt.read_manifest("signatures")
    assert manifest["lineage"]["input"] == "test-images"
    assert manifest["config_hash"] == CFG.config_hash()

    # simulate a partial failure: delete one bucket + its manifest entry
    bdir = os.path.join(ckpt.base, "signatures", "part_bucket=2")
    shutil.rmtree(bdir)
    mp = os.path.join(ckpt.base, "signatures", "_manifest.json")
    man = json.load(open(mp))
    del man["buckets"]["2"]
    json.dump(man, open(mp, "w"))

    # resume: only the missing bucket is recomputed (others keep timestamps)
    before = {b: v["ts"] for b, v in man["buckets"].items()}
    sigs2 = resumable_signatures(spark, images, ckpt, CFG, n_buckets=NB)
    assert sigs2.count() == N
    man2 = json.load(open(mp))
    for b, ts in before.items():
        assert man2["buckets"][b]["ts"] == ts
    assert man2["buckets"]["2"]["done"]


def test_config_hash_isolation(spark, images, tmp_path):
    root = str(tmp_path / "ckpt")
    c1 = CheckpointManager(root, CFG)
    c2 = CheckpointManager(root, DedupConfig(jaccard_tau=0.8))
    assert c1.base != c2.base
    # the base dir also carries the on-disk layout version, so an engine
    # upgrade that changes a stage's stored columns (config_hash unchanged)
    # never resumes from an old-layout checkpoint
    from jsonschema_jl_spark.io.checkpoint import LAYOUT_VERSION

    assert c1.base.endswith(f"_L{LAYOUT_VERSION}")
    resumable_signatures(spark, images, c1, CFG, n_buckets=2)
    assert c1.stage_complete("signatures", 2)
    assert not c2.stage_complete("signatures", 2)


def test_bucketing_is_deterministic(spark, images, tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "c"), CFG)
    ckpt.write_stage(images.select("image_id", "caption"), "s", "image_id", n_buckets=NB)
    df = ckpt.read_stage(spark, "s")
    # no dup/dropped rows across buckets
    assert df.count() == N
    assert df.select("image_id").distinct().count() == N


class _KillingCkpt(CheckpointManager):
    """CheckpointManager that dies after `fail_after` buckets of
    `fail_stage` finish — a faithful mid-stage kill: the manifest on disk
    records exactly the buckets whose parquet committed before the crash."""

    def __init__(self, *args, fail_stage: str, fail_after: int, **kw):
        super().__init__(*args, **kw)
        self._fail_stage, self._fail_after = fail_stage, fail_after

    def _write_manifest(self, stage: str, manifest: dict) -> None:
        super()._write_manifest(stage, manifest)
        if stage == self._fail_stage:
            done = sum(1 for v in manifest["buckets"].values() if v.get("done"))
            if done >= self._fail_after:
                raise RuntimeError("simulated mid-stage kill")


def test_resume_after_midstage_kill_sf001_corpus(spark):
    """North-rule resume evidence at the sf0.01 corpus (input_hint-shaped
    images derived from the driver documents parquet): kill the run midway
    through the edges stage, resume with a fresh manager, and require
    (a) identical cluster partition to the direct non-checkpointed
    pipeline, (b) the completed signatures stage untouched by the resume,
    (c) the edge buckets that committed before the kill skipped (their
    manifest entries byte-identical)."""
    import tempfile
    from collections import defaultdict

    from jsonschema_jl_spark.datagen.from_documents import images_from_documents
    from jsonschema_jl_spark.io.checkpoint import resumable_pipeline
    from jsonschema_jl_spark.operators.pipeline import dedup_pipeline

    images = images_from_documents(spark, "/root/testdata/sf0.01").persist()
    images.count()
    with tempfile.TemporaryDirectory() as root:
        killing = _KillingCkpt(
            root, CFG, input_desc="sf0.01", fail_stage="edges", fail_after=2
        )
        with pytest.raises(RuntimeError, match="mid-stage kill"):
            resumable_pipeline(spark, images, killing, CFG, n_buckets=NB)

        ckpt = CheckpointManager(root, CFG, input_desc="sf0.01")
        assert ckpt.stage_complete("signatures", NB)
        edges_before = ckpt.read_manifest("edges")["buckets"]
        assert sum(1 for v in edges_before.values() if v.get("done")) == 2
        sig_manifest = ckpt.read_manifest("signatures")

        labels = resumable_pipeline(spark, images, ckpt, CFG, n_buckets=NB)

        def partition(rows):
            comp = defaultdict(set)
            for r in rows:
                comp[r.component].add(r.image_id)
            return {frozenset(v) for v in comp.values()}

        direct = dedup_pipeline(images, CFG, collect_metrics=False)
        assert partition(labels.collect()) == partition(direct.labels.collect())
        direct.cleanup()
        # completed stages/buckets were skipped, not recomputed
        assert ckpt.read_manifest("signatures") == sig_manifest
        edges_after = ckpt.read_manifest("edges")["buckets"]
        for b, v in edges_before.items():
            if v.get("done"):
                assert edges_after[b] == v
    images.unpersist()


def test_resumable_pipeline_matches_direct_and_resumes(spark, tmp_path):
    from collections import defaultdict

    from jsonschema_jl_spark.io.checkpoint import resumable_pipeline
    from jsonschema_jl_spark.operators.pipeline import dedup_pipeline

    images = generate_images(spark, 600, CFG, with_bytes=False).persist()
    ckpt = CheckpointManager(str(tmp_path / "rp"), CFG, input_desc="n600")
    def partition(rows):
        comp = defaultdict(set)
        for r in rows:
            comp[r.component].add(r.image_id)
        return {frozenset(v) for v in comp.values()}

    # materialize eagerly: the resume step below rewrites the stage files
    p1 = partition(resumable_pipeline(spark, images, ckpt, CFG, n_buckets=4).collect())

    direct = dedup_pipeline(images, CFG, collect_metrics=False)
    assert p1 == partition(direct.labels.collect())
    direct.cleanup()

    # resume: wipe the labels stage only; signatures/edges must be reused
    import shutil as sh

    sh.rmtree(os.path.join(ckpt.base, "labels"))
    sig_manifest_before = ckpt.read_manifest("signatures")
    labels2 = resumable_pipeline(spark, images, ckpt, CFG, n_buckets=4)
    assert partition(labels2.collect()) == p1
    assert ckpt.read_manifest("signatures") == sig_manifest_before  # untouched
    images.unpersist()
