"""Dump `.explain("formatted")` for every query/operator the round-6
optimization touched, into plans/r06/<name>_<tag>.txt.

Run from the tree whose plans you want:
    python tools/dump_plans_r06.py <tag> <outdir>
(tag = "before" at the round-start commit, "after" at HEAD; outdir is the
checked-in plans/r06 directory of the CURRENT repo.)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from jsonschema_jl_spark.config import DedupConfig  # noqa: E402
from jsonschema_jl_spark.session import get_spark  # noqa: E402
from jsonschema_jl_spark.gate.gate import gate_filter  # noqa: E402
from jsonschema_jl_spark.operators.pipeline import IMAGES_GATE_SCHEMA  # noqa: E402
from jsonschema_jl_spark.operators.lsh import band_buckets, candidate_pairs  # noqa: E402
from jsonschema_jl_spark.operators.verify import verify_jaccard_text  # noqa: E402
from jsonschema_jl_spark.operators.phash import phash_pairs  # noqa: E402
from jsonschema_jl_spark.operators.substring import containment_pairs  # noqa: E402

CFG = DedupConfig()
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans_r06", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", name)

    import __spark_entry__ as entry

    queries = entry.queries()
    for q in ("emb_ann_pairs", "doc_ngram_pairs", "doc_hamming_pairs",
              "doc_components_twophase", "gate_events_dynamic_native"):
        dump(q, queries[q](spark, SF_DIR))

    # pipeline internals (images_dedup_clusters' detector cascade up to the
    # edge dedup — the checkpoint in the real pipeline truncates lineage, so
    # the edges plan is reconstructed lazily here exactly as pipeline.py
    # builds it, minus persists)
    from jsonschema_jl_spark.datagen.from_documents import images_from_documents
    images = images_from_documents(spark, SF_DIR)
    valid = gate_filter(images, IMAGES_GATE_SCHEMA)
    par = 8
    try:
        from jsonschema_jl_spark.operators.minhash import (
            normalize_signatures_bands,
        )
        slim = valid.select(
            F.xxhash64("image_id").alias("nid"), "image_id",
            F.col("caption"), "phash",
        ).repartition(par)
        slim = normalize_signatures_bands(
            slim, text_col="caption", cfg=CFG, out_text_col="txt_norm"
        )
        sigs_for_bands = slim
    except ImportError:  # round-start tree: separate normalize + signature
        from jsonschema_jl_spark.operators.minhash import (
            normalize_udf, with_signatures,
        )
        slim = valid.select(
            F.xxhash64("image_id").alias("nid"), "image_id",
            normalize_udf(F.col("caption")).alias("txt_norm"), "phash",
        ).repartition(par)
        sigs_for_bands = with_signatures(
            slim, text_col="txt_norm", cfg=CFG, keep_shingles=False,
            assume_normalized=True, repartition=False, with_bands=True,
        )
    dump("pipeline_slim", slim)
    buckets = band_buckets(sigs_for_bands, id_col="nid", cfg=CFG, bands_col="bands")
    cands = candidate_pairs(buckets, CFG, num_partitions=par)
    caption_edges = verify_jaccard_text(
        cands, slim, id_col="nid", text_col="txt_norm", cfg=CFG,
        assume_normalized=True, num_partitions=par,
    ).select("src", "dst")
    ph = phash_pairs(slim, id_col="nid", cfg=CFG, num_partitions=par).select("src", "dst")
    ct = containment_pairs(
        slim, id_col="nid", text_col="txt_norm", cfg=CFG,
        assume_normalized=True, num_partitions=par,
    ).select("src", "dst")
    dump("pipeline_phash_pairs", ph)
    dump("pipeline_containment_pairs", ct)
    # edge union + per-pair dedup, both shapes
    try:
        edges = (
            caption_edges.select("src", "dst", F.lit(0).alias("pri"))
            .unionByName(ph.select("src", "dst", F.lit(1).alias("pri")))
            .unionByName(ct.select("src", "dst", F.lit(2).alias("pri")))
            .groupBy("src", "dst").agg(F.min("pri").alias("pri"))
        )
        # the after-shape (int pri + min) mirrors pipeline.py@HEAD; the
        # before worktree falls through to the struct shape below only if
        # run against the old pipeline — detect via file content instead
        import inspect
        import jsonschema_jl_spark.operators.pipeline as pl
        if "min(\"pri\")" not in inspect.getsource(pl.dedup_pipeline) and \
                'F.min("pri")' not in inspect.getsource(pl.dedup_pipeline):
            raise ValueError("old shape")
    except ValueError:
        e2 = (
            caption_edges.select("src", "dst", F.lit("caption").alias("kind"))
            .unionByName(ph.select("src", "dst", F.lit("phash").alias("kind")))
            .unionByName(ct.select("src", "dst", F.lit("substring").alias("kind")))
        )
        e2 = e2.withColumn(
            "pri",
            F.when(F.col("kind") == "caption", 0)
            .when(F.col("kind") == "phash", 1).otherwise(2),
        )
        edges = (
            e2.groupBy("src", "dst").agg(F.min(F.struct("pri", "kind")).alias("k"))
            .select("src", "dst", F.col("k.kind").alias("kind"))
        )
    dump("pipeline_edges_dedup", edges)
    spark.stop()


if __name__ == "__main__":
    main()
