"""End-to-end north-rule dedup pipeline (P0-P13).

    images --gate--> valid rows --P2/P3--> signatures --P4/P5/P6--> candidates
       \\--P8--> phash pairs      --P7--> verified caption pairs
        \\--P9--> containment pairs
    edges = P7 ∪ P8 ∪ P9  --P10/P11--> components --P12--> clusters
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from jsonschema_jl_spark.config import DedupConfig, DEFAULT_CONFIG
from jsonschema_jl_spark.gate.gate import gate_filter
from jsonschema_jl_spark.operators.minhash import with_signatures
from jsonschema_jl_spark.operators.lsh import band_buckets, candidate_pairs
from jsonschema_jl_spark.operators.verify import verify_jaccard
from jsonschema_jl_spark.operators.phash import phash_pairs
from jsonschema_jl_spark.operators.substring import containment_pairs
from jsonschema_jl_spark.operators.components import connected_components

# The gate schema for the authoritative input shape (BASELINE.json:15,
# FIXTURES.md §1) — fully native-compilable, so the gate is pure Catalyst.
IMAGES_GATE_SCHEMA: dict = {
    "type": "object",
    "required": ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
    "properties": {
        "image_id": {"type": "string", "pattern": "^img[0-9]{12}$"},
        "w": {"type": "integer", "minimum": 1, "maximum": 65535},
        "h": {"type": "integer", "minimum": 1, "maximum": 65535},
        "fmt": {"enum": ["png", "jpeg", "webp"]},
        "caption": {"type": "string", "minLength": 3, "maxLength": 2048},
        "phash": {"type": "integer"},
    },
}


@dataclass
class PipelineResult:
    labels: DataFrame          # (image_id, component)
    edges: DataFrame           # (src, dst, kind)
    signatures: DataFrame      # (image_id, caption, phash, shingles, minhash)
    metrics: dict = field(default_factory=dict)
    _cached: tuple = ()

    def cleanup(self) -> None:
        for df in self._cached:
            df.unpersist()


def dedup_pipeline(
    images: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    gate_schema: dict | None = None,
    use_phash: bool = True,
    use_containment: bool = True,
    persist: bool = True,
    collect_metrics: bool = True,
) -> PipelineResult:
    gate_schema = IMAGES_GATE_SCHEMA if gate_schema is None else gate_schema

    valid = gate_filter(images, gate_schema)
    # column pruning: only what dedup needs flows past the gate
    slim = valid.select("image_id", "caption", "phash")
    # rebalance: the pruned projection of a wide table collapses to few scan
    # partitions; every downstream kernel (minhash UDF, phash explode,
    # containment grams) inherits that, so rebalance once to full parallelism
    par = images.sparkSession.sparkContext.defaultParallelism
    slim = slim.repartition(par)
    if persist:
        # slim feeds three detectors (minhash, phash, containment) — persist
        # so the scan+gate run once.  At cluster scale this is the Iceberg
        # signature-checkpoint write (P13) instead of executor memory.
        slim = slim.persist()

    sigs = with_signatures(slim, text_col="caption", cfg=cfg)
    if persist:
        # reused by banding AND jaccard verification — compute the Python
        # kernel once, and materialize EAGERLY: the three detector branches
        # fan out from these frames inside one job, and a lazily-persisted
        # subtree would be recomputed concurrently by each branch before the
        # cache populates (at cluster scale: the P13 signature-table write)
        sigs = sigs.persist()
        sigs.count()

    buckets = band_buckets(sigs, id_col="image_id", sig_col="minhash", cfg=cfg)
    if collect_metrics:
        cands, skew = candidate_pairs(buckets, cfg, with_metrics=True)
        skew_metrics = skew.as_dict()
    else:
        cands = candidate_pairs(buckets, cfg)
        skew_metrics = {}
    caption_edges = verify_jaccard(cands, sigs, cfg=cfg).select(
        "src", "dst", F.lit("caption").alias("kind")
    )

    edge_parts = [caption_edges]
    if use_phash:
        edge_parts.append(
            phash_pairs(slim, cfg=cfg).select("src", "dst", F.lit("phash").alias("kind"))
        )
    if use_containment:
        edge_parts.append(
            containment_pairs(slim, cfg=cfg).select(
                "src", "dst", F.lit("substring").alias("kind")
            )
        )
    edges = edge_parts[0]
    for e in edge_parts[1:]:
        edges = edges.unionByName(e)
    # P10: one edge per unordered pair (kinds may overlap; keep first by
    # priority caption < phash < substring deterministically)
    edges = edges.withColumn(
        "pri", F.when(F.col("kind") == "caption", 0).when(F.col("kind") == "phash", 1).otherwise(2)
    )
    edges = (
        edges.groupBy("src", "dst").agg(F.min(F.struct("pri", "kind")).alias("k"))
        .select("src", "dst", F.col("k.kind").alias("kind"))
    )

    labels = connected_components(
        edges.select("src", "dst"),
        vertices=slim.select("image_id"),
        max_iters=cfg.cc_max_iters,
    ).withColumnRenamed("id", "image_id")

    return PipelineResult(
        labels=labels,
        edges=edges,
        signatures=sigs,
        metrics={"skew": skew_metrics, "config_hash": cfg.config_hash()},
        _cached=(slim, sigs) if persist else (),
    )
