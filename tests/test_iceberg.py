"""Real-Iceberg-catalog integration (VERDICT round-3 stretch ask #7).

The sandbox image has no iceberg-spark-runtime jar, so this module SKIPS
cleanly there; on a cluster image that carries the jar (or with
`--packages org.apache.iceberg:iceberg-spark-runtime-...`, see
io.iceberg.ICEBERG_PACKAGE) it exercises the checkpoint-stage round-trip
against a real Hadoop catalog.

NOTE: Iceberg's SQL extensions must be configured at session CREATION, and
all sessions in one Python process share the first session's JVM — run
this file in its OWN pytest process (`pytest tests/test_iceberg.py`), not
interleaved with the shared-fixture suite.
"""

from __future__ import annotations

import tempfile

import pytest

from jsonschema_jl_spark.io.iceberg import (
    iceberg_available,
    iceberg_jar_on_classpath,
    iceberg_session_conf,
    read_stage_iceberg,
    write_stage_iceberg,
)

pytestmark = pytest.mark.skipif(
    iceberg_jar_on_classpath() is None,
    reason="iceberg-spark-runtime jar not on the classpath "
    "(expected in the sandbox; see io.iceberg.ICEBERG_PACKAGE for the "
    "cluster launch coordinate)",
)


@pytest.fixture(scope="module")
def ice_spark():
    from jsonschema_jl_spark.session import get_spark, stop_spark

    warehouse = tempfile.mkdtemp(prefix="ice_wh_")
    s = get_spark(
        app_name="jss_iceberg",
        cores=4,
        shuffle_partitions=4,
        extra_conf={
            "spark.driver.memory": "4g",
            **iceberg_session_conf(f"file://{warehouse}"),
        },
    )
    yield s
    stop_spark(s)


def test_checkpoint_stage_roundtrip_iceberg(ice_spark):
    from pyspark.sql import functions as F

    from jsonschema_jl_spark.config import DedupConfig

    assert iceberg_available(ice_spark)
    cfg = DedupConfig()
    df = ice_spark.range(1000).select(
        F.concat(F.lit("img"), F.lpad(F.col("id").cast("string"), 12, "0")).alias("image_id"),
        F.xxhash64("id").alias("sig"),
    )
    table = write_stage_iceberg(df, "sig_test", cfg, id_col="image_id", n_buckets=8)
    back = read_stage_iceberg(ice_spark, "sig_test")
    assert back.count() == 1000
    assert {r.image_id for r in back.collect()} == {r.image_id for r in df.collect()}
    # same-config retry is IDEMPOTENT (overwritePartitions, not append):
    # re-running the stage after a partial failure must not duplicate rows
    write_stage_iceberg(df, "sig_test", cfg, id_col="image_id", n_buckets=8)
    assert read_stage_iceberg(ice_spark, "sig_test").count() == 1000
    # config lineage is enforced: a different config must refuse to append
    import dataclasses

    other = dataclasses.replace(cfg, jaccard_tau=0.9)
    with pytest.raises(ValueError, match="config"):
        write_stage_iceberg(df, "sig_test", other, id_col="image_id", n_buckets=8)
    # partition layout is the bucket transform (scan pruning at 100 TB)
    parts = ice_spark.sql(f"SELECT * FROM {table}.partitions").collect()
    assert len(parts) > 1
