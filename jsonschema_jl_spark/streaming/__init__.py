from jsonschema_jl_spark.streaming.ingest import gated_stream, run_gated_ingest
from jsonschema_jl_spark.streaming.dedup import (
    streaming_exact_dedup,
    run_streaming_dedup,
    run_gated_dedup_intake,
)

__all__ = [
    "gated_stream",
    "run_gated_ingest",
    "streaming_exact_dedup",
    "run_streaming_dedup",
    "run_gated_dedup_intake",
]
