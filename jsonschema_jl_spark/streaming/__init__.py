from jsonschema_jl_spark.streaming.ingest import gated_stream, run_gated_ingest

__all__ = ["gated_stream", "run_gated_ingest"]
