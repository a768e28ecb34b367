from jsonschema_jl_spark.io.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
