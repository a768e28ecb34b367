from jsonschema_jl_spark.datagen.images import generate_images, truth_sidecar

__all__ = ["generate_images", "truth_sidecar"]
