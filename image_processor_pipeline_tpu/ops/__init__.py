from image_processor_pipeline_tpu.ops import bbox, geometry, color, photometric, compose, ccl

__all__ = ["bbox", "geometry", "color", "photometric", "compose", "ccl"]
