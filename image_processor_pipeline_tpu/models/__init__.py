from image_processor_pipeline_tpu.models.chains import AugmentChain, augment_chain

__all__ = ["AugmentChain", "augment_chain"]
