from image_processor_pipeline_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    sharded_augment_step,
)

__all__ = ["make_mesh", "shard_batch", "sharded_augment_step"]
