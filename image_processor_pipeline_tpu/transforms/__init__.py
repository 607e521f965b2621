from image_processor_pipeline_tpu.transforms.base import BatchTransform
from image_processor_pipeline_tpu.transforms.crop_square import SquareCropAroundBBox
from image_processor_pipeline_tpu.transforms.copy import copy_img_with_labels, copy_files
from image_processor_pipeline_tpu.transforms.labels import change_label_class

__all__ = [
    "BatchTransform",
    "SquareCropAroundBBox",
    "copy_img_with_labels",
    "copy_files",
    "change_label_class",
]
