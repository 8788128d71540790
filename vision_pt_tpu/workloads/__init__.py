from .jit_class_to_image import (
    JiTConfigForTraining,
    JiTForClassToImageTraining,
    JiTTrainable,
)

__all__ = [
    "JiTConfigForTraining",
    "JiTForClassToImageTraining",
    "JiTTrainable",
]
