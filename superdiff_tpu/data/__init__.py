from .datasets import (
    ImageDataset,
    SplitSpec,
    get_image_scaler,
    get_image_inverse_scaler,
)

__all__ = ["ImageDataset", "SplitSpec", "get_image_scaler", "get_image_inverse_scaler"]
