from .augmentation import ImageTransform, apply_transform, flip_axis  # noqa: F401
from .dataset import InputData, MultimodalImageDataset  # noqa: F401
from .nifti import (NiftiImage, get_spacing, read_image, read_img,  # noqa: F401
                    write_image)
from .normalization import normalize_data, normalize_modalities  # noqa: F401
