"""Camera model families (PINHOLE / OPENCV / CATA)."""

from .camera import (  # noqa: F401
    CAMERA_MODEL_CODES,
    CAMERA_MODEL_NAMES,
    CAMERA_MODEL_NUM_PARAMS,
    MAX_CAM_PARAMS,
    PINHOLE,
    OPENCV,
    CATA,
    camera_model_code,
    camera_model_name,
    image2world,
    world2image,
    normalize_threshold,
    pad_params,
)
