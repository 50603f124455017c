from .columns import (
    IMAGE_FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_image_features,
    image_phash,
    sample_frames,
)

__all__ = [
    "IMAGE_FEATURE_SCHEMA",
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "extract_image_features",
    "image_phash",
    "sample_frames",
]
