"""Input pipeline: shape-bucketed datasets feeding fixed padded shapes."""

from texocr_tpu.data.dataset import (  # noqa: F401
    BatchCollator,
    BucketBatchSampler,
    ImageDataset,
    create_dataloader,
    load_datasets,
    prefetch,
)
from texocr_tpu.data.transforms import img_transform, preprocess_jax  # noqa: F401
