"""Data pipeline: offline featurizers, fixed-shape padded GraphBatch pytrees,
splits, and synthetic data for tests."""

from dostransformer_tpu.data.graph import (  # noqa: F401
    GraphSample,
    GraphBatch,
    collate,
    bucket_size,
)
from dostransformer_tpu.data.synthetic import (  # noqa: F401
    synthetic_edos_samples,
    synthetic_phdos_samples,
)
