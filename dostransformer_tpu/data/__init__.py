"""Data pipeline: offline featurizers, fixed-shape padded GraphBatch pytrees,
splits, and synthetic data for tests."""

from dostransformer_tpu.data.graph import (  # noqa: F401
    GraphSample,
    GraphBatch,
    collate,
    bucket_size,
)
from dostransformer_tpu.data.datasets import (  # noqa: F401
    GraphLoader,
    edos_ood_split,
    edos_random_split,
    element_balanced_split,
    read_index_file,
    train_test_split,
)
from dostransformer_tpu.data.split_viz import (  # noqa: F401
    element_representation,
    split_element_statistics,
)
from dostransformer_tpu.data.synthetic import (  # noqa: F401
    synthetic_edos_learnable,
    synthetic_edos_samples,
    synthetic_phdos_learnable,
    synthetic_phdos_samples,
)
