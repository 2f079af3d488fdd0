"""Pure functional compute kernels (jnp reference implementations + Pallas TPU
kernels behind the same signatures, for differential testing)."""

from dostransformer_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    segment_mean,
    segment_sum_pallas,
)
from dostransformer_tpu.ops.geometry import (  # noqa: F401
    gaussian_basis,
    smooth_cutoff,
    spherical_harmonics_l1,
    edge_geometry_phdos,
)
from dostransformer_tpu.ops.attention import (  # noqa: F401
    dot_product_attention,
    fused_attention,
)
from dostransformer_tpu.ops.segment import (  # noqa: F401
    batched_segment_mean,
    batched_segment_sum,
)
from dostransformer_tpu.ops.fused_mp import (  # noqa: F401
    fused_mp_edge,
    mp_edge_reference,
)
