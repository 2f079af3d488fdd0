"""Device-mesh construction and shardings (DP over ICI)."""

from dostransformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    initialize_multihost,
)
