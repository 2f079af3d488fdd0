"""flax.linen module layer with torch-matching initializers."""

from dostransformer_tpu.nn.init import (  # noqa: F401
    torch_linear_kernel_init,
    torch_linear_bias_init,
    xavier_uniform_init,
    embedding_init,
)
from dostransformer_tpu.nn.modules import (  # noqa: F401
    PReLU,
    TorchLinear,
    MLP2,
    MLPBlock,
    EdgeModel,
    NodeModel,
    Processor,
    GraphEncoderEDOS,
    GraphEncoderPhDOS,
    GraphDecoderEDOS,
    GraphDecoderPhDOS,
    masked_node_pool,
)
from dostransformer_tpu.nn.transformer import (  # noqa: F401
    TransformerEncoder,
    TransformerEncoderLayer,
)
