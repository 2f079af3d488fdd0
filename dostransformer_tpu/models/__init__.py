"""Model zoo: prompt-guided multimodal DOSTransformer (eDOS 201 bins, phDOS 51
bins) and the 8 ablation baselines."""

from dostransformer_tpu.models.dostransformer import (  # noqa: F401
    DOSTransformerEDOS,
    DOSTransformerPhDOS,
)
from dostransformer_tpu.models.graphnetwork import (  # noqa: F401
    GraphnetworkEDOS,
    Graphnetwork2EDOS,
)
from dostransformer_tpu.models.mlp import MLPEDOS, MLP2EDOS  # noqa: F401
from dostransformer_tpu.models.phonon_baselines import (  # noqa: F401
    GraphnetworkPhDOS,
    Graphnetwork2PhDOS,
    MLPPhDOS,
    MLP2PhDOS,
)
from dostransformer_tpu.models.registry import build_model, MODEL_REGISTRY  # noqa: F401
