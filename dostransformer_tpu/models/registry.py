"""Model registry — the reference's if/elif model selection
(main_eDOS.py:66-88, main_phDOS.py:65-88), made case-insensitive (the
reference's phDOS selection lowercases the name but compares against a
capitalized literal and can never match — SURVEY.md §2.3-1; we implement the
intent)."""

from __future__ import annotations

from typing import Optional

from dostransformer_tpu.models.dostransformer import (
    DOSTransformerEDOS,
    DOSTransformerPhDOS,
)
from dostransformer_tpu.models.graphnetwork import (
    Graphnetwork2EDOS,
    GraphnetworkEDOS,
)
from dostransformer_tpu.models.mlp import MLP2EDOS, MLPEDOS
from dostransformer_tpu.models.phonon_baselines import (
    Graphnetwork2PhDOS,
    GraphnetworkPhDOS,
    MLP2PhDOS,
    MLPPhDOS,
)

MODEL_REGISTRY = {
    "edos": {
        "dostransformer": DOSTransformerEDOS,
        "graphnetwork": GraphnetworkEDOS,
        "graphnetwork2": Graphnetwork2EDOS,
        "mlp": MLPEDOS,
        "mlp2": MLP2EDOS,
    },
    "phdos": {
        "dostransformer": DOSTransformerPhDOS,
        "dostransformer_phonon": DOSTransformerPhDOS,
        "graphnetwork": GraphnetworkPhDOS,
        "graphnetwork2": Graphnetwork2PhDOS,
        "mlp": MLPPhDOS,
        "mlp2": MLP2PhDOS,
    },
}


def build_model(
    task: str,
    embedder: str = "DOSTransformer",
    *,
    layers: int = 3,
    t_layers: int = 2,
    hidden: int = 256,
    attn_drop: float = 0.0,
    padding: str = "mask",
    use_pallas: Optional[bool] = None,
    dtype: str = "float32",
    remat: bool = False,
    use_fused_mp: Optional[bool] = None,
    bins_pad: Optional[int] = None,
    tp_axis: Optional[str] = None,
):
    """Instantiate a model by (task, embedder) name.

    task: "edos" | "phdos"; embedder matched case-insensitively.
    """
    family = MODEL_REGISTRY[task.lower()]
    name = embedder.lower()
    if name not in family:
        raise ValueError(
            f"Inappropriate model name {embedder!r} for task {task!r}; "
            f"choose from {sorted(family)}")
    cls = family[name]
    kwargs = {"hidden": hidden}
    if "layers" in cls.__dataclass_fields__:
        kwargs["layers"] = layers
    if "t_layers" in cls.__dataclass_fields__:
        kwargs["t_layers"] = t_layers
        kwargs["attn_drop"] = attn_drop
        kwargs["padding"] = padding
        kwargs["use_pallas"] = use_pallas
    if "dtype" in cls.__dataclass_fields__:
        kwargs["dtype"] = dtype
    if "remat" in cls.__dataclass_fields__:
        kwargs["remat"] = remat
    if "use_fused_mp" in cls.__dataclass_fields__:
        kwargs["use_fused_mp"] = use_fused_mp
    if bins_pad and "bins_pad" in cls.__dataclass_fields__:
        kwargs["bins_pad"] = bins_pad
    if tp_axis and "tp_axis" in cls.__dataclass_fields__:
        kwargs["tp_axis"] = tp_axis
    return cls(**kwargs)
