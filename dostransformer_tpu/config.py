"""Configuration dataclasses.

Mirrors the reference's argparse flag surface (reference utils.py:25-43, 13 flags)
plus the constants the reference hard-codes outside its flag system
(phDOS r_max=4.0 at main_phDOS.py:21; phDOS batch_size=1 at main_phDOS.py:52;
eDOS featurization radius=8 / max_num_nbr=12 / Gaussian step 0.2 at
data/mat2graph.py:85,215-216), promoted here to config fields.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    """Training-driver knobs (reference utils.py:25-43 defaults)."""

    lr: float = 1e-4
    epochs: int = 1000
    batch_size: int = 8
    layers: int = 3            # number of GNN Processor steps
    transformer: int = 2       # number of transformer layers per encoder stack
    eval_every: int = 5        # "--eval"
    es: int = 50               # early-stopping criterion
    embedder: str = "DOSTransformer"
    hidden: int = 256
    random_state: int = 0      # dataset-split seed
    dataset: str = "whole"     # whole | ood_crystal | ood_element
    attn_drop: float = 0.0
    seed: int = 0
    beta: float = 1.0          # weight on the system-head RMSE
    weight_decay: float = 1e-2  # reference main_eDOS.py:93 (hard-coded)

    # --- TPU-native additions (no reference counterpart) ---
    dtype: str = "float32"        # compute dtype: float32 | bfloat16
    param_dtype: str = "float32"
    padding: str = "mask"         # "mask" (correct; == reference at batch 1)
    # | "ref" (zero rows act as attention keys, matching torch to_dense_batch
    #   semantics at batch>1 — reference DOSTransformer.py:61-63 passes no mask)
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0     # epochs; 0 disables
    log_jsonl: Optional[str] = None
    donate: bool = True
    use_pallas: bool = True       # fused attention / segment kernels on TPU


@dataclasses.dataclass
class EDOSDataConfig:
    """eDOS featurization constants (reference data/mat2graph.py)."""

    n_bins: int = 201          # embedder_eDOS/DOSTransformer.py:17
    radius: float = 8.0        # mat2graph.py:85
    max_num_nbr: int = 12      # mat2graph.py:216
    gauss_dmin: float = 0.0    # mat2graph.py:215
    gauss_step: float = 0.2
    n_atom_feats: int = 200    # matscholar embedding width
    n_glob_feats: int = 2      # [energy_per_atom, formation_energy_per_atom]

    @property
    def n_bond_feats(self) -> int:
        # centers arange(0, radius + step, step) -> 41 dims for radius=8, step=.2
        import numpy as np

        return int(np.arange(self.gauss_dmin, self.radius + self.gauss_step,
                             self.gauss_step).shape[0])


@dataclasses.dataclass
class PhDOSDataConfig:
    """phDOS featurization constants (reference main_phDOS.py:21, utils.py:249-303)."""

    n_bins: int = 51           # embedder_phDOS/DOSTransformer_phonon.py:19
    r_max: float = 4.0         # main_phDOS.py:21
    n_atom_feats: int = 118    # row of diag(atomic_mass), Z in 1..118 (utils.py:254-262)
    n_bond_feats: int = 4      # SH l<=1 "component" norm: 1x0e + 1x1o
    batch_size: int = 1        # main_phDOS.py:52 (hard-coded in reference)


CRYSTAL_SYSTEMS_EDOS = (
    "cubic", "hexagonal", "tetragonal", "trigonal", "orthorhombic", "monoclinic",
)  # ids 0..5; anything else -> 6 (mat2graph.py:94-107)

CRYSTAL_SYSTEMS_PHDOS = (
    "Cubic", "Hexagonal", "Tetragonal", "Trigonal", "Orthorhombic", "Monoclinic",
)  # ids 0..5; anything else -> 6 (utils.py:277-290)


def crystal_system_id(name: str, *, phonon: bool = False) -> int:
    table = CRYSTAL_SYSTEMS_PHDOS if phonon else CRYSTAL_SYSTEMS_EDOS
    try:
        return table.index(name)
    except ValueError:
        return 6


def exp_get_name(cfg: TrainConfig) -> str:
    """Run-name string with the reference's key order (utils.py:51-59)."""
    keys = ("seed", "beta", "attn_drop", "transformer", "layers", "embedder",
            "lr", "batch_size", "hidden", "random_state", "dataset")
    d = dataclasses.asdict(cfg)
    d["attn_drop"] = cfg.attn_drop
    return "".join(f"{k}({d[k]})_" for k in keys)
