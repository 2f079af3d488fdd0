"""Training/eval subsystem: beta-weighted RMSE loss, metrics, jit/pjit train
steps, early stopping, checkpointing, structured logging."""

from dostransformer_tpu.train.loss import dos_loss, clamp_negative  # noqa: F401
from dostransformer_tpu.train.metrics import (  # noqa: F401
    r2_variance_weighted,
    eval_metrics,
)
from dostransformer_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from dostransformer_tpu.train.early_stop import BestTracker  # noqa: F401
from dostransformer_tpu.train.artifacts import EvalArtifacts  # noqa: F401
from dostransformer_tpu.train.device_dataset import DeviceDataset  # noqa: F401
from dostransformer_tpu.train.trainer import make_adamw, stack_batches  # noqa: F401
from dostransformer_tpu.train.fused_adamw import FusedAdamW  # noqa: F401
