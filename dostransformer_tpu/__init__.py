"""DOSTransformer-TPU: a TPU-native JAX/XLA/Pallas framework for density-of-states
prediction of crystalline materials.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference PyTorch implementation of "Density of States
Prediction of Crystalline Materials via Prompt-guided Multi-Modal Transformer"
(NeurIPS 2023).

Subpackages
-----------
ops       pure functional kernels: segment scatter/gather, projection-free
          attention (jnp + fused Pallas), closed-form geometry features.
data      offline featurizers (crystal -> graph), fixed-shape padded/bucketed
          GraphBatch pytrees, dataset splits with sklearn-parity semantics.
nn        flax.linen modules with torch-matching initializers.
models    DOSTransformer (eDOS, 201 bins; phDOS, 51 bins) + 8 ablation baselines.
train     beta-weighted RMSE loss, metrics, jit/pjit train+eval loops,
          early stopping, orbax checkpointing, JSONL logging.
parallel  jax.sharding.Mesh construction and batch-axis NamedShardings (DP over
          ICI), multi-host init helpers.
cli       command-line drivers mirroring the reference's main_phDOS / main_eDOS,
          plus inference (main_predict) and HTTP serving (main_serve).

Top-level modules
-----------------
serve       batched/bucketed inference (Predictor), AOT StableHLO export
            (Predictor.export / ExportedPredictor).
serve_http  dependency-free HTTP model server over either predictor.
serve_batch cross-request micro-batching (CoalescingBatcher): concurrent
            predicts coalesce into one device dispatch.
"""

__version__ = "0.1.0"

from dostransformer_tpu import config as config  # noqa: F401
