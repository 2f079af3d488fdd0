"""Eval-artifact export: predictions, targets, graph embeddings.

The reference's `test` loop returns a preds_y structure — (mp_id, preds,
y, graph embeddings) accumulated per sample (utils.py:93-109) — which its
driver then discards (SURVEY.md §5 checkpoint entry). The TPU framework
preserves the export: an accumulator fed from eval_step outputs, written as
one npz keyed by sample id.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class EvalArtifacts:
    """Accumulates per-batch eval outputs; only real graphs (mask 1) kept."""

    def __init__(self):
        self.sample_ids: List[int] = []
        self.preds: List[np.ndarray] = []
        self.preds_global: List[np.ndarray] = []
        self.ys: List[np.ndarray] = []
        self.embeddings: List[np.ndarray] = []

    def update(self, metrics: Dict, batch) -> None:
        keep = np.asarray(batch.graph_mask) > 0.5
        self.sample_ids.extend(np.asarray(batch.sample_id)[keep].tolist())
        self.preds.append(np.asarray(metrics["preds"])[keep])
        self.preds_global.append(np.asarray(metrics["preds_global"])[keep])
        self.ys.append(np.asarray(metrics["y"])[keep])
        if "embeddings" in metrics:
            self.embeddings.append(np.asarray(metrics["embeddings"])[keep])

    def result(self) -> Dict[str, np.ndarray]:
        out = {
            "sample_id": np.asarray(self.sample_ids, np.int64),
            "preds": np.concatenate(self.preds) if self.preds else np.zeros((0,)),
            "preds_global": (np.concatenate(self.preds_global)
                             if self.preds_global else np.zeros((0,))),
            "y": np.concatenate(self.ys) if self.ys else np.zeros((0,)),
        }
        if self.embeddings:
            out["embeddings"] = np.concatenate(self.embeddings)
        return out

    def save(self, path: str,
             mp_ids: Optional[Sequence[str]] = None) -> None:
        out = self.result()
        if mp_ids is not None:
            by_id = {i: m for i, m in enumerate(mp_ids)}
            out["mp_id"] = np.asarray(
                [by_id.get(int(s), str(s)) for s in out["sample_id"]])
        np.savez_compressed(path, **out)
