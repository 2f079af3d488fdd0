"""Orbax checkpointing.

The reference never serializes the model (SURVEY.md §5: torch.save appears only
for datasets, mat2graph.py:259; "best model" exists only as metric scalars in
memory). The TPU framework adds periodic checkpoints carrying params, optimizer
state, PRNG key, step/epoch, and the best-metric tracker — giving restart-based
failure recovery the reference lacks.
"""

from __future__ import annotations

import os
from typing import Optional

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from dostransformer_tpu.train.early_stop import BestTracker
from dostransformer_tpu.train.trainer import TrainState

#: subdirectory of a checkpoint dir holding the BEST-validation model (one
#: kept). The cadence checkpoints in the parent dir are for crash-resume —
#: after early stopping the LATEST state is NOT the model the reported test
#: metrics describe (the reference evaluates test at the best-valid epoch,
#: main_eDOS.py:140-157); serving loads from here by default.
BEST_SUBDIR = "best"


def best_dir(directory: str) -> str:
    return os.path.join(directory, BEST_SUBDIR)


class CheckpointManager:
    """Thin orbax wrapper: save/restore (TrainState, epoch, BestTracker)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if not _HAS_ORBAX:
            raise RuntimeError("orbax-checkpoint is not available")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, epoch: int, state: TrainState,
             tracker: Optional[BestTracker] = None, wait: bool = False,
             epoch_meta: Optional[int] = None):
        """Checkpoint (TrainState, epoch, tracker) at ``epoch``.

        ASYNC by default: orbax serializes to a temp dir on background
        threads (atomic rename on completion, so a crash mid-save can never
        leave a corrupt latest checkpoint) while training continues — the
        save cost overlaps the next epochs' device compute. Orbax itself
        serializes back-to-back saves. ``wait=True`` (or
        :meth:`wait_until_finished` — the CLI calls it at training end)
        blocks until durable.

        Orbax refuses saves at a step <= the latest existing step, so the
        step must increase monotonically; when the logical epoch does not
        (the best/ manager resaves after a resume restored an older state),
        pass a monotonic ordinal as ``epoch`` and the true epoch as
        ``epoch_meta`` — :meth:`restore` reports the meta value."""
        meta = {"epoch": epoch if epoch_meta is None else epoch_meta}
        if tracker is not None:
            meta["tracker"] = {
                "es": tracker.es, "eval_every": tracker.eval_every,
                "best_rmse": tracker.best_rmse, "best_mae": tracker.best_mae,
                "best_epoch": tracker.best_epoch,
                "best_losses": list(map(float, tracker.best_losses)),
                "test_metrics": tracker.test_metrics,
            }
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if wait:
            self._mgr.wait_until_finished()

    def wait_until_finished(self):
        """Block until every in-flight async save is durable on disk."""
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()  # in-flight saves count
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, epoch: Optional[int] = None):
        self._mgr.wait_until_finished()  # never read a checkpoint mid-write
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            return None
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = restored["meta"]
        tracker = None
        if meta.get("tracker"):
            t = meta["tracker"]
            tracker = BestTracker(
                es=t["es"], eval_every=t["eval_every"], best_rmse=t["best_rmse"],
                best_mae=t["best_mae"], best_epoch=t["best_epoch"],
                best_losses=list(t["best_losses"]),
                test_metrics=t.get("test_metrics"),
            )
        return restored["state"], meta["epoch"], tracker
