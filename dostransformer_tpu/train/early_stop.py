"""Best-metric tracking + early stopping.

Reproduces the reference's three-branch best tracking and plateau-based early
stop exactly (main_eDOS.py:133-175):
  * at each eval, compare valid (rmse, mae) against the best so far; any of the
    three improvement combinations triggers a test-set evaluation and updates
    the corresponding bests;
  * `best_losses` appends best_rmse each eval; once more than es/eval entries
    exist, stop when best_losses[-1] == best_losses[-es//5]
    (with defaults es=50, eval=5: unchanged for 10 evals).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class BestTracker:
    es: int = 50
    eval_every: int = 5
    best_rmse: float = 1000.0
    best_mae: float = 1000.0
    best_epoch: int = 0
    best_losses: list = dataclasses.field(default_factory=list)
    test_metrics: Optional[dict] = None

    def update(self, epoch: int, valid_rmse: float, valid_mae: float) -> bool:
        """Returns True if the test set should be (re-)evaluated now.

        Exact replication of the reference's three sequential `if` branches
        (main_eDOS.py:140-157). They are plain `if`s, not `elif`s, but the
        first branch updates best_rmse/best_mae before the later conditions
        are evaluated, so at most one branch ever fires; the net semantics
        are three *strict*-inequality branches:
          (rmse<, mae<) -> update both;  (rmse<, mae>) -> update rmse only;
          (rmse>, mae<) -> update mae only.
        At an exact tie in either metric (valid_rmse == best_rmse or
        valid_mae == best_mae) NO branch fires: no best update, no test
        eval — covered by tests/test_train.py::TestBestTracker ties."""
        run_test = False
        if valid_rmse < self.best_rmse and valid_mae < self.best_mae:
            self.best_rmse, self.best_mae = valid_rmse, valid_mae
            self.best_epoch = epoch
            run_test = True
        elif valid_rmse < self.best_rmse and valid_mae > self.best_mae:
            self.best_rmse = valid_rmse
            self.best_epoch = epoch
            run_test = True
        elif valid_rmse > self.best_rmse and valid_mae < self.best_mae:
            self.best_mae = valid_mae
            self.best_epoch = epoch
            run_test = True
        return run_test

    def record_test(self, metrics: dict):
        self.test_metrics = dict(metrics)

    def step_and_should_stop(self) -> bool:
        """Append best_rmse and apply the plateau rule (main_eDOS.py:159-163)."""
        self.best_losses.append(self.best_rmse)
        if len(self.best_losses) > int(self.es / self.eval_every):
            if self.best_losses[-1] == self.best_losses[-int(self.es / 5)]:
                return True
        return False
