"""Dataset splits, loaders, and iterator.

Split parity (SURVEY.md §7.3-6):
  * eDOS random split: sklearn train_test_split twice with
    random_state=args.random_state — 80/10/10 (main_eDOS.py:42-48). sklearn is
    available in this environment, so we call it directly: bit-exact parity.
  * eDOS OOD splits: pre-built train/test sets; valid/test from
    train_test_split(test, 0.5) (main_eDOS.py:34-39).
  * phDOS: indices are read from idx_train/valid/test.txt files
    (main_phDOS.py:47-49); the element-balanced splitter (utils.py:176-245)
    that generates them is ported below as offline tooling.

The loader performs fixed-shape collation (dataset-level maxima by default —
ONE compiled shape for the whole run) with torch-DataLoader-style epoch
shuffling (statistically equivalent; RNG streams differ from torch's — the
random seed affects only sample order, not semantics).
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence

import numpy as np

from dostransformer_tpu.data.graph import GraphBatch, GraphSample, bucket_size, collate


def train_test_split(items: Sequence, test_size: float, random_state: int):
    """sklearn.model_selection.train_test_split(shuffle=True) with identical
    output ordering (delegates to sklearn when available, else replicates its
    permutation semantics)."""
    try:
        from sklearn.model_selection import train_test_split as _tts
        return _tts(list(items), test_size=test_size, random_state=random_state)
    except ImportError:  # pragma: no cover
        n = len(items)
        n_test = int(math.ceil(n * test_size))
        if n_test >= n or n_test < 1:
            # sklearn raises here; element_balanced_split's reference
            # parity DEPENDS on it (its `except ValueError: continue`
            # replicates utils.py's too-few-examples skip — a silent
            # empty-train split would put lone-element samples in test)
            raise ValueError(
                f"train_test_split would leave an empty split "
                f"(n={n}, n_test={n_test})")
        rng = np.random.RandomState(random_state)
        perm = rng.permutation(n)
        test_idx = perm[:n_test]
        train_idx = perm[n_test:]
        items = list(items)
        return [items[i] for i in train_idx], [items[i] for i in test_idx]


def edos_random_split(dataset: Sequence[GraphSample], random_state: int = 0):
    """80/10/10 (main_eDOS.py:42-48): split off 20%, then halve it."""
    train, rest = train_test_split(dataset, test_size=0.2, random_state=random_state)
    valid, test = train_test_split(rest, test_size=0.5, random_state=random_state)
    return train, valid, test


def edos_ood_split(train_dataset, test_dataset, random_state: int = 0):
    """OOD splits (main_eDOS.py:34-39): valid/test = halves of the OOD test set."""
    valid, test = train_test_split(test_dataset, test_size=0.5, random_state=random_state)
    return list(train_dataset), valid, test


def read_index_file(path: str) -> List[int]:
    """idx_{train,valid,test}.txt reader (main_phDOS.py:47-49)."""
    with open(path) as f:
        return [int(line.split("\n")[0]) for line in f.readlines()]


# ---------------------------------------------------------------------------
# Element-balanced splitter (offline tooling; port of utils.py:176-245)
# ---------------------------------------------------------------------------


def element_balanced_split(species_per_sample: Sequence[Sequence[str]],
                           valid_size: float = 0.1, test_size: float = 0.1,
                           seed: int = 12):
    """Element-balanced train/valid/test split (utils.py:176-194): for each
    element sorted by sample count ascending, split its sample indices with
    sklearn train_test_split, adding only indices not already assigned;
    leftovers go to train.

    Order-exact with the reference (differential-tested against a transcribed
    pandas oracle, tests/test_data.py): the reference sorts elements with
    pandas ``sort_values('count')`` whose default unstable quicksort breaks
    count ties in numpy-introsort order, NOT alphabetically — replicated here
    via ``np.argsort(counts, kind='quicksort')`` over the alphabetical
    species table (utils.py:222). Membership order within an element follows
    the universe order (sample ascending at level 1, dev-list order at
    level 2 — utils.py:185 ``df.iloc[idx_dev]``)."""
    species = sorted({sp for row in species_per_sample for sp in row})
    all_idx = list(range(len(species_per_sample)))

    def split_level(universe: List[int], frac: float):
        stats = []
        for sp in species:
            members = [i for i in universe if sp in species_per_sample[i]]
            if members:
                stats.append(members)
        counts = np.array([len(m) for m in stats])
        order = np.argsort(counts, kind="quicksort")  # pandas sort_values
        idx_train: List[int] = []
        idx_test: List[int] = []
        for j in order:
            members = stats[j]
            try:
                tr, te = train_test_split(members, test_size=frac, random_state=seed)
            except ValueError:
                continue  # too few examples (utils.py:230-233)
            assigned = set(idx_train) | set(idx_test)
            idx_train += [k for k in tr if k not in assigned and k not in idx_train]
            assigned = set(idx_train) | set(idx_test)
            idx_test += [k for k in te if k not in assigned and k not in idx_test]
        return idx_train, idx_test

    dev_size = valid_size + test_size
    idx_train, idx_dev = split_level(all_idx, dev_size)
    idx_valid, idx_test = split_level(idx_dev, test_size / dev_size)
    assigned = set(idx_train) | set(idx_valid) | set(idx_test)
    idx_train += [i for i in all_idx if i not in assigned]
    return idx_train, idx_valid, idx_test


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------


class GraphLoader:
    """Fixed-shape batched iterator over GraphSamples.

    By default every batch is padded to the dataset-level maxima (rounded to
    power-of-two buckets) -> exactly ONE compiled train-step shape. Short final
    batches are padded with dummy graphs (graph_mask=0) instead of being
    dropped or triggering a recompile.
    """

    def __init__(
        self,
        samples: Sequence[GraphSample],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        atoms_per_graph: Optional[int] = None,
        edges_per_graph: Optional[int] = None,
        use_buckets: bool = True,
        drop_last: bool = False,
        numpy: bool = False,
    ):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.numpy = numpy
        self.rng = np.random.RandomState(seed)
        if not self.samples:
            from dostransformer_tpu.data.graph import RequestError

            raise RequestError("GraphLoader needs at least one sample")
        # explicit None checks (collate's contract): a pin of 0 is invalid
        # input for collate to reject, not a falsy "derive it for me"
        if atoms_per_graph is None or edges_per_graph is None:
            max_n = max(s.n_nodes for s in self.samples)
            max_e = max(s.n_edges for s in self.samples)
        if atoms_per_graph is None:
            atoms_per_graph = bucket_size(max_n) if use_buckets else max_n
        if edges_per_graph is None:
            edges_per_graph = (bucket_size(max(max_e, 1)) if use_buckets
                               else max(max_e, 1))
        self.atoms_per_graph = atoms_per_graph
        self.edges_per_graph = edges_per_graph
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.samples)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator[GraphBatch]:
        order = np.arange(len(self.samples))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for i in range(0, len(order) - (bs - 1 if self.drop_last else 0), bs):
            chunk = [self.samples[j] for j in order[i: i + bs]]
            yield collate(chunk, atoms_per_graph=self.atoms_per_graph,
                          edges_per_graph=self.edges_per_graph,
                          num_graphs=bs, numpy=self.numpy)
