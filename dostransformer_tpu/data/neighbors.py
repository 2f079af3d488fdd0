"""Periodic neighbor search (pure NumPy, vectorized).

Replaces the native neighbor-search kernels the reference pulls from its
dependencies (SURVEY.md §2.4): ASE ``neighbor_list("ijS", cutoff,
self_interaction=True)`` (reference utils.py:267) and pymatgen
``Structure.get_all_neighbors(radius, include_index=True)``
(reference mat2graph.py:193). This is offline host-side preprocessing in the
reference too — the TPU never sees it.

Algorithm: enumerate the integer lattice shifts whose image cells can
intersect a `cutoff`-sphere (bound derived from the reciprocal-lattice plane
spacings), compute all pairwise displacements in one broadcast, and mask by
distance. For the dataset scale here (≤ a few hundred atoms/cell) the O(N²·S)
broadcast beats a cell-list in wall time and is trivially exact.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _max_shifts(cell: np.ndarray, cutoff: float) -> np.ndarray:
    """Number of periodic images needed per axis: ceil(cutoff / plane_height),
    where the height of lattice planes normal to axis i is 1/|inv(cell)[:, i]|."""
    inv = np.linalg.inv(cell)
    heights = 1.0 / np.linalg.norm(inv, axis=0)
    return np.ceil(cutoff / heights).astype(np.int64)


def neighbor_list_pbc(
    positions: np.ndarray,
    cell: np.ndarray,
    cutoff: float,
    pbc: Tuple[bool, bool, bool] = (True, True, True),
    self_interaction: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ASE neighbor_list("ijS") semantics.

    positions [N, 3] cartesian; cell [3, 3] rows = lattice vectors.
    Returns (src [E], dst [E], shift [E, 3] int): all ordered pairs with
    |pos[dst] - pos[src] + shift @ cell| < cutoff. self_interaction=True keeps
    the (i, i, S=0) zero-distance pairs (the reference's phDOS graphs include
    self-loops, utils.py:267); (i, i, S≠0) periodic self-images are always
    kept, like ASE.

    Dispatches to the C++ implementation (dostransformer_tpu.native) when the
    library is built; this NumPy version is the oracle and fallback. Both
    enumerate (shift, i, j) in identical lexicographic order — outputs are
    bit-identical.
    """
    from dostransformer_tpu import native

    res = native.neighbor_list_pbc_native(positions, cell, cutoff, pbc,
                                          self_interaction)
    if res is not None:
        return res
    positions = np.asarray(positions, np.float64)
    cell = np.asarray(cell, np.float64)
    n = positions.shape[0]

    nmax = _max_shifts(cell, cutoff)
    ranges = [np.arange(-m, m + 1) if p else np.array([0])
              for m, p in zip(nmax, pbc)]
    shifts = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    shift_cart = shifts @ cell                                   # [S, 3]

    # d[s, i, j] = pos[j] + shift_s - pos[i]
    disp = (positions[None, None, :, :] + shift_cart[:, None, None, :]
            - positions[None, :, None, :])                       # [S, N, N, 3]
    dist = np.linalg.norm(disp, axis=-1)

    mask = dist < cutoff
    zero_shift = np.all(shifts == 0, axis=1)                     # [S]
    same = np.eye(n, dtype=bool)
    if self_interaction:
        # keep i==j at S=0 (distance exactly 0) — drop nothing
        pass
    else:
        mask &= ~(zero_shift[:, None, None] & same[None])

    s_idx, i_idx, j_idx = np.nonzero(mask)
    return i_idx.astype(np.int64), j_idx.astype(np.int64), shifts[s_idx]


def get_all_neighbors(
    positions: np.ndarray,
    cell: np.ndarray,
    radius: float,
) -> list:
    """pymatgen Structure.get_all_neighbors(radius, include_index=True)
    semantics (reference mat2graph.py:193): for each site i, a list of
    (distance, neighbor_unit_cell_index) over all periodic images within
    `radius`, EXCLUDING the site itself at zero distance (pymatgen excludes
    the self site but keeps its periodic images)."""
    src, dst, shifts = neighbor_list_pbc(positions, cell, radius,
                                         self_interaction=False)
    vec = (positions[dst] + shifts @ np.asarray(cell, np.float64)
           - positions[src])
    dist = np.linalg.norm(vec, axis=1)
    out = [[] for _ in range(positions.shape[0])]
    for s, d, r in zip(src, dst, dist):
        out[s].append((float(r), int(d)))
    return out


def knn_edges(
    positions: np.ndarray,
    cell: np.ndarray,
    radius: float = 8.0,
    max_num_nbr: int = 12,
) -> Tuple[np.ndarray, np.ndarray]:
    """The eDOS 12-NN edge construction (reference mat2graph.py:212-243):
    per atom, sort neighbors within `radius` by distance; truncate to
    max_num_nbr or pad with (index 0, distance radius+1). Returns
    (edge_index [2, N*max_num_nbr] with rows (center, neighbor), dist [E])."""
    nbrs = get_all_neighbors(positions, cell, radius)
    n = positions.shape[0]
    idx = np.zeros((n, max_num_nbr), np.int64)
    dist = np.full((n, max_num_nbr), radius + 1.0, np.float64)
    for i, lst in enumerate(nbrs):
        lst = sorted(lst, key=lambda t: t[0])[:max_num_nbr]
        for k, (r, j) in enumerate(lst):
            idx[i, k] = j
            dist[i, k] = r
    senders = np.repeat(np.arange(n), max_num_nbr)
    edge_index = np.stack([senders, idx.reshape(-1)])
    return edge_index, dist.reshape(-1)
