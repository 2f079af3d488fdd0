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
    enumerate (shift, i, j) in identical lexicographic order and compare
    SQUARED distances (so the inclusion test happens in the same float
    domain — comparing sqrt'd values on one side would flip pairs lying
    within half an ulp of the cutoff).

    Positions need not be wrapped into the unit cell (ASE/pymatgen accept
    unwrapped coordinates too): the image-count bound below is only valid
    in-cell, so out-of-cell positions are wrapped for the search and the
    returned shifts re-expressed for the ORIGINAL positions — the contract
    |pos[dst] - pos[src] + shift @ cell| < cutoff always refers to the
    caller's coordinates. Already-in-cell inputs skip the wrap entirely
    (bit-identical fast path).
    """
    from dostransformer_tpu import native

    positions = np.asarray(positions, np.float64)
    cell = np.asarray(cell, np.float64)
    n = positions.shape[0]

    frac = positions @ np.linalg.inv(cell)
    wrap = np.where(np.asarray(pbc, bool)[None, :],
                    np.floor(frac), 0.0).astype(np.int64)       # [N, 3]
    if wrap.any():
        search_pos = positions - wrap @ cell
    else:
        search_pos, wrap = positions, None

    def _adjust(src, dst, shifts):
        if wrap is None:
            return src, dst, shifts
        # search ran on wrapped coords: pos_w[j] = pos[j] - wrap[j] @ cell,
        # so the original-coordinate shift is s - wrap[dst] + wrap[src]
        return src, dst, shifts - wrap[dst] + wrap[src]

    res = native.neighbor_list_pbc_native(search_pos, cell, cutoff, pbc,
                                          self_interaction)
    if res is not None:
        return _adjust(*res)

    nmax = _max_shifts(cell, cutoff)
    ranges = [np.arange(-m, m + 1) if p else np.array([0])
              for m, p in zip(nmax, pbc)]
    shifts = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    shift_cart = shifts @ cell                                   # [S, 3]

    # d[s, i, j] = pos[j] + shift_s - pos[i]
    disp = (search_pos[None, None, :, :] + shift_cart[:, None, None, :]
            - search_pos[None, :, None, :])                      # [S, N, N, 3]
    d2 = (disp ** 2).sum(axis=-1)

    mask = d2 < cutoff * cutoff
    zero_shift = np.all(shifts == 0, axis=1)                     # [S]
    same = np.eye(n, dtype=bool)
    if self_interaction:
        # keep i==j at S=0 (distance exactly 0) — drop nothing
        pass
    else:
        mask &= ~(zero_shift[:, None, None] & same[None])

    s_idx, i_idx, j_idx = np.nonzero(mask)
    return _adjust(i_idx.astype(np.int64), j_idx.astype(np.int64),
                   shifts[s_idx])


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
    positions = np.asarray(positions, np.float64)
    src, dst, shifts = neighbor_list_pbc(positions, cell, radius,
                                         self_interaction=False)
    vec = (positions[dst] + shifts @ np.asarray(cell, np.float64)
           - positions[src])
    d = np.linalg.norm(vec, axis=1)
    n = positions.shape[0]
    # stable sort by (src, dist): equal distances keep the (shift, i, j)
    # enumeration order — the same tie order the previous per-site
    # sorted() produced. NOTE (documented residual): the REFERENCE resolves
    # exact-equal distances in pymatgen get_all_neighbors' own enumeration
    # order, which this module does not reproduce; the divergence needs the
    # 12th and 13th neighbors bit-exactly equidistant (high-symmetry cells)
    # AND a different image enumeration order for that pair.
    order = np.lexsort((d, src))
    src_s, dst_s, d_s = src[order], dst[order], d[order]
    counts = np.bincount(src_s, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(src_s.shape[0]) - starts[src_s]
    keep = rank < max_num_nbr
    idx = np.zeros((n, max_num_nbr), np.int64)
    dist = np.full((n, max_num_nbr), radius + 1.0, np.float64)
    idx[src_s[keep], rank[keep]] = dst_s[keep]
    dist[src_s[keep], rank[keep]] = d_s[keep]
    senders = np.repeat(np.arange(n), max_num_nbr)
    edge_index = np.stack([senders, idx.reshape(-1)])
    return edge_index, dist.reshape(-1)
