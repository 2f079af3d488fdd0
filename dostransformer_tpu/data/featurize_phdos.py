"""phDOS featurizer: phononDoS data.csv -> GraphSamples.

Behavioral port of the reference's `load_data` + `build_data`
(utils.py:152-173, 249-303), with the dependency-provided kernels replaced by
in-repo NumPy (SURVEY.md §2.4):
  * ASE `Atoms.fromdict` -> plain dict parsing (ast.literal_eval, no eval);
  * ASE `neighbor_list("ijS", cutoff=r_max, self_interaction=True)` ->
    :func:`dostransformer_tpu.data.neighbors.neighbor_list_pbc`;
  * ASE `Atom(Z).mass` -> :data:`dostransformer_tpu.data.elements.ATOMIC_MASSES`.

Node features: row of diag(atomic_mass) (118-d); z: one-hot type; edges carry
edge_vec = pos[dst] - pos[src] + shift @ cell (utils.py:271-273); target
`phdos` [51]; crystal-system id 0..6 (utils.py:277-290).

This runs offline on the host — the same place the reference runs it
(main_phDOS.py:18-22 builds all graphs at import time).
"""

from __future__ import annotations

import ast
from typing import List, Sequence, Tuple

import numpy as np

from dostransformer_tpu.config import crystal_system_id
from dostransformer_tpu.data.elements import (
    SYMBOLS,
    atomic_mass_features,
    one_hot_types,
)
from dostransformer_tpu.data.graph import GraphSample
from dostransformer_tpu.data.neighbors import neighbor_list_pbc


def build_sample(
    numbers: Sequence[int],
    positions: np.ndarray,
    cell: np.ndarray,
    phdos: np.ndarray,
    crystal_system: str = "",
    mp_id: str = "",
    sample_id: int = 0,
    r_max: float = 4.0,
    pbc: Tuple[bool, bool, bool] = (True, True, True),
) -> GraphSample:
    """One crystal -> GraphSample (reference build_data, utils.py:249-303)."""
    numbers = np.asarray(numbers, np.int64)
    positions = np.asarray(positions, np.float64)
    cell = np.asarray(cell, np.float64)

    src, dst, shifts = neighbor_list_pbc(positions, cell, r_max, pbc=pbc,
                                         self_interaction=True)
    edge_vec = positions[dst] - positions[src] + shifts @ cell

    return GraphSample(
        x=atomic_mass_features(numbers).astype(np.float32),
        z=one_hot_types(numbers).astype(np.float32),
        edge_index=np.stack([src, dst]),
        edge_vec=edge_vec.astype(np.float32),
        edge_shift=shifts.astype(np.float32),
        y=np.asarray(phdos, np.float32).reshape(-1),
        system=crystal_system_id(crystal_system, phonon=True),
        mp_id=mp_id,
        sample_id=sample_id,
    )


def _atoms_from_dict(d: dict):
    """Parse an ASE Atoms.todict() payload: numbers, positions, cell, pbc."""
    numbers = np.asarray(d["numbers"], np.int64)
    positions = np.asarray(d["positions"], np.float64)
    cell = np.asarray(d["cell"], np.float64)
    pbc = tuple(bool(b) for b in np.atleast_1d(d.get("pbc", True)).tolist())
    if len(pbc) == 1:
        pbc = pbc * 3
    if len(pbc) != 3:
        # must be exactly 3: the native neighbor kernel indexes pbc[0..2]
        # (a shorter buffer would be read past), and a longer one is a
        # malformed payload either way
        raise ValueError(f"pbc must have 1 or 3 entries, got {len(pbc)}")
    return numbers, positions, cell, pbc


# worker-process state for the featurizer pool (set once per worker by the
# initializer; the serial path runs the same task function)
_POOL_STATE: dict = {}


def _phdos_pool_init(r_max):
    _POOL_STATE["r_max"] = r_max


def _phdos_pool_task(task):
    i, structure_str, phdos_str, crystal_system, mp_id = task
    numbers, positions, cell, pbc = _atoms_from_dict(
        ast.literal_eval(structure_str))
    phdos = np.asarray(ast.literal_eval(phdos_str), np.float64)
    sample = build_sample(
        numbers, positions, cell, phdos, crystal_system=crystal_system,
        mp_id=mp_id, sample_id=i, r_max=_POOL_STATE["r_max"], pbc=pbc)
    return sample, sorted({SYMBOLS[z - 1] for z in numbers})


def featurize_csv(
    path: str,
    r_max: float = 4.0,
    workers: int = 0,
) -> Tuple[List[GraphSample], List[List[str]]]:
    """data.csv -> (samples, species_per_sample).

    The CSV carries `structure` as the repr of an ASE Atoms dict, plus
    `phfreq`, `phdos`, `pdos`, `crystal_system`, `mp_id` columns (reference
    utils.py:152-173). species_per_sample feeds the element-balanced splitter.

    ``workers > 1`` featurizes crystals on a spawn-context process pool
    (SURVEY.md §3.2: featurization is offline and embarrassingly parallel);
    ordering and sample_ids match the serial path, which runs the same
    task function. Malformed rows raise either way (no silent drops — the
    reference's build loop has no error handling, main_phDOS.py:18-22).
    """
    import pandas as pd

    df = pd.read_csv(path)
    tasks = [(int(i), str(row["structure"]), str(row["phdos"]),
              str(row.get("crystal_system", "")), str(row.get("mp_id", i)))
             for i, row in df.iterrows()]
    if workers and workers > 1:
        from dostransformer_tpu.data.pool import host_pool

        with host_pool(workers, initializer=_phdos_pool_init,
                       initargs=(r_max,)) as pool:
            results = pool.map(_phdos_pool_task, tasks, chunksize=16)
    else:
        _phdos_pool_init(r_max)
        results = [_phdos_pool_task(t) for t in tasks]
    samples = [s for s, _ in results]
    species = [sp for _, sp in results]
    return samples, species


def main(argv=None):
    import argparse

    from dostransformer_tpu.data.io import save_samples

    p = argparse.ArgumentParser("featurize_phdos")
    p.add_argument("csv")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--r_max", type=float, default=4.0)
    p.add_argument("--workers", type=int, default=0,
                   help="featurizer process-pool size (0/1 = serial)")
    args = p.parse_args(argv)
    samples, _ = featurize_csv(args.csv, r_max=args.r_max,
                               workers=args.workers)
    save_samples(args.out, samples)
    print(f"featurized {len(samples)} crystals -> {args.out}")


if __name__ == "__main__":
    main()
