"""eDOS featurizer: Materials Project records -> GraphSamples.

Behavioral port of the reference's mat2graph.py pipeline with the
dependency-provided kernels replaced in-repo (SURVEY.md §2.4):
  * matscholar element embeddings (200-d per element, JSON keyed by symbol)
    loaded in atomic-number order Z=1..100 and column-standardized like
    sklearn.preprocessing.scale (mat2graph.py:33-47);
  * pymatgen `get_all_neighbors(radius=8)` -> NumPy periodic neighbor search
    (:mod:`dostransformer_tpu.data.neighbors`); 12-NN sort/truncate/pad with
    (index 0, distance radius+1) (mat2graph.py:212-243);
  * Gaussian distance expansion, centers arange(0, 8.2, 0.2) -> 41 dims,
    var = step (mat2graph.py:162-179);
  * one all-zero 200-d "prompt node" row appended per graph — node count
    n_atoms+1, no incident edges (mat2graph.py:155-158);
  * labels y = y/y.max(), y_ft = y_ft/y_ft.max(), y_max kept; glob =
    [energy_per_atom, formation_energy_per_atom]; band_gap; efermi;
    crystal-system id 0..6 from the lowercase system name (mat2graph.py:80-107).

Structure input: either a pre-parsed dict {"numbers", "cart_coords",
"lattice"} or a CIF string (CIF parsing requires pymatgen and is gated —
pymatgen is an offline-only dependency in the reference too).
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

import numpy as np

from dostransformer_tpu.config import crystal_system_id
from dostransformer_tpu.data.elements import SYMBOLS
from dostransformer_tpu.data.graph import GraphSample
from dostransformer_tpu.data.neighbors import knn_edges

N_MATSCHOLAR_ELEMENTS = 100  # Z = 1..100 (H..Fm), mat2graph.py:15-26


def standardize_columns(x: np.ndarray) -> np.ndarray:
    """sklearn.preprocessing.scale semantics: per-column zero mean, unit
    population std (ddof=0); zero-variance columns pass through centered."""
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd = np.where(sd == 0.0, 1.0, sd)
    return (x - mu) / sd


def load_elem_feats(path_elem_embs: Optional[str] = None) -> np.ndarray:
    """Element feature table, row order Z-1 (mat2graph.py:33-47).

    Default (no path): the bundled matscholar table
    (``matscholar_embedding.npz``, public third-party data from the
    matscholar project — the reference ships the same table as
    data/matscholar-embedding.json) -> [100, 200] standardized. The eDOS
    featurizer therefore runs with zero user-supplied files.

    With a path: a matscholar-format JSON ({symbol: [200 floats]}).
    ``path_elem_embs="mendeleev"`` selects the reference's no-JSON fallback
    (mat2graph.py:36-38): 8 mendeleev features + 1st ionization energy ->
    [100, 9] standardized — requires the mendeleev package (offline-only
    dependency, exactly like the reference)."""
    if path_elem_embs is None:
        rows = load_matscholar_table()
    elif path_elem_embs == "mendeleev":
        return get_mendeleev_feats()
    else:
        with open(path_elem_embs) as f:
            embs = json.load(f)
        rows = np.vstack([np.asarray(embs[SYMBOLS[z]], np.float64)
                          for z in range(N_MATSCHOLAR_ELEMENTS)])
    return standardize_columns(rows)


def load_matscholar_table() -> np.ndarray:
    """Raw (unstandardized) bundled matscholar embeddings, [100, 200] f64,
    row order Z-1 for Z=1..100."""
    import os

    path = os.path.join(os.path.dirname(__file__), "matscholar_embedding.npz")
    with np.load(path) as npz:
        return np.asarray(npz["embeddings"], np.float64)


def get_mendeleev_feats() -> np.ndarray:
    """The reference's no-JSON fallback (mat2graph.py:50-62): 8 tabulated
    element properties + first ionization energy, column-standardized."""
    try:
        from mendeleev.fetch import fetch_table
        from mendeleev import element
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "the mendeleev fallback requires the `mendeleev` package; "
            "pass the matscholar embeddings JSON instead") from e
    names = ["atomic_number", "period", "en_pauling", "covalent_radius_bragg",
             "electron_affinity", "atomic_volume", "atomic_weight",
             "fusion_heat"]
    tb = fetch_table("elements")[:N_MATSCHOLAR_ELEMENTS]
    feats = np.nan_to_num(np.array(tb[names], np.float64))
    ion = np.zeros((feats.shape[0], 1))
    for i in range(ion.shape[0]):
        ion[i, 0] = element(i + 1).ionenergies.get(1, 0.0)
    return standardize_columns(np.hstack([feats, ion]))


def gaussian_expand(distances: np.ndarray, dmin: float = 0.0,
                    dmax: float = 8.0, step: float = 0.2,
                    var: Optional[float] = None) -> np.ndarray:
    """Gaussian basis expansion (mat2graph.py:162-179)."""
    if var is None:
        var = step
    centers = np.arange(dmin, dmax + step, step)
    return np.exp(-((distances[..., None] - centers) ** 2) / var ** 2)


def build_sample(
    elem_feats: np.ndarray,
    numbers: Sequence[int],
    cart_coords: np.ndarray,
    lattice: np.ndarray,
    y: np.ndarray,
    y_ft: np.ndarray,
    glob: Sequence[float],
    crystal_system: str = "",
    band_gap: float = 0.0,
    efermi: float = 0.0,
    mp_id: str = "",
    sample_id: int = 0,
    radius: float = 8.0,
    max_num_nbr: int = 12,
) -> GraphSample:
    """One crystal -> GraphSample (mat2graph.py get_crystal_graph semantics)."""
    numbers = np.asarray(numbers, np.int64)
    cart_coords = np.asarray(cart_coords, np.float64)
    lattice = np.asarray(lattice, np.float64)

    x = elem_feats[numbers - 1]                        # [n, 200]
    x = np.vstack([x, np.zeros((1, x.shape[1]))])      # zero prompt node

    # data-fidelity fields of the reference Data (mat2graph.py:143):
    # coords [n_atoms, 3] cartesian; z one-hot(100) atom type — both exclude
    # the prompt node (one row fewer than x), and no model consumes them.
    # (The reference's coords path dedupes identical coordinate strings via a
    # dict, mat2graph.py:196-203 — a latent defect that would drop rows for
    # coincident sites; we keep one row per atom.)
    z_onehot = np.eye(100, dtype=np.float32)[numbers - 1]

    edge_index, dist = knn_edges(cart_coords, lattice, radius=radius,
                                 max_num_nbr=max_num_nbr)
    edge_attr = gaussian_expand(dist, dmax=radius)

    y = np.asarray(y, np.float64)
    y_ft = np.asarray(y_ft, np.float64)
    y_max = float(y_ft.max())
    return GraphSample(
        x=x.astype(np.float32),
        edge_index=edge_index,
        edge_attr=edge_attr.astype(np.float32),
        coords=cart_coords.astype(np.float32),
        z=z_onehot,
        glob=np.asarray(glob, np.float32),
        y=(y_ft / y_ft.max()).astype(np.float32),      # y_ft is the train target
        y_raw=(y / y.max()).astype(np.float32),
        y_max=y_max,
        band_gap=float(band_gap),
        efermi=float(efermi),
        system=crystal_system_id(crystal_system, phonon=False),
        mp_id=mp_id,
        sample_id=sample_id,
    )


def structure_from_cif(cif):
    """CIF string -> (numbers, cart_coords, lattice).

    Accepts three forms:
      * a pre-parsed ``{"numbers", "cart_coords", "lattice"}`` dict
        (the in-env migration format — converters that already parsed the
        structure store records this way);
      * a CIF string, parsed with pymatgen when it is importable (exactly
        the reference's path, mat2graph.py:121);
      * a CIF string with NO pymatgen: the in-repo parser
        (:mod:`dostransformer_tpu.data.cif`) handles the
        Materials-Project-style subset — cell params, fractional coords,
        symmetry-op expansion — so raw-CIF featurization runs
        dependency-free."""
    if isinstance(cif, dict):
        return (np.asarray(cif["numbers"]), np.asarray(cif["cart_coords"]),
                np.asarray(cif["lattice"]))
    try:
        from pymatgen.core.structure import Structure
    except ImportError:
        from dostransformer_tpu.data.cif import parse_cif
        d = parse_cif(cif)
        return d["numbers"], d["cart_coords"], d["lattice"]
    s = Structure.from_str(cif, fmt="cif")
    return (np.array(s.atomic_numbers), np.array(s.cart_coords),
            np.array(s.lattice.matrix))


# worker-process state for the featurizer pool (set once per worker by the
# initializer; also used by the serial path so both run the SAME code)
_POOL_STATE: dict = {}


def _edos_pool_init(elem_feats, radius):
    _POOL_STATE["elem_feats"] = elem_feats
    _POOL_STATE["radius"] = radius


def _edos_pool_task(task):
    i, mp_id, rec, dos_rec = task
    try:
        numbers, coords, lattice = structure_from_cif(rec["cif"])
        return build_sample(
            _POOL_STATE["elem_feats"], numbers, coords, lattice,
            y=np.asarray(dos_rec["densities_total_1"]),
            y_ft=np.asarray(dos_rec["densities_total_1_ft"]),
            glob=[rec["energy_per_atom"], rec["formation_energy_per_atom"]],
            crystal_system=rec["spacegroup"]["crystal_system"],
            # direct indexing, NOT .get(..., 0.0): the reference reads both
            # inside its per-record try (mat2graph.py) so a record missing
            # either key counts as an ERROR and is dropped — a fabricated
            # 0.0 band gap would silently keep it with wrong metadata
            band_gap=rec["band_gap"],
            efermi=dos_rec["efermi"],
            mp_id=mp_id, sample_id=i, radius=_POOL_STATE["radius"])
    except Exception:
        return None


def load_dataset(
    mp_data: dict,
    dos_data: dict,
    original_dataset_mp_id: Sequence[str],
    path_elem_embs: Optional[str] = None,
    radius: float = 8.0,
    workers: int = 0,
) -> List[GraphSample]:
    """mp.pkl/dos.pkl-shaped dicts -> GraphSamples (mat2graph.py:69-117).

    ``workers > 1`` featurizes crystals on a spawn-context process pool
    (SURVEY.md §3.2: featurization is the offline hot spot and is
    embarrassingly parallel) — sample_ids, ordering, and error accounting
    are identical to the serial path, which runs the same task function."""
    elem_feats = load_elem_feats(path_elem_embs)
    keep = set(original_dataset_mp_id)
    # sample_id = position in mp_data INCLUDING records outside the keep
    # set (mat2graph.py enumerates the full dict)
    tasks = [(i, mp_id, rec, dos_data.get(mp_id, {}))
             for i, (mp_id, rec) in enumerate(mp_data.items())
             if mp_id in keep]
    if workers and workers > 1:
        from dostransformer_tpu.data.pool import host_pool

        with host_pool(workers, initializer=_edos_pool_init,
                       initargs=(elem_feats, radius)) as pool:
            results = pool.map(_edos_pool_task, tasks, chunksize=16)
    else:
        _edos_pool_init(elem_feats, radius)
        results = [_edos_pool_task(t) for t in tasks]
    out = [s for s in results if s is not None]
    errors = len(results) - len(out)
    print(f"Converted {len(out)} | errors {errors}")
    return out


def main(argv=None):
    import argparse
    import pickle

    from dostransformer_tpu.data.io import save_samples

    p = argparse.ArgumentParser("featurize_edos")
    p.add_argument("mp_pkl")
    p.add_argument("dos_pkl")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--elem_embs", default=None,
                   help="path to a matscholar-embedding.json (default: the "
                        "bundled matscholar table)")
    p.add_argument("--radius", type=float, default=8.0)
    p.add_argument("--workers", type=int, default=0,
                   help="featurizer process-pool size (0/1 = serial)")
    args = p.parse_args(argv)
    with open(args.mp_pkl, "rb") as f:
        mp_data = pickle.load(f)
    with open(args.dos_pkl, "rb") as f:
        dos_data = pickle.load(f)
    samples = load_dataset(mp_data, dos_data, list(mp_data.keys()),
                           args.elem_embs, radius=args.radius,
                           workers=args.workers)
    save_samples(args.out, samples)
    print(f"featurized {len(samples)} crystals -> {args.out}")


if __name__ == "__main__":
    main()
