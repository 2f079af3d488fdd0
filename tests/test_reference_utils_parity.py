"""Parity vs the GENUINE reference utils.py: eval loops + the splitter.

tests/test_reference_model_parity.py pins the model forwards against the real
reference code; this file extends genuine-code pinning to the two remaining
behavior-heavy reference surfaces our framework re-implements from reading:

  * ``utils.test`` / ``utils.test_phonon`` (utils.py:61-143) — the eval loops
    whose per-sample metric semantics (running batch means, the eval-side
    clamp of BOTH y and preds for eDOS, L1-as-mae, variance-weighted r2 per
    sample, the scatter_sum embedding export) our `train/metrics.py` +
    `eval_step` reproduce.  Here the genuine loops run (with the genuine
    models from refshims-imported embedder modules) over batch-size-1 loaders
    of synthetic crystals, and our eval pipeline must produce the same four
    scalars and the same preds/embeddings export.
  * ``utils.train_valid_test_split`` (utils.py:176-245) — the element-balanced
    splitter.  pandas + sklearn + tqdm ARE installed here, so the genuine
    function executes as-is; our `element_balanced_split` (which replaced the
    transcribed-pandas oracle reasoning with plain numpy) must match its
    index lists EXACTLY, killing the transcription circularity noted in
    tests/test_data.py.

Shims used (tests/refshims.py): torch_scatter (index_add), torch_geometric /
ase fakes that are imported but never called on these paths.  pandas, sklearn,
scipy and tqdm are real.
"""

import sys
import types

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
pd = pytest.importorskip("pandas")

from dostransformer_tpu.data import (
    collate,
    synthetic_edos_samples,
    synthetic_phdos_samples,
)
from dostransformer_tpu.data.datasets import element_balanced_split
from dostransformer_tpu.models.dostransformer import (
    DOSTransformerEDOS,
    DOSTransformerPhDOS,
)
from dostransformer_tpu.models.import_torch import import_reference_state_dict
from dostransformer_tpu.train.metrics import MetricAccumulator, eval_metrics
from tests.refshims import reference_imports

H, L, T = 32, 2, 2


@pytest.fixture(scope="module")
def ref():
    with reference_imports("utils",
                           "embedder_eDOS.DOSTransformer",
                           "embedder_phDOS.DOSTransformer_phonon") as (
            utils, m_dt, m_ph):
        yield utils, m_dt.DOSTransformer, m_ph.DOSTransformer_phonon


@pytest.fixture(autouse=True)
def f64():
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)
        jax.config.update("jax_enable_x64", False)


def _cast_f64(tree):
    return jax.tree.map(
        lambda a: np.asarray(a).astype(np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, tree)


class _B:
    """A batch-size-1 PyG-style batch for the genuine eval loops."""

    def __init__(self, s, phdos=False):
        self.x = torch.as_tensor(np.asarray(s.x, dtype=np.float64))
        self.edge_index = torch.as_tensor(
            np.asarray(s.edge_index, dtype=np.int64))
        self.batch = torch.zeros(s.n_nodes, dtype=torch.long)
        self.system = torch.as_tensor([int(s.system)])
        self.mp_id = [s.mp_id]
        y = torch.as_tensor(np.asarray(s.y, dtype=np.float64))
        if phdos:
            self.edge_vec = torch.as_tensor(
                np.asarray(s.edge_vec, dtype=np.float64))
            self.phdos = y
        else:
            self.edge_attr = torch.as_tensor(
                np.asarray(s.edge_attr, dtype=np.float64))
            self.glob = torch.as_tensor(
                np.asarray(s.glob, dtype=np.float64))[None]
            self.y_ft = y
        self._phdos = phdos

    def to(self, device):
        return self

    # the phDOS preprocess probes 'batch' / 'edge_index' dict-style
    def __contains__(self, k):
        return k in self.__dict__

    def __getitem__(self, k):
        return self.__dict__[k]


def _our_eval(model_cls, tmodel, samples, clamp, **kw):
    """Run OUR production eval components (model.apply -> eval_metrics ->
    MetricAccumulator) with the genuine weights; returns (scalars, preds,
    embeddings-or-None)."""
    batch0 = _cast_f64(collate([samples[0]],
                               atoms_per_graph=samples[0].n_nodes,
                               edges_per_graph=samples[0].n_edges,
                               use_buckets=False))
    model = model_cls(hidden=H, dtype="float64", padding="ref",
                      use_pallas=False, **kw)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = import_reference_state_dict(
        sd, _cast_f64(model.init(jax.random.PRNGKey(0), batch0)))

    acc = MetricAccumulator()
    preds, embs = [], []
    for s in samples:
        batch = _cast_f64(collate([s], atoms_per_graph=s.n_nodes,
                                  edges_per_graph=s.n_edges,
                                  use_buckets=False))
        dg, x, ds = model.apply(params, batch, deterministic=True)
        m = eval_metrics(ds, batch.y, clamp=clamp, graph_mask=batch.graph_mask)
        acc.update(m)
        preds.append(np.asarray(m["preds"])[0])
        embs.append(np.asarray(
            (x * batch.node_mask[..., None]).sum(axis=1))[0])
    return acc.result(), np.stack(preds), np.stack(embs)


def test_edos_eval_loop_matches_genuine_utils_test(ref):
    utils, EDOSRef, _ = ref
    torch.manual_seed(31)
    tmodel = EDOSRef(L, T, 200, 41, 2, H, "cpu", 0.0).eval()
    samples = synthetic_edos_samples(5, seed=17, min_atoms=4, max_atoms=9)
    loader = [_B(s) for s in samples]

    rmse, mse, mae, r2, preds_y = utils.test(
        tmodel, loader, torch.nn.L1Loss(), utils.r2, "cpu")

    ours, our_preds, our_embs = _our_eval(
        DOSTransformerEDOS, tmodel, samples, clamp=True,
        layers=L, t_layers=T)

    np.testing.assert_allclose(ours["rmse"], float(rmse), rtol=1e-6)
    np.testing.assert_allclose(ours["mse"], float(mse), rtol=1e-6)
    np.testing.assert_allclose(ours["mae"], float(mae), rtol=1e-6)
    np.testing.assert_allclose(ours["r2"], float(r2), rtol=1e-6)
    # the preds_y export: [mp_id list, preds, y, embeddings]
    mp_id, preds, y, embeddings = preds_y[0]
    assert mp_id == [s.mp_id for s in samples]
    np.testing.assert_allclose(our_preds, preds, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(our_embs, embeddings, rtol=1e-5, atol=1e-7)


def test_phdos_eval_loop_matches_genuine_utils_test_phonon(ref):
    utils, _, PhDOSRef = ref
    torch.manual_seed(32)
    tmodel = PhDOSRef(L, T, 118, 4, H, "cpu", 0.0).eval()
    samples = synthetic_phdos_samples(5, seed=18, min_atoms=4, max_atoms=8)
    loader = [_B(s, phdos=True) for s in samples]

    rmse, mse, mae, r2 = utils.test_phonon(
        tmodel, loader, torch.nn.L1Loss(), utils.r2, "cpu")

    ours, _, _ = _our_eval(DOSTransformerPhDOS, tmodel, samples, clamp=False,
                           layers=L, t_layers=T)
    np.testing.assert_allclose(ours["rmse"], float(rmse), rtol=1e-6)
    np.testing.assert_allclose(ours["mse"], float(mse), rtol=1e-6)
    np.testing.assert_allclose(ours["mae"], float(mae), rtol=1e-6)
    np.testing.assert_allclose(ours["r2"], float(r2), rtol=1e-6)


def test_flag_defaults_and_run_name_match_genuine_utils(ref, monkeypatch):
    """The genuine parse_args/training_config/exp_get_name execute here: the
    13 shared flag defaults and the run-name string (key order + f-string
    float formatting) must match config.TrainConfig/exp_get_name exactly."""
    from dostransformer_tpu.config import TrainConfig, exp_get_name

    utils, _, _ = ref

    def genuine(argv):
        monkeypatch.setattr(sys, "argv", ["prog", *argv])
        return utils.training_config(utils.parse_args())

    gd = genuine([])
    cfg = TrainConfig()
    ours = {"lr": cfg.lr, "epochs": cfg.epochs, "batch_size": cfg.batch_size,
            "layers": cfg.layers, "transformer": cfg.transformer,
            "eval": cfg.eval_every, "es": cfg.es, "embedder": cfg.embedder,
            "hidden": cfg.hidden, "random_state": cfg.random_state,
            "dataset": cfg.dataset, "attn_drop": cfg.attn_drop,
            "seed": cfg.seed, "beta": cfg.beta}
    for k, v in ours.items():
        assert gd[k] == v, f"default mismatch for --{k}: {gd[k]} vs {v}"

    assert exp_get_name(cfg) == utils.exp_get_name(gd)

    # a non-default combination: float formatting and key order must survive
    gd2 = genuine(["--lr", "0.001", "--beta", "2.5", "--layers", "4",
                   "--embedder", "graphnetwork", "--dataset", "ood_element",
                   "--attn_drop", "0.1", "--seed", "3"])
    cfg2 = TrainConfig(lr=0.001, beta=2.5, layers=4, embedder="graphnetwork",
                       dataset="ood_element", attn_drop=0.1, seed=3)
    assert exp_get_name(cfg2) == utils.exp_get_name(gd2)


def test_featurizer_constants_match_genuine_mat2graph():
    """The GENUINE data/mat2graph.py executes here (psy/pymatgen/mendeleev
    stubbed — none of their code paths run): its element-feature loader over
    its OWN shipped matscholar-embedding.json and its GaussianDistance must
    match our bundled npz table + standardize_columns and ops.gaussian_basis
    exactly.  Kills the hand-transcription circularity for the matscholar
    table (previously pinned by transcribed literals) and the Gaussian
    expansion."""
    from tests.refshims import load_reference_file, reference_imports

    from dostransformer_tpu.data.featurize_edos import load_elem_feats
    from dostransformer_tpu.ops.geometry import gaussian_basis

    with reference_imports():
        m2g = load_reference_file("data/mat2graph.py", "ref_mat2graph")

        genuine_table = m2g.load_elem_feats(
            "/root/reference/data/matscholar-embedding.json")
        ours = load_elem_feats()  # bundled npz + our standardization
        assert genuine_table.shape == ours.shape == (100, 200)
        np.testing.assert_allclose(ours, genuine_table, rtol=1e-12,
                                   atol=1e-12)
        # the JSON path of OUR loader over the GENUINE json, too
        ours_json = load_elem_feats(
            "/root/reference/data/matscholar-embedding.json")
        np.testing.assert_allclose(ours_json, genuine_table, rtol=1e-12,
                                   atol=1e-12)

        gd = m2g.GaussianDistance(dmin=0.0, dmax=8.0, step=0.2)
        d = np.linspace(0.0, 9.5, 37)  # past dmax: padding uses radius+1
        genuine_exp = gd.expand(d)
        ours_exp = np.asarray(gaussian_basis(d))
        assert genuine_exp.shape == ours_exp.shape == (37, 41)
        np.testing.assert_allclose(ours_exp, genuine_exp, rtol=1e-6,
                                   atol=1e-7)


@pytest.mark.parametrize("seed,n", [(12, 40), (0, 25), (7, 60)])
def test_splitter_matches_genuine_train_valid_test_split(ref, seed, n):
    """The genuine element-balanced splitter runs as-is here (pandas, sklearn
    and tqdm are installed); our numpy re-derivation must match its index
    lists exactly — order included (the reference's downstream consumers are
    order-sensitive list slices)."""
    utils, _, _ = ref
    rng = np.random.default_rng(seed)
    universe = ["H", "C", "N", "O", "Si", "Fe", "Cu", "Zn", "Ga", "As"]
    species_per_sample = [
        sorted(rng.choice(universe, size=rng.integers(1, 5),
                          replace=False).tolist())
        for _ in range(n)
    ]
    df = pd.DataFrame({"species": species_per_sample})
    species = sorted({sp for row in species_per_sample for sp in row})

    g_train, g_valid, g_test = utils.train_valid_test_split(
        df, species, valid_size=0.1, test_size=0.1, seed=seed)
    o_train, o_valid, o_test = element_balanced_split(
        species_per_sample, valid_size=0.1, test_size=0.1, seed=seed)

    assert o_train == list(g_train)
    assert o_valid == list(g_valid)
    assert o_test == list(g_test)


@pytest.mark.parametrize("case", ["sparse_pad", "dense_truncate"])
def test_knn_edges_match_genuine_get_bond_info(case):
    """The GENUINE mat2graph.get_bond_info executes here and our knn_edges
    must reproduce it exactly.

    get_bond_info consumes `list_nbrs` as plain (site, distance, index)
    tuples and uses `crystal` only through len() (mat2graph.py:212-243), so
    it runs genuinely with no pymatgen at all.  This pins the per-site
    distance sort, the <12-neighbor pad (index 0, distance radius+1), the
    >=12 truncation, the Gaussian expansion and the (center, neighbor) edge
    assembly against the real reference code.  The candidate set is computed
    once by our neighbor_list_pbc (itself pinned bit-identical to an
    independent NumPy oracle) and fed to BOTH sides, shuffled per site so
    the genuine sorted() does all the ordering work; only the neighbor
    SEARCH (pymatgen get_all_neighbors, env-blocked) stays unpinned —
    documented in PARITY.md."""
    from tests.refshims import load_reference_file, reference_imports

    from dostransformer_tpu.data.featurize_edos import gaussian_expand
    from dostransformer_tpu.data.neighbors import knn_edges, neighbor_list_pbc

    rng = np.random.default_rng(3 if case == "sparse_pad" else 4)
    radius, max_nbr = 8.0, 12
    if case == "sparse_pad":
        # 20 A box: few neighbors within 8 A -> pad path; atom 0 pushed to a
        # corner so at least one site exercises len(nbr) == 0
        cell = np.diag([20.0, 21.0, 22.0])
        pos = rng.uniform(6.0, 14.0, size=(7, 3))
        pos[0] = [0.5, 0.5, 0.5]
    else:
        # 4 A cell: every site sees >12 periodic images -> truncate path
        cell = np.diag([4.0, 4.2, 4.4]) + rng.normal(0, 0.05, (3, 3))
        pos = rng.uniform(0.0, 4.0, size=(5, 3))
    n = pos.shape[0]

    src, dst, shifts = neighbor_list_pbc(pos, cell, radius,
                                         self_interaction=False)
    vec = pos[dst] + shifts @ cell - pos[src]
    d = np.linalg.norm(vec, axis=1)
    list_nbrs = [[] for _ in range(n)]
    for s, t, dist in zip(src, dst, d):
        list_nbrs[s].append((None, float(dist), int(t)))
    for nbrs in list_nbrs:
        rng.shuffle(nbrs)  # genuine sorted() must restore the order
    if case == "sparse_pad":
        assert any(len(v) == 0 for v in list_nbrs)  # empty-site path covered
        assert all(len(v) < max_nbr for v in list_nbrs)
    else:
        assert all(len(v) > max_nbr for v in list_nbrs)

    crystal = type("LenOnlyCrystal", (), {"__len__": lambda self: n})()
    with reference_imports():
        m2g = load_reference_file("data/mat2graph.py", "ref_mat2graph")
        bonds, bond_feats = m2g.get_bond_info(crystal, list_nbrs, None, None,
                                              41, radius)

    edge_index, dist_ours = knn_edges(pos, cell, radius=radius,
                                      max_num_nbr=max_nbr)
    np.testing.assert_array_equal(edge_index.T, np.asarray(bonds))
    np.testing.assert_allclose(gaussian_expand(dist_ours, dmax=radius),
                               bond_feats.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("crystal_system", [
    "Cubic", "Hexagonal", "Tetragonal", "Trigonal", "Orthorhombic",
    "Monoclinic", "Triclinic", "SomethingElse"])
def test_build_sample_matches_genuine_build_data(ref, crystal_system):
    """The GENUINE utils.build_data executes here (ase shimmed: Atom masses
    from our transcribed IUPAC table, neighbor_list backed by our
    neighbor_list_pbc so both sides consume the identical candidate set —
    honesty notes in tests/refshims.py) and our featurize_phdos.build_sample
    must reproduce every field: mass-diag node features, one-hot types, edge
    index/shift/vec (einsum with the lattice), the 7-way crystal-system
    mapping incl. the else branch, and the phDOS target."""
    utils, _, _ = ref
    from tests.refshims import _AseAtoms

    from dostransformer_tpu.data.featurize_phdos import build_sample

    rng = np.random.default_rng(11)
    numbers = np.array([1, 8, 14, 26, 83])  # H, O, Si, Fe, Bi
    cell = np.diag([4.0, 4.5, 5.0]) + rng.normal(0, 0.1, (3, 3))
    positions = rng.uniform(0.0, 4.0, size=(5, 3))
    phdos = rng.uniform(0.0, 1.0, size=51)

    entry = types.SimpleNamespace(
        structure=_AseAtoms(numbers, positions, cell),
        crystal_system=crystal_system, phdos=phdos, mp_id="mp-test-1")
    g = utils.build_data(entry, r_max=4.0)
    assert g.edge_index.shape[1] > len(numbers)  # self-loops + real edges

    ours = build_sample(numbers, positions, cell, phdos,
                        crystal_system=crystal_system, mp_id="mp-test-1",
                        r_max=4.0)
    np.testing.assert_allclose(ours.x, g.x.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(ours.z, g.z.numpy())
    np.testing.assert_array_equal(ours.edge_index, g.edge_index.numpy())
    np.testing.assert_allclose(ours.edge_shift, g.edge_shift.numpy(),
                               atol=0.0)
    np.testing.assert_allclose(ours.edge_vec, g.edge_vec.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(ours.y, g.phdos.numpy().reshape(-1),
                               rtol=1e-7)
    assert ours.system == int(g.system)
    assert ours.mp_id == g.mp_id


def test_featurize_csv_matches_genuine_load_data_pipeline(ref, tmp_path):
    """The GENUINE CSV pipeline (utils.load_data -> per-row utils.build_data,
    exactly as main_phDOS.py:18-22 drives it) executes here over a synthetic
    data.csv, and featurize_csv must produce the same samples.

    Pins the reference's eval-based column parsing (stringified Atoms dicts
    and phdos lists) against our ast.literal_eval path, the species
    derivation, and the whole CSV->GraphSample composition.  Same ase-shim
    honesty notes as the build_data pin above; df['formula'] is never
    consumed downstream and is not compared."""
    utils, _, _ = ref

    from dostransformer_tpu.data.featurize_phdos import featurize_csv

    rng = np.random.default_rng(23)
    systems = ["Cubic", "Trigonal", "Weird"]
    rows = []
    for i in range(3):
        n = int(rng.integers(3, 7))
        numbers = rng.choice([1, 6, 8, 14, 26, 31], size=n).tolist()
        cell = (np.diag(rng.uniform(3.5, 5.0, 3))
                + rng.normal(0, 0.05, (3, 3))).round(6)
        pos = rng.uniform(0.0, 3.5, size=(n, 3)).round(6)
        struct = {"numbers": numbers, "positions": pos.tolist(),
                  "cell": cell.tolist(), "pbc": (True, True, True)}
        phdos = rng.uniform(0.0, 1.0, 51).round(6).tolist()
        phfreq = np.linspace(0.0, 50.0, 51).tolist()
        rows.append({"mp_id": f"mp-{100 + i}", "structure": repr(struct),
                     "phfreq": repr(phfreq), "phdos": repr(phdos),
                     "pdos": repr([phdos]), "crystal_system": systems[i]})
    csv_path = tmp_path / "data.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)

    df, species_all = utils.load_data(str(csv_path))
    df["data"] = df.apply(lambda x: utils.build_data(x, 4.0), axis=1)

    samples, species_per_sample = featurize_csv(str(csv_path), r_max=4.0)
    assert len(samples) == len(df) == 3
    assert sorted({s for row in species_per_sample for s in row}) \
        == list(species_all)
    for ours, (_, row) in zip(samples, df.iterrows()):
        g = row["data"]
        assert set(species_per_sample[ours.sample_id]) == set(row["species"])
        np.testing.assert_allclose(ours.x, g.x.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(ours.edge_index, g.edge_index.numpy())
        np.testing.assert_allclose(ours.edge_vec, g.edge_vec.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ours.y, g.phdos.numpy().reshape(-1),
                                   rtol=1e-7)
        assert ours.system == int(g.system)
        assert ours.mp_id == g.mp_id


@pytest.mark.parametrize("seed", [3, 11])
def test_split_viz_matches_genuine_element_representation(ref, seed):
    """utils.element_representation (utils.py:243-245) is the one utils
    function with no direct genuine pin (train_valid_test_split covers
    get_element_statistics/split_data transitively): our data.split_viz
    equivalent — and the per-element fraction table built on it — must
    reproduce the genuine fraction exactly, with member lists produced by
    the GENUINE get_element_statistics so the composition matches the
    reference's intended plot=True path end-to-end."""
    utils, _, _ = ref
    rng = np.random.default_rng(seed)
    universe = ["H", "C", "O", "Fe", "Cu"]
    species_per_sample = [
        sorted(rng.choice(universe, size=rng.integers(1, 4),
                          replace=False).tolist())
        for _ in range(30)
    ]
    df = pd.DataFrame({"species": species_per_sample})
    species = sorted({sp for row in species_per_sample for sp in row})
    stats = utils.get_element_statistics(df, species)
    idx_tr, idx_va, idx_te = element_balanced_split(
        species_per_sample, valid_size=0.15, test_size=0.15, seed=seed)

    from dostransformer_tpu.data.split_viz import (
        element_representation,
        split_element_statistics,
    )

    table = split_element_statistics(
        species_per_sample,
        {"train": idx_tr, "valid": idx_va, "test": idx_te})
    assert table["species"] == species
    for row in stats.itertuples():
        col = species.index(row.symbol)
        members = row.data
        assert table["counts"][col] == len(members)
        for name, idx in (("train", idx_tr), ("valid", idx_va),
                          ("test", idx_te)):
            genuine = utils.element_representation(members, idx)
            assert element_representation(members, idx) == genuine
            assert table["fractions"][name][col] == genuine
    # Scope of the pin: the exact-equality above covers NON-EMPTY member
    # lists only. On empty members the genuine function divides by zero
    # (utils.py:245 raises ZeroDivisionError); ours returns 0.0 by design
    # (split_viz.py:41-42) so whole-table plots don't crash on elements
    # absent from the corpus. Document the intentional divergence here so
    # the PARITY.md "pinned exactly" claim stays honestly scoped.
    with pytest.raises(ZeroDivisionError):
        utils.element_representation([], idx_tr)
    assert element_representation([], idx_tr) == 0.0
