"""Data-layer tests: periodic neighbor search, featurizers, io, loader, splits
(SURVEY.md §4 unit strategy)."""

import os
import tempfile

import numpy as np
import pytest

from dostransformer_tpu.data.datasets import (
    GraphLoader,
    edos_random_split,
    element_balanced_split,
)
from dostransformer_tpu.data.elements import (
    ATOMIC_MASSES,
    SYMBOL_TO_Z,
    atomic_mass_features,
)
from dostransformer_tpu.data.featurize_edos import (
    build_sample as build_edos,
    gaussian_expand,
    standardize_columns,
)
from dostransformer_tpu.data.featurize_phdos import build_sample as build_phdos
from dostransformer_tpu.data.graph import collate
from dostransformer_tpu.data.io import load_samples, save_samples
from dostransformer_tpu.data.neighbors import (
    get_all_neighbors,
    knn_edges,
    neighbor_list_pbc,
)
from dostransformer_tpu.data.synthetic import (
    synthetic_edos_samples,
    synthetic_phdos_samples,
)


class TestNeighborList:
    def test_simple_cubic_counts(self):
        # one atom in a cubic cell a=2: neighbors within r<2.1 are the 6 face
        # images (d=2) + the self pair at d=0
        cell = np.eye(3) * 2.0
        pos = np.zeros((1, 3))
        src, dst, shift = neighbor_list_pbc(pos, cell, 2.1)
        assert len(src) == 7
        d = np.linalg.norm(pos[dst] + shift @ cell - pos[src], axis=1)
        assert (np.sort(d) == pytest.approx([0, 2, 2, 2, 2, 2, 2])) is not False

    def test_self_interaction_flag(self):
        cell = np.eye(3) * 2.0
        pos = np.zeros((1, 3))
        src, dst, shift = neighbor_list_pbc(pos, cell, 2.1,
                                            self_interaction=False)
        assert len(src) == 6  # self pair at S=0 dropped, images kept

    def test_brute_force_differential(self):
        rng = np.random.RandomState(0)
        cell = np.eye(3) * 4.0 + rng.randn(3, 3) * 0.3
        frac = rng.rand(5, 3)
        pos = frac @ cell
        cutoff = 3.0
        src, dst, shift = neighbor_list_pbc(pos, cell, cutoff)
        got = {(int(i), int(j), tuple(map(int, s)))
               for i, j, s in zip(src, dst, shift)}
        # brute force over a generous shift range
        want = set()
        for i in range(5):
            for j in range(5):
                for sx in range(-3, 4):
                    for sy in range(-3, 4):
                        for sz in range(-3, 4):
                            v = pos[j] + np.array([sx, sy, sz]) @ cell - pos[i]
                            if np.linalg.norm(v) < cutoff:
                                want.add((i, j, (sx, sy, sz)))
        assert got == want

    def test_knn_padding_semantics(self):
        # isolated atoms in a huge cell: fewer than 12 neighbors -> pad with
        # index 0 and distance radius+1 (mat2graph.py:216-232)
        cell = np.eye(3) * 100.0
        pos = np.array([[0.0, 0, 0], [1.5, 0, 0], [0, 2.0, 0]])
        edge_index, dist = knn_edges(pos, cell, radius=8.0, max_num_nbr=12)
        assert edge_index.shape == (2, 36)
        d0 = dist[:12]  # atom 0's slots
        assert d0[0] == pytest.approx(1.5)    # nearest first (sorted)
        assert d0[1] == pytest.approx(2.0)
        assert np.all(d0[2:] == 9.0)          # radius + 1 padding
        assert np.all(edge_index[1, 2:12] == 0)  # pad neighbor index 0

    def test_get_all_neighbors_excludes_self(self):
        cell = np.eye(3) * 100.0
        pos = np.array([[0.0, 0, 0], [1.0, 0, 0]])
        nbrs = get_all_neighbors(pos, cell, 8.0)
        assert [sorted(n) for n in nbrs] == [[(1.0, 1)], [(1.0, 0)]]


class TestFeaturizers:
    def test_gaussian_expand_dims(self):
        out = gaussian_expand(np.array([0.0, 9.0]))
        assert out.shape == (2, 41)

    def test_standardize_columns_sklearn_semantics(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10, 4) * 3 + 1
        z = standardize_columns(x)
        np.testing.assert_allclose(z.mean(0), 0, atol=1e-12)
        np.testing.assert_allclose(z.std(0), 1, atol=1e-12)  # ddof=0

    def test_edos_sample_structure(self):
        rng = np.random.RandomState(1)
        elem_feats = rng.randn(100, 200)
        numbers = np.array([1, 8, 8])
        coords = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
        s = build_edos(elem_feats, numbers, coords, np.eye(3) * 50.0,
                       y=np.abs(rng.randn(201)), y_ft=np.abs(rng.randn(201)),
                       glob=[0.1, -0.2], crystal_system="cubic")
        assert s.x.shape == (4, 200)                # 3 atoms + prompt node
        np.testing.assert_array_equal(s.x[3], 0.0)  # zero prompt row
        assert s.edge_index.shape == (2, 36)
        assert s.edge_attr.shape == (36, 41)
        assert s.system == 0
        assert s.y.max() == pytest.approx(1.0)      # normalized target

    def test_phdos_sample_edge_vec(self):
        numbers = np.array([14, 14])
        cell = np.eye(3) * 3.0
        pos = np.array([[0.0, 0, 0], [1.5, 0, 0]])
        s = build_phdos(numbers, pos, cell, phdos=np.ones(51),
                        crystal_system="Hexagonal")
        assert s.system == 1
        assert s.x.shape == (2, 118)
        # mass one-hot: row Z-1 holds the atomic mass
        assert s.x[0, 13] == pytest.approx(ATOMIC_MASSES[13], rel=1e-6)
        # check edge vectors against the definition (utils.py:271-273)
        vec = (pos[s.edge_index[1]] + s.edge_shift.astype(np.float64) @ cell
               - pos[s.edge_index[0]])
        np.testing.assert_allclose(s.edge_vec, vec, atol=1e-5)
        # self-loops present (self_interaction=True)
        self_loops = (s.edge_index[0] == s.edge_index[1]) & (
            np.linalg.norm(s.edge_vec, axis=1) < 1e-9)
        assert self_loops.sum() == 2

    def test_symbol_table(self):
        assert SYMBOL_TO_Z["H"] == 1 and SYMBOL_TO_Z["Og"] == 118
        f = atomic_mass_features(np.array([1]))
        assert f[0, 0] == pytest.approx(1.008)
        assert f[0, 1:].sum() == 0


class TestIO:
    @pytest.mark.parametrize("kind", ["edos", "phdos"])
    def test_roundtrip(self, kind):
        gen = synthetic_edos_samples if kind == "edos" else synthetic_phdos_samples
        samples = gen(3, seed=5)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "x.npz")
            save_samples(path, samples)
            loaded = load_samples(path)
        assert len(loaded) == 3
        for a, b in zip(samples, loaded):
            np.testing.assert_array_equal(a.x, b.x)
            np.testing.assert_array_equal(a.edge_index, b.edge_index)
            np.testing.assert_array_equal(a.y, b.y)
            assert a.system == b.system and a.mp_id == b.mp_id
            if a.edge_vec is not None:
                np.testing.assert_array_equal(a.edge_vec, b.edge_vec)
            if a.glob is not None:
                np.testing.assert_array_equal(a.glob, b.glob)


class TestSplitsAndLoader:
    def test_random_split_proportions_and_disjoint(self):
        samples = synthetic_edos_samples(50, seed=0)
        tr, va, te = edos_random_split(samples, random_state=0)
        assert len(tr) == 40 and len(va) == 5 and len(te) == 5
        ids = [s.sample_id for s in tr + va + te]
        assert sorted(ids) == list(range(50))

    def test_random_split_matches_sklearn_exactly(self):
        from sklearn.model_selection import train_test_split as skl

        items = list(range(30))
        a, b = skl(items, test_size=0.2, random_state=7)
        from dostransformer_tpu.data.datasets import train_test_split

        a2, b2 = train_test_split(items, test_size=0.2, random_state=7)
        assert a == a2 and b == b2

    def test_element_balanced_split_partition(self):
        rng = np.random.RandomState(3)
        elements = ["H", "O", "Si", "Fe", "Al"]
        species = [sorted(rng.choice(elements,
                                     size=rng.randint(1, 4), replace=False))
                   for _ in range(40)]
        tr, va, te = element_balanced_split(species, 0.1, 0.1, seed=12)
        assert sorted(tr + va + te) == list(range(40))
        assert len(set(tr) & set(va)) == 0
        assert len(set(va) & set(te)) == 0

    def test_loader_short_final_batch(self):
        samples = synthetic_edos_samples(10, seed=2)
        loader = GraphLoader(samples, batch_size=4)
        batches = list(loader)
        assert len(batches) == 3
        assert [float(b.graph_mask.sum()) for b in batches] == [4, 4, 2]
        # fixed shapes across batches
        shapes = {b.nodes.shape for b in batches}
        assert len(shapes) == 1

    def test_loader_shuffle_determinism(self):
        samples = synthetic_edos_samples(16, seed=2)
        l1 = GraphLoader(samples, batch_size=4, shuffle=True, seed=9)
        l2 = GraphLoader(samples, batch_size=4, shuffle=True, seed=9)
        ids1 = [b.sample_id.tolist() for b in l1]
        ids2 = [b.sample_id.tolist() for b in l2]
        assert ids1 == ids2

    def test_collate_rejects_undersized_pins(self):
        samples = synthetic_edos_samples(2, seed=0)
        with pytest.raises(ValueError, match="shape envelope"):
            collate(samples, atoms_per_graph=1)


class TestSplitVisualization:
    """element_representation + split statistics (utils.py:176,243-245)."""

    def _species(self, n=40, seed=3):
        rng = np.random.RandomState(seed)
        elements = ["H", "O", "Si", "Fe", "Al", "Na", "Cl"]
        return [sorted(rng.choice(elements, size=rng.randint(1, 4),
                                  replace=False)) for _ in range(n)]

    def test_element_representation_matches_reference_expression(self):
        from dostransformer_tpu.data.split_viz import element_representation

        rng = np.random.RandomState(0)
        x = list(rng.choice(100, size=17, replace=False))
        idx = list(rng.choice(100, size=40, replace=False))
        # utils.py:245 verbatim
        want = len([k for k in x if k in idx]) / len(x)
        assert element_representation(x, idx) == want
        assert element_representation([], idx) == 0.0

    def test_statistics_fractions_partition_to_one(self):
        from dostransformer_tpu.data.split_viz import split_element_statistics

        species = self._species()
        tr, va, te = element_balanced_split(species, 0.1, 0.1, seed=12)
        stats = split_element_statistics(
            species, {"train": tr, "valid": va, "test": te})
        total = sum(stats["fractions"][k] for k in ("train", "valid", "test"))
        np.testing.assert_allclose(total, 1.0)  # splits partition all samples
        # counts: every element of every sample is tallied exactly once
        assert int(stats["counts"].sum()) == sum(
            len(set(row)) for row in species)
        assert stats["species"] == sorted({s for r in species for s in r})

    def test_plot_writes_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from dostransformer_tpu.data.split_viz import (
            plot_split_statistics, split_element_statistics)

        species = self._species()
        tr, va, te = element_balanced_split(species, 0.1, 0.1, seed=12)
        stats = split_element_statistics(
            species, {"train": tr, "valid": va, "test": te})
        out = plot_split_statistics(stats, str(tmp_path / "splits.png"),
                                    per_row=4)  # exercise row wrapping
        assert os.path.getsize(out) > 1000


class TestMatscholarTable:
    """The bundled element-embedding table (public matscholar data; the
    reference ships the identical table as data/matscholar-embedding.json,
    loaded at mat2graph.py:33-47)."""

    # raw values transcribed BY HAND from the public matscholar JSON —
    # independent of the loader/converter code paths
    RAW_GOLDENS = {
        ("H", 1, 0): 0.016640299931168556,
        ("O", 8, 3): 0.005574800539761782,
        ("Si", 14, 100): 0.1019131988286972,
        ("Fe", 26, 199): -0.0329613983631134,
        ("Fm", 100, 50): 0.09603229910135269,
    }

    def test_bundled_raw_table_matches_source_literals(self):
        from dostransformer_tpu.data.featurize_edos import load_matscholar_table

        raw = load_matscholar_table()
        assert raw.shape == (100, 200)
        for (_, z, col), want in self.RAW_GOLDENS.items():
            np.testing.assert_allclose(raw[z - 1, col], want, rtol=0)

    def test_load_elem_feats_standardization(self):
        from dostransformer_tpu.data.featurize_edos import (
            load_elem_feats,
            load_matscholar_table,
        )

        feats = load_elem_feats()
        assert feats.shape == (100, 200)
        # sklearn.preprocessing.scale semantics (mat2graph.py:47): per-column
        # zero mean, unit population std
        np.testing.assert_allclose(feats.mean(0), 0.0, atol=1e-12)
        np.testing.assert_allclose(feats.std(0), 1.0, atol=1e-12)
        # spot-check the formula against a hand-transcribed raw literal
        raw = load_matscholar_table()
        col = 100
        want = ((self.RAW_GOLDENS[("Si", 14, 100)] - raw[:, col].mean())
                / raw[:, col].std())
        np.testing.assert_allclose(feats[13, col], want, rtol=1e-12)

    def test_build_sample_zero_config(self):
        """eDOS featurization end-to-end with zero user-supplied files: node
        features are the standardized table rows plus the all-zero prompt
        node (mat2graph.py:155-158)."""
        from dostransformer_tpu.data.featurize_edos import (
            build_sample,
            load_elem_feats,
        )

        feats = load_elem_feats()
        numbers = [14, 8, 8]  # SiO2-ish fixture
        coords = np.array([[0.0, 0, 0], [1.2, 1.2, 0], [2.4, 0, 1.2]])
        lattice = np.eye(3) * 4.8
        s = build_sample(feats, numbers, coords, lattice,
                         y=np.linspace(0.1, 1.0, 201),
                         y_ft=np.linspace(0.2, 2.0, 201),
                         glob=[-1.0, -2.0], crystal_system="cubic")
        assert s.x.shape == (4, 200)  # 3 atoms + prompt node
        for i, z in enumerate(numbers):
            np.testing.assert_allclose(s.x[i], feats[z - 1].astype(np.float32))
        np.testing.assert_array_equal(s.x[3], 0.0)
        assert s.edge_index.shape == (2, 36)  # 12-NN per atom, prompt node none
        assert s.system == 0  # 'cubic' id (config.crystal_system_id)
        # coords/z carried for data fidelity (mat2graph.py:143): one row per
        # ATOM (no prompt-node entry), z = one-hot(100) of Z-1
        np.testing.assert_allclose(s.coords, coords.astype(np.float32))
        assert s.z.shape == (3, 100)
        np.testing.assert_array_equal(np.argmax(s.z, axis=1),
                                      np.asarray(numbers) - 1)
        np.testing.assert_array_equal(s.z.sum(axis=1), 1.0)


class TestNativeCollateDifferential:
    """The C++ packers (nodes/edges/indices/geometry) must produce leaves
    bit-identical to the NumPy fallback path for both tasks."""

    @pytest.mark.parametrize("task", ["edos", "phdos"])
    def test_native_matches_numpy(self, task, monkeypatch):
        from dostransformer_tpu import native
        from dostransformer_tpu.data.graph import collate

        if not native.available():
            pytest.skip("native library unavailable")
        gen = (synthetic_edos_samples if task == "edos"
               else synthetic_phdos_samples)
        samples = gen(5, seed=31, min_atoms=3, max_atoms=11)
        monkeypatch.setenv("DOSTPU_NATIVE_COLLATE", "1")
        b_native = collate(samples)
        monkeypatch.delenv("DOSTPU_NATIVE_COLLATE")
        b_numpy = collate(samples)
        for name in ("nodes", "senders", "receivers", "node_mask",
                     "edge_mask", "y", "system", "graph_mask", "sample_id",
                     "edges", "edge_vec", "edge_shift", "glob", "node_z"):
            x, ref = getattr(b_native, name), getattr(b_numpy, name)
            assert (x is None) == (ref is None), name
            if x is not None:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(ref),
                                              err_msg=name)


class TestElementBalancedSplitDifferential:
    """Order-exact differential test of element_balanced_split against a
    transcription of the reference algorithm (utils.py:176-245), including
    pandas sort_values' unstable-quicksort tie order and the assigned-set
    dedup semantics."""

    @staticmethod
    def _ref_stats(df, species):
        import pandas as pd

        species_dict = {k: [] for k in species}
        for entry in df.itertuples():
            for specie in entry.species:
                species_dict[specie].append(entry.Index)
        stats = pd.DataFrame({"symbol": species})
        stats["data"] = stats["symbol"].astype("object")
        for specie in species:
            stats.at[stats.index[stats["symbol"] == specie].values[0],
                     "data"] = species_dict[specie]
        stats["count"] = stats["data"].apply(len)
        return stats

    @classmethod
    def _ref_split_data(cls, df, test_size, seed):
        from sklearn.model_selection import train_test_split

        idx_train, idx_test = [], []
        df = df[df["data"].str.len() > 0]
        df = df.sort_values("count")
        for _, entry in df.iterrows():
            df_specie = entry.to_frame().T.explode("data")
            try:
                tr_s, te_s = train_test_split(
                    df_specie["data"].values, test_size=test_size,
                    random_state=seed)
            except Exception:
                pass
            else:
                idx_train += [k for k in tr_s
                              if k not in idx_train + idx_test]
                idx_test += [k for k in te_s
                             if k not in idx_train + idx_test]
        return idx_train, idx_test

    @classmethod
    def _ref_split(cls, df, species, valid_size, test_size, seed=12):
        dev_size = valid_size + test_size
        stats = cls._ref_stats(df, species)
        idx_train, idx_dev = cls._ref_split_data(stats, dev_size, seed)
        stats_dev = cls._ref_stats(df.iloc[idx_dev], species)
        idx_valid, idx_test = cls._ref_split_data(
            stats_dev, test_size / dev_size, seed)
        idx_train += df[~df.index.isin(
            idx_train + idx_valid + idx_test)].index.tolist()
        return idx_train, idx_valid, idx_test

    @pytest.mark.parametrize("fixture_seed,n", [(3, 50), (7, 64), (11, 41)])
    def test_exact_index_lists(self, fixture_seed, n):
        import pandas as pd

        rng = np.random.RandomState(fixture_seed)
        elements = ["H", "O", "Si", "Fe", "Al", "Ga", "N", "C"]
        rows = [sorted(rng.choice(elements, size=rng.randint(1, 4),
                                  replace=False).tolist())
                for _ in range(n)]
        df = pd.DataFrame({"species": rows})
        species = sorted({s for row in rows for s in row})
        want = self._ref_split(df, species, 0.1, 0.1, seed=12)
        got = element_balanced_split(rows, 0.1, 0.1, seed=12)
        for w, g in zip(want, got):
            assert list(w) == list(g)


class TestFeaturizerPool:
    """Serial == parallel for the featurizer process pools (data/pool.py).

    Records carry pre-parsed structure dicts (the pymatgen-free path of
    structure_from_cif), so the whole load_dataset pipeline runs in-env."""

    @staticmethod
    def _make_edos_records(n=10, seed=0):
        rng = np.random.RandomState(seed)
        systems = ["cubic", "hexagonal", "tetragonal", "trigonal",
                   "orthorhombic", "monoclinic", "triclinic"]
        mp_data, dos_data = {}, {}
        for i in range(n):
            n_atoms = int(rng.randint(2, 6))
            struct = {"numbers": rng.randint(1, 80, size=n_atoms).tolist(),
                      "cart_coords": (rng.rand(n_atoms, 3) * 3.0).tolist(),
                      "lattice": (np.eye(3) * rng.uniform(3.0, 5.0)).tolist()}
            mp_id = f"mp-{i}"
            mp_data[mp_id] = {
                "cif": struct,
                "energy_per_atom": float(rng.randn()),
                "formation_energy_per_atom": float(rng.randn()),
                "spacegroup": {"crystal_system": systems[i % 7]},
                "band_gap": float(abs(rng.randn())),
            }
            dos_data[mp_id] = {
                "densities_total_1": np.abs(rng.randn(201)) + 1e-3,
                "densities_total_1_ft": np.abs(rng.randn(201)) + 1e-3,
                "efermi": float(rng.randn()),
            }
        return mp_data, dos_data

    def _assert_samples_equal(self, a, b):
        import dataclasses

        assert len(a) == len(b)
        for sa, sb in zip(a, b):
            for f in dataclasses.fields(sa):
                va, vb = getattr(sa, f.name), getattr(sb, f.name)
                if isinstance(va, np.ndarray):
                    np.testing.assert_array_equal(va, vb, err_msg=f.name)
                else:
                    assert va == vb, f.name

    def test_edos_pool_matches_serial(self, capsys):
        from dostransformer_tpu.data.featurize_edos import load_dataset

        mp_data, dos_data = self._make_edos_records(n=10)
        # a record outside the keep set (sample_id enumeration skips it but
        # keeps the full-dict positions, mat2graph.py:69-117) and a broken
        # record (counted as an error, not raised)
        keep = [k for k in mp_data if k != "mp-3"]
        del dos_data["mp-5"]["densities_total_1"]
        serial = load_dataset(mp_data, dos_data, keep, workers=0)
        parallel = load_dataset(mp_data, dos_data, keep, workers=2)
        out = capsys.readouterr().out
        assert out.count("Converted 8 | errors 1") == 2
        assert [s.sample_id for s in serial] == [
            i for i in range(10) if i not in (3, 5)]
        self._assert_samples_equal(serial, parallel)

    def test_phdos_pool_matches_serial(self, tmp_path):
        from dostransformer_tpu.data.featurize_phdos import featurize_csv
        from tests.test_featurize_csv import _make_csv

        csv = tmp_path / "data.csv"
        _make_csv(str(csv), n=10)
        s_samples, s_species = featurize_csv(str(csv), r_max=4.0, workers=0)
        p_samples, p_species = featurize_csv(str(csv), r_max=4.0, workers=2)
        assert s_species == p_species
        self._assert_samples_equal(s_samples, p_samples)


class TestUnwrappedCoordinates:
    def test_out_of_cell_positions_find_the_same_edges(self):
        """The periodic-image bound assumes in-cell positions; ASE/pymatgen
        accept unwrapped coordinates. An atom displaced by whole lattice
        vectors must yield the SAME edge set, with shifts re-expressed so
        |pos[dst] - pos[src] + shift @ cell| is unchanged."""
        rng = np.random.RandomState(0)
        cell = np.diag([4.0, 5.0, 6.0]) + rng.rand(3, 3) * 0.3
        pos = rng.rand(6, 3) @ cell  # in-cell
        cutoff = 4.0

        src0, dst0, sh0 = neighbor_list_pbc(pos, cell, cutoff)
        moved = pos.copy()
        moved[2] += np.array([2, -3, 1]) @ cell  # whole-lattice displacement
        src1, dst1, sh1 = neighbor_list_pbc(moved, cell, cutoff)

        def canon(pp, s, d, sh):
            vec = pp[d] + sh @ cell - pp[s]
            dist = np.linalg.norm(vec, axis=1)
            order = np.lexsort((dist, d, s))
            return s[order], d[order], np.round(dist[order], 9)

        a = canon(pos, src0, dst0, sh0)
        b = canon(moved, src1, dst1, sh1)
        assert len(a[0]) == len(b[0]) > 0
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_allclose(a[2], b[2], atol=1e-8)

    def test_in_cell_inputs_skip_the_wrap(self):
        """Already-wrapped positions take the bit-identical fast path (no
        wrap adjustment applied)."""
        rng = np.random.RandomState(1)
        cell = np.diag([4.0, 4.0, 4.0])
        frac = rng.rand(5, 3) * 0.98 + 0.01
        pos = frac @ cell
        src, dst, sh = neighbor_list_pbc(pos, cell, 3.0)
        assert len(src) > 0  # sanity; fast path exercised


class TestNativePackBounds:
    def test_oversized_row_count_raises_not_corrupts(self):
        """The C++ packers bounds-check BEFORE writing and return a status;
        the wrapper raises ValueError (asserts would strip under python -O
        and the memcpy would run past the output buffer)."""
        from dostransformer_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        arrays = [np.ones((3, 4), np.float32), np.ones((9, 4), np.float32)]
        with pytest.raises(ValueError, match="exceeds the pinned"):
            native.pack_f32(arrays, r=4, c=4)
        with pytest.raises(ValueError, match="exceeds the pinned"):
            native.pack_edges([np.zeros((2, 9), np.int64)], r=4)
