"""End-to-end real-data path: phononDoS-style data.csv -> featurize -> CLI
train (exercises ast parsing, the periodic neighbor list, element-balanced
split generation, and idx_*.txt reuse)."""

import os

import numpy as np
import pandas as pd
import pytest

from dostransformer_tpu.data.featurize_phdos import featurize_csv


def _make_csv(path, n=12, seed=0):
    """Synthesize a data.csv with ASE Atoms-dict structure strings."""
    rng = np.random.RandomState(seed)
    systems = ["Cubic", "Hexagonal", "Tetragonal", "Trigonal",
               "Orthorhombic", "Monoclinic", "Triclinic"]
    rows = []
    for i in range(n):
        n_atoms = int(rng.randint(2, 6))
        cell = (np.eye(3) * rng.uniform(3.0, 5.0)).tolist()
        pos = (rng.rand(n_atoms, 3) * 3.0).tolist()
        numbers = rng.randint(1, 80, size=n_atoms).tolist()
        struct = {"numbers": numbers, "positions": pos, "cell": cell,
                  "pbc": [True, True, True]}
        phdos = np.abs(rng.randn(51)).tolist()
        rows.append({
            "mp_id": f"mp-{1000 + i}",
            "structure": repr(struct),
            "phfreq": repr(list(np.linspace(0, 1, 51))),
            "phdos": repr(phdos),
            "pdos": repr([phdos]),
            "crystal_system": systems[i % 7],
        })
    pd.DataFrame(rows).to_csv(path, index=False)


class TestFeaturizeCSV:
    def test_featurize(self, tmp_path):
        csv = tmp_path / "data.csv"
        _make_csv(str(csv))
        samples, species = featurize_csv(str(csv), r_max=4.0)
        assert len(samples) == 12 and len(species) == 12
        s = samples[0]
        assert s.x.shape[1] == 118
        assert s.edge_vec is not None and s.edge_vec.shape[1] == 3
        # self-loops present
        assert ((s.edge_index[0] == s.edge_index[1])
                & (np.linalg.norm(s.edge_vec, axis=1) < 1e-9)).sum() == s.n_nodes
        assert s.y.shape == (51,)
        assert samples[1].system == 1  # Hexagonal
        assert all(isinstance(sp, str) for sp in species[0])

    def test_cli_trains_from_csv(self, tmp_path):
        from dostransformer_tpu.cli import main_phdos

        d = tmp_path / "processed"
        d.mkdir()
        _make_csv(str(d / "data.csv"), n=12)
        result = main_phdos.main([
            "--data_dir", str(d), "--epochs", "1", "--eval", "1",
            "--hidden", "16", "--layers", "1", "--transformer", "1",
            "--batch_size", "4", "--results_dir", str(tmp_path)])
        assert np.isfinite(result["test"]["rmse"])
        # the element-balanced splitter wrote the idx files for reuse
        for split in ("train", "valid", "test"):
            assert os.path.exists(d / f"idx_{split}.txt")

    def test_cli_reuses_idx_files(self, tmp_path):
        from dostransformer_tpu.cli import main_phdos
        from dostransformer_tpu.data.datasets import read_index_file

        d = tmp_path / "processed"
        d.mkdir()
        _make_csv(str(d / "data.csv"), n=12)
        # pin explicit splits (the reference reads them, main_phDOS.py:47-49)
        (d / "idx_train.txt").write_text("\n".join(map(str, range(8))))
        (d / "idx_valid.txt").write_text("8\n9")
        (d / "idx_test.txt").write_text("10\n11")
        result = main_phdos.main([
            "--data_dir", str(d), "--epochs", "1", "--eval", "1",
            "--hidden", "16", "--layers", "1", "--transformer", "1",
            "--batch_size", "4", "--results_dir", str(tmp_path)])
        assert np.isfinite(result["test"]["rmse"])
        assert read_index_file(str(d / "idx_valid.txt")) == [8, 9]
