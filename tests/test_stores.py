"""L0 ingestion + OOD CLI path tests."""

import json
import pickle

import numpy as np

from dostransformer_tpu.data.create_store import create_dos_store, create_mp_store
from dostransformer_tpu.data.io import save_samples
from dostransformer_tpu.data.synthetic import synthetic_edos_samples


class TestCreateStore:
    def test_dos_store(self, tmp_path):
        raw = tmp_path / "dos_ft"
        raw.mkdir()
        (raw / "mp-123_dos.json").write_text(json.dumps({"efermi": 1.0}))
        (raw / "mp-456_dos.json").write_text(json.dumps({"efermi": 2.0}))
        (raw / "broken__dos.json").write_text("{not json")
        out = tmp_path / "dos.pkl"
        total, ok = create_dos_store(str(raw), str(out))
        assert (total, ok) == (3, 2)
        with open(out, "rb") as f:
            store = pickle.load(f)
        # key = filename minus the 9-char suffix (create_pickle.py:15)
        assert store["mp-123"] == {"efermi": 1.0}

    def test_mp_store(self, tmp_path):
        raw = tmp_path / "mpdata"
        raw.mkdir()
        (raw / "a.json").write_text(json.dumps(
            {"response": [{"material_id": "mp-7", "band_gap": 0.5}]}))
        (raw / "b.json").write_text(json.dumps({"response": []}))
        out = tmp_path / "mp.pkl"
        total, ok = create_mp_store(str(raw), str(out))
        assert (total, ok) == (2, 1)
        with open(out, "rb") as f:
            store = pickle.load(f)
        assert store["mp-7"]["band_gap"] == 0.5


class TestOODCLIPath:
    def test_ood_split_from_npz(self, tmp_path):
        from dostransformer_tpu.cli import main_edos

        train = synthetic_edos_samples(12, seed=0)
        test = synthetic_edos_samples(8, seed=1)
        d = tmp_path / "processed"
        d.mkdir()
        save_samples(str(d / "train_ood_crystal.npz"), train)
        save_samples(str(d / "test_ood_crystal.npz"), test)
        result = main_edos.main([
            "--dataset", "ood_crystal", "--data_dir", str(d),
            "--epochs", "1", "--eval", "1", "--hidden", "32",
            "--layers", "2", "--transformer", "1", "--batch_size", "4",
            "--results_dir", str(tmp_path)])
        assert result["test"] is not None
        assert np.isfinite(result["test"]["rmse"])
