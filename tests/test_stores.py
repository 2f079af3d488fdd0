"""L0 ingestion + OOD CLI path tests."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

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


REF_CREATE_PICKLE = "/root/reference/data/create_pickle.py"


@pytest.mark.skipif(not os.path.exists(REF_CREATE_PICKLE),
                    reason="reference repo not mounted")
class TestGenuineCreatePickleParity:
    """Execute the GENUINE reference create_pickle.py (pure stdlib — no shims
    needed) and pin our stores against its pickles byte-for-semantics.

    The genuine script has a cwd-layout quirk: it LISTS ./raw/dos_ft and
    ./raw/mpdata but OPENS ./dosdata/{name} and ./mpdata/{name}
    (create_pickle.py:6-16, 26-36). To execute it we lay out both the listed
    and the opened directories with identical contents; our create_store reads
    from the listed directory directly (the clear intent — documented
    divergence, same outputs whenever the directories agree). This pins the
    key derivations (filename[:-9]; response[0]["material_id"]) and the
    bare-except skip tolerance against the real code, not a reading of it.
    """

    def _layout(self, tmp_path):
        dos_files = {
            "mp-123_dos.json": json.dumps({"efermi": 1.0, "densities": [0.5]}),
            "mp-456_dos.json": json.dumps({"efermi": 2.0}),
            "broken___dos.json": "{not json",
        }
        mp_files = {
            "a.json": json.dumps(
                {"response": [{"material_id": "mp-7", "band_gap": 0.5}]}),
            "b.json": json.dumps({"response": []}),  # IndexError -> skipped
            "c.json": "also not json",
        }
        for listed, opened, files in [("raw/dos_ft", "dosdata", dos_files),
                                      ("raw/mpdata", "mpdata", mp_files)]:
            for d in (listed, opened):
                (tmp_path / d).mkdir(parents=True, exist_ok=True)
                for name, text in files.items():
                    (tmp_path / d / name).write_text(text)
        return dos_files, mp_files

    def test_stores_match_genuine_run(self, tmp_path):
        self._layout(tmp_path)
        r = subprocess.run([sys.executable, REF_CREATE_PICKLE],
                           cwd=tmp_path, capture_output=True, text=True,
                           timeout=120)
        assert r.returncode == 0, r.stderr
        with open(tmp_path / "dos.pkl", "rb") as f:
            ref_dos = pickle.load(f)
        with open(tmp_path / "mp.pkl", "rb") as f:
            ref_mp = pickle.load(f)
        # sanity on the genuine outputs themselves
        assert set(ref_dos) == {"mp-123", "mp-456"}
        assert set(ref_mp) == {"mp-7"}

        create_dos_store(str(tmp_path / "raw/dos_ft"),
                         str(tmp_path / "ours_dos.pkl"))
        create_mp_store(str(tmp_path / "raw/mpdata"),
                        str(tmp_path / "ours_mp.pkl"))
        with open(tmp_path / "ours_dos.pkl", "rb") as f:
            assert pickle.load(f) == ref_dos
        with open(tmp_path / "ours_mp.pkl", "rb") as f:
            assert pickle.load(f) == ref_mp
        # the genuine success/fail accounting prints ("total | success, fail")
        assert "total 3 | success : 2 | fail : 1" in r.stdout


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
