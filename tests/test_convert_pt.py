"""Tests the reference-.pt migration converter WITHOUT torch_geometric:
synthesizes a .pt whose pickle references torch_geometric class paths, then
converts via the stub-unpickle path."""

import sys
import types

import numpy as np
import torch

from dostransformer_tpu.data.convert_reference_pt import convert
from dostransformer_tpu.data.io import load_samples


def _fake_reference_pt(path, n=3, seed=0):
    """Build a .pt like the reference's dos_dataset_random.pt: a list of
    objects pickled under the torch_geometric.data.data.Data path."""
    mod = types.ModuleType("torch_geometric.data.data")

    class Data:  # minimal PyG-like container (attribute dict)
        pass

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    mod.Data = Data
    pkg = types.ModuleType("torch_geometric")
    sub = types.ModuleType("torch_geometric.data")
    sys.modules["torch_geometric"] = pkg
    sys.modules["torch_geometric.data"] = sub
    sys.modules["torch_geometric.data.data"] = mod

    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        d = Data()
        n_atoms = int(rng.randint(3, 7))
        d.x = torch.tensor(rng.randn(n_atoms + 1, 200), dtype=torch.float)
        d.edge_index = torch.tensor(
            np.stack([np.repeat(np.arange(n_atoms), 12),
                      rng.randint(0, n_atoms, n_atoms * 12)]),
            dtype=torch.long)
        d.edge_attr = torch.tensor(rng.rand(n_atoms * 12, 41), dtype=torch.float)
        y = torch.tensor(np.abs(rng.randn(201)), dtype=torch.float)
        d.y = y / y.max()
        d.y_ft = y / y.max()
        d.y_max = torch.tensor(float(y.max()))
        d.glob = torch.tensor(rng.randn(2), dtype=torch.float)
        d.band_gap = torch.tensor(0.5)
        d.efermi = torch.tensor(1.5)
        d.system = torch.tensor(i % 7)
        d.mp_id = f"mp-{i}"
        # reference Data carries coords/z too (mat2graph.py:143), one row
        # fewer than x (no prompt-node entry)
        d.coords = torch.tensor(rng.randn(n_atoms, 3), dtype=torch.float)
        d.z = torch.eye(100)[torch.tensor(rng.randint(0, 100, n_atoms))]
        items.append(d)
    torch.save(items, path)
    for m in ("torch_geometric", "torch_geometric.data",
              "torch_geometric.data.data"):
        del sys.modules[m]


class TestConvert:
    def test_roundtrip_without_pyg(self, tmp_path):
        pt = tmp_path / "dos_dataset_random.pt"
        npz = tmp_path / "out.npz"
        _fake_reference_pt(str(pt))
        assert "torch_geometric" not in sys.modules
        samples = convert(str(pt), str(npz))
        assert len(samples) == 3
        s = samples[0]
        assert s.x.shape[1] == 200 and s.edge_attr.shape[1] == 41
        assert s.y.shape == (201,) and s.glob.shape == (2,)
        assert s.mp_id == "mp-0" and s.band_gap == 0.5
        # coords/z are carried (field-complete migration, VERDICT r2 #8):
        # one row fewer than x (the prompt node has no coords/type)
        assert s.coords.shape == (s.x.shape[0] - 1, 3)
        assert s.z.shape == (s.x.shape[0] - 1, 100)
        loaded = load_samples(str(npz))
        np.testing.assert_array_equal(loaded[1].x, samples[1].x)
        np.testing.assert_array_equal(loaded[2].coords, samples[2].coords)
        np.testing.assert_array_equal(loaded[2].z, samples[2].z)
        # stubs must not leak into sys.modules
        assert "torch_geometric" not in sys.modules


def _fake_pyg2_pt(path, n=2, seed=1):
    """Mimic PyG >= 2.0's ACTUAL pickle layout (residual-risk check,
    BASELINE.md): Data holds a `_store` GlobalStorage
    (torch_geometric.data.storage path) whose state dict nests the fields
    under `_mapping` with a `_parent` back-reference — the layout
    BaseStorage.__getstate__ emits. A real PyG pickle cannot be produced
    in-env (PyG not installable), so this reconstruction is the closest
    testable stand-in."""
    data_mod = types.ModuleType("torch_geometric.data.data")
    storage_mod = types.ModuleType("torch_geometric.data.storage")

    class Data:
        pass

    class GlobalStorage:
        pass

    Data.__module__ = "torch_geometric.data.data"
    Data.__qualname__ = "Data"
    GlobalStorage.__module__ = "torch_geometric.data.storage"
    GlobalStorage.__qualname__ = "GlobalStorage"
    data_mod.Data = Data
    storage_mod.GlobalStorage = GlobalStorage
    sys.modules["torch_geometric"] = types.ModuleType("torch_geometric")
    sys.modules["torch_geometric.data"] = types.ModuleType("torch_geometric.data")
    sys.modules["torch_geometric.data.data"] = data_mod
    sys.modules["torch_geometric.data.storage"] = storage_mod

    rng = np.random.RandomState(seed)
    items = []
    for i in range(n):
        n_atoms = int(rng.randint(3, 7))
        y = torch.tensor(np.abs(rng.randn(201)), dtype=torch.float)
        mapping = {
            "x": torch.tensor(rng.randn(n_atoms + 1, 200), dtype=torch.float),
            "edge_index": torch.tensor(
                np.stack([np.repeat(np.arange(n_atoms), 12),
                          rng.randint(0, n_atoms, n_atoms * 12)]),
                dtype=torch.long),
            "edge_attr": torch.tensor(rng.rand(n_atoms * 12, 41),
                                      dtype=torch.float),
            "y": y / y.max(),
            "y_ft": y / y.max(),
            "y_max": torch.tensor(float(y.max())),
            "glob": torch.tensor(rng.randn(2), dtype=torch.float),
            "system": torch.tensor(i % 7),
            "mp_id": f"mp-{100 + i}",
        }
        d = Data()
        st = GlobalStorage()
        st.__dict__.update({"_mapping": mapping, "_parent": d})
        d.__dict__.update({"_store": st})
        items.append(d)
    torch.save(items, path)
    for m in ("torch_geometric", "torch_geometric.data",
              "torch_geometric.data.data", "torch_geometric.data.storage"):
        del sys.modules[m]


class TestConvertPyG2Layout:
    def test_nested_storage_layout(self, tmp_path):
        pt = tmp_path / "pyg2.pt"
        npz = tmp_path / "out.npz"
        _fake_pyg2_pt(str(pt))
        assert "torch_geometric" not in sys.modules
        samples = convert(str(pt), str(npz))
        assert len(samples) == 2
        s = samples[0]
        assert s.x.shape[1] == 200 and s.edge_attr.shape[1] == 41
        assert s.mp_id == "mp-100"
        loaded = load_samples(str(npz))
        np.testing.assert_array_equal(loaded[0].x, samples[0].x)
