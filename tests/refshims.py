"""Faithful torch shims for the reference's uninstallable dependencies, plus
a context manager that imports GENUINE /root/reference modules against them.

Used by tests/test_reference_model_parity.py (model forwards) and
tests/test_reference_utils_parity.py (eval loops + splitter).  Each shim is a
tiny, exactly-specified op; see the test-file docstrings for the honesty
accounting of what remains builder-authored.
"""

from __future__ import annotations

import contextlib
import importlib
import math
import sys
import types

import torch

REF_ROOT = "/root/reference"


def scatter_sum(src, index, dim=0, dim_size=None):
    """torch_scatter.scatter_sum via index_add (deterministic on CPU)."""
    if dim_size is None:
        dim_size = int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = dim_size
    return src.new_zeros(shape).index_add(dim, index, src)


def scatter_mean(src, index, dim=0, dim_size=None):
    total = scatter_sum(src, index, dim, dim_size)
    count = scatter_sum(torch.ones_like(src), index, dim, dim_size)
    return total / count.clamp(min=1.0)


def to_dense_batch(x, batch=None, fill_value=0.0):
    """PyG to_dense_batch for sorted batch vectors: [N, F] -> [B, max, F]."""
    b = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=b)
    m = int(counts.max())
    ptr = torch.cumsum(counts, 0) - counts
    pos = torch.arange(x.size(0)) - ptr[batch]
    out = x.new_full((b, m, x.size(-1)), fill_value)
    mask = torch.zeros(b, m, dtype=torch.bool)
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


def sh_l1(irreps, vec, normalize, normalization="component"):
    """o3.spherical_harmonics(l<=1, normalize=True, 'component') — the same
    closed form as ops/geometry.spherical_harmonics_l1, in torch.  This one
    IS circular with our implementation (e3nn is not installable in-env —
    PARITY.md "Known gaps")."""
    assert normalization == "component"
    r = vec.norm(dim=-1, keepdim=True)
    unit = vec / r.clamp(min=1e-12) if normalize else vec
    return torch.cat([torch.ones_like(r), math.sqrt(3.0) * unit], dim=-1)


def smooth_cutoff(x):
    u = 2.0 * (x - 1.0)
    y = (1.0 - torch.cos(math.pi * u)) / 2.0
    y = torch.where(u > 0.0, torch.zeros_like(y), y)
    y = torch.where(u < -1.0, torch.ones_like(y), y)
    return y


def _radius_graph(*a, **k):  # dead fallback path (SURVEY §2.2) — loud
    raise AssertionError("reference radius_graph fallback should be dead")


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _AseAtom:
    """ase.Atom(Z): .symbol/.mass via our element tables (data/elements.py,
    IUPAC standard atomic weights — the ase.data.atomic_masses convention)."""

    def __init__(self, Z):
        from dostransformer_tpu.data.elements import ATOMIC_MASSES, SYMBOLS

        self.symbol = SYMBOLS[Z - 1]
        self.mass = float(ATOMIC_MASSES[Z - 1])


class _AseCell:
    def __init__(self, array):
        self.array = array


class _AseAtoms:
    """Minimal ase.Atoms: the fields utils.build_data touches
    (.symbols, .positions, .cell.array) plus .pbc for the neighbor list."""

    def __init__(self, numbers, positions, cell, pbc=(True, True, True)):
        import numpy as _np

        from dostransformer_tpu.data.elements import SYMBOLS

        self.numbers = _np.asarray(numbers, int)
        self.symbols = [SYMBOLS[z - 1] for z in self.numbers]
        self.positions = _np.asarray(positions, float)
        self.cell = _AseCell(_np.asarray(cell, float))
        self.pbc = tuple(pbc)

    @classmethod
    def fromdict(cls, d):
        """ase.Atoms.fromdict over a todict() payload (utils.load_data
        applies this to the eval'd CSV `structure` column)."""
        pbc = d.get("pbc", (True, True, True))
        try:
            pbc = tuple(bool(b) for b in pbc)
        except TypeError:
            pbc = (bool(pbc),) * 3
        return cls(d["numbers"], d["positions"], d["cell"], pbc=pbc)

    def get_chemical_symbols(self):
        return list(self.symbols)

    def get_chemical_formula(self):
        """Hill-ish formula — load_data only stores this into df['formula']
        (never consumed downstream), so exact ASE formatting is not pinned."""
        from collections import Counter

        counts = Counter(self.symbols)
        return "".join(s + (str(c) if c > 1 else "")
                       for s, c in sorted(counts.items()))


def _ase_neighbor_list(quantities, a, cutoff, self_interaction=False):
    """ase.neighborlist.neighbor_list('ijS', ...) backed by our
    neighbor_list_pbc (see the honesty note at the ase shim below)."""
    assert quantities == "ijS"
    from dostransformer_tpu.data.neighbors import neighbor_list_pbc

    return neighbor_list_pbc(a.positions, a.cell.array, cutoff, pbc=a.pbc,
                             self_interaction=self_interaction)


def _build_shims():
    shims = {}
    shims["torch_scatter"] = _module(
        "torch_scatter", scatter_sum=scatter_sum, scatter_mean=scatter_mean)

    class _Data:  # utils.py build_data constructs these; never run in tests
        def __init__(self, **kw):
            self.__dict__.update(kw)

    tg_utils = _module("torch_geometric.utils", to_dense_batch=to_dense_batch)
    tg_data = _module("torch_geometric.data", Data=_Data)
    tg = _module("torch_geometric", utils=tg_utils, data=tg_data)
    shims.update({"torch_geometric": tg, "torch_geometric.utils": tg_utils,
                  "torch_geometric.data": tg_data})

    class _Irreps:
        @staticmethod
        def spherical_harmonics(lmax):
            assert lmax == 1
            return "1x0e+1x1o"

    o3 = _module("e3nn.o3", spherical_harmonics=sh_l1, Irreps=_Irreps)
    gp = _module("e3nn.nn.models.gate_points_2101", smooth_cutoff=smooth_cutoff)
    e3nn_models = _module("e3nn.nn.models", gate_points_2101=gp)
    e3nn_nn = _module("e3nn.nn", models=e3nn_models)
    e3nn = _module("e3nn", o3=o3, nn=e3nn_nn)
    shims.update({"e3nn": e3nn, "e3nn.o3": o3, "e3nn.nn": e3nn_nn,
                  "e3nn.nn.models": e3nn_models,
                  "e3nn.nn.models.gate_points_2101": gp})

    shims["torch_cluster"] = _module("torch_cluster",
                                     radius_graph=_radius_graph)

    # Minimal REAL ase shim — enough for the genuine utils.build_data to
    # execute.  Honesty accounting: Atom symbols/masses come from our
    # transcribed IUPAC tables (data/elements.py — constants, same convention
    # as ase.data.atomic_masses), and neighbor_list is backed by our
    # neighbor_list_pbc (circular for the SEARCH — both sides then consume
    # the identical candidate set; everything downstream of it in build_data
    # runs genuinely).
    ase_nl = _module("ase.neighborlist", neighbor_list=_ase_neighbor_list)
    ase = _module("ase", Atoms=_AseAtoms, Atom=_AseAtom, neighborlist=ase_nl)
    shims.update({"ase": ase, "ase.neighborlist": ase_nl})

    # mat2graph.py extras: the dead `psy` import (mat2graph.py:4), pymatgen
    # (Structure paths not exercised), mendeleev (fallback not exercised)
    def _unusable(*a, **k):
        raise AssertionError("stubbed dependency path exercised unexpectedly")

    shims["psy"] = _module("psy")
    pmg_struct = _module("pymatgen.core.structure", Structure=_unusable)
    pmg_core = _module("pymatgen.core", structure=pmg_struct)
    pymatgen = _module("pymatgen", core=pmg_core)
    shims.update({"pymatgen": pymatgen, "pymatgen.core": pmg_core,
                  "pymatgen.core.structure": pmg_struct})
    men_fetch = _module("mendeleev.fetch", fetch_table=_unusable)
    mendeleev = _module("mendeleev", element=_unusable, fetch=men_fetch)
    shims.update({"mendeleev": mendeleev, "mendeleev.fetch": men_fetch})
    return shims


def load_reference_file(relpath, name):
    """Import a single reference source file by path (for modules that are
    not import-packages, e.g. data/mat2graph.py).  Call INSIDE a
    reference_imports() context so the dependency shims are visible; the
    module is NOT registered in sys.modules."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def reference_imports(*module_names):
    """Install the shims, freshly import the named /root/reference modules,
    yield them (one module or a tuple), then restore sys.modules/sys.path —
    pre-existing entries (e.g. test_convert_pt's fake torch_geometric) are
    put back exactly as they were."""
    shims = _build_shims()
    ref_mods = ["layers", "layers.transformer", "layers.multihead_attention",
                *module_names]
    saved = {n: sys.modules.get(n) for n in list(shims) + ref_mods}
    # parent packages of the requested modules must re-import too
    for n in module_names:
        parent = n.partition(".")[0]
        if parent not in saved:
            saved[parent] = sys.modules.get(parent)
            ref_mods.append(parent)
    sys.modules.update(shims)
    sys.path.insert(0, REF_ROOT)
    try:
        for n in ref_mods:  # force fresh imports against the shims
            sys.modules.pop(n, None)
        mods = tuple(importlib.import_module(n) for n in module_names)
        yield mods[0] if len(mods) == 1 else mods
    finally:
        sys.path.remove(REF_ROOT)
        for n, prev in saved.items():
            if prev is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = prev
