"""Full-MODEL parity vs the GENUINE reference code (oracle-circularity killer).

tests/test_reference_parity.py pins our transformer stack against the real
/root/reference/layers package (pure torch, runnable here).  The reference's
MODEL files (embedder_eDOS/*.py, embedder_phDOS/*.py) additionally import
torch_scatter / torch_geometric.utils.to_dense_batch / e3nn / torch_cluster —
none installed — but each of those uses is a tiny, exactly-specified op.  This
file installs faithful torch shims for them in sys.modules, imports the ACTUAL
reference model classes, loads the genuine ``state_dict()`` through our
production weight importer (models/import_torch.py), and pins our flax
forwards against the genuine torch forwards at float64.

What this kills: every other golden test compares against a builder-authored
oracle (tests/oracles/torch_oracle.py) — a shared misreading of the
reference's model code would pass all of them.  Here the model code IS the
reference's (embedder_eDOS/DOSTransformer.py:45-93 etc.).

Shim honesty (what remains builder-authored):
  * scatter_sum/scatter_mean  -> torch.index_add / count division.  Exactly
    specified by torch_scatter's docs and pinned independently against
    jax.ops.segment_sum in tests/test_ops.py.
  * to_dense_batch(x, batch)  -> dense [B, max_count, F] zero-padded + mask,
    for sorted ``batch`` vectors (the only way the reference builds them).
  * e3nn SH(l<=1)+smooth_cutoff (phDOS only) -> the same closed forms as
    ops/geometry.py, in torch.  This one IS circular for the 4 geometry
    columns (e3nn is not installable in this env — PARITY.md "Known gaps");
    everything downstream of edge_attr (encoder, message passing, attention,
    heads) is genuinely pinned.  eDOS needs no e3nn at all.

Runnability notes (verified here, extends SURVEY.md §2.3):
  * genuine eDOS Graphnetwork2.forward calls Encoder with 3 of 5 required
    positional args (graphnetwork.py:64 vs :94) and mlp2.forward with 4 of 5
    (mlp.py:52 vs :76) — both TypeError on any input; asserted below, which
    documents why our Graphnetwork2EDOS/MLP2EDOS implement the intent instead
    (they are pinned against the torch oracle in tests/test_baseline_parity.py).
  * genuine phDOS Graphnetwork2_phonon/mlp_phonon/mlp2_phonon have the same
    class of bug (SURVEY.md §2.3-4) and are likewise intent-only.

Tolerances: rtol 1e-5 / atol 1e-6 for transformer models (the genuine
attention softmaxes at exactly f32 even under f64 — multihead_attention.py:69
`.float()`; ours reproduces that downcast, and torch-vs-jax f32 softmax
differs at ~6e-8); 1e-9/1e-10 for the attention-free baselines, which should
agree to f64 roundoff.
"""

import math
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dostransformer_tpu.data import (
    collate,
    synthetic_edos_samples,
    synthetic_phdos_samples,
)
from dostransformer_tpu.models.dostransformer import (
    DOSTransformerEDOS,
    DOSTransformerPhDOS,
)
from dostransformer_tpu.models.graphnetwork import GraphnetworkEDOS
from dostransformer_tpu.models.import_torch import import_reference_state_dict
from dostransformer_tpu.models.mlp import MLPEDOS
from dostransformer_tpu.models.phonon_baselines import GraphnetworkPhDOS

REF_ROOT = "/root/reference"

H = 32   # hidden (small: the genuine energy tables are hard-coded 201/51 rows)
L = 2    # GNN layers
T = 2    # transformer layers


# ---------------------------------------------------------------------------
# shims for the reference's native-dependency imports
# ---------------------------------------------------------------------------

def _scatter_sum(src, index, dim=0, dim_size=None):
    if dim_size is None:
        dim_size = int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = dim_size
    return src.new_zeros(shape).index_add(dim, index, src)


def _scatter_mean(src, index, dim=0, dim_size=None):
    total = _scatter_sum(src, index, dim, dim_size)
    count = _scatter_sum(torch.ones_like(src), index, dim, dim_size)
    return total / count.clamp(min=1.0)


def _to_dense_batch(x, batch=None, fill_value=0.0):
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


def _sh_l1(irreps, vec, normalize, normalization="component"):
    """o3.spherical_harmonics(l<=1, normalize=True, 'component') — the same
    closed form as ops/geometry.spherical_harmonics_l1, in torch."""
    assert normalization == "component"
    r = vec.norm(dim=-1, keepdim=True)
    unit = vec / r.clamp(min=1e-12) if normalize else vec
    return torch.cat([torch.ones_like(r), math.sqrt(3.0) * unit], dim=-1)


def _smooth_cutoff(x):
    u = 2.0 * (x - 1.0)
    y = (1.0 - torch.cos(math.pi * u)) / 2.0
    y = torch.where(u > 0.0, torch.zeros_like(y), y)
    y = torch.where(u < -1.0, torch.ones_like(y), y)
    return y


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Install dependency shims, import the genuine reference model modules,
    restore sys.modules afterwards."""
    shims = {}
    shims["torch_scatter"] = _module(
        "torch_scatter", scatter_sum=_scatter_sum, scatter_mean=_scatter_mean)
    tg = _module("torch_geometric")
    tg_utils = _module("torch_geometric.utils", to_dense_batch=_to_dense_batch)
    tg.utils = tg_utils
    shims["torch_geometric"] = tg
    shims["torch_geometric.utils"] = tg_utils

    class _Irreps:
        @staticmethod
        def spherical_harmonics(lmax):
            assert lmax == 1
            return "1x0e+1x1o"

    o3 = _module("e3nn.o3", spherical_harmonics=_sh_l1, Irreps=_Irreps)
    gp = _module("e3nn.nn.models.gate_points_2101", smooth_cutoff=_smooth_cutoff)
    e3nn_models = _module("e3nn.nn.models", gate_points_2101=gp)
    e3nn_nn = _module("e3nn.nn", models=e3nn_models)
    e3nn = _module("e3nn", o3=o3, nn=e3nn_nn)
    shims.update({"e3nn": e3nn, "e3nn.o3": o3, "e3nn.nn": e3nn_nn,
                  "e3nn.nn.models": e3nn_models,
                  "e3nn.nn.models.gate_points_2101": gp})

    def _radius_graph(*a, **k):  # dead fallback path (SURVEY §2.2) — loud
        raise AssertionError("reference radius_graph fallback should be dead")

    shims["torch_cluster"] = _module("torch_cluster", radius_graph=_radius_graph)

    # import the genuine modules with the shims visible; leave any
    # pre-existing entries (e.g. test_convert_pt's fake torch_geometric)
    # exactly as they were afterwards
    saved = {n: sys.modules.get(n) for n in shims}
    ref_mods = ["layers", "layers.transformer", "layers.multihead_attention",
                "embedder_eDOS", "embedder_eDOS.DOSTransformer",
                "embedder_eDOS.graphnetwork", "embedder_eDOS.mlp",
                "embedder_phDOS", "embedder_phDOS.DOSTransformer_phonon",
                "embedder_phDOS.graphnetwork_phonon"]
    saved.update({n: sys.modules.get(n) for n in ref_mods})
    sys.modules.update(shims)
    sys.path.insert(0, REF_ROOT)
    try:
        for n in ref_mods:  # force fresh imports against the shims
            sys.modules.pop(n, None)
        from embedder_eDOS.DOSTransformer import DOSTransformer as EDOSRef
        from embedder_eDOS.graphnetwork import (
            Graphnetwork as GNRef,
            Graphnetwork2 as GN2Ref,
        )
        from embedder_eDOS.mlp import mlp as MLPRef, mlp2 as MLP2Ref
        from embedder_phDOS.DOSTransformer_phonon import (
            DOSTransformer_phonon as PhDOSRef,
        )
        from embedder_phDOS.graphnetwork_phonon import (
            Graphnetwork_phonon as GNPhRef,
        )
        yield SimpleNamespace(edos=EDOSRef, gn=GNRef, gn2=GN2Ref,
                              mlp=MLPRef, mlp2=MLP2Ref,
                              phdos=PhDOSRef, gn_ph=GNPhRef)
    finally:
        sys.path.remove(REF_ROOT)
        for n, prev in saved.items():
            if prev is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = prev


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


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def _cast_f64(tree):
    return jax.tree.map(
        lambda a: np.asarray(a).astype(np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, tree)


class _G:
    """Stands in for a PyG Batch: attribute access (g.x) for the eDOS models,
    dict-style ('batch' in data, data['edge_vec']) for the phDOS preprocess
    (DOSTransformer_phonon.py:47-55)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __contains__(self, k):
        return k in self.__dict__

    def __getitem__(self, k):
        return self.__dict__[k]


def _ragged(samples, phdos=False):
    """Concatenate samples the way PyG collation does (f64 torch tensors)."""
    xs, eis, evs, eas, globs, systems, bvec = [], [], [], [], [], [], []
    off = 0
    for i, s in enumerate(samples):
        xs.append(torch.as_tensor(np.asarray(s.x, dtype=np.float64)))
        eis.append(torch.as_tensor(np.asarray(s.edge_index, dtype=np.int64)) + off)
        if phdos:
            evs.append(torch.as_tensor(np.asarray(s.edge_vec, dtype=np.float64)))
        else:
            eas.append(torch.as_tensor(np.asarray(s.edge_attr, dtype=np.float64)))
            globs.append(torch.as_tensor(np.asarray(s.glob, dtype=np.float64)))
        systems.append(int(s.system))
        bvec.append(torch.full((s.n_nodes,), i, dtype=torch.long))
        off += s.n_nodes
    g = _G(x=torch.cat(xs), edge_index=torch.cat(eis, dim=1),
           batch=torch.cat(bvec), system=torch.as_tensor(systems))
    if phdos:
        g.edge_vec = torch.cat(evs)
    else:
        g.edge_attr = torch.cat(eas)
        g.glob = torch.stack(globs)
    return g


def _our_batch(samples):
    """Exact-envelope collate: atom pad == max nodes in batch, so our 'ref'
    zero-key padding matches to_dense_batch's zero rows exactly."""
    return _cast_f64(collate(
        samples,
        atoms_per_graph=max(s.n_nodes for s in samples),
        edges_per_graph=max(s.n_edges for s in samples),
        use_buckets=False))


def _import_genuine(tmodel, our_model, batch):
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    template = _cast_f64(our_model.init(jax.random.PRNGKey(0), batch))
    return import_reference_state_dict(sd, template)


# ---------------------------------------------------------------------------
# eDOS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_size", [1, 2])
def test_edos_flagship_matches_genuine_reference(ref, batch_size):
    torch.manual_seed(11)
    tmodel = ref.edos(L, T, 200, 41, 2, H, "cpu", 0.0).eval()
    samples = synthetic_edos_samples(batch_size, seed=5, min_atoms=5,
                                     max_atoms=9)
    batch = _our_batch(samples)
    model = DOSTransformerEDOS(layers=L, t_layers=T, hidden=H,
                               dtype="float64", padding="ref",
                               use_pallas=False)
    params = _import_genuine(tmodel, model, batch)
    dg, x, ds = model.apply(params, batch, deterministic=True)
    assert np.asarray(dg).dtype == np.float64

    with torch.no_grad():
        tdg, tx, tds = tmodel(_ragged(samples))
    np.testing.assert_allclose(np.asarray(dg), tdg.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ds), tds.numpy(),
                               rtol=1e-5, atol=1e-6)
    # node embeddings: ours is [B, A_pad, H]; compare the real rows
    ours_x = np.asarray(x)
    off = 0
    for b, s in enumerate(samples):
        np.testing.assert_allclose(
            ours_x[b, :s.n_nodes], tx.numpy()[off:off + s.n_nodes],
            rtol=1e-5, atol=1e-6)
        off += s.n_nodes


def test_edos_graphnetwork_matches_genuine_reference(ref):
    torch.manual_seed(3)
    tmodel = ref.gn(L, 200, 41, 2, H, 201, "cpu").eval()
    samples = synthetic_edos_samples(2, seed=9, min_atoms=4, max_atoms=8)
    batch = _our_batch(samples)
    model = GraphnetworkEDOS(layers=L, hidden=H)
    params = _import_genuine(tmodel, model, batch)
    dos, _ = model.apply(params, batch)
    with torch.no_grad():
        tdos, _ = tmodel(_ragged(samples))
    np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                               rtol=1e-9, atol=1e-10)


def test_edos_mlp_matches_genuine_reference(ref):
    torch.manual_seed(4)
    tmodel = ref.mlp(L, 200, 41, 2, H, 201, "cpu").eval()
    samples = synthetic_edos_samples(2, seed=13, min_atoms=4, max_atoms=8)
    batch = _our_batch(samples)
    model = MLPEDOS(hidden=H)
    params = _import_genuine(tmodel, model, batch)
    dos = model.apply(params, batch)
    with torch.no_grad():
        tdos = tmodel(_ragged(samples))
    np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                               rtol=1e-9, atol=1e-10)


def test_genuine_edos_graphnetwork2_and_mlp2_are_broken(ref):
    """The genuine Graphnetwork2/mlp2 eDOS forwards crash on ANY input:
    Encoder.forward requires (x, edge_attr, glob, batch, energies) but
    Graphnetwork2 passes 3 args (graphnetwork.py:64) and mlp2 passes 4
    (mlp.py:52).  This pins why our versions implement the intent (encode +
    pool + readout, golden-tested in tests/test_baseline_parity.py) rather
    than the crash."""
    torch.manual_seed(5)
    samples = synthetic_edos_samples(2, seed=2, min_atoms=4, max_atoms=6)
    g = _ragged(samples)
    with pytest.raises(TypeError):
        ref.gn2(L, 200, 41, 2, H, 201, "cpu").eval()(g)
    with pytest.raises(TypeError):
        ref.mlp2(L, 200, 41, 2, H, 201, "cpu").eval()(g)


# ---------------------------------------------------------------------------
# phDOS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_size", [1, 2])
def test_phdos_flagship_matches_genuine_reference(ref, batch_size):
    torch.manual_seed(21)
    tmodel = ref.phdos(L, T, 118, 4, H, "cpu", 0.0).eval()
    samples = synthetic_phdos_samples(batch_size, seed=6, min_atoms=4,
                                      max_atoms=7)
    batch = _our_batch(samples)
    model = DOSTransformerPhDOS(layers=L, t_layers=T, hidden=H,
                                dtype="float64", padding="ref",
                                use_pallas=False)
    params = _import_genuine(tmodel, model, batch)
    dg, _, ds = model.apply(params, batch, deterministic=True)
    with torch.no_grad():
        tdg, _, tds = tmodel(_ragged(samples, phdos=True))
    np.testing.assert_allclose(np.asarray(dg), tdg.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ds), tds.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_phdos_graphnetwork_matches_genuine_reference(ref):
    torch.manual_seed(22)
    tmodel = ref.gn_ph(L, 118, 4, H, 51, "cpu").eval()
    samples = synthetic_phdos_samples(2, seed=8, min_atoms=4, max_atoms=7)
    batch = _our_batch(samples)
    model = GraphnetworkPhDOS(layers=L, hidden=H)
    params = _import_genuine(tmodel, model, batch)
    dos = model.apply(params, batch)
    with torch.no_grad():
        tdos = tmodel(_ragged(samples, phdos=True))
    np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                               rtol=1e-9, atol=1e-10)
