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

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.refshims import reference_imports

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

H = 32   # hidden (small: the genuine energy tables are hard-coded 201/51 rows)
L = 2    # GNN layers
T = 2    # transformer layers


@pytest.fixture(scope="module")
def ref():
    """Import the genuine reference model modules against the dependency
    shims (tests/refshims.py), restore sys.modules afterwards."""
    with reference_imports("embedder_eDOS.DOSTransformer",
                           "embedder_eDOS.graphnetwork",
                           "embedder_eDOS.mlp",
                           "embedder_phDOS.DOSTransformer_phonon",
                           "embedder_phDOS.graphnetwork_phonon") as (
            m_dt, m_gn, m_mlp, m_ph, m_gnp):
        yield SimpleNamespace(edos=m_dt.DOSTransformer,
                              gn=m_gn.Graphnetwork,
                              gn2=m_gn.Graphnetwork2,
                              mlp=m_mlp.mlp, mlp2=m_mlp.mlp2,
                              phdos=m_ph.DOSTransformer_phonon,
                              gn_ph=m_gnp.Graphnetwork_phonon)


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


def test_edos_graphnetwork2_matches_minimally_repaired_genuine(ref):
    """Graphnetwork2's genuine forward crashes (test below), so our version
    implements the intent.  Pin that intent against the genuine BLOCKS: run
    the genuine module's own encoder/processors/out_layer exactly as
    graphnetwork.py:63-74 sequences them, fixing ONLY the encoder call arity
    (pass batch + a discarded energies table — the two missing args feed
    nothing Graphnetwork2 uses)."""
    from tests.refshims import scatter_sum

    torch.manual_seed(6)
    tmodel = ref.gn2(L, 200, 41, 2, H, 201, "cpu").eval()
    samples = synthetic_edos_samples(2, seed=15, min_atoms=4, max_atoms=8)
    batch = _our_batch(samples)
    from dostransformer_tpu.models.graphnetwork import Graphnetwork2EDOS
    model = Graphnetwork2EDOS(layers=L, hidden=H)
    params = _import_genuine(tmodel, model, batch)
    dos, _ = model.apply(params, batch)

    g = _ragged(samples)
    with torch.no_grad():
        x, e, u, _ = tmodel.GN_encoder(x=g.x, edge_attr=g.edge_attr,
                                       glob=g.glob, batch=g.batch,
                                       energies=torch.zeros(1, H))
        for p in tmodel.stacked_processor:
            ox, oe = p(x=x, edge_index=g.edge_index, edge_attr=e)
            x = x + ox
            e = e + oe
        tdos = tmodel.out_layer(
            torch.cat([scatter_sum(x, g.batch, dim=0), u], dim=1))
    np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                               rtol=1e-9, atol=1e-10)


def test_edos_mlp2_matches_minimally_repaired_genuine(ref):
    """Same as above for mlp2 (mlp.py:49-56: encode, pool, out_layer; the
    genuine call misses only the discarded energies arg)."""
    from tests.refshims import scatter_sum

    torch.manual_seed(7)
    tmodel = ref.mlp2(L, 200, 41, 2, H, 201, "cpu").eval()
    samples = synthetic_edos_samples(2, seed=16, min_atoms=4, max_atoms=8)
    batch = _our_batch(samples)
    from dostransformer_tpu.models.mlp import MLP2EDOS
    model = MLP2EDOS(hidden=H)
    params = _import_genuine(tmodel, model, batch)
    dos = model.apply(params, batch)

    g = _ragged(samples)
    with torch.no_grad():
        x, _, u, _ = tmodel.GN_encoder(x=g.x, edge_attr=g.edge_attr,
                                       glob=g.glob, batch=g.batch,
                                       energies=torch.zeros(1, H))
        tdos = tmodel.out_layer(
            torch.cat([scatter_sum(x, g.batch, dim=0), u], dim=1))
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


def test_edos_training_gradients_match_genuine_reference(ref):
    """TRAINING-path parity: jax.grad of our production loss (train/loss.py
    dos_loss — clamp y only, per-sample RMSE, batch mean, + beta*system,
    main_eDOS.py:111-123) vs torch autograd through the GENUINE model.  The
    genuine grads are mapped onto our tree with the same importer used for
    weights (grads transpose/rename exactly like the params they belong to).
    Pins the whole backward, not just the forward."""
    from dostransformer_tpu.train.loss import dos_loss

    torch.manual_seed(41)
    tmodel = ref.edos(L, T, 200, 41, 2, H, "cpu", 0.0)
    samples = synthetic_edos_samples(2, seed=23, min_atoms=4, max_atoms=8)
    batch = _our_batch(samples)
    model = DOSTransformerEDOS(layers=L, t_layers=T, hidden=H,
                               dtype="float64", padding="ref",
                               use_pallas=False)
    params = _import_genuine(tmodel, model, batch)

    # genuine side: the reference's training loss, then backward
    g = _ragged(samples)
    tdg, _, tds = tmodel(g)
    y_raw = torch.as_tensor(
        np.stack([np.asarray(s.y, dtype=np.float64) for s in samples]))
    y = torch.where(y_raw < 0, torch.zeros((), dtype=torch.float64), y_raw)
    global_rmse = torch.sqrt(((y - tdg) ** 2).mean(dim=1)).mean()
    system_rmse = torch.sqrt(((y - tds) ** 2).mean(dim=1)).mean()
    (global_rmse + 1.0 * system_rmse).backward()
    grad_sd = {k: p.grad.detach().numpy()
               for k, p in tmodel.named_parameters() if p.grad is not None}
    tgrads = import_reference_state_dict(grad_sd, params, strict=False)

    def loss_fn(p):
        dg, _, ds = model.apply(p, batch, deterministic=True)
        return dos_loss(dg, ds, batch.y, batch.graph_mask, beta=1.0,
                        clamp_targets=True)[0]

    ours = jax.grad(loss_fn)(params)
    assert jax.tree.structure(ours) == jax.tree.structure(tgrads)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(ours),
                               jax.tree_util.tree_leaves_with_path(tgrads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(kp))


def test_phdos_training_gradients_match_genuine_reference(ref):
    """phDOS training backward at the reference's hard batch-1 cadence
    (main_phDOS.py:52,109-114: MSELoss over the whole [1,51] then sqrt —
    equals per-sample RMSE at B=1; no clamp)."""
    from dostransformer_tpu.train.loss import dos_loss

    torch.manual_seed(42)
    tmodel = ref.phdos(L, T, 118, 4, H, "cpu", 0.0)
    samples = synthetic_phdos_samples(1, seed=24, min_atoms=5, max_atoms=5)
    batch = _our_batch(samples)
    model = DOSTransformerPhDOS(layers=L, t_layers=T, hidden=H,
                                dtype="float64", padding="ref",
                                use_pallas=False)
    params = _import_genuine(tmodel, model, batch)

    g = _ragged(samples, phdos=True)
    tdg, _, tds = tmodel(g)
    y = torch.as_tensor(np.asarray(samples[0].y, dtype=np.float64))[None]
    loss = (torch.sqrt(((tdg - y) ** 2).mean())
            + 1.0 * torch.sqrt(((tds - y) ** 2).mean()))
    loss.backward()
    grad_sd = {k: p.grad.detach().numpy()
               for k, p in tmodel.named_parameters() if p.grad is not None}
    tgrads = import_reference_state_dict(grad_sd, params, strict=False)

    def loss_fn(p):
        dg, _, ds = model.apply(p, batch, deterministic=True)
        return dos_loss(dg, ds, batch.y, batch.graph_mask, beta=1.0,
                        clamp_targets=False)[0]

    ours = jax.grad(loss_fn)(params)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(ours),
                               jax.tree_util.tree_leaves_with_path(tgrads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(kp))


def test_edos_three_adamw_steps_match_genuine_training(ref):
    """END-TO-END training parity: 3 optimizer steps of the genuine reference
    loop (genuine model, torch.optim.AdamW(lr=1e-4, weight_decay=1e-2) —
    main_eDOS.py:93 — and the reference loss) vs 3 Trainer.train_step calls
    from the same imported weights on the same batches.  Final param trees
    must agree, pinning forward + backward + optimizer semantics as one
    system.  mu_dtype=None gives the bit-faithful f32/f64 optimizer state
    (the production bf16 first moment is a documented, convergence-validated
    divergence — make_adamw docstring)."""
    from dostransformer_tpu.train.trainer import Trainer, make_adamw

    torch.manual_seed(51)
    tmodel = ref.edos(L, T, 200, 41, 2, H, "cpu", 0.0)
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-4, weight_decay=1e-2)

    # equal atom counts per sample => our pads equal to_dense_batch's exactly
    all_samples = synthetic_edos_samples(6, seed=29, min_atoms=7, max_atoms=7)
    steps = [all_samples[i:i + 2] for i in range(0, 6, 2)]
    e_pad = max(s.n_edges for s in all_samples)
    a_pad = all_samples[0].n_nodes  # 7 atoms + the zero prompt node
    batches = [_cast_f64(collate(ss, atoms_per_graph=a_pad,
                                 edges_per_graph=e_pad,
                                 use_buckets=False)) for ss in steps]

    model = DOSTransformerEDOS(layers=L, t_layers=T, hidden=H,
                               dtype="float64", padding="ref",
                               use_pallas=False)
    inner = _import_genuine(tmodel, model, batches[0])["params"]
    trainer = Trainer(model, tx=make_adamw(mu_dtype=None), beta=1.0,
                      clamp_targets=True, donate=False)
    state = trainer.init_state(batches[0], seed=0)
    # imported f64 params + fresh optimizer state built from THEM (init_state
    # built its state from the model's own init, whose dtypes differ)
    state = state.replace(params=inner, opt_state=trainer.tx.init(inner))

    our_losses = []
    for b in batches:
        state, aux = trainer.train_step(state, b)
        our_losses.append(float(aux["loss"]))

    ref_losses = []
    for ss in steps:
        g = _ragged(ss)
        tdg, _, tds = tmodel(g)
        y_raw = torch.as_tensor(
            np.stack([np.asarray(s.y, dtype=np.float64) for s in ss]))
        y = torch.where(y_raw < 0, torch.zeros((), dtype=torch.float64), y_raw)
        loss = (torch.sqrt(((y - tdg) ** 2).mean(dim=1)).mean()
                + 1.0 * torch.sqrt(((y - tds) ** 2).mean(dim=1)).mean())
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-6)
    final_ref = _import_genuine(tmodel, model, batches[0])["params"]
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(final_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8,
            err_msg=jax.tree_util.keystr(kp))


def test_phdos_intent_fixed_baselines_match_minimally_repaired_genuine(ref):
    """The three phDOS baselines with arity-broken genuine forwards
    (SURVEY §2.3-4): run their genuine blocks with ONLY the call arities
    fixed and pin our intent implementations against them at f64/1e-9.

      * Graphnetwork2_phonon: encoder missing `energies` (a discarded
        expansion) and 2-of-3 unpack (graphnetwork_phonon.py:114).
      * mlp_phonon: encoder missing `z` and 3-of-4 unpack (mlp_phonon.py:29
        vs :96); decoder called (x, batch) vs (x, z, batch) (:32 vs :136).
      * mlp2_phonon: encoder missing `energies`, 2-of-4 unpack
        (mlp_phonon.py:52)."""
    from tests.refshims import reference_imports, scatter_sum, sh_l1, \
        smooth_cutoff
    from dostransformer_tpu.models.phonon_baselines import (
        Graphnetwork2PhDOS,
        MLP2PhDOS,
        MLPPhDOS,
    )

    with reference_imports("embedder_phDOS.graphnetwork_phonon",
                           "embedder_phDOS.mlp_phonon") as (m_gnp, m_mlpp):
        samples = synthetic_phdos_samples(2, seed=19, min_atoms=4,
                                          max_atoms=7)
        batch = _our_batch(samples)
        g = _ragged(samples, phdos=True)
        g.z = torch.cat([torch.as_tensor(np.asarray(s.z, dtype=np.float64))
                         for s in samples])
        g.edge_shift = torch.cat(
            [torch.as_tensor(np.asarray(s.edge_shift, dtype=np.float64))
             for s in samples])
        edge_len = g.edge_vec.norm(dim=1)
        edge_sh_attr = (smooth_cutoff(edge_len / 4.0)[:, None]
                        * sh_l1(None, g.edge_vec, True))

        # Graphnetwork2_phonon
        torch.manual_seed(61)
        t_gn2 = m_gnp.Graphnetwork2_phonon(L, 118, 4, H, 51, "cpu").eval()
        model = Graphnetwork2PhDOS(layers=L, hidden=H)
        params = _import_genuine(t_gn2, model, batch)
        dos = model.apply(params, batch)
        with torch.no_grad():
            x, e, _ = t_gn2.GN_encoder(x=g.x, edge_attr=edge_sh_attr,
                                       batch=g.batch,
                                       energies=torch.zeros(1, H))
            for p in t_gn2.stacked_processor:
                ox, oe = p(x=x, edge_index=g.edge_index, edge_attr=e)
                x, e = x + ox, e + oe
            tdos = t_gn2.out_layer(scatter_sum(x, g.batch, dim=0))
        np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                                   rtol=1e-9, atol=1e-10)

        # mlp_phonon (edge feature is cutoff * edge_shift, NOT SH —
        # mlp_phonon.py:27-28)
        torch.manual_seed(62)
        t_mlp = m_mlpp.mlp_phonon(L, 118, 3, H, 51, "cpu").eval()
        model = MLPPhDOS(hidden=H)
        params = _import_genuine(t_mlp, model, batch)
        dos = model.apply(params, batch)
        with torch.no_grad():
            energies = t_mlp.embeddings(torch.arange(51))
            eattr = smooth_cutoff(edge_len / 4.0)[:, None] * g.edge_shift
            x, z, e, energies = t_mlp.GN_encoder(
                x=g.x, z=g.z, edge_attr=eattr, batch=g.batch,
                energies=energies)
            graph = t_mlp.GN_decoder(x, z, g.batch)
            graph = graph.reshape(-1, graph.shape[0], graph.shape[1]).expand(
                51, graph.shape[0], graph.shape[1])
            tdos = t_mlp.out_layer(
                torch.cat([energies, graph], dim=2)).squeeze(2).T
        np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                                   rtol=1e-9, atol=1e-10)

        # mlp2_phonon
        torch.manual_seed(63)
        t_mlp2 = m_mlpp.mlp2_phonon(L, 118, 4, H, 51, "cpu").eval()
        model = MLP2PhDOS(hidden=H)
        params = _import_genuine(t_mlp2, model, batch)
        dos = model.apply(params, batch)
        with torch.no_grad():
            # mlp_phonon.py's Encoder signature is (x, z, edge_attr, batch,
            # energies) -> (x, z, e, energies); mlp2 uses only x
            x, _, _, _ = t_mlp2.GN_encoder(x=g.x, z=g.z,
                                           edge_attr=edge_sh_attr,
                                           batch=g.batch,
                                           energies=torch.zeros(1, H))
            tdos = t_mlp2.out_layer(scatter_sum(x, g.batch, dim=0))
        np.testing.assert_allclose(np.asarray(dos), tdos.numpy(),
                                   rtol=1e-9, atol=1e-10)


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
