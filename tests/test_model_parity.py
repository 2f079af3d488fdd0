"""Golden-parity tests: flax models vs the independent torch oracle with
identical weights (SURVEY.md §4 parity strategy).

Batch size 1 with exact shapes (no padding) — the configuration in which the
reference's behavior is unambiguous (eval always runs at batch 1,
main_eDOS.py:55-56).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dostransformer_tpu.data import collate, synthetic_edos_samples, synthetic_phdos_samples
from dostransformer_tpu.models import DOSTransformerEDOS, DOSTransformerPhDOS

from oracles import torch_oracle as oracle


def _to_numpy_tree(params):
    return jax.tree.map(np.asarray, params)


class TestEDOSParity:
    @pytest.fixture(scope="class")
    def setup(self):
        (s,) = synthetic_edos_samples(1, seed=7, min_atoms=9, max_atoms=9)
        batch = collate([s], atoms_per_graph=s.n_nodes,
                        edges_per_graph=s.n_edges, use_buckets=False)
        model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=64)
        params = model.init(jax.random.PRNGKey(0), batch)
        return s, batch, model, params

    def test_forward_matches_oracle(self, setup):
        s, batch, model, params = setup
        dg, x, ds = model.apply(params, batch)
        odg, ox, ods = oracle.dostransformer_edos_forward(
            _to_numpy_tree(params), s.x, s.edge_index, s.edge_attr, s.glob,
            s.system, n_layers=3, t_layers=2, n_bins=201)
        np.testing.assert_allclose(np.asarray(x).reshape(-1, x.shape[-1]),
                                   ox.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dg), odg.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds), ods.numpy(), rtol=1e-4, atol=1e-4)

    def test_padding_invariance_batch1(self, setup):
        """With padding='mask', growing the pad buckets must not change the
        outputs (SURVEY.md §4: padding invariance)."""
        s, batch, model, params = setup
        padded = collate([s], atoms_per_graph=s.n_nodes + 13,
                         edges_per_graph=s.n_edges + 57, use_buckets=False)
        dg1, _, ds1 = model.apply(params, batch)
        dg2, _, ds2 = model.apply(params, padded)
        np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ds1), np.asarray(ds2), rtol=1e-4, atol=1e-5)

    def test_ref_padding_diverges_only_via_zero_keys(self, setup):
        """padding='ref' adds zero-vector keys like torch to_dense_batch; at
        exact shapes (no pad slots) it must equal padding='mask'."""
        s, batch, _, _ = setup
        model_ref = DOSTransformerEDOS(layers=3, t_layers=2, hidden=64, padding="ref")
        model_mask = DOSTransformerEDOS(layers=3, t_layers=2, hidden=64, padding="mask")
        params = model_ref.init(jax.random.PRNGKey(1), batch)
        dg_r, _, ds_r = model_ref.apply(params, batch)
        dg_m, _, ds_m = model_mask.apply(params, batch)
        np.testing.assert_allclose(np.asarray(dg_r), np.asarray(dg_m), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_r), np.asarray(ds_m), rtol=1e-5, atol=1e-6)


class TestPhDOSParity:
    @pytest.fixture(scope="class")
    def setup(self):
        (s,) = synthetic_phdos_samples(1, seed=11, min_atoms=6, max_atoms=6)
        batch = collate([s], atoms_per_graph=s.n_nodes,
                        edges_per_graph=s.n_edges, use_buckets=False)
        model = DOSTransformerPhDOS(layers=3, t_layers=2, hidden=64)
        params = model.init(jax.random.PRNGKey(0), batch)
        return s, batch, model, params

    def test_forward_matches_oracle(self, setup):
        s, batch, model, params = setup
        dg, x, ds = model.apply(params, batch)
        odg, ox, ods = oracle.dostransformer_phdos_forward(
            _to_numpy_tree(params), s.x, s.edge_index, s.edge_vec, s.system,
            n_layers=3, t_layers=2, n_bins=51)
        np.testing.assert_allclose(np.asarray(x).reshape(-1, x.shape[-1]),
                                   ox.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dg), odg.numpy(), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds), ods.numpy(), rtol=1e-4, atol=1e-4)

    def test_padding_invariance(self, setup):
        s, batch, model, params = setup
        padded = collate([s], atoms_per_graph=s.n_nodes + 5,
                         edges_per_graph=s.n_edges + 21, use_buckets=False)
        dg1, _, ds1 = model.apply(params, batch)
        dg2, _, ds2 = model.apply(params, padded)
        np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ds1), np.asarray(ds2), rtol=1e-4, atol=1e-5)


class TestRefPaddingBatchedParity:
    def test_batch2_ref_padding_matches_torch_to_dense_batch(self):
        """Training-time batch semantics (SURVEY.md §2.3-10): with
        padding='ref', zero pad rows act as attention keys exactly like torch
        to_dense_batch in the reference — verified against a batched oracle
        with ragged concat + global-index scatter + zero-padded dense batch
        and NO mask."""
        s1, s2 = synthetic_edos_samples(2, seed=13, min_atoms=5, max_atoms=11)
        assert s1.n_nodes != s2.n_nodes  # genuinely ragged
        a_max = max(s1.n_nodes, s2.n_nodes)
        e_max = max(s1.n_edges, s2.n_edges)
        batch = collate([s1, s2], atoms_per_graph=a_max,
                        edges_per_graph=e_max, use_buckets=False)
        model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=64,
                                   padding="ref")
        params = model.init(jax.random.PRNGKey(2), batch)
        dg, x, ds = model.apply(params, batch)

        graphs = [dict(x=s.x, edge_index=s.edge_index, edge_attr=s.edge_attr,
                       glob=s.glob, system=s.system) for s in (s1, s2)]
        odg, ox, ods = oracle.dostransformer_edos_forward_batched(
            _to_numpy_tree(params), graphs, n_layers=3, t_layers=2)
        np.testing.assert_allclose(np.asarray(dg), odg.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds), ods.numpy(),
                                   rtol=1e-4, atol=1e-4)
        # node embeddings: ours padded [B, A, h]; oracle ragged [N, h]
        ours = np.asarray(x)
        np.testing.assert_allclose(ours[0, :s1.n_nodes], ox[:s1.n_nodes],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ours[1, :s2.n_nodes], ox[s1.n_nodes:],
                                   rtol=1e-4, atol=1e-4)


class TestBinsPadEquivalence:
    """bins_pad runs the energy-token axis lane-aligned (201 -> 256); pad
    bins are masked out of self-attention keys and sliced off the outputs,
    so results must match the unpadded model with the SAME params (the param
    tree is unchanged) in both padding modes."""

    @pytest.mark.parametrize("padding", ["mask", "ref"])
    def test_edos_padded_bins_match(self, padding):
        samples = synthetic_edos_samples(2, seed=21, min_atoms=5, max_atoms=9)
        batch = collate(samples)
        m0 = DOSTransformerEDOS(layers=2, t_layers=2, hidden=64,
                                padding=padding)
        m1 = DOSTransformerEDOS(layers=2, t_layers=2, hidden=64,
                                padding=padding, bins_pad=256)
        params = m0.init(jax.random.PRNGKey(4), batch)
        params1 = m1.init(jax.random.PRNGKey(4), batch)
        assert jax.tree.structure(params) == jax.tree.structure(params1)
        assert params["params"]["embeddings"].shape == (201, 64)

        dg0, x0, ds0 = m0.apply(params, batch)
        dg1, x1, ds1 = m1.apply(params, batch)
        assert dg1.shape == (batch.num_graphs, 201)
        np.testing.assert_allclose(np.asarray(dg0), np.asarray(dg1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds0), np.asarray(ds1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                   rtol=1e-5, atol=1e-6)

    def test_padded_bins_pallas_path(self, monkeypatch):
        """The Pallas kernel path (interpret mode on CPU) must honour the
        pad-bin key mask too — this is the path the TPU actually runs with
        --pad_bins."""
        monkeypatch.setenv("DOSTPU_PALLAS_INTERPRET", "1")
        samples = synthetic_edos_samples(2, seed=23, min_atoms=5, max_atoms=7)
        batch = collate(samples)
        m0 = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32,
                                use_pallas=False)
        m1 = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32,
                                use_pallas=True, bins_pad=256)
        params = m0.init(jax.random.PRNGKey(6), batch)
        dg0, _, ds0 = m0.apply(params, batch)
        dg1, _, ds1 = m1.apply(params, batch)
        np.testing.assert_allclose(np.asarray(dg0), np.asarray(dg1),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ds0), np.asarray(ds1),
                                   rtol=2e-4, atol=1e-5)

    def test_edos_padded_bins_gradients_match(self):
        samples = synthetic_edos_samples(2, seed=22, min_atoms=5, max_atoms=8)
        batch = collate(samples)
        m0 = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32)
        m1 = DOSTransformerEDOS(layers=1, t_layers=1, hidden=32, bins_pad=256)
        params = m0.init(jax.random.PRNGKey(5), batch)["params"]

        def loss(m):
            def f(p):
                dg, _, ds = m.apply({"params": p}, batch)
                return ((batch.y - dg) ** 2).mean() + ((batch.y - ds) ** 2).mean()
            return f

        g0 = jax.grad(loss(m0))(params)
        g1 = jax.grad(loss(m1))(params)
        assert jax.tree.structure(g0) == jax.tree.structure(g1)
        for (k0, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                   jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(k0))


def _cast_tree_f64(tree):
    return jax.tree.map(
        lambda a: np.asarray(a).astype(np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, tree)


class TestX64Parity:
    """Flagship forwards under jax_enable_x64 vs the f64 torch oracle at
    ~1e-10: pins that f32 is the ONLY divergence from the reference's f64
    phDOS training (main_phDOS.py:14-16) — VERDICT r2 weak #5. The model
    runs with dtype='float64' (params cast f64; LN promotes).

    Softmax note: the GENUINE reference softmaxes at exactly f32 even under
    f64 (multihead_attention.py:69 `.float()` downcast — see
    tests/test_reference_parity.py, which pins against the real code). Since
    torch's and jax's f32 softmaxes differ at ~6e-8, a 1e-10 pin through a
    truly-f32 softmax is impossible between libraries; these tests opt BOTH
    sides into wide (operand-dtype) softmax to keep every OTHER op pinned at
    1e-10. Reference-exact softmax semantics are covered by the genuine-code
    test instead."""

    @pytest.fixture(autouse=True)
    def x64(self, monkeypatch):
        monkeypatch.setenv("DOSTPU_SOFTMAX_WIDE", "1")
        monkeypatch.setattr(oracle, "SOFTMAX_WIDE", True)
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_phdos_x64_matches_f64_oracle(self):
        (s,) = synthetic_phdos_samples(1, seed=11, min_atoms=6, max_atoms=6)
        batch = _cast_tree_f64(collate([s], atoms_per_graph=s.n_nodes,
                                       edges_per_graph=s.n_edges,
                                       use_buckets=False))
        model = DOSTransformerPhDOS(layers=3, t_layers=2, hidden=64,
                                    dtype="float64", use_pallas=False)
        params = _cast_tree_f64(model.init(jax.random.PRNGKey(0), batch))
        dg, x, ds = model.apply(params, batch)
        assert np.asarray(dg).dtype == np.float64
        odg, ox, ods = oracle.dostransformer_phdos_forward(
            _to_numpy_tree(params), s.x, s.edge_index, s.edge_vec, s.system,
            n_layers=3, t_layers=2, n_bins=51)
        np.testing.assert_allclose(np.asarray(dg), odg.numpy(),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ds), ods.numpy(),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(x).reshape(-1, x.shape[-1]), ox.numpy(),
            rtol=1e-9, atol=1e-10)

    def test_edos_x64_matches_f64_oracle(self):
        (s,) = synthetic_edos_samples(1, seed=7, min_atoms=9, max_atoms=9)
        batch = _cast_tree_f64(collate([s], atoms_per_graph=s.n_nodes,
                                       edges_per_graph=s.n_edges,
                                       use_buckets=False))
        model = DOSTransformerEDOS(layers=3, t_layers=2, hidden=64,
                                   dtype="float64", use_pallas=False)
        params = _cast_tree_f64(model.init(jax.random.PRNGKey(0), batch))
        dg, x, ds = model.apply(params, batch)
        assert np.asarray(dg).dtype == np.float64
        odg, ox, ods = oracle.dostransformer_edos_forward(
            _to_numpy_tree(params), s.x, s.edge_index, s.edge_attr, s.glob,
            s.system, n_layers=3, t_layers=2, n_bins=201)
        np.testing.assert_allclose(np.asarray(dg), odg.numpy(),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ds), ods.numpy(),
                                   rtol=1e-9, atol=1e-10)


class TestSharedHeadWeights:
    def test_heads_share_transformer_params(self):
        """The reference reuses transformer_self/transformer_source/out_layer
        between heads (DOSTransformer.py:71-89): the param tree must contain
        exactly one copy of each."""
        (s,) = synthetic_edos_samples(1, seed=3, min_atoms=5, max_atoms=5)
        batch = collate([s], use_buckets=False)
        model = DOSTransformerEDOS(hidden=32)
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
        names = set(params.keys())
        assert {"transformer", "transformer_self", "transformer_source",
                "out_layer", "fc", "fc_prompt"} <= names
        assert not any(n.endswith("_1") or n.endswith("_copy") for n in names)
