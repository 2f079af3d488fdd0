"""Golden-parity tests for the ablation-baseline model families vs the
independent torch oracle (SURVEY.md §4 parity strategy) at batch 1, exact
shapes."""

import jax
import numpy as np
import pytest

from dostransformer_tpu.data import collate, synthetic_edos_samples, synthetic_phdos_samples
from dostransformer_tpu.models.graphnetwork import Graphnetwork2EDOS, GraphnetworkEDOS
from dostransformer_tpu.models.mlp import MLP2EDOS, MLPEDOS
from dostransformer_tpu.models.phonon_baselines import (
    Graphnetwork2PhDOS,
    GraphnetworkPhDOS,
    MLP2PhDOS,
    MLPPhDOS,
)

from oracles import torch_oracle as oracle


def _np_tree(params):
    return jax.tree.map(np.asarray, params)


@pytest.fixture(scope="module")
def edos_sample():
    (s,) = synthetic_edos_samples(1, seed=21, min_atoms=7, max_atoms=7)
    batch = collate([s], atoms_per_graph=s.n_nodes,
                    edges_per_graph=s.n_edges, use_buckets=False)
    return s, batch


class TestEDOSBaselines:
    def test_graphnetwork(self, edos_sample):
        s, batch = edos_sample
        model = GraphnetworkEDOS(layers=3, hidden=48)
        params = model.init(jax.random.PRNGKey(0), batch)
        dos, x = model.apply(params, batch)
        odos, ox = oracle.graphnetwork_edos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_attr, s.glob,
            n_layers=3)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(x)[0], ox.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_graphnetwork2(self, edos_sample):
        s, batch = edos_sample
        model = Graphnetwork2EDOS(layers=3, hidden=48)
        params = model.init(jax.random.PRNGKey(1), batch)
        dos, _ = model.apply(params, batch)
        odos, _ = oracle.graphnetwork2_edos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_attr, s.glob,
            n_layers=3)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_mlp(self, edos_sample):
        s, batch = edos_sample
        model = MLPEDOS(hidden=48)
        params = model.init(jax.random.PRNGKey(2), batch)
        dos = model.apply(params, batch)
        odos = oracle.mlp_edos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_attr, s.glob)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)


    def test_mlp2(self, edos_sample):
        s, batch = edos_sample
        model = MLP2EDOS(hidden=48)
        params = model.init(jax.random.PRNGKey(4), batch)
        dos = model.apply(params, batch)
        odos = oracle.mlp2_edos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_attr, s.glob)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def phdos_sample():
    (s,) = synthetic_phdos_samples(1, seed=31, min_atoms=5, max_atoms=5)
    batch = collate([s], atoms_per_graph=s.n_nodes,
                    edges_per_graph=s.n_edges, use_buckets=False)
    return s, batch


class TestPhDOSBaselines:
    def test_graphnetwork_phonon(self, phdos_sample):
        s, batch = phdos_sample
        model = GraphnetworkPhDOS(layers=3, hidden=48)
        params = model.init(jax.random.PRNGKey(3), batch)
        dos = model.apply(params, batch)
        odos = oracle.graphnetwork_phdos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_vec, n_layers=3)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_graphnetwork2_phonon(self, phdos_sample):
        s, batch = phdos_sample
        model = Graphnetwork2PhDOS(layers=3, hidden=48)
        params = model.init(jax.random.PRNGKey(5), batch)
        dos = model.apply(params, batch)
        odos = oracle.graphnetwork2_phdos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_vec, n_layers=3)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_mlp_phonon(self, phdos_sample):
        s, batch = phdos_sample
        model = MLPPhDOS(hidden=48)
        params = model.init(jax.random.PRNGKey(6), batch)
        dos = model.apply(params, batch)
        odos = oracle.mlp_phdos_forward(
            _np_tree(params), s.x, s.z, s.edge_vec, s.edge_shift)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_mlp2_phonon(self, phdos_sample):
        s, batch = phdos_sample
        model = MLP2PhDOS(hidden=48)
        params = model.init(jax.random.PRNGKey(7), batch)
        dos = model.apply(params, batch)
        odos = oracle.mlp2_phdos_forward(
            _np_tree(params), s.x, s.edge_index, s.edge_vec)
        np.testing.assert_allclose(np.asarray(dos), odos.numpy(),
                                   rtol=1e-4, atol=1e-4)
