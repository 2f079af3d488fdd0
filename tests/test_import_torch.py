"""Tests for the reference torch state_dict importer.

Two layers of evidence:

1. Key-schema fixtures: torch nn.Modules that replicate the REFERENCE's
   module attribute structure (reference embedder_eDOS/DOSTransformer.py:17-43,
   embedder_phDOS/*.py, layers/transformer.py:103-118) — Sequential index
   positions, ModuleList names, dead params included — so ``state_dict()``
   produces byte-authentic reference key strings. Import into each of our 10
   families must consume every live key, reject none, and place values on the
   right leaves (spot-checked incl. transposes).

2. End-to-end forward differential: weights flow through
   benchmarks/torch_reference.TorchDOSTransformerEDOS (an independent torch
   forward) and through our flax model after import; outputs must agree.
   This catches mis-wiring that shape checks cannot (e.g. swapping the two
   same-shape LayerNorms of a transformer layer).
"""

import os

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from dostransformer_tpu.data import (
    collate,
    synthetic_edos_samples,
    synthetic_phdos_samples,
)
from dostransformer_tpu.data.datasets import GraphLoader
from dostransformer_tpu.models.import_torch import (
    import_reference_state_dict,
    load_torch_state_dict,
)
from dostransformer_tpu.models.registry import build_model

H = 32
L = 2  # GNN layers
T = 2  # transformer layers


# ---------------------------------------------------------------------------
# reference-structure skeletons (naming fixtures: key strings + shapes only;
# no forward logic — the names are the interface under test)
# ---------------------------------------------------------------------------

def _enc(i, h):
    return nn.Sequential(nn.Linear(i, h), nn.PReLU(), nn.Linear(h, h))


def _block(i, m, o):
    return nn.Sequential(nn.Linear(i, m), nn.LayerNorm(m), nn.PReLU(),
                         nn.Linear(m, o))


class _Attn(nn.Module):
    """Dead attention params (multihead_attention.py:22-26)."""

    def __init__(self, d):
        super().__init__()
        self.in_proj_weight = nn.Parameter(torch.randn(3 * d, d))
        self.in_proj_bias = nn.Parameter(torch.randn(3 * d))
        self.out_proj = nn.Linear(d, d)


class _TrLayer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.self_attn = _Attn(d)
        self.fc1 = nn.Linear(d, 4 * d)
        self.fc2 = nn.Linear(4 * d, d)
        self.layer_norms = nn.ModuleList(nn.LayerNorm(d) for _ in range(2))


class _Tr(nn.Module):
    def __init__(self, d, n):
        super().__init__()
        self.layers = nn.ModuleList(_TrLayer(d) for _ in range(n))
        self.layer_norm = nn.LayerNorm(d)


class _EncoderEDOS(nn.Module):
    def __init__(self, h, prompt):
        super().__init__()
        self.node_encoder = _enc(200, h)
        if prompt:  # baseline Encoders only (graphnetwork.py:83)
            self.node_encoder_prompt = _enc(200 + h // 2, h)
        self.edge_encoder = _enc(41, h)
        self.global_encoder = _enc(2, h)


class _EncoderPhDOS(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.node_encoder = _enc(118, h)
        self.edge_encoder = _enc(4, h)


class _EdgeModel(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.edge_mlp = _block(3 * h, 2 * h, h)


class _NodeModel(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.node_mlp_1 = _block(2 * h, 2 * h, h)  # dead (DOSTransformer.py:181)
        self.node_mlp_2 = _block(2 * h, 2 * h, h)


class _Processor(nn.Module):
    def __init__(self, h):
        super().__init__()
        self.edge_model = _EdgeModel(h)
        self.node_model = _NodeModel(h)


def _procs(h, n):
    return nn.ModuleList(_Processor(h) for _ in range(n))


class _Decoder(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.mlp = nn.Sequential(nn.Linear(i, o))


def _out3(i, m, o):
    """Baseline out_layer: Sequential(Linear, LeakyReLU, Linear)."""
    return nn.Sequential(nn.Linear(i, m), nn.LeakyReLU(), nn.Linear(m, o))


class _FlagshipEDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(201, h)
        self.promt_token = nn.Embedding(7, h // 2)  # reference spelling
        self.GN_encoder = _EncoderEDOS(h, prompt=False)
        self.stacked_processor = _procs(h, L)
        self.transformer = _Tr(h, T)
        self.transformer_self = _Tr(h, T)
        self.transformer_source = _Tr(h, T)
        self.GN_decoder = _Decoder(2 * h, h)
        self.out_layer = nn.Linear(h, 1)
        self.fc_prompt = nn.Linear(2 * h + h // 2, h)
        self.fc = nn.Linear(2 * h, h)


class _FlagshipPhDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(51, h)
        self.prompt_token = nn.Embedding(7, h // 2)  # phDOS spelling
        self.GN_encoder = _EncoderPhDOS(h)
        self.stacked_processor = _procs(h, L)
        self.transformer = _Tr(h, T)
        self.transformer_self = _Tr(h, T)
        self.transformer_source = _Tr(h, T)
        self.GN_decoder = _Decoder(h, h)
        self.alpha = nn.Parameter(torch.rand(1))  # dead (:40)
        self.out_layer = nn.Linear(h, 1)
        self.fc = nn.Linear(2 * h, h)
        self.fc_prompt = nn.Linear(2 * h + h // 2, h)


class _GraphnetworkEDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(201, h)
        self.GN_encoder = _EncoderEDOS(h, prompt=True)
        self.stacked_processor = _procs(h, L)
        self.GN_decoder = _Decoder(2 * h, h)
        self.out_layer = _out3(2 * h, h, 1)


class _Graphnetwork2EDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.GN_encoder = _EncoderEDOS(h, prompt=True)
        self.stacked_processor = _procs(h, L)
        self.GN_decoder = _Decoder(2 * h, h)  # dead (graphnetwork.py:56)
        self.alpha = nn.Parameter(torch.rand(1))
        self.out_layer = _out3(2 * h, h, 201)


class _MLPEDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(201, h)
        self.GN_encoder = _EncoderEDOS(h, prompt=True)
        self.GN_decoder = _Decoder(2 * h, h)
        self.out_layer = _out3(2 * h, h, 1)


class _MLP2EDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.GN_encoder = _EncoderEDOS(h, prompt=True)
        self.out_layer = _out3(2 * h, h, 201)


class _GraphnetworkPhDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(51, h)
        self.GN_encoder = _EncoderPhDOS(h)
        self.stacked_processor = _procs(h, L)
        self.GN_decoder = _Decoder(h, h)
        self.out_layer = _out3(2 * h, h, 1)


class _Graphnetwork2PhDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.GN_encoder = _EncoderPhDOS(h)
        self.stacked_processor = _procs(h, L)
        self.out_layer = _out3(h, h // 2, 51)


class _EncoderMLPPhDOS(nn.Module):
    """mlp_phonon feeds the 3-d ``edge_shift`` into its edge encoder
    (mlp_phonon.py:28); the reference constructs it 4-wide and would crash
    (SURVEY §2.3-4) — our model implements the 3-d intent, so a usable
    checkpoint has a 3-wide first edge Linear."""

    def __init__(self, h):
        super().__init__()
        self.node_encoder = _enc(118, h)
        self.edge_encoder = _enc(3, h)


class _MLPPhDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.embeddings = nn.Embedding(51, h)
        self.GN_encoder = _EncoderMLPPhDOS(h)
        self.GN_decoder = _Decoder(2 * h, h)
        self.out_layer = _block(2 * h, h, 1)  # mlp_phonon.py:20


class _MLP2PhDOS(nn.Module):
    def __init__(self, h=H):
        super().__init__()
        self.GN_encoder = _EncoderPhDOS(h)
        self.out_layer = _out3(h, h, 51)


SKELETONS = {
    ("edos", "dostransformer"): _FlagshipEDOS,
    ("edos", "graphnetwork"): _GraphnetworkEDOS,
    ("edos", "graphnetwork2"): _Graphnetwork2EDOS,
    ("edos", "mlp"): _MLPEDOS,
    ("edos", "mlp2"): _MLP2EDOS,
    ("phdos", "dostransformer"): _FlagshipPhDOS,
    ("phdos", "graphnetwork"): _GraphnetworkPhDOS,
    ("phdos", "graphnetwork2"): _Graphnetwork2PhDOS,
    ("phdos", "mlp"): _MLPPhDOS,
    ("phdos", "mlp2"): _MLP2PhDOS,
}


@pytest.fixture(scope="module")
def batches():
    be = next(iter(GraphLoader(synthetic_edos_samples(4, seed=0),
                               batch_size=2)))
    bp = next(iter(GraphLoader(synthetic_phdos_samples(4, seed=0),
                               batch_size=2)))
    return {"edos": be, "phdos": bp}


@pytest.mark.parametrize("task,name", sorted(SKELETONS))
def test_import_all_families(task, name, batches):
    torch.manual_seed(hash((task, name)) % 2**31)
    sd = {k: v.detach().numpy() for k, v in
          SKELETONS[(task, name)]().state_dict().items()}
    model = build_model(task, name, layers=L, t_layers=T, hidden=H)
    template = model.init(jax.random.PRNGKey(0), batches[task])
    imported = import_reference_state_dict(sd, template)

    # identical tree structure, every leaf replaced with the torch value
    assert (jax.tree_util.tree_structure(imported)
            == jax.tree_util.tree_structure(template))
    for (path, tmpl), (_, got) in zip(
            jax.tree_util.tree_flatten_with_path(template)[0],
            jax.tree_util.tree_flatten_with_path(imported)[0]):
        assert got.shape == tmpl.shape and got.dtype == tmpl.dtype, path

    p = imported["params"]
    if name == "dostransformer":
        emb = "embeddings.weight"
        np.testing.assert_array_equal(np.asarray(p["embeddings"]), sd[emb])
        np.testing.assert_array_equal(np.asarray(p["fc"]["kernel"]),
                                      sd["fc.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(p["transformer"]["layer0"]["ln0"]["ln"]["scale"]),
            sd["transformer.layers.0.layer_norms.0.weight"])
        np.testing.assert_array_equal(
            np.asarray(p["transformer"]["layer1"]["ln1"]["bias"]),
            sd["transformer.layers.1.layer_norms.1.bias"])
        np.testing.assert_array_equal(
            np.asarray(p["transformer"]["final_ln"]["scale"]),
            sd["transformer.layer_norm.weight"])
        np.testing.assert_array_equal(
            np.asarray(
                p["processor1"]["node_model"]["node_mlp_2"]["lin1"]["kernel"]),
            sd["stacked_processor.1.node_model.node_mlp_2.3.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(
                p["processor0"]["edge_model"]["edge_mlp"]["prelu"]["alpha"]),
            sd["stacked_processor.0.edge_model.edge_mlp.2.weight"])
        np.testing.assert_array_equal(
            np.asarray(p["GN_decoder"]["mlp"]["kernel"]),
            sd["GN_decoder.mlp.0.weight"].T)
        key = ("promt_token.weight" if task == "edos"
               else "prompt_token.weight")
        np.testing.assert_array_equal(np.asarray(p["prompt_token"]), sd[key])
    if name in ("graphnetwork", "graphnetwork2", "mlp", "mlp2") and "out0" in p:
        np.testing.assert_array_equal(np.asarray(p["out0"]["kernel"]),
                                      sd["out_layer.0.weight"].T)
        np.testing.assert_array_equal(np.asarray(p["out1"]["kernel"]),
                                      sd["out_layer.2.weight"].T)
    if (task, name) == ("phdos", "mlp"):
        np.testing.assert_array_equal(np.asarray(p["decoder"]["kernel"]),
                                      sd["GN_decoder.mlp.0.weight"].T)
        np.testing.assert_array_equal(
            np.asarray(p["node_encoder"]["lin0"]["bias"]),
            sd["GN_encoder.node_encoder.0.bias"])
        np.testing.assert_array_equal(np.asarray(p["out_layer"]["ln"]["scale"]),
                                      sd["out_layer.1.weight"])


def test_strict_rejects_unknown_keys(batches):
    sd = {k: v.detach().numpy() for k, v in _FlagshipEDOS().state_dict().items()}
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    model = build_model("edos", "dostransformer", layers=L, t_layers=T, hidden=H)
    template = model.init(jax.random.PRNGKey(0), batches["edos"])
    with pytest.raises(ValueError, match="mystery"):
        import_reference_state_dict(sd, template)
    # non-strict ignores it
    import_reference_state_dict(sd, template, strict=False)


def test_missing_key_and_shape_mismatch(batches):
    model = build_model("edos", "dostransformer", layers=L, t_layers=T, hidden=H)
    template = model.init(jax.random.PRNGKey(0), batches["edos"])
    sd = {k: v.detach().numpy() for k, v in _FlagshipEDOS().state_dict().items()}
    missing = dict(sd)
    del missing["fc.weight"]
    with pytest.raises(KeyError, match="fc.weight"):
        import_reference_state_dict(missing, template)
    bad = dict(sd)
    bad["fc.weight"] = bad["fc.weight"][:, :-1]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_reference_state_dict(bad, template)


def test_phdos_f64_cast(batches):
    """phDOS reference weights are float64 (main_phDOS.py:14-16)."""
    sd = {k: v.detach().numpy().astype(np.float64)
          for k, v in _FlagshipPhDOS().state_dict().items()}
    model = build_model("phdos", "dostransformer", layers=L, t_layers=T,
                        hidden=H)
    template = model.init(jax.random.PRNGKey(0), batches["phdos"])
    imported = import_reference_state_dict(sd, template)
    for leaf in jax.tree_util.tree_leaves(imported):
        assert leaf.dtype == np.float32


def test_load_torch_state_dict_roundtrip(tmp_path, batches):
    skel = _FlagshipEDOS()
    path = os.path.join(tmp_path, "ref_model.pt")
    torch.save(skel.state_dict(), path)
    sd = load_torch_state_dict(path)
    model = build_model("edos", "dostransformer", layers=L, t_layers=T,
                        hidden=H)
    template = model.init(jax.random.PRNGKey(0), batches["edos"])
    imported = import_reference_state_dict(sd, template)
    np.testing.assert_array_equal(
        np.asarray(imported["params"]["embeddings"]),
        skel.state_dict()["embeddings.weight"].numpy())


def test_load_torch_state_dict_unwraps_checkpoint_wrapper(tmp_path):
    """The common {'state_dict': ..., metadata...} wrapper unwraps even when
    sibling metadata itself holds tensors (e.g. a best-loss scalar)."""
    skel = _FlagshipEDOS()
    path = os.path.join(tmp_path, "ckpt.pt")
    torch.save({"state_dict": skel.state_dict(), "epoch": 5,
                "best_loss": torch.tensor(0.3)}, path)
    sd = load_torch_state_dict(path)
    assert "embeddings.weight" in sd and "best_loss" not in sd


def test_export_requires_task_for_prompt_models(batches):
    from dostransformer_tpu.models.import_torch import (
        export_reference_state_dict,
    )

    model = build_model("edos", "dostransformer", layers=L, t_layers=T,
                        hidden=H)
    params = model.init(jax.random.PRNGKey(2), batches["edos"])
    with pytest.raises(ValueError, match="task"):
        export_reference_state_dict(params)
    # prompt-free families need no task
    m2 = build_model("edos", "mlp2", hidden=H)
    p2 = m2.init(jax.random.PRNGKey(2), batches["edos"])
    assert "out_layer.0.weight" in export_reference_state_dict(p2)


@pytest.mark.parametrize("task", ["edos", "phdos"])
def test_export_import_roundtrip(task, batches):
    """export_reference_state_dict is the exact inverse of the import, and
    its key set matches the live (non-dead) reference keys."""
    from dostransformer_tpu.models.import_torch import (
        export_reference_state_dict,
    )

    model = build_model(task, "dostransformer", layers=L, t_layers=T, hidden=H)
    params = model.init(jax.random.PRNGKey(9), batches[task])
    sd = export_reference_state_dict(params, task=task)
    spelled = "promt_token.weight" if task == "edos" else "prompt_token.weight"
    assert spelled in sd
    assert sd["fc.weight"].shape == (H, 2 * H)  # torch [out, in] layout
    back = import_reference_state_dict(sd, params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    # torch side can consume it modulo dead params
    skel = (_FlagshipEDOS if task == "edos" else _FlagshipPhDOS)()
    missing, unexpected = skel.load_state_dict(
        {k: torch.as_tensor(v.copy()) for k, v in sd.items()}, strict=False)
    assert not unexpected
    assert all(".self_attn." in k or ".node_mlp_1." in k or k == "alpha"
               for k in missing), missing


def test_serve_cli_torch_state_dict(tmp_path):
    """main_serve builds a server straight from reference torch weights."""
    from dostransformer_tpu.cli.main_serve import build_server
    from dostransformer_tpu.data.io import save_samples

    torch.manual_seed(13)
    pt = os.path.join(tmp_path, "ref.pt")
    torch.save(_FlagshipEDOS().state_dict(), pt)
    samples = synthetic_edos_samples(2, seed=6)
    ex = os.path.join(tmp_path, "ex.npz")
    save_samples(ex, samples)
    server = build_server(
        ["--task", "edos", "--torch_state_dict", pt, "--example", ex,
         "--layers", str(L), "--transformer", str(T), "--hidden", str(H),
         "--port", "0"])
    try:
        dos = server.predictor.predict(samples)
        assert dos.shape == (2, 201) and np.isfinite(dos).all()
    finally:
        server.server_close()


def test_predictor_from_torch_and_cli(tmp_path):
    """Serving migration: Predictor.from_torch and the main_predict
    --torch_state_dict flag produce identical predictions."""
    from dostransformer_tpu.cli import main_predict
    from dostransformer_tpu.data.io import save_samples
    from dostransformer_tpu.serve import Predictor

    torch.manual_seed(11)
    pt = os.path.join(tmp_path, "ref.pt")
    torch.save(_FlagshipEDOS().state_dict(), pt)
    samples = synthetic_edos_samples(4, seed=5)

    pred = Predictor.from_torch(pt, task="edos", example=samples[0],
                                layers=L, t_layers=T, hidden=H)
    dos = pred.predict(samples)
    assert dos.shape == (4, 201) and np.isfinite(dos).all()

    inp = os.path.join(tmp_path, "in.npz")
    out = os.path.join(tmp_path, "out.npz")
    save_samples(inp, samples)
    dos_cli = main_predict.main(
        ["--task", "edos", "--torch_state_dict", pt, "--input", inp,
         "--output", out, "--layers", str(L), "--transformer", str(T),
         "--hidden", str(H)])
    np.testing.assert_allclose(np.asarray(dos_cli), np.asarray(dos),
                               rtol=1e-6, atol=1e-6)
    assert os.path.exists(out)
    # source flags are mutually exclusive
    with pytest.raises(SystemExit):
        main_predict.main(
            ["--task", "edos", "--torch_state_dict", pt,
             "--checkpoint_dir", "somewhere", "--input", inp, "--output", out])


def test_predict_metrics_flag(tmp_path, capsys):
    """--metrics evaluates predictions vs carried targets with reference
    eval semantics and stores the scalars in the output npz."""
    import json

    from dostransformer_tpu.cli import main_predict
    from dostransformer_tpu.data.io import save_samples
    from dostransformer_tpu.train.metrics import r2_variance_weighted

    torch.manual_seed(21)
    pt = os.path.join(tmp_path, "ref.pt")
    torch.save(_FlagshipEDOS().state_dict(), pt)
    samples = synthetic_edos_samples(4, seed=8)
    inp = os.path.join(tmp_path, "in.npz")
    out = os.path.join(tmp_path, "out.npz")
    save_samples(inp, samples)
    dos = main_predict.main(
        ["--task", "edos", "--torch_state_dict", pt, "--input", inp,
         "--output", out, "--layers", str(L), "--transformer", str(T),
         "--hidden", str(H), "--metrics"])
    line = next(ln for ln in capsys.readouterr().out.splitlines()
                if ln.startswith("{"))
    m = json.loads(line)["metrics"]
    ys = np.clip(np.stack([s.y for s in samples]).astype(np.float64), 0, None)
    preds = np.asarray(dos, np.float64)
    np.testing.assert_allclose(
        m["rmse"], np.sqrt(((ys - preds) ** 2).mean(-1)).mean(), rtol=1e-9)
    np.testing.assert_allclose(
        m["r2"], np.mean([r2_variance_weighted(y, pp)
                          for y, pp in zip(ys, preds)]), rtol=1e-9)
    saved = np.load(out)
    assert float(saved["rmse"]) == m["rmse"] and int(saved["n"]) == 4


def test_train_warm_start_init_torch(tmp_path, capsys):
    """--init_torch warm-starts training from reference torch weights."""
    from dostransformer_tpu.cli import main_phdos

    torch.manual_seed(12)
    pt = os.path.join(tmp_path, "ref_phdos.pt")
    torch.save(_FlagshipPhDOS().state_dict(), pt)
    main_phdos.main(
        ["--synthetic", "16", "--epochs", "2", "--eval", "2", "--es", "50",
         "--layers", str(L), "--transformer", str(T), "--hidden", str(H),
         "--batch_size", "4", "--init_torch", pt,
         "--results_dir", str(tmp_path)])
    assert "initialized params from torch state_dict" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# end-to-end: independent torch forward vs our forward after import
# ---------------------------------------------------------------------------

def _reference_named(sd):
    """Rename TorchDOSTransformerEDOS keys to the reference's state_dict
    names (independent of the importer's own rewrite logic)."""
    top = {
        "energy_emb": "embeddings", "prompt_emb": "promt_token",
        "node_enc": "GN_encoder.node_encoder",
        "edge_enc": "GN_encoder.edge_encoder",
        "glob_enc": "GN_encoder.global_encoder",
        "procs": "stacked_processor", "tr_cross": "transformer",
        "tr_self": "transformer_self", "tr_source": "transformer_source",
        "dec": "GN_decoder.mlp.0", "out": "out_layer",
        "fc": "fc", "fc_prompt": "fc_prompt",
    }
    out = {}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        nk = top[head] + ("." + rest if rest else "")
        nk = nk.replace(".edge_mlp.", ".edge_model.edge_mlp.")
        nk = nk.replace(".node_mlp.", ".node_model.node_mlp_2.")
        nk = nk.replace(".ln0.", ".layer_norms.0.")
        nk = nk.replace(".ln1.", ".layer_norms.1.")
        nk = nk.replace(".final_ln.", ".layer_norm.")
        out[nk] = v.detach().numpy()
    return out


def test_end_to_end_forward_parity():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.torch_reference import TorchDOSTransformerEDOS

    torch.manual_seed(7)
    tmodel = TorchDOSTransformerEDOS(h=H, layers=L, t_layers=T)
    sd = _reference_named(tmodel.state_dict())

    samples = synthetic_edos_samples(2, seed=3, min_atoms=5, max_atoms=9)
    a_pad = max(s.n_nodes for s in samples)
    e_pad = max(s.n_edges for s in samples)
    batch = collate(samples, atoms_per_graph=a_pad, edges_per_graph=e_pad,
                    use_buckets=False)

    model = build_model("edos", "dostransformer", layers=L, t_layers=T,
                        hidden=H, padding="ref")
    template = model.init(jax.random.PRNGKey(0), batch)
    params = import_reference_state_dict(sd, template)
    dg, _, ds = model.apply(params, batch, deterministic=True)

    # independent torch forward over the ragged concatenation
    xs, eis, eas, globs, systems, bvec = [], [], [], [], [], []
    off = 0
    for g, sm in enumerate(samples):
        xs.append(torch.as_tensor(sm.x, dtype=torch.float32))
        eis.append(torch.as_tensor(sm.edge_index, dtype=torch.long) + off)
        eas.append(torch.as_tensor(sm.edge_attr, dtype=torch.float32))
        globs.append(torch.as_tensor(sm.glob, dtype=torch.float32))
        systems.append(sm.system)
        bvec.append(torch.full((sm.n_nodes,), g, dtype=torch.long))
        off += sm.n_nodes
    with torch.no_grad():
        tdg, tds = tmodel(torch.cat(xs), torch.cat(eis, dim=1),
                          torch.cat(eas), torch.stack(globs),
                          torch.as_tensor(systems), torch.cat(bvec),
                          len(samples))
    np.testing.assert_allclose(np.asarray(dg), tdg.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ds), tds.numpy(),
                               rtol=1e-4, atol=1e-4)
