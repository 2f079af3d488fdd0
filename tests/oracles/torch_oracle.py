"""Independent PyTorch oracle for golden-parity tests.

Re-implements the *behavior* of the reference models (as documented in
SURVEY.md §2.2/§3.3) using plain torch ops (no torch_scatter/PyG — scatter via
index_add), parameterized by the flax param pytree so both frameworks compute
with identical weights. This is the "recorded reference activations" strategy
of SURVEY.md §4, with the oracle generated on the fly.

Functional style: every function takes (params_subtree, tensors) -> tensor.
All math in torch float32 (double=False) or float64 for tight tolerances.
"""

from __future__ import annotations

import numpy as np
import torch

DTYPE = torch.float64  # run the oracle in f64: isolates our kernels' f32 error


def t(x) -> torch.Tensor:
    return torch.as_tensor(np.asarray(x), dtype=DTYPE)


def linear(p, x):
    return x @ t(p["kernel"]) + t(p["bias"])


def prelu(p, x):
    a = t(p["alpha"])
    return torch.clamp(x, min=0) + a * torch.clamp(x, max=0)


def layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * t(p["scale"]) + t(p["bias"])


def mlp2(p, x):
    """Linear -> PReLU -> Linear (encoder MLP)."""
    return linear(p["lin1"], prelu(p["prelu"], linear(p["lin0"], x)))


def mlp_block(p, x):
    """Linear -> LayerNorm -> PReLU -> Linear (Edge/NodeModel MLP)."""
    h = linear(p["lin0"], x)
    h = layer_norm(p["ln"], h)
    h = prelu(p["prelu"], h)
    return linear(p["lin1"], h)


def scatter_sum(src, index, dim_size):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add(0, torch.as_tensor(index, dtype=torch.long), src)


def scatter_mean(src, index, dim_size):
    s = scatter_sum(src, index, dim_size)
    cnt = scatter_sum(torch.ones(src.shape[0], dtype=src.dtype), index, dim_size)
    return s / cnt.clamp(min=1).unsqueeze(-1)


def processor(p, x, senders, receivers, edge_attr, aggregation="sum"):
    """EdgeModel then NodeModel (reference DOSTransformer.py:137-148)."""
    src, dst = x[senders], x[receivers]
    e = mlp_block(p["edge_model"]["edge_mlp"],
                  torch.cat([src, dst, edge_attr], dim=-1))
    agg = (scatter_sum if aggregation == "sum" else scatter_mean)(
        e, receivers, x.shape[0])
    xn = mlp_block(p["node_model"]["node_mlp_2"], torch.cat([x, agg], dim=-1))
    return xn, e


# The genuine reference softmaxes at EXACTLY f32 via `.float()` — a DOWNCAST
# under its f64 phDOS training (multihead_attention.py:69; verified against
# the real code in tests/test_reference_parity.py). The x64 pin tests set
# SOFTMAX_WIDE=True on BOTH sides (env DOSTPU_SOFTMAX_WIDE=1 for ours) to
# keep softmax at the operand dtype and isolate everything else at 1e-10.
SOFTMAX_WIDE = False


def attention(q, k, v):
    """Projection-free softmax(QK^T d^-0.5)V (multihead_attention.py:68-76).
    Batch-first [B, L, D]."""
    d = q.shape[-1]
    w = torch.bmm(q, k.transpose(1, 2)) * d ** -0.5
    w = torch.softmax(w if SOFTMAX_WIDE else w.float(), dim=-1).type_as(w)
    return torch.bmm(w, v)


def transformer_layer(p, x, x_k, x_v):
    """Pre-LN layer (transformer.py:120-150): shared LN0 on q/k/v, attn,
    residual; LN1, 4x FFN ReLU, residual."""
    ln0 = p["ln0"]["ln"]
    residual = x
    q, k, v = layer_norm(ln0, x), layer_norm(ln0, x_k), layer_norm(ln0, x_v)
    x = residual + attention(q, k, v)
    residual = x
    h = layer_norm(p["ln1"], x)
    h = torch.relu(linear(p["fc1"], h))
    h = linear(p["fc2"], h)
    return residual + h


def transformer_encoder(p, x_in, x_k_in=None, x_v_in=None, n_layers=2):
    """Stack + final LN; k/v streams FIXED across layers (transformer.py:63-77)."""
    x = x_in
    x_k = x_in if x_k_in is None else x_k_in
    x_v = x_in if x_v_in is None else x_v_in
    for i in range(n_layers):
        x = transformer_layer(p[f"layer{i}"], x, x_k, x_v)
    return layer_norm(p["final_ln"], x)


def sh_l1_component(vec):
    """e3nn SH l<=1, normalize=True, 'component': [1, sqrt(3)*(x,y,z)/r]
    (e3nn's generated sh_1_* polynomials are the identity on the input
    components — see ops/geometry.spherical_harmonics_l1)."""
    r = vec.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    return torch.cat([torch.ones_like(r), np.sqrt(3.0) * vec / r], dim=-1)


def smooth_cutoff(x):
    u = 2.0 * (x - 1.0)
    y = (1.0 - torch.cos(np.pi * u)) / 2.0
    y = torch.where(u > 0, torch.zeros_like(y), y)
    y = torch.where(u < -1, torch.ones_like(y), y)
    return y


def dostransformer_edos_forward(params, x, edge_index, edge_attr, glob, system,
                                n_layers=3, t_layers=2, n_bins=201):
    """Full eDOS flagship forward, single graph (B=1), no padding.
    Mirrors reference DOSTransformer.forward (DOSTransformer.py:45-93)."""
    p = params["params"] if "params" in params else params
    x, edge_attr, glob = t(x), t(edge_attr), t(glob).reshape(1, -1)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)

    energies = t(p["embeddings"]).unsqueeze(0)          # [1, bins, h]
    enc = p["GN_encoder"]
    h_x = mlp2(enc["node_encoder"], x)
    h_e = mlp2(enc["edge_encoder"], edge_attr)
    u = mlp2(enc["global_encoder"], glob)

    for i in range(n_layers):
        out_x, out_e = processor(p[f"processor{i}"], h_x, senders, receivers,
                                 h_e, "sum")
        h_x = h_x + out_x
        h_e = h_e + out_e

    x_dense = h_x.unsqueeze(0)                          # [1, A, h]
    energies = transformer_encoder(p["transformer"], energies, x_dense, x_dense,
                                   t_layers)

    pooled = h_x.sum(0, keepdim=True)                   # scatter_sum, B=1
    graph = linear(p["GN_decoder"]["mlp"], torch.cat([u, pooled], dim=-1))
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)

    def head(dos_in):
        d = transformer_encoder(p["transformer_self"], dos_in, dos_in, dos_in,
                                t_layers)
        d = transformer_encoder(p["transformer_source"], d, x_dense, x_dense,
                                t_layers)
        return linear(p["out_layer"], d)[..., 0]

    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc"], torch.cat([energies, graph], dim=-1)))
    dos_global = head(dos_in)

    prompt = t(p["prompt_token"])[int(system)].reshape(1, 1, -1).expand(1, n_bins, -1)
    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc_prompt"], torch.cat([energies, graph, prompt], dim=-1)))
    dos_system = head(dos_in)
    return dos_global, h_x, dos_system


def _gnn_encode_and_process(p, x, edge_attr, senders, receivers, n_layers,
                            aggregation):
    h_x = mlp2(p["GN_encoder"]["node_encoder"], x)
    h_e = mlp2(p["GN_encoder"]["edge_encoder"], edge_attr)
    for i in range(n_layers):
        out_x, out_e = processor(p[f"processor{i}"], h_x, senders, receivers,
                                 h_e, aggregation)
        h_x = h_x + out_x
        h_e = h_e + out_e
    return h_x, h_e


def dostransformer_edos_forward_batched(params, graphs, n_layers=3,
                                        t_layers=2, n_bins=201):
    """Batched eDOS flagship forward with the reference's batch semantics:
    ragged concatenation + batch vector, scatter by GLOBAL node index,
    to_dense_batch zero-padding, and NO attention key mask
    (DOSTransformer.py:61-63 — padded zero rows act as keys).

    graphs: list of dicts with x, edge_index, edge_attr, glob, system.
    Returns (dos_global [B, bins], node_emb [N_total, h], dos_system).
    """
    p = params["params"] if "params" in params else params
    b = len(graphs)
    xs, eis, eas, globs, systems, batch_vec = [], [], [], [], [], []
    off = 0
    for gi, g in enumerate(graphs):
        n = g["x"].shape[0]
        xs.append(t(g["x"]))
        eis.append(torch.as_tensor(g["edge_index"], dtype=torch.long) + off)
        eas.append(t(g["edge_attr"]))
        globs.append(t(g["glob"]).reshape(-1))
        systems.append(int(g["system"]))
        batch_vec.append(torch.full((n,), gi, dtype=torch.long))
        off += n
    x = torch.cat(xs)
    senders, receivers = torch.cat(eis, dim=1)
    edge_attr = torch.cat(eas)
    glob = torch.stack(globs)
    batch_vec = torch.cat(batch_vec)

    energies = t(p["embeddings"]).unsqueeze(0).expand(b, -1, -1).clone()
    enc = p["GN_encoder"]
    h_x = mlp2(enc["node_encoder"], x)
    h_e = mlp2(enc["edge_encoder"], edge_attr)
    u = mlp2(enc["global_encoder"], glob)

    for i in range(n_layers):
        out_x, out_e = processor(p[f"processor{i}"], h_x, senders, receivers,
                                 h_e, "sum")
        h_x = h_x + out_x
        h_e = h_e + out_e

    # to_dense_batch: [B, A_max, h] zero-padded, NO mask
    counts = torch.bincount(batch_vec, minlength=b)
    a_max = int(counts.max())
    dense = torch.zeros(b, a_max, h_x.shape[-1], dtype=h_x.dtype)
    pos = torch.cat([torch.arange(int(c)) for c in counts])
    dense[batch_vec, pos] = h_x

    energies = transformer_encoder(p["transformer"], energies, dense, dense,
                                   t_layers)
    pooled = scatter_sum(h_x, batch_vec, b)
    graph = linear(p["GN_decoder"]["mlp"], torch.cat([u, pooled], dim=-1))
    graph = graph.unsqueeze(1).expand(b, n_bins, -1)

    def head(dos_in):
        d = transformer_encoder(p["transformer_self"], dos_in, dos_in, dos_in,
                                t_layers)
        d = transformer_encoder(p["transformer_source"], d, dense, dense,
                                t_layers)
        return linear(p["out_layer"], d)[..., 0]

    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc"], torch.cat([energies, graph], dim=-1)))
    dos_global = head(dos_in)
    prompt = t(p["prompt_token"])[systems].unsqueeze(1).expand(b, n_bins, -1)
    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc_prompt"], torch.cat([energies, graph, prompt], dim=-1)))
    dos_system = head(dos_in)
    return dos_global, h_x, dos_system


def graphnetwork_edos_forward(params, x, edge_index, edge_attr, glob,
                              n_layers=3, n_bins=201):
    """Graphnetwork baseline (graphnetwork.py:10-43), single graph."""
    p = params["params"] if "params" in params else params
    x, edge_attr, glob = t(x), t(edge_attr), t(glob).reshape(1, -1)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)

    h_x, _ = _gnn_encode_and_process(p, x, edge_attr, senders, receivers,
                                     n_layers, "sum")
    u = mlp2(p["GN_encoder"]["global_encoder"], glob)
    pooled = h_x.sum(0, keepdim=True)
    graph = linear(p["GN_decoder"]["mlp"], torch.cat([u, pooled], dim=-1))
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)
    energies = t(p["embeddings"]).unsqueeze(0)
    h = torch.nn.functional.leaky_relu(
        linear(p["out0"], torch.cat([energies, graph], dim=-1)))
    return linear(p["out1"], h)[..., 0], h_x


def graphnetwork2_edos_forward(params, x, edge_index, edge_attr, glob,
                               n_layers=3):
    """Graphnetwork2 baseline (graphnetwork.py:48-74): [pooled, glob] order."""
    p = params["params"] if "params" in params else params
    x, edge_attr, glob = t(x), t(edge_attr), t(glob).reshape(1, -1)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)

    h_x, _ = _gnn_encode_and_process(p, x, edge_attr, senders, receivers,
                                     n_layers, "sum")
    u = mlp2(p["GN_encoder"]["global_encoder"], glob)
    pooled = h_x.sum(0, keepdim=True)
    h = torch.nn.functional.leaky_relu(
        linear(p["out0"], torch.cat([pooled, u], dim=-1)))
    return linear(p["out1"], h), h_x


def mlp_edos_forward(params, x, edge_index, edge_attr, glob, n_bins=201):
    """mlp baseline (mlp.py:11-35): encode, decode, per-energy readout."""
    p = params["params"] if "params" in params else params
    x, edge_attr, glob = t(x), t(edge_attr), t(glob).reshape(1, -1)
    h_x = mlp2(p["GN_encoder"]["node_encoder"], x)
    u = mlp2(p["GN_encoder"]["global_encoder"], glob)
    pooled = h_x.sum(0, keepdim=True)
    graph = linear(p["GN_decoder"]["mlp"], torch.cat([u, pooled], dim=-1))
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)
    energies = t(p["embeddings"]).unsqueeze(0)
    h = torch.nn.functional.leaky_relu(
        linear(p["out0"], torch.cat([energies, graph], dim=-1)))
    return linear(p["out1"], h)[..., 0]


def graphnetwork_phdos_forward(params, x, edge_index, edge_vec,
                               n_layers=3, n_bins=51, r_max=4.0):
    """Graphnetwork_phonon baseline (graphnetwork_phonon.py:14-72)."""
    p = params["params"] if "params" in params else params
    x, edge_vec = t(x), t(edge_vec)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)

    edge_sh = sh_l1_component(edge_vec)
    edge_attr = smooth_cutoff(edge_vec.norm(dim=-1) / r_max).unsqueeze(-1) * edge_sh
    h_x, _ = _gnn_encode_and_process(p, x, edge_attr, senders, receivers,
                                     n_layers, "mean")
    pooled = h_x.sum(0, keepdim=True)
    graph = linear(p["GN_decoder"]["mlp"], pooled)
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)
    energies = t(p["embeddings"]).unsqueeze(0)
    h = torch.nn.functional.leaky_relu(
        linear(p["out0"], torch.cat([energies, graph], dim=-1)))
    return linear(p["out1"], h)[..., 0]


def mlp2_edos_forward(params, x, edge_index, edge_attr, glob):
    """mlp2 baseline (mlp.py:41-56): encode, pool, [pooled, glob] readout."""
    p = params["params"] if "params" in params else params
    x, glob = t(x), t(glob).reshape(1, -1)
    h_x = mlp2(p["GN_encoder"]["node_encoder"], x)
    u = mlp2(p["GN_encoder"]["global_encoder"], glob)
    pooled = h_x.sum(0, keepdim=True)
    h = torch.nn.functional.leaky_relu(
        linear(p["out0"], torch.cat([pooled, u], dim=-1)))
    return linear(p["out1"], h)


def graphnetwork2_phdos_forward(params, x, edge_index, edge_vec,
                                n_layers=3, r_max=4.0):
    """Graphnetwork2_phonon (graphnetwork_phonon.py:78-124, intent fix):
    GNN, sum-pool, Linear(h->h/2)->LeakyReLU->Linear(h/2->51)."""
    p = params["params"] if "params" in params else params
    x, edge_vec = t(x), t(edge_vec)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)
    edge_sh = sh_l1_component(edge_vec)
    edge_attr = smooth_cutoff(edge_vec.norm(dim=-1) / r_max).unsqueeze(-1) * edge_sh
    h_x, _ = _gnn_encode_and_process(p, x, edge_attr, senders, receivers,
                                     n_layers, "mean")
    pooled = h_x.sum(0, keepdim=True)
    h = torch.nn.functional.leaky_relu(linear(p["out0"], pooled))
    return linear(p["out1"], h)


def mlp_phdos_forward(params, x, z, edge_vec, edge_shift, n_bins=51,
                      r_max=4.0):
    """mlp_phonon (mlp_phonon.py:12-35, intent fixes): edge feature =
    cutoff * edge_shift; shared node encoder over x and z; decoder
    Linear(2h->h)([sum z_enc, sum x_enc]); MLPBlock readout per energy."""
    p = params["params"] if "params" in params else params
    x, z, edge_vec, edge_shift = t(x), t(z), t(edge_vec), t(edge_shift)
    _ = smooth_cutoff(edge_vec.norm(dim=-1) / r_max).unsqueeze(-1) * edge_shift
    h_x = mlp2(p["node_encoder"], x)
    h_z = mlp2(p["node_encoder"], z)
    pooled = torch.cat([h_z.sum(0, keepdim=True), h_x.sum(0, keepdim=True)],
                       dim=-1)
    graph = linear(p["decoder"], pooled)
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)
    energies = t(p["embeddings"]).unsqueeze(0)
    return mlp_block(p["out_layer"],
                     torch.cat([energies, graph], dim=-1))[..., 0]


def mlp2_phdos_forward(params, x, edge_index, edge_vec, r_max=4.0):
    """mlp2_phonon (mlp_phonon.py:39-78, intent fix): encode nodes, sum-pool,
    Linear(h->h)->LeakyReLU->Linear(h->51)."""
    p = params["params"] if "params" in params else params
    x = t(x)
    h_x = mlp2(p["GN_encoder"]["node_encoder"], x)
    pooled = h_x.sum(0, keepdim=True)
    h = torch.nn.functional.leaky_relu(linear(p["out0"], pooled))
    return linear(p["out1"], h)


def dostransformer_phdos_forward(params, x, edge_index, edge_vec, system,
                                 n_layers=3, t_layers=2, n_bins=51, r_max=4.0):
    """Full phDOS flagship forward, single graph (B=1)
    (DOSTransformer_phonon.py:66-119)."""
    p = params["params"] if "params" in params else params
    x, edge_vec = t(x), t(edge_vec)
    senders = torch.as_tensor(edge_index[0], dtype=torch.long)
    receivers = torch.as_tensor(edge_index[1], dtype=torch.long)

    edge_sh = sh_l1_component(edge_vec)
    edge_len = edge_vec.norm(dim=-1)
    edge_attr = smooth_cutoff(edge_len / r_max).unsqueeze(-1) * edge_sh

    energies = t(p["embeddings"]).unsqueeze(0)
    enc = p["GN_encoder"]
    h_x = mlp2(enc["node_encoder"], x)
    h_e = mlp2(enc["edge_encoder"], edge_attr)

    for i in range(n_layers):
        out_x, out_e = processor(p[f"processor{i}"], h_x, senders, receivers,
                                 h_e, "mean")
        h_x = h_x + out_x
        h_e = h_e + out_e

    x_dense = h_x.unsqueeze(0)
    energies = transformer_encoder(p["transformer"], energies, x_dense, x_dense,
                                   t_layers)

    pooled = h_x.sum(0, keepdim=True)
    graph = linear(p["GN_decoder"]["mlp"], pooled)
    graph = graph.unsqueeze(1).expand(1, n_bins, -1)

    def head(dos_in):
        d = transformer_encoder(p["transformer_self"], dos_in, dos_in, dos_in,
                                t_layers)
        d = transformer_encoder(p["transformer_source"], d, x_dense, x_dense,
                                t_layers)
        return linear(p["out_layer"], d)[..., 0]

    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc"], torch.cat([energies, graph], dim=-1)))
    dos_global = head(dos_in)

    prompt = t(p["prompt_token"])[int(system)].reshape(1, 1, -1).expand(1, n_bins, -1)
    dos_in = torch.nn.functional.leaky_relu(
        linear(p["fc_prompt"], torch.cat([energies, graph, prompt], dim=-1)))
    dos_system = head(dos_in)
    return dos_global, h_x, dos_system
