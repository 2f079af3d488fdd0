"""Runnable PyTorch baseline with the reference's execution model.

The reference repo publishes no numbers and its CUDA/PyG environment is not
available here (BASELINE.md plan-of-record), so this module provides a
behaviorally equivalent eager-PyTorch trainer — same math as documented in
SURVEY.md §2.2/§3.3 (ragged concatenated graphs, index_add scatter like
torch_scatter, zero-padded to_dense_batch with NO attention mask, AdamW,
beta-weighted per-sample RMSE loss) — used only to MEASURE the baseline
train-throughput that bench.py compares against. Written from the survey's
behavioral description; not a copy of the reference code.
"""

from __future__ import annotations

import time
from typing import List

import numpy as np
import torch
import torch.nn as nn


def _mlp2(n_in: int, h: int) -> nn.Sequential:
    return nn.Sequential(nn.Linear(n_in, h), nn.PReLU(), nn.Linear(h, h))


def _mlp_block(n_in: int, mid: int, out: int) -> nn.Sequential:
    return nn.Sequential(nn.Linear(n_in, mid), nn.LayerNorm(mid), nn.PReLU(),
                         nn.Linear(mid, out))


def _scatter_sum(src: torch.Tensor, index: torch.Tensor, dim_size: int):
    out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    return out.index_add(0, index, src)


class _Attention(nn.Module):
    """Projection-free softmax(QK^T d^-0.5)V."""

    def forward(self, q, k, v):
        w = torch.bmm(q, k.transpose(1, 2)) * q.shape[-1] ** -0.5
        return torch.bmm(torch.softmax(w, dim=-1), v)


class _TransformerLayer(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.ln0 = nn.LayerNorm(dim)
        self.ln1 = nn.LayerNorm(dim)
        self.attn = _Attention()
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x, x_k, x_v):
        x = x + self.attn(self.ln0(x), self.ln0(x_k), self.ln0(x_v))
        return x + self.fc2(torch.relu(self.fc1(self.ln1(x))))


class _Transformer(nn.Module):
    def __init__(self, dim: int, layers: int):
        super().__init__()
        self.layers = nn.ModuleList(_TransformerLayer(dim) for _ in range(layers))
        self.final_ln = nn.LayerNorm(dim)

    def forward(self, x, x_k, x_v):
        for layer in self.layers:
            x = layer(x, x_k, x_v)
        return self.final_ln(x)


class _Processor(nn.Module):
    def __init__(self, h: int):
        super().__init__()
        self.edge_mlp = _mlp_block(3 * h, 2 * h, h)
        self.node_mlp = _mlp_block(2 * h, 2 * h, h)

    def forward(self, x, senders, receivers, e):
        e = self.edge_mlp(torch.cat([x[senders], x[receivers], e], dim=-1))
        agg = _scatter_sum(e, receivers, x.shape[0])
        return self.node_mlp(torch.cat([x, agg], dim=-1)), e


class TorchDOSTransformerEDOS(nn.Module):
    """Eager baseline of the eDOS flagship (behavior per SURVEY.md §3.3)."""

    def __init__(self, n_atom=200, n_bond=41, n_glob=2, h=256, layers=3,
                 t_layers=2, n_bins=201):
        super().__init__()
        self.n_bins = n_bins
        self.energy_emb = nn.Embedding(n_bins, h)
        self.prompt_emb = nn.Embedding(7, h // 2)
        self.node_enc = _mlp2(n_atom, h)
        self.edge_enc = _mlp2(n_bond, h)
        self.glob_enc = _mlp2(n_glob, h)
        self.procs = nn.ModuleList(_Processor(h) for _ in range(layers))
        self.tr_cross = _Transformer(h, t_layers)
        self.tr_self = _Transformer(h, t_layers)
        self.tr_source = _Transformer(h, t_layers)
        self.dec = nn.Linear(2 * h, h)
        self.fc = nn.Linear(2 * h, h)
        self.fc_prompt = nn.Linear(2 * h + h // 2, h)
        self.out = nn.Linear(h, 1)

    def forward(self, nodes, edge_index, edge_attr, glob, system, batch_vec, b):
        x = self.node_enc(nodes)
        e = self.edge_enc(edge_attr)
        u = self.glob_enc(glob)
        s, r = edge_index
        for proc in self.procs:
            ox, oe = proc(x, s, r, e)
            x = x + ox
            e = e + oe

        # to_dense_batch: zero-pad to [B, A_max, h]; no attention mask (reference)
        a_max = int(torch.bincount(batch_vec).max())
        dense = torch.zeros(b, a_max, x.shape[-1], dtype=x.dtype)
        pos = torch.cat([torch.arange(c) for c in torch.bincount(batch_vec)])
        dense[batch_vec, pos] = x

        energies = self.energy_emb.weight.unsqueeze(0).expand(b, -1, -1)
        energies = self.tr_cross(energies, dense, dense)

        pooled = _scatter_sum(x, batch_vec, b)
        graph = self.dec(torch.cat([u, pooled], dim=-1))
        graph = graph.unsqueeze(1).expand(b, self.n_bins, -1)

        def head(dos_in):
            d = self.tr_self(dos_in, dos_in, dos_in)
            d = self.tr_source(d, dense, dense)
            return self.out(d)[..., 0]

        dg = head(torch.nn.functional.leaky_relu(
            self.fc(torch.cat([energies, graph], dim=-1))))
        prompt = self.prompt_emb(system).unsqueeze(1).expand(b, self.n_bins, -1)
        ds = head(torch.nn.functional.leaky_relu(
            self.fc_prompt(torch.cat([energies, graph, prompt], dim=-1))))
        return dg, ds


def _ragged_batches(samples, batch_size: int):
    """Reference-style collation: concatenate graphs, offset edge_index,
    build the batch vector."""
    batches = []
    for i in range(0, len(samples) - batch_size + 1, batch_size):
        chunk = samples[i: i + batch_size]
        xs, eis, eas, globs, ys, systems, bvec = [], [], [], [], [], [], []
        off = 0
        for g, sm in enumerate(chunk):
            xs.append(torch.as_tensor(sm.x, dtype=torch.float32))
            eis.append(torch.as_tensor(sm.edge_index, dtype=torch.long) + off)
            eas.append(torch.as_tensor(sm.edge_attr, dtype=torch.float32))
            globs.append(torch.as_tensor(sm.glob, dtype=torch.float32))
            ys.append(torch.as_tensor(sm.y, dtype=torch.float32))
            systems.append(sm.system)
            bvec.append(torch.full((sm.n_nodes,), g, dtype=torch.long))
            off += sm.n_nodes
        batches.append(dict(
            nodes=torch.cat(xs), edge_index=torch.cat(eis, dim=1),
            edge_attr=torch.cat(eas), glob=torch.stack(globs),
            y=torch.stack(ys), system=torch.as_tensor(systems),
            batch_vec=torch.cat(bvec), b=len(chunk)))
    return batches


def measure_torch_throughput(samples, batch_size=8, h=256, layers=3,
                             t_layers=2, warmup=2, steps=10,
                             threads: int = 0) -> float:
    """Train-step throughput (samples/sec) of the eager torch baseline."""
    if threads:
        torch.set_num_threads(threads)
    model = TorchDOSTransformerEDOS(h=h, layers=layers, t_layers=t_layers)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=1e-2)
    batches = _ragged_batches(samples, batch_size)

    def step(bt):
        dg, ds = model(bt["nodes"], bt["edge_index"], bt["edge_attr"],
                       bt["glob"], bt["system"], bt["batch_vec"], bt["b"])
        y = torch.clamp(bt["y"], min=0)
        loss = (torch.sqrt(((y - dg) ** 2).mean(-1)).mean()
                + torch.sqrt(((y - ds) ** 2).mean(-1)).mean())
        opt.zero_grad()
        loss.backward()
        opt.step()

    for i in range(warmup):
        step(batches[i % len(batches)])
    t0 = time.perf_counter()
    for i in range(steps):
        step(batches[i % len(batches)])
    dt = time.perf_counter() - t0
    return steps * batch_size / dt
