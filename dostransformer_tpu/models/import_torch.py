"""Import reference PyTorch ``state_dict``s into dostransformer_tpu params.

The reference (HeewoongNoh/DOSTransformer) never checkpoints its models —
``torch.save`` appears only for datasets (reference data/mat2graph.py:259;
SURVEY.md §5) — but a user who added the obvious
``torch.save(model.state_dict(), path)`` to the reference training loop can
bring those weights here and serve/fine-tune them on TPU. This module is the
weight half of the migration story (the dataset half is
data/convert_reference_pt.py).

Mapping is template-guided: we walk OUR initialized param tree and derive,
for every leaf, the reference state_dict key that holds it. Our module tree
deliberately mirrors the reference's attribute names
(reference embedder_eDOS/DOSTransformer.py:17-43, layers/transformer.py:32-44,
103-118), so the rewrite rules are small and uniform across all 10 model
families:

  our tree                         reference state_dict key
  ------------------------------  -------------------------------------
  embeddings                      embeddings.weight
  prompt_token                    promt_token.weight (eDOS spelling,
                                  DOSTransformer.py:20) or
                                  prompt_token.weight (phDOS, :21)
  GN_encoder.node_encoder.lin0    GN_encoder.node_encoder.0   (Sequential
    .prelu / .lin1                 indices 1 / 2; Linear,PReLU,Linear)
  processor{i}                    stacked_processor.{i}
  *.edge_mlp.{lin0,ln,prelu,lin1} *.edge_mlp.{0,1,2,3}
  GN_decoder.mlp / decoder        GN_decoder.mlp.0
  transformer*.layer{i}           transformer*.layers.{i}
  *.ln0.ln / *.ln1                *.layer_norms.0 / .1
  *.final_ln                      *.layer_norm
  out0 / out1                     out_layer.0 / out_layer.2  (baselines'
                                  Sequential(Linear, LeakyReLU, Linear))
  kernel                          weight, TRANSPOSED (torch Linear stores
                                  [out,in]; flax kernels are [in,out])
  scale (LayerNorm)               weight
  alpha (PReLU)                   weight

Reference parameters that exist but receive no gradient / are never used in
the forward (SURVEY.md §2.3-6) are dropped on import: attention
``in_proj_*``/``out_proj`` (layers/multihead_attention.py:22-26),
``node_mlp_1`` (DOSTransformer.py:181), ``node_encoder_prompt`` (baseline
Encoders, graphnetwork.py:83), the free ``alpha`` Parameter
(DOSTransformer_phonon.py:40, graphnetwork.py:57), and Graphnetwork2's
never-called ``GN_decoder`` (graphnetwork.py:56 vs its forward :63-74).

phDOS reference weights arrive float64 (main_phDOS.py:14-16); they are cast
to the template leaf's dtype (f32 on TPU).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "export_reference_state_dict",
    "import_reference_state_dict",
    "load_torch_state_dict",
]

# Sequential-index maps for the two MLP shapes used everywhere in the
# reference (SURVEY.md §2.2): encoder MLPs Linear->PReLU->Linear and
# "mlp blocks" Linear->LayerNorm->PReLU->Linear.
_ENCODER_SEQ = {"lin0": "0", "prelu": "1", "lin1": "2"}
_MLP_BLOCK_SEQ = {"lin0": "0", "ln": "1", "prelu": "2", "lin1": "3"}


def _seq_map(child_keys) -> Dict[str, str] | None:
    keys = set(child_keys)
    if keys == set(_ENCODER_SEQ):
        return _ENCODER_SEQ
    if keys == set(_MLP_BLOCK_SEQ):
        return _MLP_BLOCK_SEQ
    return None


def _rewrite(key: str, depth: int, seq: Dict[str, str] | None) -> List[str]:
    """Reference name components for one of our tree keys (context-free part)."""
    if seq is not None and key in seq:
        return [seq[key]]
    if key.startswith("processor") and key[len("processor"):].isdigit():
        return ["stacked_processor", key[len("processor"):]]
    if key.startswith("layer") and key[len("layer"):].isdigit():
        return ["layers", key[len("layer"):]]
    if key == "ln0":
        return ["layer_norms", "0"]
    if key == "ln1":
        return ["layer_norms", "1"]
    if key == "ln" and seq is None:
        return []  # the LayerNorm module nested under ln0
    if key == "final_ln":
        return ["layer_norm"]
    if key == "out0":
        return ["out_layer", "0"]
    if key == "out1":
        return ["out_layer", "2"]  # index 1 is the param-free LeakyReLU
    if key == "decoder" and depth == 0:
        return ["GN_decoder", "mlp", "0"]  # MLPPhDOS flattens the Decoder
    if key == "mlp":
        return ["mlp", "0"]  # reference Decoder.mlp is Sequential(Linear)
    if depth == 0 and key in ("node_encoder", "edge_encoder"):
        # MLPPhDOS holds its encoders at top level; the reference nests them
        # in an Encoder module (embedder_phDOS/mlp_phonon.py:18,86-87)
        return ["GN_encoder", key]
    return [key]


def _leaf_entries(tree: Mapping) -> List[Tuple[Tuple[str, ...], List[str], bool]]:
    """(our_path, candidate reference keys, transpose?) for every leaf."""
    out: List[Tuple[Tuple[str, ...], List[str], bool]] = []

    def emit(path, refs, transpose=False):
        out.append((tuple(path), refs, transpose))

    def walk(node, path: List[str], ref: List[str]):
        if not isinstance(node, Mapping):
            # raw-array leaf: an Embedding table
            if path[-1] == "prompt_token":
                emit(path, ["promt_token.weight", "prompt_token.weight"])
            else:
                emit(path, [".".join(ref) + ".weight"])
            return
        keys = set(node)
        base = ".".join(ref)
        if keys in ({"kernel", "bias"}, {"kernel"}):  # Linear
            emit(path + ["kernel"], [base + ".weight"], transpose=True)
            if "bias" in keys:
                emit(path + ["bias"], [base + ".bias"])
            return
        if keys == {"scale", "bias"}:  # LayerNorm
            emit(path + ["scale"], [base + ".weight"])
            emit(path + ["bias"], [base + ".bias"])
            return
        if keys == {"alpha"}:  # PReLU
            emit(path + ["alpha"], [base + ".weight"])
            return
        seq = _seq_map(keys)
        for k in node:
            walk(node[k], path + [k], ref + _rewrite(k, len(path), seq))

    walk(tree, [], [])
    return out


def _is_dead_reference_key(key: str, template_tops: set) -> bool:
    """Reference params with no effect on the forward (SURVEY.md §2.3-6)."""
    if ".self_attn." in key:
        return True  # projection-free attention never uses in_proj/out_proj
    if ".node_mlp_1." in key:
        return True
    if "node_encoder_prompt." in key:
        return True
    if key == "alpha":
        return True
    if key == "version" or key.endswith(".version"):
        return True  # fairseq-style format buffer (layers/transformer.py:41)
    if key.startswith("GN_decoder.") and "GN_decoder" not in template_tops:
        return True  # Graphnetwork2 creates a Decoder it never calls
    return False


def import_reference_state_dict(state_dict: Mapping[str, object],
                                params: Mapping,
                                *,
                                strict: bool = True):
    """Map a reference-format torch ``state_dict`` onto our param tree.

    Args:
      state_dict: flat ``{dotted_name: tensor}`` as produced by
        ``model.state_dict()`` on any of the reference's 10 model families
        (values may be torch tensors or numpy arrays).
      params: OUR initialized variable collection for the matching model —
        either the full ``{"params": tree}`` or the bare tree. Provides the
        expected structure, shapes and dtypes.
      strict: when True (default), raise if the state_dict holds any key
        that was neither consumed nor a known-dead reference param.

    Returns a new tree of the same structure (and wrapping) as ``params``
    with every leaf replaced by the state_dict value (Linear weights
    transposed, dtypes cast to the template's).
    """
    wrapped = isinstance(params, Mapping) and set(params) == {"params"}
    tree = params["params"] if wrapped else params
    sd = {str(k): np.asarray(v) for k, v in state_dict.items()}

    entries = _leaf_entries(tree)
    used = set()
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    for path, refs, transpose in entries:
        key = next((r for r in refs if r in sd), None)
        if key is None:
            raise KeyError(
                f"state_dict has no key {refs[0]!r} (wanted for our param "
                f"{'.'.join(path)}); got a state_dict with {len(sd)} keys — "
                "is it from the matching model family/size?")
        arr = sd[key]
        used.add(key)
        if transpose:
            arr = arr.T
        tmpl = tree
        for p in path:
            tmpl = tmpl[p]
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"shape mismatch importing {key!r} -> {'.'.join(path)}: "
                f"state_dict {tuple(arr.shape)} vs model {tuple(tmpl.shape)} "
                "(check hidden/layers/t_layers against the checkpoint)")
        flat[path] = np.ascontiguousarray(arr, dtype=tmpl.dtype)

    tops = set(tree)
    leftovers = sorted(k for k in sd
                       if k not in used and not _is_dead_reference_key(k, tops))
    if strict and leftovers:
        raise ValueError(
            "state_dict keys not consumed by the import (pass strict=False "
            f"to ignore): {leftovers}")

    # leaves stay host numpy: every caller places them itself (Predictor
    # replicates over its mesh, the trainer device_puts onto each template
    # leaf's sharding, bare jit commits on first use) — committing to a
    # device here would force a second copy and, on a multi-host mesh, hand
    # cross-process device_put a committed array instead of the host buffer
    # it is documented to accept
    new_tree: Dict = {}
    for path, arr in flat.items():
        node = new_tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return {"params": new_tree} if wrapped else new_tree


def export_reference_state_dict(params: Mapping,
                                task: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_reference_state_dict`: our param tree as a
    reference-named flat ``{dotted_name: np.ndarray}`` state_dict.

    Lets TPU-trained weights flow back to the reference PyTorch ecosystem
    (validation runs, downstream torch tooling). Linear kernels are
    transposed back to torch's [out, in] layout. ``task`` picks the prompt
    embedding spelling — the reference misspells it per task ('promt_token'
    for eDOS, DOSTransformer.py:20; 'prompt_token' for phDOS) and torch's
    ``load_state_dict(strict=False)`` would SILENTLY drop a wrong-spelling
    key (leaving a randomly initialized prompt table), so ``task`` is
    required whenever the tree has a prompt embedding. The reference's dead
    params (in_proj_*, node_mlp_1, ...) have no counterpart here and are
    omitted — load with ``model.load_state_dict(sd, strict=False)`` on the
    torch side and check that ``missing_keys`` holds only those dead params.
    """
    wrapped = isinstance(params, Mapping) and set(params) == {"params"}
    tree = params["params"] if wrapped else params
    if "prompt_token" in tree and task is None:
        raise ValueError(
            "this model has a prompt embedding, whose reference state_dict "
            "key is task-specific ('promt_token' eDOS / 'prompt_token' "
            "phDOS) — pass task='edos' or task='phdos'")
    out: Dict[str, np.ndarray] = {}
    for path, refs, transpose in _leaf_entries(tree):
        leaf = tree
        for p in path:
            leaf = leaf[p]
        arr = np.asarray(leaf)
        if transpose:
            arr = np.ascontiguousarray(arr.T)
        key = refs[0]
        if path[-1] == "prompt_token" and task.lower() != "edos":
            key = "prompt_token.weight"
        out[key] = arr
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``torch.save``d state_dict (or module) as numpy arrays.

    Accepts a bare state_dict, a ``{"state_dict": ...}`` wrapper, or a whole
    pickled module. Requires torch (present in this image, CPU-only); the
    tensors are plain — none of the reference's PyG types appear in a
    state_dict, so no PyG install is needed.
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older-format pickles (or a whole nn.Module) need a full unpickle
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if (isinstance(obj, Mapping) and isinstance(obj.get("state_dict"), Mapping)
            and obj["state_dict"]
            and all(torch.is_tensor(v) for v in obj["state_dict"].values())):
        # common checkpoint wrapper {'state_dict': ..., 'epoch': ..., ...} —
        # unwrap based on what the INNER mapping holds (sibling metadata may
        # itself contain tensors, e.g. a best-loss scalar)
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if torch.is_tensor(v):
            out[str(k)] = v.detach().cpu().numpy()
    if not out:
        raise ValueError(f"{path!r} contained no tensors")
    return out
