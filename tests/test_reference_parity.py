"""Parity vs the GENUINE reference transformer code (VERDICT r3 missing #1).

Every other golden test in this suite compares against a builder-authored
torch oracle (tests/oracles/torch_oracle.py) — a shared misreading of the
reference's semantics would pass all of them.  The reference's `layers/`
subpackage imports only torch and runs in this environment, so here we import
the ACTUAL reference modules (/root/reference/layers/transformer.py,
/root/reference/layers/multihead_attention.py), copy our flax params into the
reference `TransformerEncoder`, and pin our `nn/transformer.py` forward
against its output at float64.

Tolerance: rtol 1e-5 / atol 5e-7, NOT 1e-10 — the genuine reference softmaxes
at exactly f32 even under f64 (`attn_weights.float()` is a downcast,
multihead_attention.py:69; our attention reproduces this by default), and
torch's vs jax's f32 softmax differ at ~6e-8, which is the measured floor
here. Everything outside the softmax is separately pinned at 1e-10 by
tests/test_model_parity.py::TestX64Parity with wide softmax on both sides.

Covered call patterns (the two the models use):
  * cross-attention  enc(x, k, v)      — DOSTransformer.py:76,86 style
  * "self"-attention enc(x, x, x)      — DOSTransformer.py:71 style (the
    reference NEVER calls enc(x) with k/v omitted: that path NameErrors,
    SURVEY.md §2.2; ours treats it as self-attention — equality with the
    explicit (x, x, x) reference call is asserted separately)
at 1, 2 and 3 layers, several (seq, batch) shapes, odd embed dims.

Layout note: the reference uses (seq_len, batch, dim); ours is batch-first
(batch, seq_len, dim).  Inputs are transposed accordingly.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref_layers():
    """Import the reference's layers package from /root/reference."""
    sys.path.insert(0, REF_ROOT)
    try:
        from layers.transformer import TransformerEncoder as RefEncoder
    finally:
        sys.path.remove(REF_ROOT)
    return RefEncoder


@pytest.fixture(autouse=True)
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _copy_params_into_ref(params, ref_enc, n_layers):
    """Copy our flax param tree into the reference torch TransformerEncoder.

    Mapping (names from nn/transformer.py -> reference transformer.py):
      layer{i}/ln0/ln -> layers[i].layer_norms[0]   (shared LN over q/k/v)
      layer{i}/ln1    -> layers[i].layer_norms[1]
      layer{i}/fc1    -> layers[i].fc1 (kernel transposed: flax [in,out],
                                        torch [out,in])
      layer{i}/fc2    -> layers[i].fc2
      final_ln        -> layer_norm
    The reference's MultiheadAttention in_proj/out_proj params are dead code
    (multihead_attention.py:63-76 never reads them) and are left at their
    random init — if they were NOT dead, this test would catch it.
    """
    p = params["params"]

    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float64))

    with torch.no_grad():
        for i in range(n_layers):
            lp = p[f"layer{i}"]
            tl = ref_enc.layers[i]
            tl.layer_norms[0].weight.copy_(t(lp["ln0"]["ln"]["scale"]))
            tl.layer_norms[0].bias.copy_(t(lp["ln0"]["ln"]["bias"]))
            tl.layer_norms[1].weight.copy_(t(lp["ln1"]["scale"]))
            tl.layer_norms[1].bias.copy_(t(lp["ln1"]["bias"]))
            tl.fc1.weight.copy_(t(lp["fc1"]["kernel"]).T)
            tl.fc1.bias.copy_(t(lp["fc1"]["bias"]))
            tl.fc2.weight.copy_(t(lp["fc2"]["kernel"]).T)
            tl.fc2.bias.copy_(t(lp["fc2"]["bias"]))
        ref_enc.layer_norm.weight.copy_(t(p["final_ln"]["scale"]))
        ref_enc.layer_norm.bias.copy_(t(p["final_ln"]["bias"]))


def _run_pair(ref_layers, n_layers, seq_q, seq_kv, batch, dim, seed,
              self_attn=False):
    """Build both encoders with identical weights; return (ours, reference)
    outputs as float64 numpy arrays in batch-first layout."""
    from dostransformer_tpu.nn.transformer import TransformerEncoder

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, seq_q, dim)).astype(np.float64)
    if self_attn:
        k = v = x
    else:
        k = rng.normal(size=(batch, seq_kv, dim)).astype(np.float64)
        v = rng.normal(size=(batch, seq_kv, dim)).astype(np.float64)

    ours = TransformerEncoder(embed_dim=dim, num_heads=1, layers=n_layers,
                              use_pallas=False)
    params = ours.init(jax.random.PRNGKey(seed), jnp.asarray(x),
                       jnp.asarray(k), jnp.asarray(v))
    params = jax.tree.map(
        lambda a: np.asarray(a).astype(np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a, params)
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(k), jnp.asarray(v))
    assert np.asarray(out).dtype == np.float64

    ref = ref_layers(dim, 4, n_layers).double().eval()
    _copy_params_into_ref(params, ref, n_layers)
    with torch.no_grad():
        # reference layout: (seq, batch, dim)
        rout = ref(torch.from_numpy(x.transpose(1, 0, 2)),
                   torch.from_numpy(k.transpose(1, 0, 2)),
                   torch.from_numpy(v.transpose(1, 0, 2)))
    return np.asarray(out), rout.numpy().transpose(1, 0, 2)


class TestGenuineReferenceTransformer:
    @pytest.mark.parametrize("n_layers", [1, 2, 3])
    def test_cross_attention_matches_reference(self, ref_layers, n_layers):
        ours, ref = _run_pair(ref_layers, n_layers, seq_q=7, seq_kv=13,
                              batch=2, dim=32, seed=10 + n_layers)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=5e-7)

    @pytest.mark.parametrize("n_layers", [1, 3])
    def test_self_attention_matches_reference(self, ref_layers, n_layers):
        """enc(x, x, x) — how DOSTransformer.py:71 invokes 'self'-attention.
        Note k/v stay the ORIGINAL x in every layer on both sides."""
        ours, ref = _run_pair(ref_layers, n_layers, seq_q=9, seq_kv=9,
                              batch=3, dim=48, seed=20 + n_layers,
                              self_attn=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=5e-7)

    def test_odd_shapes(self, ref_layers):
        """Non-power-of-two everything: dim 33, seq 5/17, batch 1."""
        ours, ref = _run_pair(ref_layers, 2, seq_q=5, seq_kv=17,
                              batch=1, dim=33, seed=31)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=5e-7)

    def test_kv_omitted_equals_explicit_self(self, ref_layers):
        """Our k/v-omitted path (the intent fix for the reference's NameError,
        SURVEY.md §2.2) must equal the reference called as enc(x, x, x)."""
        from dostransformer_tpu.nn.transformer import TransformerEncoder

        rng = np.random.default_rng(44)
        x = rng.normal(size=(2, 6, 32)).astype(np.float64)
        ours = TransformerEncoder(embed_dim=32, num_heads=1, layers=2,
                                  use_pallas=False)
        params = ours.init(jax.random.PRNGKey(44), jnp.asarray(x))
        params = jax.tree.map(
            lambda a: np.asarray(a).astype(np.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a, params)
        out = ours.apply(params, jnp.asarray(x))

        ref = ref_layers(32, 4, 2).double().eval()
        _copy_params_into_ref(params, ref, 2)
        with torch.no_grad():
            xt = torch.from_numpy(x.transpose(1, 0, 2))
            rout = ref(xt, xt, xt)
        np.testing.assert_allclose(np.asarray(out),
                                   rout.numpy().transpose(1, 0, 2),
                                   rtol=1e-5, atol=5e-7)
