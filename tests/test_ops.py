"""Unit tests for dostransformer_tpu.ops (SURVEY.md §4 unit strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dostransformer_tpu.ops import (
    dot_product_attention,
    edge_geometry_phdos,
    fused_attention,
    gaussian_basis,
    segment_mean,
    segment_sum,
    segment_sum_pallas,
    smooth_cutoff,
    spherical_harmonics_l1,
)


class TestSegment:
    def test_segment_sum_matches_loop(self):
        rng = np.random.RandomState(0)
        e, n, f = 500, 37, 19
        data = rng.randn(e, f).astype(np.float32)
        ids = rng.randint(0, n + 5, size=e).astype(np.int32)  # incl. OOB -> dropped
        ref = np.zeros((n, f), np.float32)
        for i in range(e):
            if ids[i] < n:
                ref[ids[i]] += data[i]
        out = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), n))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_segment_sum_pallas_differential(self):
        rng = np.random.RandomState(1)
        e, n, f = 777, 130, 65
        data = rng.randn(e, f).astype(np.float32)
        ids = rng.randint(0, n + 10, size=e).astype(np.int32)
        ref = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), n))
        out = np.asarray(segment_sum_pallas(jnp.array(data), jnp.array(ids), n))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_segment_mean_torch_semantics(self):
        # empty segments -> 0 (torch_scatter.scatter_mean behavior)
        data = jnp.array([[2.0], [4.0], [6.0]])
        ids = jnp.array([0, 0, 2])
        out = np.asarray(segment_mean(data, ids, 4))
        np.testing.assert_allclose(out[:, 0], [3.0, 0.0, 6.0, 0.0])

    def test_segment_mean_masked(self):
        data = jnp.array([[2.0], [4.0], [100.0]])
        mask = jnp.array([1.0, 1.0, 0.0])
        out = np.asarray(segment_mean(data * mask[:, None], jnp.array([0, 0, 0]), 1,
                                      weights=mask))
        np.testing.assert_allclose(out[0, 0], 3.0)


class TestAttention:
    def test_matches_numpy_oracle(self):
        # 5-line NumPy oracle per SURVEY.md §4
        rng = np.random.RandomState(0)
        b, lq, lk, d = 2, 7, 11, 32
        q, k, v = (rng.randn(b, n, d).astype(np.float32) for n in (lq, lk, lk))
        s = np.einsum("bqd,bkd->bqk", q, k) * d ** -0.5
        w = np.exp(s - s.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        ref = np.einsum("bqk,bkd->bqd", w, v)
        out = np.asarray(dot_product_attention(*map(jnp.array, (q, k, v))))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("masked", [False, True])
    def test_fused_differential(self, masked):
        rng = np.random.RandomState(2)
        b, lq, lk, d = 3, 201, 37, 256
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.3) if masked else None
        ref = dot_product_attention(q, k, v, mask)
        out = fused_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_fused_gradients(self):
        rng = np.random.RandomState(3)
        b, lq, lk, d = 2, 16, 24, 64
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.2)
        g1 = jax.grad(lambda *a: fused_attention(*a, mask).sum(), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: dot_product_attention(*a, mask).sum(), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("b,lq,lk,d", [(4, 16, 24, 64), (2, 201, 33, 96)])
    def test_fused_gradients_pallas_bwd(self, b, lq, lk, d, monkeypatch):
        """Pallas backward kernel (default at b >= 64 elements, where it was
        measured +6-10% end-to-end; XLA einsums below — see _use_pallas_bwd)
        must match the jnp backward — including at every-axis-misaligned
        shapes, which exercise the padded residuals saved by
        _fused_attention_fwd_keep."""
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "1")
        rng = np.random.RandomState(4)
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.2)
        loss = lambda *a: (fused_attention(*a, mask) ** 2).sum()
        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "0")
        g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_bwd_dispatch_default(self, monkeypatch):
        """The production default: b >= 64 elements AND lq >= 128 query rows
        takes the Pallas backward (eDOS's 201-bin stream); short queries
        (phDOS's 51-bin stream) or small batch take XLA — the round-5 phDOS
        profile attack measured the kernel −10.4% at lq=51 (BASELINE.md).
        Env forces either, and the default-on path is differential-tested
        against the forced-off XLA backward."""
        from dostransformer_tpu.ops.attention import _use_pallas_bwd

        monkeypatch.delenv("DOSTPU_ATTN_PALLAS_BWD", raising=False)
        assert not _use_pallas_bwd(16, 201)
        assert _use_pallas_bwd(64, 201) and _use_pallas_bwd(128, 128)
        assert not _use_pallas_bwd(64, 51)   # phDOS bins: XLA bwd
        assert not _use_pallas_bwd(128, 64)
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "0")
        assert not _use_pallas_bwd(128, 201)
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "1")
        assert _use_pallas_bwd(2, 9)

        monkeypatch.delenv("DOSTPU_ATTN_PALLAS_BWD")
        rng = np.random.RandomState(5)
        b, lq, lk, d = 64, 201, 13, 32
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.2)
        loss = lambda *a: (fused_attention(*a, mask) ** 2).sum()
        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)   # default: Pallas
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "0")
        g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)   # forced XLA
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)


class TestNopadAttention:
    """DOSTPU_ATTN_NOPAD=1: the kernels take RAW logical shapes (full-dim
    blocks, Mosaic handles alignment internally) instead of explicitly
    HBM-padded operands. Opt-in until measured on real TPU (BASELINE.md
    B=64 copy-floor item); numerics must match both other paths exactly."""

    def test_nopad_dispatch_default(self, monkeypatch):
        """Default no-pad gate: batch-only — the raw-shape kernel FORM wins
        at every b >= 64 geometry measured (eDOS lq=201 AND phDOS lq=51:
        26,123 no-pad fwd + XLA bwd vs 25,488 padded fwd + XLA bwd),
        while the backward ENGINE separately needs lq >= 128
        (_use_pallas_bwd) — BASELINE.md rounds 3 and 5."""
        from dostransformer_tpu.ops.attention import _use_nopad

        monkeypatch.delenv("DOSTPU_ATTN_NOPAD", raising=False)
        assert _use_nopad(64, 201) and _use_nopad(128, 128)
        assert not _use_nopad(8, 201)
        assert _use_nopad(64, 51)   # phDOS: no-pad fwd (+ XLA bwd) wins
        monkeypatch.setenv("DOSTPU_ATTN_NOPAD", "0")
        assert not _use_nopad(64, 201)
        monkeypatch.setenv("DOSTPU_ATTN_NOPAD", "1")
        assert _use_nopad(2, 9)

    @pytest.mark.parametrize("b,lq,lk,d", [(2, 201, 33, 96), (4, 9, 13, 32)])
    def test_nopad_forward_and_grads_match(self, b, lq, lk, d, monkeypatch):
        rng = np.random.RandomState(7)
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.2)
        loss = lambda *a: (fused_attention(*a, mask) ** 2).sum()

        monkeypatch.setenv("DOSTPU_ATTN_NOPAD", "1")
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "1")  # nopad bwd kernel
        out_np = fused_attention(q, k, v, mask)
        g_np = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        monkeypatch.delenv("DOSTPU_ATTN_NOPAD")
        monkeypatch.setenv("DOSTPU_ATTN_PALLAS_BWD", "0")  # jnp reference bwd
        out_ref = fused_attention(q, k, v, mask)
        g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        np.testing.assert_allclose(np.asarray(out_np), np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-5)
        for a, b_ in zip(g_np, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_default_dispatch_at_64_elements(self, monkeypatch):
        """At >= 64 batch elements the no-pad fwd+bwd kernels are the
        DEFAULT (measured winner on v5e, BASELINE.md round 3 — no env
        needed); numerics must equal the jnp reference."""
        monkeypatch.delenv("DOSTPU_ATTN_NOPAD", raising=False)
        monkeypatch.delenv("DOSTPU_ATTN_PALLAS_BWD", raising=False)
        rng = np.random.RandomState(9)
        b, lq, lk, d = 64, 17, 33, 32
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        mask = jnp.array(rng.rand(b, lk) > 0.2)

        out = fused_attention(q, k, v, mask)
        loss = lambda *a: (fused_attention(*a, mask) ** 2).sum()
        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        ref = dot_product_attention(q, k, v, mask)
        ref_loss = lambda *a: (dot_product_attention(*a, mask) ** 2).sum()
        ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        for a, b_ in zip(grads, ref_grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-5)

    def test_nopad_unmasked(self, monkeypatch):
        rng = np.random.RandomState(8)
        b, lq, lk, d = 2, 51, 201, 64
        q, k, v = (jnp.array(rng.randn(b, n, d).astype(np.float32))
                   for n in (lq, lk, lk))
        monkeypatch.setenv("DOSTPU_ATTN_NOPAD", "1")
        out = fused_attention(q, k, v, None)
        ref = dot_product_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestGeometry:
    # --- transcribed e3nn goldens ------------------------------------------
    # e3nn itself is not installable in this environment (no installs; see
    # BASELINE.md); these literals are hand-evaluated from e3nn's PUBLISHED
    # generated polynomials (e3nn/o3/_spherical_harmonics.py:
    # sh_1_0 = sqrt(3)*x, sh_1_1 = sqrt(3)*y, sh_1_2 = sqrt(3)*z, components
    # in input order) and gate_points_2101.smooth_cutoff
    # (u = 2(x-1); (1-cos(pi u))/2 on -1<=u<=0; clamped 1 below, 0 above) —
    # independent of any code shared with the implementation or the oracle.
    SMOOTH_CUTOFF_GOLDENS = [
        (0.0, 1.0),
        (0.25, 1.0),
        (0.4999, 1.0),                     # u just below -1
        (0.625, 0.8535533905932737),       # (1 + sqrt(2)/2) / 2
        (0.75, 0.5),
        (0.875, 0.14644660940672627),      # (1 - sqrt(2)/2) / 2
        (1.0, 0.0),
        (1.5, 0.0),
    ]
    # (input vector, expected [Y00, sqrt(3)x/r, sqrt(3)y/r, sqrt(3)z/r])
    _S3 = 1.7320508075688772  # sqrt(3)
    SH_GOLDENS = [
        ((1.0, 0.0, 0.0), (1.0, _S3, 0.0, 0.0)),
        ((0.0, 2.0, 0.0), (1.0, 0.0, _S3, 0.0)),   # normalize=True: scale-free
        ((0.0, 0.0, 0.5), (1.0, 0.0, 0.0, _S3)),
        ((-1.0, 0.0, 0.0), (1.0, -_S3, 0.0, 0.0)),
        # (2,-3,6)/7 exactly: sqrt(3) * (2/7, -3/7, 6/7)
        ((2.0, -3.0, 6.0), (1.0, 0.4948716593053935, -0.7423074889580903,
                            1.4846149779161806)),
        # (1,1,1)/sqrt(3): sqrt(3)/sqrt(3) = 1 per component
        ((1.0, 1.0, 1.0), (1.0, 1.0, 1.0, 1.0)),
        # (3,4,0)/5
        ((3.0, 4.0, 0.0), (1.0, 1.0392304845413263, 1.3856406460551018, 0.0)),
        ((0.0, -0.6, 0.8), (1.0, 0.0, -1.0392304845413263,
                            1.3856406460551018)),
    ]

    def test_smooth_cutoff_goldens(self):
        x = jnp.array([g[0] for g in self.SMOOTH_CUTOFF_GOLDENS])
        want = np.array([g[1] for g in self.SMOOTH_CUTOFF_GOLDENS])
        np.testing.assert_allclose(np.asarray(smooth_cutoff(x)), want,
                                   atol=1e-6)

    def test_sh_l1_component_goldens(self):
        v = jnp.array([g[0] for g in self.SH_GOLDENS])
        want = np.array([g[1] for g in self.SH_GOLDENS])
        np.testing.assert_allclose(np.asarray(spherical_harmonics_l1(v)),
                                   want, atol=1e-6)
        # component normalization identity: sum_m Y_1m^2 = 3 on any unit vec
        u = jnp.array([[0.3, -0.4, 0.87]])
        shu = np.asarray(spherical_harmonics_l1(u / jnp.linalg.norm(u)))
        np.testing.assert_allclose((shu[0, 1:] ** 2).sum(), 3.0, rtol=1e-5)

    def test_edge_geometry_zero_vec(self):
        # self-loops at zero shift: cutoff(0)=1, SH=[1,0,0,0]
        out = np.asarray(edge_geometry_phdos(jnp.zeros((1, 3))))
        np.testing.assert_allclose(out[0], [1, 0, 0, 0], atol=1e-7)

    def test_gaussian_basis_reference_semantics(self):
        # mat2graph.py:176-179: exp(-(d-centers)^2/var^2), centers 0..8.2:0.2
        d = jnp.array([0.0, 3.14, 9.0])  # incl. the 12-NN pad distance 9.0
        out = np.asarray(gaussian_basis(d))
        assert out.shape == (3, 41)
        centers = np.arange(0, 8.2, 0.2)
        ref = np.exp(-((np.array([0.0, 3.14, 9.0])[:, None] - centers) ** 2) / 0.04)
        np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-5, atol=1e-7)
