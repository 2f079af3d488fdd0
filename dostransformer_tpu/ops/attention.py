"""Projection-free scaled dot-product attention.

The reference's MultiheadAttention (layers/multihead_attention.py:49-76) applies
NO q/k/v/output projections and no head split: it is exactly
``softmax(Q K^T * d^-0.5) V`` with the softmax computed in float32
(multihead_attention.py:68-72); the registered in_proj/out_proj parameters are
dead weight (created but never used). We implement the *intent*: the bare
attention op, with an optional key-padding mask (the reference never builds one
— see SURVEY.md §2.3-10 — so masking is opt-in via the `padding="mask"` config).

Two implementations behind one signature:
  * :func:`dot_product_attention` — jnp reference (XLA fuses it well already).
  * :func:`fused_attention` — a Pallas TPU kernel that keeps the whole
    [TQ, Lk] score tile in VMEM (our sequences are <=201 queries x <=1k keys,
    so no online-softmax pass is needed; one VMEM-resident block per grid step
    is the speed-of-light schedule at this scale). Backward runs through a
    custom VJP with closed-form gradients.

Layout: batch-first [B, L, D] (TPU-friendly; the reference uses torch's
(seq, batch, dim) — semantics are identical).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """softmax(q k^T * D^-0.5) v, softmax in float32.

    q [B, Lq, D], k/v [B, Lk, D], key_mask [B, Lk] (True = attend) or None.
    """
    d = q.shape[-1]
    scale = d ** -0.5
    # accumulate in AT LEAST f32 regardless of operand dtype (bf16 operands
    # still ride the MXU natively; only the accumulator is widened). f64
    # operands (x64 CPU parity runs) keep f64 accumulation.
    acc = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum("bqd,bkd->bqk", q, k,
                        preferred_element_type=acc) * scale
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, :], scores, NEG_INF)
    # The softmax runs at EXACTLY float32 at every input dtype: the genuine
    # reference casts the scores with `.float()` (a DOWNCAST under its f64
    # phDOS training) before softmax and casts back after
    # (multihead_attention.py:69) — pinned against the real reference code in
    # tests/test_reference_parity.py. DOSTPU_SOFTMAX_WIDE=1 promotes the
    # softmax to the score dtype instead (used by the x64 oracle pins to
    # isolate all non-softmax math at 1e-10).
    sm = acc if os.environ.get("DOSTPU_SOFTMAX_WIDE") == "1" else jnp.float32
    weights = jax.nn.softmax(scores.astype(sm), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bqk,bkd->bqd", weights, v,
                      preferred_element_type=acc).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                     precision, nb: int):
    # nb batch elements per invocation (unrolled): the per-element matmuls
    # are tiny at these shapes ([<=256, 256] @ [256, 256]) so invocation
    # overhead dominates a 1-element grid; batching amortizes it while the
    # MXU/VPU work pipelines across the unrolled elements.
    for i in range(nb):
        q = q_ref[i]        # [TQ, D]
        k = k_ref[i]        # [Lk, D]
        s = jax.lax.dot(q, k.T, preferred_element_type=jnp.float32,
                        precision=precision) * scale      # [TQ, Lk]
        s = s + bias_ref[i]  # additive key bias (0 or NEG_INF) per element
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / denom).astype(v_ref.dtype)
        o_ref[i] = jax.lax.dot(p, v_ref[i], preferred_element_type=jnp.float32,
                               precision=precision).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_nb(b: int, per_elem_bytes: int) -> int:
    """Batch elements per kernel invocation: the per-element matmuls are far
    below MXU saturation at this workload's shapes, so batching amortizes
    invocation overhead — but bounded by a VMEM budget so large key counts
    degrade to fewer elements per invocation instead of failing to
    compile."""
    budget = 8 * 1024 * 1024  # of ~16 MB VMEM; leaves room for pipelining
                              # (flagship fwd: 4 x 1.31 MB -> nb=4; the
                              # docstring's 1k-key envelope: 4.23 MB/elem ->
                              # nb=1 instead of a Mosaic VMEM OOM)
    for n in (4, 2, 1):
        if b % n == 0 and n * per_elem_bytes <= budget:
            return n
    return 1


def _attn_precision():
    # Match the rest of the model: single-pass bf16 MXU (DEFAULT) — the same
    # precision every Linear/einsum in the model (and this kernel's OWN
    # backward) already uses on TPU. Golden parity runs on CPU where matmuls
    # are true f32 regardless; end-to-end f32-vs-bf16 accuracy is validated
    # by benchmarks/convergence_demo.py (BASELINE.md). Set
    # DOSTPU_ATTN_HIGHEST=1 to force 6-pass exact-f32 passes for debugging.
    return (jax.lax.Precision.HIGHEST
            if os.environ.get("DOSTPU_ATTN_HIGHEST") == "1"
            else jax.lax.Precision.DEFAULT)


def _pad_operands(q, k, v, bias, q_tile: int):
    """Lane-align q/k/v/bias for the kernels: [B, lq_pad, d_pad] etc. with
    zero rows/cols and NEG_INF bias on padded keys."""
    b, lq, d = q.shape
    lk = k.shape[1]
    lq_pad = _round_up(lq, 8)
    tq = min(q_tile, lq_pad)
    lq_pad = _round_up(lq_pad, tq)
    lk_pad = _round_up(lk, 128)
    d_pad = _round_up(d, 128)
    qb = jnp.zeros((b, lq_pad, d_pad), q.dtype).at[:, :lq, :d].set(q)
    kb = jnp.zeros((b, lk_pad, d_pad), k.dtype).at[:, :lk, :d].set(k)
    vb = jnp.zeros((b, lk_pad, d_pad), v.dtype).at[:, :lk, :d].set(v)
    # pad keys masked out
    biasb = jnp.full((b, 1, lk_pad), NEG_INF, jnp.float32).at[:, 0, :lk].set(bias)
    return qb, kb, vb, biasb, tq


def _fwd_kernel_call(qb, kb, vb, biasb, *, d: int, tq: int):
    """Run the forward kernel on pre-padded operands; returns the PADDED
    [B, lq_pad, d_pad] output."""
    b, lq_pad, d_pad = qb.shape
    lk_pad = kb.shape[1]
    scale = d ** -0.5
    precision = _attn_precision()
    # q/o blocks + k/v blocks at operand itemsize, plus the f32 score and
    # softmax tiles
    per_elem = (2 * tq * d_pad + 2 * lk_pad * d_pad) * qb.dtype.itemsize \
        + 2 * tq * lk_pad * 4
    nb = _pick_nb(b, per_elem)

    grid = (b // nb, lq_pad // tq)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, precision=precision,
                          nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, tq, d_pad), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lk_pad, d_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lk_pad, d_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, lk_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, tq, d_pad), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, d_pad), qb.dtype),
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(qb, kb, vb, biasb)


def _use_nopad(b: int, lq: int) -> bool:
    """No-pad kernel path: pass q/k/v/bias to Pallas at their RAW logical
    shapes with full-dimension blocks and let Mosaic handle the sublane/lane
    alignment internally. The explicit _pad_operands copies exist because
    grid-tiled blocks that overrun an array have unspecified out-of-bounds
    content (BASELINE.md B=64 burn-down); with block == full dim there IS no
    overrun — shapes are logical and Mosaic masks its internal padding
    semantically, deleting the residual-format pads, the g pad and the
    dq/dk/dv un-pads (the ~2.3 ms/step copy floor at B=64).

    Gates the KERNEL FORM (raw vs padded operands), not whether Pallas runs
    — _use_pallas_bwd separately decides the backward engine. DEFAULT at
    >= 64 batch elements at ANY query length, MEASURED on v5e: at eDOS
    geometry (lq=201 energy tokens; BASELINE.md round 3) B=64 5,514 vs
    5,285 samples/s, B=128 5,024 vs 4,613, large-crystal B=64 1,490 vs
    1,458 — the no-pad kernels beat both the padded-kernel and XLA paths
    wherever the relayout copies dominate. At small batch the padded fwd +
    XLA bwd combination stays ahead (headline B=8: 7,065 vs 6,473 with the
    forced no-pad bwd). At SHORT query lengths only the BACKWARD flips
    (see _use_pallas_bwd): phDOS B=64 bf16 (lq=51 bins) measured no-pad
    fwd + XLA bwd 26,123 vs padded fwd + XLA bwd 25,488 vs no-pad fwd+bwd
    23,096 (BASELINE.md round-5 profile attack) — the raw-shape FORWARD
    wins at every b >= 64 geometry, so this gate stays batch-only.
    DOSTPU_ATTN_NOPAD=1/0 forces either form."""
    env = os.environ.get("DOSTPU_ATTN_NOPAD")
    if env in ("0", "1"):
        return env == "1"
    return b >= 64


def _vmem_rounded(rows: int, cols: int, itemsize: int) -> int:
    """Mosaic's internal VMEM footprint of a [rows, cols] block (sublane
    rounded to 8, lane to 128) — used for nb budgeting on raw shapes."""
    return _round_up(rows, 8) * _round_up(cols, 128) * itemsize


def _fwd_kernel_call_nopad(q, k, v, bias):
    """Forward kernel on RAW shapes: grid over batch only, one full-dim
    block per operand; output lands unpadded (no slice needed)."""
    b, lq, d = q.shape
    lk = k.shape[1]
    scale = d ** -0.5
    precision = _attn_precision()
    per_elem = (2 * _vmem_rounded(lq, d, q.dtype.itemsize)
                + 2 * _vmem_rounded(lk, d, k.dtype.itemsize)
                + 2 * _vmem_rounded(lq, lk, 4))
    nb = _pick_nb(b, per_elem)
    return pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, precision=precision,
                          nb=nb),
        grid=(b // nb,),
        in_specs=[
            pl.BlockSpec((nb, lq, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lk, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, lk, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, lk), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, lq, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq, d), q.dtype),
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(q, k, v, bias[:, None, :])


@jax.jit
def _fused_attention_bwd_nopad(q, k, v, bias, g):
    """Backward on RAW shapes (no pads in, no un-pads out)."""
    b, lq, d = g.shape
    lk = k.shape[1]
    scale = d ** -0.5
    precision = _attn_precision()
    per_elem = (3 * _vmem_rounded(lq, d, q.dtype.itemsize)
                + 4 * _vmem_rounded(lk, d, k.dtype.itemsize)
                + 4 * _vmem_rounded(lq, lk, 4))
    nb = _pick_nb(b, per_elem)
    blk = lambda l: pl.BlockSpec((nb, l, d), lambda bi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, precision=precision,
                          nb=nb),
        grid=(b // nb,),
        in_specs=[blk(lq), blk(lk), blk(lk),
                  pl.BlockSpec((nb, 1, lk), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  blk(lq)],
        out_specs=[blk(lq), blk(lk), blk(lk)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq, d), q.dtype),
            jax.ShapeDtypeStruct((b, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b, lk, d), v.dtype),
        ],
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(q, k, v, bias[:, None, :], g)
    return dq, dk, dv


@functools.partial(jax.jit, static_argnames=("q_tile",))
def _fused_attention_fwd(q, k, v, bias, *, q_tile: int = 256):
    if _use_nopad(q.shape[0], q.shape[1]):
        return _fwd_kernel_call_nopad(q, k, v, bias)
    b, lq, d = q.shape
    qb, kb, vb, biasb, tq = _pad_operands(q, k, v, bias, q_tile)
    out = _fwd_kernel_call(qb, kb, vb, biasb, d=d, tq=tq)
    return out[:, :lq, :d]


@functools.partial(jax.jit, static_argnames=("q_tile",))
def _fused_attention_fwd_keep(q, k, v, bias, *, q_tile: int = 256):
    """Forward that ALSO returns the padded operands, so a Pallas backward
    can consume them as residuals instead of re-padding q/k/v from HBM —
    the fwd already materialized these buffers as kernel inputs, so saving
    them is free while the bwd's three large pad copies disappear
    (BASELINE.md B=64 burn-down: the remaining copy floor was exactly these
    boundary pads)."""
    b, lq, d = q.shape
    qb, kb, vb, biasb, tq = _pad_operands(q, k, v, bias, q_tile)
    out = _fwd_kernel_call(qb, kb, vb, biasb, d=d, tq=tq)
    return out[:, :lq, :d], qb, kb, vb


@jax.custom_vjp
def _fused_attention(q, k, v, bias):
    return _fused_attention_fwd(q, k, v, bias)


def _fused_fwd(q, k, v, bias):
    if (_use_pallas_bwd(q.shape[0], q.shape[1])
            and not _use_nopad(q.shape[0], q.shape[1])):
        # padded residuals: bias stays unpadded ([B, Lk] — tiny) so the
        # backward can recover the real Lk/Lq/D from (bias, g) shapes
        o, qb, kb, vb = _fused_attention_fwd_keep(q, k, v, bias)
        return o, (qb, kb, vb, bias)
    # nopad path: residuals are the raw operands — there are no padded
    # buffers to share; the nopad backward consumes raw shapes directly
    o = _fused_attention_fwd(q, k, v, bias)
    return o, (q, k, v, bias)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, precision,
                     nb: int):
    # recompute-in-kernel backward: the [Lq, Lk] score/softmax tiles and the
    # five matmuls stay in VMEM. Dispatch is batch-dependent (see
    # _use_pallas_bwd): XLA einsums win at small batch, this kernel wins
    # +6-10% at >= 64 elements. q/k/v arrive PRE-PADDED (the fwd's own
    # kernel-input buffers, saved as residuals); only g and the bias row are
    # padded here. Saving padded residuals measured NEUTRAL end-to-end
    # (B=64: 5,291 vs 5,285 samples/s — XLA already CSE'd the duplicate
    # fwd/bwd pads) but makes that elision structural instead of
    # optimizer-dependent.
    for i in range(nb):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        g = g_ref[i]
        s = jax.lax.dot(q, k.T, preferred_element_type=jnp.float32,
                        precision=precision) * scale + bias_ref[i]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)       # f32 [Lq, Lk]
        pc = p.astype(v.dtype)
        dv_ref[i] = jax.lax.dot(pc.T, g, preferred_element_type=jnp.float32,
                                precision=precision).astype(dv_ref.dtype)
        dp = jax.lax.dot(g, v.T, preferred_element_type=jnp.float32,
                         precision=precision)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq_ref[i] = (jax.lax.dot(dsc, k, preferred_element_type=jnp.float32,
                                 precision=precision)
                     * scale).astype(dq_ref.dtype)
        dk_ref[i] = (jax.lax.dot(dsc.T, q, preferred_element_type=jnp.float32,
                                 precision=precision)
                     * scale).astype(dk_ref.dtype)


@jax.jit
def _fused_attention_bwd(qb, kb, vb, bias, g):
    """Backward on PADDED q/k/v residuals (saved by _fused_attention_fwd_keep
    — the fwd's own kernel-input buffers, so no pad copies here beyond g and
    the tiny bias row). Real Lq/D come from g, real Lk from bias."""
    b, lq, d = g.shape
    lk = bias.shape[1]
    lq_pad, d_pad = qb.shape[1], qb.shape[2]
    lk_pad = kb.shape[1]
    scale = d ** -0.5
    precision = _attn_precision()
    # q/g/dq blocks + k/v/dk/dv blocks at operand itemsize, plus four f32
    # [Lq, Lk] tiles (s, p, dp, ds)
    per_elem = (3 * lq_pad * d_pad + 4 * lk_pad * d_pad) * qb.dtype.itemsize \
        + 4 * lq_pad * lk_pad * 4
    nb = _pick_nb(b, per_elem)

    gb = jnp.zeros((b, lq_pad, d_pad), g.dtype).at[:, :lq, :d].set(g)
    # padded keys masked out; padded-query rows have g == 0 so every one of
    # their contributions cancels
    biasb = jnp.full((b, 1, lk_pad), NEG_INF,
                     jnp.float32).at[:, 0, :lk].set(bias)

    blk = lambda l: pl.BlockSpec((nb, l, d_pad), lambda bi: (bi, 0, 0),
                                 memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, precision=precision,
                          nb=nb),
        grid=(b // nb,),
        in_specs=[blk(lq_pad), blk(lk_pad), blk(lk_pad),
                  pl.BlockSpec((nb, 1, lk_pad), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
                  blk(lq_pad)],
        out_specs=[blk(lq_pad), blk(lk_pad), blk(lk_pad)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lq_pad, d_pad), qb.dtype),
            jax.ShapeDtypeStruct((b, lk_pad, d_pad), kb.dtype),
            jax.ShapeDtypeStruct((b, lk_pad, d_pad), vb.dtype),
        ],
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(qb, kb, vb, biasb, gb)
    return dq[:, :lq, :d], dk[:, :lk, :d], dv[:, :lk, :d]


def _use_pallas_bwd(b: int, lq: int) -> bool:
    """Backward-path dispatch, MEASURED on v5e (BASELINE.md rounds 2-5):
    at few batch elements (flagship B=8 -> b=8..16) the XLA einsum backward
    wins — the kernel's lane-alignment pad/unpad copies cost more than the
    fusions it replaces (round-2 negative: 1088 -> 1112 us/step). At
    production batch AND long queries the XLA backward's relayout copies
    grow SUPERLINEARLY (eDOS lq=201, B=64 profile: copy-done 45 -> 1885
    us/step) and the kernel wins +6-10% end-to-end (B=64: 4818 -> 5282
    samples/s; B=128: 4351 -> 4610; neutral at large crystals). At SHORT
    queries those copies are ~4x smaller and the kernel's sublane padding
    (phDOS lq=51 -> 64 rows per operand) costs more than it saves: phDOS
    B=64 bf16 profile shows _fused_attention_bwd_nopad at 420 us (12.7% of
    the step) and switching its bwd to XLA measured +10.4% end-to-end
    (BASELINE.md round-5 profile attack). Default: Pallas at b >= 64
    elements AND lq >= 128 query rows (eDOS's 201-bin stream qualifies,
    phDOS's 51-bin stream does not). DOSTPU_ATTN_PALLAS_BWD=1/0 forces
    either path."""
    env = os.environ.get("DOSTPU_ATTN_PALLAS_BWD")
    if env in ("0", "1"):
        return env == "1"
    return b >= 64 and lq >= 128


def _softmax_attn_bwd(q, k, v, bias, g, scale):
    """Recompute-form backward of softmax(qk^T*scale + bias)v, shared by the
    XLA-fallback VJP and the LN-fused VJP.

    Scores and dp ACCUMULATE in at least f32 (preferred_element_type): the
    forward policy (line ~51) is bf16 MXU passes with f32 accumulation, and
    a bf16-ROUNDED score feeding exp() amplifies the rounding into 0.5-1%
    gradient error (measured) — at f32 inputs the promotion is the default
    and the math below is bit-identical to the pre-helper code."""
    acc = jnp.promote_types(q.dtype, jnp.float32)
    s = (jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=acc)
         * scale + bias[:, None, :])
    p32 = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    p = p32.astype(q.dtype)
    dv = jnp.einsum("bqk,bqd->bkd", p, g)
    dp = jnp.einsum("bqd,bkd->bqk", g, v, preferred_element_type=acc)
    ds = (p32 * (dp - jnp.sum(dp * p32, axis=-1,
                              keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bqk,bkd->bqd", ds, k) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, q) * scale
    return dq, dk, dv


def _fused_bwd(res, g):
    if _use_pallas_bwd(g.shape[0], g.shape[1]):
        if _use_nopad(g.shape[0], g.shape[1]):
            q, k, v, bias = res  # raw residuals
            dq, dk, dv = _fused_attention_bwd_nopad(q, k, v, bias, g)
            return dq, dk, dv, None
        # res holds the fwd's PADDED kernel operands (see _fused_fwd)
        qb, kb, vb, bias = res
        dq, dk, dv = _fused_attention_bwd(qb, kb, vb, bias, g)
        return dq, dk, dv, None
    q, k, v, bias = res
    d = q.shape[-1]
    dq, dk, dv = _softmax_attn_bwd(q, k, v, bias, g, d ** -0.5)
    return dq, dk, dv, None


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# LN-fused variant: the pre-LN transformer applies ONE shared LayerNorm to
# q, k and v separately right before the projection-free attention
# (reference transformer.py:132-134); its outputs feed ONLY the attention.
# Fusing the three LayerNorms into the kernel removes their HBM round trips
# (BASELINE.md round-2 burn-down item).
# ---------------------------------------------------------------------------

LN_EPS_ATTN = 1e-5  # == nn.modules.LN_EPS (kept literal: ops must not import nn)


def _attn_ln_fwd_kernel(x_ref, xk_ref, xv_ref, lns_ref, lnb_ref, cm_ref,
                        bias_ref, o_ref, *, scale: float, precision,
                        d_real: int, out_dtype):
    cm = cm_ref[0]      # [1, D_pad] 1.0 on real cols, 0.0 on padding
    lns = lns_ref[0]    # [1, D_pad] zero-padded LN scale
    lnb = lnb_ref[0]    # [1, D_pad] zero-padded LN bias

    def ln(t):
        # stats over the REAL feature width; padded cols are zeros on input
        t = t.astype(jnp.float32)
        mu = jnp.sum(t, axis=-1, keepdims=True) / d_real
        diff = (t - mu) * cm
        var = jnp.sum(diff * diff, axis=-1, keepdims=True) / d_real
        # zero-padded lns/lnb keep padding columns exactly 0
        out = diff * jax.lax.rsqrt(var + LN_EPS_ATTN) * lns + lnb
        return out.astype(out_dtype)

    q = ln(x_ref[0])
    k = ln(xk_ref[0])
    v = ln(xv_ref[0])
    s = jax.lax.dot(q, k.T, preferred_element_type=jnp.float32,
                    precision=precision) * scale
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0] = jax.lax.dot(p, v, preferred_element_type=jnp.float32,
                           precision=precision).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile",))
def _fused_attention_ln_fwd(x, x_k, x_v, ln_scale, ln_bias, bias,
                            *, q_tile: int = 256):
    b, lq, d = x.shape
    lk = x_k.shape[1]
    scale = d ** -0.5
    # same precision policy and padding/alignment rules as the main kernel
    # (shared helpers — a policy change must reach this opt-in variant too)
    precision = _attn_precision()
    xb, kb, vb, biasb, tq = _pad_operands(x, x_k, x_v, bias, q_tile)
    _, lq_pad, d_pad = xb.shape
    lk_pad = kb.shape[1]
    lns = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(
        ln_scale.astype(jnp.float32))
    lnb = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(
        ln_bias.astype(jnp.float32))
    cm = jnp.zeros((1, d_pad), jnp.float32).at[0, :d].set(1.0)

    grid = (b, lq_pad // tq)
    out = pl.pallas_call(
        functools.partial(_attn_ln_fwd_kernel, scale=scale,
                          precision=precision, d_real=d, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d_pad), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d_pad), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, d_pad), x.dtype),
        interpret=os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1",
    )(xb, kb, vb, lns, lnb, cm, biasb)
    return out[:, :lq, :d]


def _ln_apply(x, scale, bias):
    """flax LayerNorm(dtype=f32) semantics; returns (y in x.dtype, xhat, rstd)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS_ATTN)
    xhat = (xf - mu) * rstd
    y = (xhat * scale + bias).astype(x.dtype)
    return y, xhat, rstd


def _ln_bwd(g, xhat, rstd, scale, in_dtype):
    gf = g.astype(jnp.float32)
    dscale = (gf * xhat).sum(axis=tuple(range(g.ndim - 1)))
    dbias = gf.sum(axis=tuple(range(g.ndim - 1)))
    gx = gf * scale
    dx = rstd * (gx - gx.mean(-1, keepdims=True)
                 - xhat * (gx * xhat).mean(-1, keepdims=True))
    return dx.astype(in_dtype), dscale, dbias


@jax.custom_vjp
def _fused_attention_ln(x, x_k, x_v, ln_scale, ln_bias, bias):
    return _fused_attention_ln_fwd(x, x_k, x_v, ln_scale, ln_bias, bias)


def _fused_ln_vjp_fwd(x, x_k, x_v, ln_scale, ln_bias, bias):
    o = _fused_attention_ln_fwd(x, x_k, x_v, ln_scale, ln_bias, bias)
    return o, (x, x_k, x_v, ln_scale, ln_bias, bias)


def _fused_ln_vjp_bwd(res, g):
    x, x_k, x_v, ln_scale, ln_bias, bias = res
    d = x.shape[-1]
    scale = d ** -0.5
    # recompute the LN outputs (cheap; keeps the residuals = raw inputs)
    q, qhat, qrstd = _ln_apply(x, ln_scale, ln_bias)
    k, khat, krstd = _ln_apply(x_k, ln_scale, ln_bias)
    v, vhat, vrstd = _ln_apply(x_v, ln_scale, ln_bias)
    dq, dk, dv = _softmax_attn_bwd(q, k, v, bias, g, scale)
    dx, s1, b1 = _ln_bwd(dq, qhat, qrstd, ln_scale, x.dtype)
    dxk, s2, b2 = _ln_bwd(dk, khat, krstd, ln_scale, x_k.dtype)
    dxv, s3, b3 = _ln_bwd(dv, vhat, vrstd, ln_scale, x_v.dtype)
    return (dx, dxk, dxv,
            (s1 + s2 + s3).astype(ln_scale.dtype),
            (b1 + b2 + b3).astype(ln_bias.dtype), None)


_fused_attention_ln.defvjp(_fused_ln_vjp_fwd, _fused_ln_vjp_bwd)


def ln_attention_reference(x, x_k, x_v, ln_scale, ln_bias, key_mask=None):
    """jnp composition (the oracle / non-Pallas path): shared LN on q/k/v then
    projection-free attention — reference transformer.py:132-139."""
    q, _, _ = _ln_apply(x, ln_scale, ln_bias)
    k, _, _ = _ln_apply(x_k, ln_scale, ln_bias)
    v, _, _ = _ln_apply(x_v, ln_scale, ln_bias)
    return dot_product_attention(q, k, v, key_mask)


def fused_attention_ln(x, x_k, x_v, ln_scale, ln_bias, key_mask=None):
    """Shared-LN + projection-free attention in one Pallas kernel.

    Same contract as :func:`ln_attention_reference`; differential-tested in
    tests/test_multihead.py. Backward recomputes the LNs (residuals are the
    raw inputs — no LN output ever lands in HBM in either pass)."""
    b, lk = x.shape[0], x_k.shape[1]
    if key_mask is None:
        bias = jnp.zeros((b, lk), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    return _fused_attention_ln(x, x_k, x_v, ln_scale, ln_bias, bias)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Pallas-fused attention; falls back to the jnp path when attention-weight
    dropout is active (training with --attn_drop > 0) since the dropout mask
    lives on the [Lq, Lk] weights."""
    if dropout_rate > 0.0 and dropout_rng is not None:
        return dot_product_attention(q, k, v, key_mask,
                                     dropout_rate=dropout_rate,
                                     dropout_rng=dropout_rng)
    b, lk = q.shape[0], k.shape[1]
    if key_mask is None:
        bias = jnp.zeros((b, lk), jnp.float32)
    else:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    return _fused_attention(q, k, v, bias)
