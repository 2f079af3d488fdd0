"""Fused message-passing kernel (Pallas TPU).

One GNN processor step's edge pipeline, fused into a single VMEM-resident
kernel per (graph, edge-tile) — the hot irregular computation of the model
(reference EdgeModel/NodeModel, embedder_eDOS/DOSTransformer.py:168-189):

    mid   = src_proj[senders] + dst_proj[receivers] + edge_proj      (gathers)
    act   = PReLU(LayerNorm(mid))
    e_out = act @ W1 + b1                                            (edge MLP tail)
    agg   = segment_sum(e_out * edge_mask -> receivers)              (scatter)

The node-level projections (src_proj = x @ W0[:H], dst_proj = x @ W0[H:2H],
edge_proj = e @ W0[2H:] + b0) stay in XLA — they are large clean matmuls XLA
already runs near peak. What the fusion removes is the HBM round-trips of the
[E, 2H] intermediates (mid, normalized, activated) between those matmuls:
gathers, LN, PReLU, the W1 matmul and the scatter all happen on one VMEM tile.
Gather/scatter ride the MXU as one-hot matmuls (A is small: <= a few hundred
atoms per graph).

Backward is a custom VJP with a recompute-in-kernel strategy (the [E, 2H]
intermediates are never materialized in HBM in either pass).

Differential-tested against the jnp composition in tests/test_fused_mp.py;
opt-in via DOSTransformer(use_fused_mp=True) until proven faster end-to-end.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _interpret() -> bool:
    return os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# reference jnp composition (the oracle; also the CPU fallback)
# ---------------------------------------------------------------------------


def mp_edge_reference(src_proj, dst_proj, edge_proj, senders, receivers,
                      edge_mask, ln_scale, ln_bias, alpha, w1, b1):
    """jnp composition of the fused pipeline. All batch-leading:
    src_proj/dst_proj [B, A, M], edge_proj [B, E, M], senders/receivers [B, E],
    edge_mask [B, E]; returns (e_out [B, E, H], agg [B, A, H])."""
    sp = jnp.take_along_axis(src_proj, senders[..., None], axis=1)
    dp = jnp.take_along_axis(dst_proj, receivers[..., None], axis=1)
    mid = sp + dp + edge_proj
    mu = mid.mean(-1, keepdims=True)
    var = ((mid - mu) ** 2).mean(-1, keepdims=True)
    norm = (mid - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
    act = jnp.maximum(norm, 0.0) + alpha * jnp.minimum(norm, 0.0)
    e_out = act @ w1 + b1
    masked = e_out * edge_mask[..., None]
    a = src_proj.shape[1]
    agg = jax.vmap(lambda d, i: jax.ops.segment_sum(d, i, num_segments=a))(
        masked, receivers)
    return e_out, agg


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(s_ref, r_ref, m_ref, sp_ref, dp_ref, ep_ref, lns_ref, lnb_ref,
                alpha_ref, w1_ref, b1_ref, eout_ref, agg_ref, *, a_pad: int):
    e_idx = pl.program_id(1)

    @pl.when(e_idx == 0)
    def _zero():
        agg_ref[:] = jnp.zeros_like(agg_ref)

    senders = s_ref[0, 0]       # [TE]
    receivers = r_ref[0, 0]     # [TE]
    mask = m_ref[0, 0]          # [TE]
    te = senders.shape[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (te, a_pad), 1)
    oh_s = (rows == senders[:, None]).astype(jnp.float32)    # [TE, A]
    oh_r = (rows == receivers[:, None]).astype(jnp.float32)

    mid = (jax.lax.dot(oh_s, sp_ref[0], preferred_element_type=jnp.float32)
           + jax.lax.dot(oh_r, dp_ref[0], preferred_element_type=jnp.float32)
           + ep_ref[0])                                      # [TE, M]
    mu = jnp.mean(mid, axis=-1, keepdims=True)
    var = jnp.mean((mid - mu) ** 2, axis=-1, keepdims=True)
    norm = (mid - mu) * jax.lax.rsqrt(var + LN_EPS) * lns_ref[0] + lnb_ref[0]
    act = jnp.maximum(norm, 0.0) + alpha_ref[0, 0] * jnp.minimum(norm, 0.0)
    e_out = (jax.lax.dot(act, w1_ref[:],
                         preferred_element_type=jnp.float32) + b1_ref[0])
    eout_ref[0] = e_out.astype(eout_ref.dtype)
    masked = e_out * mask[:, None]
    agg_ref[0] += jax.lax.dot(oh_r.T, masked,
                              preferred_element_type=jnp.float32
                              ).astype(agg_ref.dtype)


def _bwd_kernel(s_ref, r_ref, m_ref, sp_ref, dp_ref, ep_ref, lns_ref, lnb_ref,
                alpha_ref, w1_ref, geout_ref, gagg_ref,
                gsp_ref, gdp_ref, gep_ref, glns_ref, glnb_ref, galpha_ref,
                gw1_ref, gb1_ref, *, a_pad: int):
    e_idx = pl.program_id(1)

    b_idx = pl.program_id(0)

    # per-graph node grads: zeroed at each graph's first edge tile
    @pl.when(e_idx == 0)
    def _zero():
        gsp_ref[:] = jnp.zeros_like(gsp_ref)
        gdp_ref[:] = jnp.zeros_like(gdp_ref)

    # parameter grads accumulate across the WHOLE grid (batch AND edge
    # tiles) into a single VMEM-resident block — one [M, H] buffer instead
    # of B of them in HBM plus an outer sum (the index maps are constant, so
    # Mosaic keeps the blocks resident between grid steps)
    @pl.when((b_idx == 0) & (e_idx == 0))
    def _zero_params():
        glns_ref[:] = jnp.zeros_like(glns_ref)
        glnb_ref[:] = jnp.zeros_like(glnb_ref)
        galpha_ref[:] = jnp.zeros_like(galpha_ref)
        gw1_ref[:] = jnp.zeros_like(gw1_ref)
        gb1_ref[:] = jnp.zeros_like(gb1_ref)

    senders = s_ref[0, 0]
    receivers = r_ref[0, 0]
    mask = m_ref[0, 0]
    te = senders.shape[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (te, a_pad), 1)
    oh_s = (rows == senders[:, None]).astype(jnp.float32)
    oh_r = (rows == receivers[:, None]).astype(jnp.float32)

    # recompute forward intermediates (never stored in HBM)
    mid = (jax.lax.dot(oh_s, sp_ref[0], preferred_element_type=jnp.float32)
           + jax.lax.dot(oh_r, dp_ref[0], preferred_element_type=jnp.float32)
           + ep_ref[0])
    m_dim = mid.shape[-1]
    mu = jnp.mean(mid, axis=-1, keepdims=True)
    var = jnp.mean((mid - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (mid - mu) * rstd
    norm = xhat * lns_ref[0] + lnb_ref[0]
    act = jnp.maximum(norm, 0.0) + alpha_ref[0, 0] * jnp.minimum(norm, 0.0)

    # d e_out: upstream + the aggregation's contribution (gather of g_agg)
    g_eout = (geout_ref[0]
              + mask[:, None] * jax.lax.dot(
                  oh_r, gagg_ref[0], preferred_element_type=jnp.float32))

    # W1 tail
    gw1_ref[:] += jax.lax.dot(act.T, g_eout,
                              preferred_element_type=jnp.float32)
    gb1_ref[0] += jnp.sum(g_eout, axis=0)
    g_act = jax.lax.dot(g_eout, w1_ref[:].T,
                        preferred_element_type=jnp.float32)

    # PReLU: act = max(norm, 0) + alpha * min(norm, 0)
    pos = norm > 0.0
    g_norm = jnp.where(pos, g_act, alpha_ref[0, 0] * g_act)
    galpha_ref[0, 0] += jnp.sum(jnp.where(pos, 0.0, g_act * norm))

    # LayerNorm
    glns_ref[0] += jnp.sum(g_norm * xhat, axis=0)
    glnb_ref[0] += jnp.sum(g_norm, axis=0)
    g_xhat = g_norm * lns_ref[0]
    g_mid = rstd * (g_xhat
                    - jnp.mean(g_xhat, axis=-1, keepdims=True)
                    - xhat * jnp.mean(g_xhat * xhat, axis=-1, keepdims=True))

    gep_ref[0] = g_mid.astype(gep_ref.dtype)
    gsp_ref[0] += jax.lax.dot(oh_s.T, g_mid,
                              preferred_element_type=jnp.float32)
    gdp_ref[0] += jax.lax.dot(oh_r.T, g_mid,
                              preferred_element_type=jnp.float32)


def _tile_bytes(te: int, m: int, h: int, a_pad: int) -> int:
    """Estimated live VMEM for one bwd-kernel tile (f32): ~6 [TE, m] buffers
    (the ep/gep blocks plus the mid/act/g_* temporaries after Mosaic buffer
    reuse), the [TE, h] g_eout block, and two [TE, a_pad] one-hots. The bwd
    kernel dominates the fwd, so one estimator serves both."""
    return 4 * te * (6 * m + 2 * h + 2 * a_pad)


def _fixed_bytes(m: int, h: int, a_pad: int) -> int:
    """Tile-independent residents: sp/dp/gsp/gdp [a_pad, m], g_agg [a_pad, h],
    w1 + the accumulated gw1 [m, h]."""
    return 4 * (4 * a_pad * m + a_pad * h + 2 * m * h)


# Mosaic's default per-kernel scoped-VMEM guard is ~16 MB; _tile_bytes is an
# ESTIMATE and was measured ~20% low on the bwd kernel at (B=64, A_pad=128,
# E=1536, m=512): actual 17.18 MB vs 14.08 estimated -> compile failure at
# the default guard. Raising the guard (v5e has 128 MB VMEM; this is a limit
# check, not an allocation) gives the estimator real headroom WITHOUT
# changing any tile choice the 14 MB budget makes.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _pick_tile_e(e: int, m: int, h: int, a_pad: int) -> int:
    """One edge tile per graph when it fits VMEM (grid (B, 1): fewer kernel
    invocations and zero tile-padding waste — measured fwd 24.5 vs
    31.8 us/call at the flagship E=384/m=512, and 38.0 vs 44.7/48.7 at the
    scaled E=768, each against fixed tiles). The tile comes from a BYTE
    budget, not E alone: the kernel footprint scales with tile_e*m, so at
    larger --hidden (e.g. m=1024) an unconditional 1024-edge tile would
    exceed ~16 MB VMEM and fail to compile — degrade to smaller tiles
    instead. The budget keeps both measured-fast single-tile configs above
    one-tile while capping m=1024 at tile 256."""
    budget = 14 * 1024 * 1024  # of ~16 MB VMEM
    full = min(_round_up(e, 128), 1024)
    cands = sorted({t for t in (full, 768, 512, 384, 256, 128) if t <= full},
                   reverse=True)
    fixed = _fixed_bytes(m, h, a_pad)
    for t in cands:
        if _tile_bytes(t, m, h, a_pad) + fixed <= budget:
            return t
    return 128


@functools.partial(jax.jit, static_argnames=("tile_e",))
def _fused_fwd_call(src_proj, dst_proj, edge_proj, senders, receivers,
                    edge_mask, ln_scale, ln_bias, alpha, w1, b1,
                    tile_e: int | None = None):
    b, a, m = src_proj.shape
    e = senders.shape[1]
    h = w1.shape[1]
    a_pad = max(8, _round_up(a, 8))
    if tile_e is None:
        tile_e = _pick_tile_e(e, m, h, a_pad)
    e_pad = _round_up(e, tile_e)

    def pad_nodes(t):
        return jnp.zeros((b, a_pad, m), t.dtype).at[:, :a].set(t)

    sp, dp = pad_nodes(src_proj), pad_nodes(dst_proj)
    ep = jnp.zeros((b, e_pad, m), edge_proj.dtype).at[:, :e].set(edge_proj)
    trash = jnp.int32(a_pad)  # out-of-range -> matches no one-hot row
    s = jnp.full((b, 1, e_pad), trash, jnp.int32).at[:, 0, :e].set(
        senders.astype(jnp.int32))
    r = jnp.full((b, 1, e_pad), trash, jnp.int32).at[:, 0, :e].set(
        receivers.astype(jnp.int32))
    mk = jnp.zeros((b, 1, e_pad), jnp.float32).at[:, 0, :e].set(
        edge_mask.astype(jnp.float32))

    grid = (b, e_pad // tile_e)
    eout, agg = pl.pallas_call(
        functools.partial(_fwd_kernel, a_pad=a_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, m), lambda bi, ei: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, m), lambda bi, ei: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_e, m), lambda bi, ei: (bi, ei, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda bi, ei: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, h), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_e, h), lambda bi, ei: (bi, ei, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, h), lambda bi, ei: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, e_pad, h), src_proj.dtype),
            # agg accumulates ACROSS edge tiles (`agg_ref[0] +=` above): the
            # buffer must be f32 so a multi-tile grid does not round the
            # partial sums to bf16 between tiles — exact aggregation sums
            # are the contract (ops/segment.py); cast once on the way out
            jax.ShapeDtypeStruct((b, a_pad, h), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(s, r, mk, sp, dp, ep, ln_scale[None], ln_bias[None], alpha[None, :1],
      w1, b1[None])
    return eout[:, :e], agg[:, :a].astype(src_proj.dtype)


@functools.partial(jax.jit, static_argnames=("tile_e",))
def _fused_bwd_call(src_proj, dst_proj, edge_proj, senders, receivers,
                    edge_mask, ln_scale, ln_bias, alpha, w1,
                    g_eout, g_agg, tile_e: int | None = None):
    b, a, m = src_proj.shape
    e = senders.shape[1]
    h = w1.shape[1]
    a_pad = max(8, _round_up(a, 8))
    if tile_e is None:
        tile_e = _pick_tile_e(e, m, h, a_pad)
    e_pad = _round_up(e, tile_e)

    def pad_nodes(t, width):
        return jnp.zeros((b, a_pad, width), t.dtype).at[:, :a].set(t)

    sp, dp = pad_nodes(src_proj, m), pad_nodes(dst_proj, m)
    ep = jnp.zeros((b, e_pad, m), edge_proj.dtype).at[:, :e].set(edge_proj)
    geo = jnp.zeros((b, e_pad, h), g_eout.dtype).at[:, :e].set(g_eout)
    gag = pad_nodes(g_agg, h)
    trash = jnp.int32(a_pad)
    s = jnp.full((b, 1, e_pad), trash, jnp.int32).at[:, 0, :e].set(
        senders.astype(jnp.int32))
    r = jnp.full((b, 1, e_pad), trash, jnp.int32).at[:, 0, :e].set(
        receivers.astype(jnp.int32))
    mk = jnp.zeros((b, 1, e_pad), jnp.float32).at[:, 0, :e].set(
        edge_mask.astype(jnp.float32))

    grid = (b, e_pad // tile_e)
    blk_e = lambda w: pl.BlockSpec((1, tile_e, w), lambda bi, ei: (bi, ei, 0), memory_space=pltpu.VMEM)
    blk_n = lambda w: pl.BlockSpec((1, a_pad, w), lambda bi, ei: (bi, 0, 0), memory_space=pltpu.VMEM)
    blk_vec = lambda w: pl.BlockSpec((1, w), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, a_pad=a_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_e), lambda bi, ei: (bi, 0, ei), memory_space=pltpu.VMEM),
            blk_n(m), blk_n(m), blk_e(m),
            blk_vec(m), blk_vec(m),
            pl.BlockSpec((1, 1), lambda bi, ei: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((m, h), lambda bi, ei: (0, 0), memory_space=pltpu.VMEM),
            blk_e(h), blk_n(h),
        ],
        out_specs=[
            blk_n(m), blk_n(m), blk_e(m),
            # parameter grads: ONE block accumulated across the whole grid
            # (constant index map -> VMEM-resident; zeroed at (0, 0))
            pl.BlockSpec((1, 1, m), lambda bi, ei: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, ei: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda bi, ei: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, h), lambda bi, ei: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h), lambda bi, ei: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((b, a_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((b, e_pad, m), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, m, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, h), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_VMEM_LIMIT,
    )(s, r, mk, sp, dp, ep, ln_scale[None], ln_bias[None], alpha[None, :1],
      w1, geo, gag)
    gsp, gdp, gep, glns, glnb, galpha, gw1, gb1 = outs
    return (gsp[:, :a], gdp[:, :a], gep[:, :e],
            glns[0, 0], glnb[0, 0],
            galpha.reshape(1), gw1[0], gb1[0, 0])


@jax.custom_vjp
def fused_mp_edge(src_proj, dst_proj, edge_proj, senders, receivers,
                  edge_mask, ln_scale, ln_bias, alpha, w1, b1):
    """Fused edge pipeline; same contract as :func:`mp_edge_reference`."""
    return _fused_fwd_call(src_proj, dst_proj, edge_proj, senders, receivers,
                           edge_mask, ln_scale, ln_bias, alpha, w1, b1)


def _vjp_fwd(src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
             ln_scale, ln_bias, alpha, w1, b1):
    out = _fused_fwd_call(src_proj, dst_proj, edge_proj, senders, receivers,
                          edge_mask, ln_scale, ln_bias, alpha, w1, b1)
    res = (src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
           ln_scale, ln_bias, alpha, w1)
    return out, res


def _vjp_bwd(res, cotangents):
    (src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
     ln_scale, ln_bias, alpha, w1) = res
    g_eout, g_agg = cotangents
    gsp, gdp, gep, glns, glnb, galpha, gw1, gb1 = _fused_bwd_call(
        src_proj, dst_proj, edge_proj, senders, receivers, edge_mask,
        ln_scale, ln_bias, alpha, w1, g_eout, g_agg)
    return (gsp, gdp, gep, None, None, None, glns, glnb, galpha, gw1, gb1)


fused_mp_edge.defvjp(_vjp_fwd, _vjp_bwd)
