"""Edge->node segment aggregation ops.

TPU-native replacement for the reference's torch_scatter.scatter_sum /
scatter_mean native CUDA kernels (reference embedder_eDOS/DOSTransformer.py:187,
embedder_phDOS/DOSTransformer_phonon.py:209, utils.py:91).

Two implementations behind the same signature:
  * jnp (XLA scatter-add) — always available, differentiable, the reference
    semantics oracle.
  * Pallas — a blocked one-hot-matmul kernel that rides the MXU; used for the
    hot edge->node aggregation over fixed-shape padded edge arrays.

Both operate on *padded* arrays: out-of-range segment ids are dropped, and
callers mask pad rows (multiply data by the mask) before aggregation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run Pallas kernels in interpreter mode (CPU tests): set
    DOSTPU_PALLAS_INTERPRET=1."""
    return os.environ.get("DOSTPU_PALLAS_INTERPRET", "0") == "1"


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """sum_{i: segment_ids[i]==s} data[i]   -> [num_segments, ...].

    Semantics of torch_scatter.scatter_sum(src, index, dim=0, dim_size=N)
    (reference DOSTransformer.py:187). Out-of-range ids (>= num_segments, e.g.
    padding rows pointed at a trash id) are dropped.
    """
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Mean aggregation with torch_scatter.scatter_mean semantics
    (reference DOSTransformer_phonon.py:209): empty segments yield 0.

    ``weights`` (e.g. an edge mask) selects which rows count toward the
    denominator; data rows must already be masked by the caller.
    """
    total = segment_sum(data, segment_ids, num_segments)
    if weights is None:
        weights = jnp.ones(data.shape[:1], dtype=data.dtype)
    count = segment_sum(weights.astype(data.dtype), segment_ids, num_segments)
    count = jnp.maximum(count, 1.0)
    return total / count[(...,) + (None,) * (data.ndim - 1)]


def batched_segment_sum(data: jax.Array, segment_ids: jax.Array,
                        num_segments: int) -> jax.Array:
    """Per-graph segment sum over batch-leading arrays: data [B, E, F],
    segment_ids [B, E] (local, in [0, num_segments)) -> [B, num_segments, F].
    Batch-local by construction — shards cleanly over the 'data' mesh axis."""
    return jax.vmap(lambda d, i: segment_sum(d, i, num_segments))(data, segment_ids)


def batched_segment_mean(data: jax.Array, segment_ids: jax.Array,
                         num_segments: int, weights: jax.Array) -> jax.Array:
    """Per-graph masked segment mean (torch scatter_mean semantics: empty
    segments -> 0). data rows must already be masked by the caller."""
    total = batched_segment_sum(data, segment_ids, num_segments)
    count = batched_segment_sum(weights[..., None].astype(data.dtype),
                                segment_ids, num_segments)
    return total / jnp.maximum(count, 1.0)


# ---------------------------------------------------------------------------
# Pallas kernel: blocked segment-sum via local one-hot matmul on the MXU.
#
# Strategy: edges are processed in tiles of TILE_E rows. For each edge tile we
# build, *in VMEM*, a one-hot routing matrix R[TILE_N, TILE_E] per node tile
# (R[n, e] = 1 iff segment_ids[e] == node_tile_base + n) and accumulate
# R @ data_tile into the output node tile. The grid iterates node tiles in the
# outer dimension and edge tiles in the inner dimension, accumulating into the
# same output block (revisited across the inner grid axis).
#
# For graph workloads where edges are sorted (or nearly sorted) by receiver,
# most (node_tile, edge_tile) pairs produce an all-zero routing matrix; a
# cheap range test skips the matmul for those pairs.
# ---------------------------------------------------------------------------


def _segment_sum_kernel(ids_ref, data_ref, out_ref, *, tile_n: int):
    n_idx = pl.program_id(0)
    e_idx = pl.program_id(1)

    @pl.when(e_idx == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    node_base = n_idx * tile_n
    ids = ids_ref[0, :]  # [TILE_E] int32 (kept 2D in SMEM-friendly layout)

    lo = jnp.min(ids)
    hi = jnp.max(ids)
    overlaps = jnp.logical_and(lo < node_base + tile_n, hi >= node_base)

    @pl.when(overlaps)
    def _accum():
        # R[n, e] = 1 iff ids[e] - node_base == n
        local = ids - node_base  # [TILE_E]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, ids.shape[0]), 0)
        onehot = (rows == local[None, :]).astype(data_ref.dtype)
        # HIGHEST: the routing matrix is exact 0/1, but the data operand must
        # not be rounded to bf16 on the MXU — exact sums are the contract.
        out_ref[:] += jax.lax.dot(
            onehot, data_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_segments", "tile_n", "tile_e"))
def segment_sum_pallas(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    *,
    tile_n: int = 128,
    tile_e: int = 512,
) -> jax.Array:
    """Pallas TPU segment-sum. Same contract as :func:`segment_sum`.

    data [E, F] float, segment_ids [E] int32; ids >= num_segments are dropped.
    E and F need not be tile-aligned; they are padded here (pad rows are routed
    to a trash id).
    """
    e, f = data.shape
    f_pad = max(128, -(-f // 128) * 128)
    e_pad = -(-e // tile_e) * tile_e
    n_pad = -(-num_segments // tile_n) * tile_n

    trash = jnp.int32(n_pad)  # one past the padded range -> never matches
    ids = jnp.full((e_pad,), trash, jnp.int32).at[:e].set(segment_ids.astype(jnp.int32))
    # drop genuinely out-of-range ids exactly like jax.ops.segment_sum
    ids = jnp.where(ids >= num_segments, trash, ids)
    ids = jnp.where(ids < 0, trash, ids)
    buf = jnp.zeros((e_pad, f_pad), data.dtype).at[:e, :f].set(data)

    grid = (n_pad // tile_n, e_pad // tile_e)
    out = pl.pallas_call(
        functools.partial(_segment_sum_kernel, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_e), lambda n, e_: (0, e_), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_e, f_pad), lambda n, e_: (e_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, f_pad), lambda n, e_: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), data.dtype),
        interpret=_interpret(),
    )(ids[None, :], buf)
    return out[:num_segments, :f]
