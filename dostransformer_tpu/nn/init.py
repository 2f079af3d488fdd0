"""Parameter initializers matching torch semantics.

The reference mixes two Linear init schemes:
  * torch default (kaiming_uniform(a=sqrt(5)) on weight -> U(-1/sqrt(fan_in),
    1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), 1/sqrt(fan_in))) — used everywhere
    except the transformer (all GNN MLPs, out_layer, fc, fc_prompt).
  * xavier_uniform weight + zero bias — only the transformer's fc1/fc2
    (reference layers/transformer.py:160-165).
torch Embedding default is N(0, 1); torch PReLU default is a single shared
slope initialized to 0.25.

flax Dense kernels are [fan_in, fan_out] (torch stores [out, in]); fan_in here
is shape[0] of the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernel [fan_in, fan_out]
    (== torch kaiming_uniform(a=sqrt(5)): bound = sqrt(6/(6*fan_in)))."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """xavier_uniform for kernel [fan_in, fan_out] (transformer.py:162)."""
    fan_in, fan_out = shape[0], shape[1]
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)
