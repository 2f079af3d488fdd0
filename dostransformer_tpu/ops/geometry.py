"""Closed-form geometry featurization ops.

TPU-native replacements for the reference's dependency-provided kernels:
  * e3nn o3.spherical_harmonics(lmax=1, normalize=True, 'component')
    (reference DOSTransformer_phonon.py:75)
  * e3nn gate_points_2101.smooth_cutoff (reference DOSTransformer_phonon.py:77)
  * the CGCNN-style Gaussian distance expansion (reference mat2graph.py:162-179)

All are trivially fusable elementwise jnp; XLA fuses them into the surrounding
encoder matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def smooth_cutoff(x: jax.Array) -> jax.Array:
    """e3nn gate_points_2101.smooth_cutoff closed form.

    With u = 2*(x-1):  1 for u < -1;  (1 - cos(pi*u))/2 for -1 <= u <= 0;
    0 for u > 0.  The reference calls this with x = edge_length / r_max
    (DOSTransformer_phonon.py:77), ramping from 1 at r=r_max/2 to 0 at r=r_max.
    """
    u = 2.0 * (x - 1.0)
    y = (1.0 - jnp.cos(jnp.pi * u)) / 2.0
    y = jnp.where(u > 0.0, 0.0, y)
    y = jnp.where(u < -1.0, 1.0, y)
    return y


def spherical_harmonics_l1(edge_vec: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Real spherical harmonics l<=1, e3nn 'component' normalization, with
    input normalization (normalize=True), matching
    o3.spherical_harmonics(o3.Irreps.spherical_harmonics(1), edge_vec, True,
    normalization='component') at reference DOSTransformer_phonon.py:75.

    Output [E, 4] = [1, sqrt(3)*x/r, sqrt(3)*y/r, sqrt(3)*z/r] — the l=1
    block is the normalized input in ITS OWN component order. e3nn's
    generated polynomials (e3nn/o3/_spherical_harmonics.py) are
    sh_1_0 = sqrt(3)*x, sh_1_1 = sqrt(3)*y, sh_1_2 = sqrt(3)*z, evaluated on
    the input components in order; e3nn's y-up axis convention is chosen
    precisely so that Y^1 is the identity on (x, y, z). Cross-check: the l=2
    terms sqrt(15)*x*z, sqrt(15)*x*y, ... are the physics-convention
    polynomials xy, yz, ... under the cyclic axis map
    (x,y,z)_phys -> (z,x,y)_e3nn, which maps Y^1_phys = (y,z,x)_phys to the
    identity. NOTE: a column permutation here is absorbed by the first
    edge-MLP linear layer, so training-from-scratch behavior is unaffected
    either way; the order matters only for activation-level parity.

    'component' normalization: |Y^l|^2 = 2l+1 on the unit sphere
    (Y^0 = 1, Y^1 = sqrt(3)*unit).

    Zero-length vectors (padding rows, self-loops with zero shift) produce
    [1, 0, 0, 0] — e3nn normalizes 0/0 to 0 as well.
    """
    r = jnp.linalg.norm(edge_vec, axis=-1, keepdims=True)
    unit = edge_vec / jnp.maximum(r, eps)
    sqrt3 = jnp.sqrt(jnp.asarray(3.0, edge_vec.dtype))
    y00 = jnp.ones_like(r)
    return jnp.concatenate([y00, sqrt3 * unit], axis=-1)


def edge_geometry_phdos(edge_vec: jax.Array, r_max: float = 4.0) -> jax.Array:
    """The phDOS in-model edge featurization (DOSTransformer_phonon.py:74-77):
    smooth_cutoff(|v| / r_max)[:, None] * SH_l<=1(v)   -> [E, 4].
    """
    sh = spherical_harmonics_l1(edge_vec)
    length = jnp.linalg.norm(edge_vec, axis=-1)
    return smooth_cutoff(length / r_max)[..., None] * sh


def gaussian_basis_centers(dmin: float = 0.0, dmax: float = 8.0, step: float = 0.2) -> np.ndarray:
    """Filter centers arange(dmin, dmax+step, step) (mat2graph.py:171) — 41 dims
    for the defaults."""
    return np.arange(dmin, dmax + step, step)


def gaussian_basis(
    distances: jax.Array,
    dmin: float = 0.0,
    dmax: float = 8.0,
    step: float = 0.2,
    var: float | None = None,
) -> jax.Array:
    """CGCNN Gaussian distance expansion (mat2graph.py:176-179):
    exp(-(d - centers)**2 / var**2), var defaults to step."""
    if var is None:
        var = step
    centers = jnp.asarray(gaussian_basis_centers(dmin, dmax, step),
                          dtype=distances.dtype)
    return jnp.exp(-((distances[..., None] - centers) ** 2) / (var ** 2))
