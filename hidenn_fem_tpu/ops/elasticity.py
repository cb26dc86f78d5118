"""Plane-stress constitutive algebra (Voigt form) and stress recovery.

Mirrors the constitutive pieces of the reference's ``EnergyLoss2D``
(``/root/reference/src/loss.py:28-32, 69-77``) and the von-Mises recovery in
``src/plots.py:189-201``, as free functions over arrays so they fuse into
whatever kernel calls them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "plane_stress_C",
    "strain_voigt_from_grad",
    "stress_from_strain",
    "energy_density",
    "von_mises_plane_stress",
]


def plane_stress_C(E: float, nu: float, dtype=jnp.float32) -> jax.Array:
    """Plane-stress constitutive matrix C [3,3] (``src/loss.py:29-32``)."""
    f = E / (1.0 - nu ** 2)
    return jnp.asarray(
        [[f, f * nu, 0.0],
         [f * nu, f, 0.0],
         [0.0, 0.0, f * (1.0 - nu) / 2.0]], dtype=dtype)


def strain_voigt_from_grad(grad_u: jax.Array) -> jax.Array:
    """Infinitesimal strain in Voigt form [.., 3] from grad_u [.., 2, 2].

    Voigt convention [eps_xx, eps_yy, 2*eps_xy] (engineering shear),
    matching ``src/loss.py:70-73``.  grad_u[i, j] = d u_i / d x_j.
    """
    eps_xx = grad_u[..., 0, 0]
    eps_yy = grad_u[..., 1, 1]
    gamma_xy = grad_u[..., 0, 1] + grad_u[..., 1, 0]
    return jnp.stack([eps_xx, eps_yy, gamma_xy], axis=-1)


def stress_from_strain(eps_voigt: jax.Array, C: jax.Array) -> jax.Array:
    """sigma = eps @ C^T (``src/loss.py:76``).

    Full f32 precision forced: the TPU MXU's default matmul precision is
    bf16, which costs ~1e-3 relative error on strain energies — measured
    against f64 ground truth on the benchmark plate.
    """
    return jnp.dot(eps_voigt, C.T, precision=jax.lax.Precision.HIGHEST)


def energy_density(eps_voigt: jax.Array, C: jax.Array) -> jax.Array:
    """Elastic energy density 0.5 * eps : sigma (``src/loss.py:77``)."""
    sigma = stress_from_strain(eps_voigt, C)
    return 0.5 * jnp.sum(eps_voigt * sigma, axis=-1)


def von_mises_plane_stress(grad_u: jax.Array, E: float, nu: float
                           ) -> jax.Array:
    """Plane-stress von-Mises stress from grad_u [.., 2, 2].

    Same recovery as the reference post-processor (``src/plots.py:189-201``):
    sigma_vm = sqrt(sxx^2 - sxx*syy + syy^2 + 3*sxy^2).
    """
    eps_xx = grad_u[..., 0, 0]
    eps_yy = grad_u[..., 1, 1]
    eps_xy = 0.5 * (grad_u[..., 0, 1] + grad_u[..., 1, 0])
    f = E / (1.0 - nu ** 2)
    sxx = f * (eps_xx + nu * eps_yy)
    syy = f * (eps_yy + nu * eps_xx)
    sxy = E / (1.0 + nu) * eps_xy
    return jnp.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3.0 * sxy ** 2)
