"""1D piecewise-linear FE interpolant ("shape-function network").

Capability parity with the reference's ``PiecewiseLinearShapeNN``
(``/root/reference/src/models.py:6-90``), redesigned as a pure
``init``/``apply`` pair over parameter pytrees so the whole solve jits:

* parameters: nodal values ``u`` (free DOFs only) and, with ``r_adapt``,
  positive inter-node increments that reparameterize the grid
  (softplus -> clamp(1e-6) -> cumsum -> rescale to [x0, xN]) — this
  guarantees a monotone grid / no element inversion exactly like the
  reference (``src/models.py:46-56``).
* Dirichlet values u0/uN are baked into the static config and concatenated
  into ``u_full`` (``src/models.py:58-67`` analog).
* forward: ``searchsorted`` element locate + hat functions with an epsilon
  guard (``src/models.py:70-90`` analog), fully batched and jit-safe
  (static shapes, no data-dependent control flow).

Everything is a pure function of ``(params, x)`` so ``jax.grad`` provides
both solution gradients (d/du) and r-adaptivity gradients (d/d increments),
and ``jax.jvp`` gives du/dx for energy losses.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Linear1D"]

_EPS_SEG = 1e-10  # element-length division guard (src/models.py:43 analog)
_EPS_INC = 1e-6  # increment positivity floor (src/models.py:50 analog)


def _inv_softplus(y: np.ndarray) -> np.ndarray:
    """Inverse of softplus, stable for small/large y (host-side init only)."""
    y = np.asarray(y, dtype=np.float64)
    return y + np.log(-np.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Linear1D:
    """Static configuration of a 1D piecewise-linear interpolant.

    Attributes:
      n_nodes: number of grid nodes N.
      x0, xN: fixed endpoint coordinates.
      r_adapt: if True, interior node positions are trainable via the
        positive-increment reparameterization.
      u0, uN: optional fixed Dirichlet values at the endpoints; ``None``
        leaves the corresponding nodal value trainable.
      dtype: compute dtype (float32 default, like the reference).
    """

    n_nodes: int
    x0: float
    xN: float
    r_adapt: bool = False
    u0: Optional[float] = None
    uN: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    # fixed interior coords (hashable tuple) for non-adaptive, non-uniform
    # grids; None means uniform linspace(x0, xN, n_nodes)
    x_inner: Optional[tuple] = None

    # ---------------------------------------------------------------- init
    @classmethod
    def from_node_coords(cls, node_coords, r_adapt=False, u0=None, uN=None,
                         dtype=jnp.float32):
        """Build config + params from explicit node coordinates.

        Mirrors the reference constructor signature
        (``src/models.py:7``): returns ``(model, params)``.
        """
        node_coords = np.asarray(node_coords, dtype=np.float64)
        adaptive = r_adapt and node_coords.shape[0] > 2
        uniform = np.allclose(
            node_coords,
            np.linspace(node_coords[0], node_coords[-1], node_coords.shape[0]),
        )
        model = cls(
            n_nodes=int(node_coords.shape[0]),
            x0=float(node_coords[0]),
            xN=float(node_coords[-1]),
            r_adapt=r_adapt,
            u0=u0,
            uN=uN,
            dtype=dtype,
            x_inner=None if (adaptive or uniform)
            else tuple(float(v) for v in node_coords[1:-1]),
        )
        # Uniform grids: raw-diff increment init (the reference's choice,
        # ``src/models.py:19``) leaves the initial grid uniform and sits at
        # a much better-conditioned softplus slope — and reproduces the
        # reference's optimization trajectory (example-1 MSE parity).
        # Non-uniform grids need the faithful inverse-softplus init so the
        # initial geometry is preserved exactly.
        if uniform:
            return model, model.init_reference_compat(node_coords)
        return model, model.init(node_coords)

    @property
    def n_free_u(self) -> int:
        n = self.n_nodes
        if self.u0 is not None:
            n -= 1
        if self.uN is not None:
            n -= 1
        return n

    @property
    def adaptive(self) -> bool:
        return self.r_adapt and self.n_nodes > 2

    def init(self, node_coords=None) -> dict:
        """Initial parameter pytree.

        ``u`` starts at zero (reference ``src/models.py:36-40``); with
        r-adaptivity the increments start at the given grid spacing passed
        through inverse-softplus so the *initial grid equals node_coords
        exactly* (the reference initializes the raw parameter to the diffs
        themselves, ``src/models.py:18-19``, which shifts the initial grid
        through softplus; we keep the initial geometry faithful — use
        ``init_reference_compat`` to reproduce the reference's offset).
        """
        if node_coords is None:
            node_coords = np.linspace(self.x0, self.xN, self.n_nodes)
        node_coords = np.asarray(node_coords, dtype=np.float64)
        params = {"u": jnp.zeros((self.n_free_u,), dtype=self.dtype)}
        if self.adaptive:
            diffs = np.maximum(node_coords[1:] - node_coords[:-1], 2 * _EPS_INC)
            params["x_increments"] = jnp.asarray(_inv_softplus(diffs),
                                                 dtype=self.dtype)
        return params

    def init_reference_compat(self, node_coords=None) -> dict:
        """Init matching the reference bit-for-bit: raw increments = diffs
        (so the initial grid is softplus(diffs)-warped, ``src/models.py:19``).
        """
        if node_coords is None:
            node_coords = np.linspace(self.x0, self.xN, self.n_nodes)
        node_coords = np.asarray(node_coords, dtype=np.float64)
        params = {"u": jnp.zeros((self.n_free_u,), dtype=self.dtype)}
        if self.adaptive:
            params["x_increments"] = jnp.asarray(
                node_coords[1:] - node_coords[:-1], dtype=self.dtype)
        return params

    # ------------------------------------------------------------- getters
    def grid(self, params) -> jax.Array:
        """Current node coordinates [N], monotone by construction
        (``src/models.py:46-56`` analog)."""
        x0 = jnp.asarray(self.x0, dtype=self.dtype)
        xN = jnp.asarray(self.xN, dtype=self.dtype)
        if self.adaptive:
            inc = jnp.clip(jax.nn.softplus(params["x_increments"]), min=_EPS_INC)
            cum = jnp.cumsum(inc)
            x_inner = x0 + (xN - x0) * cum / cum[-1]
            return jnp.concatenate([x0[None], x_inner])
        if self.x_inner is not None:
            return jnp.asarray((self.x0,) + self.x_inner + (self.xN,),
                               dtype=self.dtype)
        return jnp.linspace(x0, xN, self.n_nodes, dtype=self.dtype)

    def u_full(self, params) -> jax.Array:
        """All nodal values [N] with Dirichlet ends baked in
        (``src/models.py:58-67`` analog)."""
        u = params["u"].reshape(-1)
        parts = []
        if self.u0 is not None:
            parts.append(jnp.asarray([self.u0], dtype=self.dtype))
        parts.append(u)
        if self.uN is not None:
            parts.append(jnp.asarray([self.uN], dtype=self.dtype))
        return jnp.concatenate(parts) if len(parts) > 1 else u

    # ------------------------------------------------------------- forward
    def apply(self, params, x_eval) -> jax.Array:
        """Evaluate u_h at ``x_eval`` (any shape); returns same shape.

        searchsorted locate + hat-function combine
        (``src/models.py:70-90`` analog). Locate indices are
        non-differentiable (as in torch); values/derivatives flow through
        the gathered endpoints, so d(u_h)/d(x_eval), d/du and
        d/d(increments) are all exact.
        """
        shape = jnp.shape(x_eval)
        x = jnp.asarray(x_eval, dtype=self.dtype).reshape(-1)
        grid = self.grid(params)
        idx = jnp.searchsorted(jax.lax.stop_gradient(grid), x, side="left") - 1
        idx = jnp.clip(idx, 0, self.n_nodes - 2)

        x_i = grid[idx]
        x_ip1 = grid[idx + 1]
        u_full = self.u_full(params)
        u_i = u_full[idx]
        u_ip1 = u_full[idx + 1]

        seg = jnp.clip(x_ip1 - x_i, min=_EPS_SEG)
        n1 = (x_ip1 - x) / seg
        n2 = (x - x_i) / seg
        return (u_i * n1 + u_ip1 * n2).reshape(shape)

    __call__ = apply

    def du_dx(self, params, x_eval) -> jax.Array:
        """du_h/dx at ``x_eval`` via forward-mode AD (piecewise constant)."""
        f = lambda x: self.apply(params, x)
        _, tangent = jax.jvp(f, (jnp.asarray(x_eval, self.dtype),),
                             (jnp.ones_like(jnp.asarray(x_eval, self.dtype)),))
        return tangent
