"""2D structured (tensor-product) bilinear FE interpolant.

Capability parity with the reference's *first* ``PiecewiseLinearShapeNN2D``
(``/root/reference/src/models.py:93-212``) — the structured-grid model that
is unreachable as shipped because a second class of the same name shadows it
(quirk E1 in SURVEY.md, verified ``examples/example2.py:31`` raises
TypeError).  Rebuilt under a distinct name as a pure init/apply pair:

* separable grids grid_x [Nx], grid_y [Ny]; per-axis positive-increment
  r-adaptivity reparameterization (``src/models.py:111-116, 148-155``);
* per-axis boundary masks pin boundary coordinates to their initial values
  via ``where`` (``src/models.py:122-134, 164-166``); the 2D node mask is
  the row-OR-column union (``src/models.py:134``);
* nodal values ``u`` [Nx, Ny] (randn init, ``src/models.py:142``), with an
  optional scalar ``u_fixed`` applied on the node mask
  (``src/models.py:170-177``);
* forward: per-axis searchsorted locate, 4-corner gather, bilinear blend
  (``src/models.py:180-212``), fully batched/jit-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Bilinear2D"]

_EPS_SEG = 1e-10
_EPS_INC = 1e-6


def _inv_softplus(y: np.ndarray) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    return y + np.log(-np.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Bilinear2D:
    """Static config for the structured bilinear interpolant."""

    nx: int
    ny: int
    x0: float
    xN: float
    y0: float
    yN: float
    r_adapt: bool = False
    u_fixed: Optional[float] = None
    # hashable initial grids (needed to pin boundary coords like the
    # reference's ``initial_x_grid`` buffers, src/models.py:102-103)
    initial_grid_x: tuple = ()
    initial_grid_y: tuple = ()
    # per-axis boundary masks as hashable tuples of bool
    boundary_mask_x: tuple = ()
    boundary_mask_y: tuple = ()
    dtype: jnp.dtype = jnp.float32

    # ---------------------------------------------------------------- init
    @classmethod
    def create(cls, grid_x, grid_y, boundary_mask_x=None, boundary_mask_y=None,
               r_adapt=False, u_fixed=None, dtype=jnp.float32, seed=0):
        """Build (model, params); mirrors the reference constructor
        signature (``src/models.py:94``)."""
        gx = np.asarray(grid_x, dtype=np.float64).reshape(-1)
        gy = np.asarray(grid_y, dtype=np.float64).reshape(-1)
        nx, ny = gx.shape[0], gy.shape[0]
        if boundary_mask_x is None:
            boundary_mask_x = np.zeros(nx, bool)
            boundary_mask_x[[0, -1]] = True
        if boundary_mask_y is None:
            boundary_mask_y = np.zeros(ny, bool)
            boundary_mask_y[[0, -1]] = True
        model = cls(
            nx=nx, ny=ny,
            x0=float(gx[0]), xN=float(gx[-1]),
            y0=float(gy[0]), yN=float(gy[-1]),
            r_adapt=r_adapt, u_fixed=u_fixed,
            initial_grid_x=tuple(map(float, gx)),
            initial_grid_y=tuple(map(float, gy)),
            boundary_mask_x=tuple(map(bool, boundary_mask_x)),
            boundary_mask_y=tuple(map(bool, boundary_mask_y)),
            dtype=dtype,
        )
        return model, model.init(jax.random.PRNGKey(seed))

    @property
    def adaptive(self) -> bool:
        return self.r_adapt and max(self.nx, self.ny) > 2

    def init(self, key) -> dict:
        """randn nodal values (src/models.py:142 analog) + increment params.

        Uniform axes use the reference's raw-diff init
        (``src/models.py:113-116``) — initial grid stays uniform and the
        softplus slope is well-conditioned; non-uniform axes use the
        faithful inverse-softplus init so the initial geometry is exact.
        """
        params = {"u": jax.random.normal(key, (self.nx, self.ny),
                                         dtype=self.dtype)}
        if self.adaptive:
            for axis, grid in (("x", self.initial_grid_x),
                               ("y", self.initial_grid_y)):
                g = np.asarray(grid)
                diffs = np.maximum(np.diff(g), 2 * _EPS_INC)
                uniform = np.allclose(g, np.linspace(g[0], g[-1], g.size))
                raw = diffs if uniform else _inv_softplus(diffs)
                params[f"increments_{axis}"] = jnp.asarray(raw,
                                                           dtype=self.dtype)
        return params

    # ------------------------------------------------------------- getters
    def _axis_grid(self, incr, g0, gN, initial, bmask):
        g0 = jnp.asarray(g0, self.dtype)
        gN = jnp.asarray(gN, self.dtype)
        inc = jnp.clip(jax.nn.softplus(incr), min=_EPS_INC)
        cum = jnp.cumsum(inc)
        inner = g0 + (gN - g0) * cum / cum[-1]
        full = jnp.concatenate([g0[None], inner])
        # pin boundary-mask coords to initial positions (src/models.py:165)
        return jnp.where(jnp.asarray(bmask), jnp.asarray(initial, self.dtype),
                         full)

    def grid(self, params):
        """Current (grid_x [Nx], grid_y [Ny])."""
        if self.adaptive:
            gx = self._axis_grid(params["increments_x"], self.x0, self.xN,
                                 self.initial_grid_x, self.boundary_mask_x)
            gy = self._axis_grid(params["increments_y"], self.y0, self.yN,
                                 self.initial_grid_y, self.boundary_mask_y)
            return gx, gy
        return (jnp.asarray(self.initial_grid_x, self.dtype),
                jnp.asarray(self.initial_grid_y, self.dtype))

    def node_mask(self):
        """2D boundary-node mask [Nx, Ny] = row OR column boundary."""
        bx = jnp.asarray(self.boundary_mask_x)
        by = jnp.asarray(self.boundary_mask_y)
        return bx[:, None] | by[None, :]

    def u_full(self, params):
        """Nodal values [Nx, Ny] with fixed boundary value applied
        (src/models.py:170-177 analog)."""
        if self.u_fixed is not None:
            return jnp.where(self.node_mask(),
                             jnp.asarray(self.u_fixed, self.dtype),
                             params["u"])
        return params["u"]

    # ------------------------------------------------------------- forward
    def apply(self, params, x_eval):
        """Evaluate u_h at points x_eval [M, 2] -> [M]."""
        x_eval = jnp.asarray(x_eval, self.dtype)
        grid_x, grid_y = self.grid(params)
        px, py = x_eval[:, 0], x_eval[:, 1]
        ix = jnp.clip(
            jnp.searchsorted(jax.lax.stop_gradient(grid_x), px, side="left") - 1,
            0, self.nx - 2)
        iy = jnp.clip(
            jnp.searchsorted(jax.lax.stop_gradient(grid_y), py, side="left") - 1,
            0, self.ny - 2)

        x_i, x_ip1 = grid_x[ix], grid_x[ix + 1]
        y_i, y_ip1 = grid_y[iy], grid_y[iy + 1]

        u = self.u_full(params)
        u00 = u[ix, iy]
        u10 = u[ix + 1, iy]
        u01 = u[ix, iy + 1]
        u11 = u[ix + 1, iy + 1]

        hx = jnp.clip(x_ip1 - x_i, min=_EPS_SEG)
        hy = jnp.clip(y_ip1 - y_i, min=_EPS_SEG)
        n1x = (x_ip1 - px) / hx
        n2x = (px - x_i) / hx
        n1y = (y_ip1 - py) / hy
        n2y = (py - y_i) / hy
        return n1x * n1y * u00 + n2x * n1y * u10 + n1x * n2y * u01 \
            + n2x * n2y * u11

    __call__ = apply

    def grad_u(self, params, x_eval):
        """(du/dx, du/dy) at x_eval [M,2] via forward-mode AD -> [M, 2]."""
        x_eval = jnp.asarray(x_eval, self.dtype)
        f = lambda p: self.apply(params, p)
        _, dx = jax.jvp(f, (x_eval,),
                        (jnp.tile(jnp.asarray([[1.0, 0.0]], self.dtype),
                                  (x_eval.shape[0], 1)),))
        _, dy = jax.jvp(f, (x_eval,),
                        (jnp.tile(jnp.asarray([[0.0, 1.0]], self.dtype),
                                  (x_eval.shape[0], 1)),))
        return jnp.stack([dx, dy], axis=1)
