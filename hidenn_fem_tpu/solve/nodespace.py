"""Node-space solves: iterate on the packed [N, 4] node table directly.

The params-space energy pays three full-array passes per step before
the stencil ever runs — two Dirichlet ``where`` selects and the
coords/u concat of ``packed_nodes`` — plus the matching unpack in the
backward (the compiled-HLO finding in ``ops/lattice_slab.py``'s module
doc).  For solves those passes are pure overhead: the fixed entries
never change.  This module bakes the BCs into the node table ONCE,
masks their gradients with an identity-forward ``grad_gate`` (so the
optimizer — unchanged — never moves them), and runs the existing
drivers on the node table itself:

    per step:   energy(node) -> grads -> axpy updates
    (no selects, no concat, no unpack)

Gradient equivalence: the params-space gradient IS the masked node
gradient (the chain rule through ``where(mask, fixed, free)`` is the
mask multiply), so node-space L-BFGS reproduces the params-space
trajectory up to float reassociation — plateau-equality tested in
``tests/test_nodespace.py``.

Lattice-routable energies only (``losses.total_from_nodes``); the
gather/banded assemblies' step is dominated by their gathers, not by
packing, so they stay params-space.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .drivers import run_lbfgs

__all__ = ["grad_gate", "node_free_mask", "lbfgs_node_space"]


@jax.custom_vjp
def grad_gate(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Identity forward; backward multiplies the cotangent by ``mask``.

    Passing the mask as an argument (not a closure) keeps the jitted
    loss free of captured device arrays (the ~27 ms/call degraded-mode
    trap on the tunneled backend — see CLAUDE.md)."""
    return x


def _gate_fwd(x, mask):
    return x, mask


def _gate_bwd(mask, ct):
    return ct * mask, None


grad_gate.defvjp(_gate_fwd, _gate_bwd)


def node_free_mask(model, mesh) -> jax.Array:
    """[N, 4] 0/1 mask of the free node-table entries: coords columns
    free off the geometric boundary, u columns off the Dirichlet set."""
    cfree = ~mesh.geom_boundary_mask
    ufree = ~mesh.dirichlet_mask
    return jnp.stack([cfree, cfree, ufree, ufree],
                     axis=1).astype(model.dtype)


def lbfgs_node_space(energy, params, mesh, num_steps: int = 600,
                     tol: Optional[float] = None, **kwargs
                     ) -> Tuple[dict, jax.Array]:
    """L-BFGS on the node table; returns (params-shaped solution,
    losses) like ``minimize(method="lbfgs")``.

    The returned ``coords``/``u`` carry the PINNED values at fixed
    entries (params-space leaves whatever the initial params held
    there; both evaluate identically through the model's selects).
    """
    node0 = energy.model.packed_nodes(params, mesh)
    mask = node_free_mask(energy.model, mesh)
    node_sol, losses = run_lbfgs(_node_loss_for(energy), node0,
                                 num_steps=num_steps, tol=tol,
                                 loss_args=(mask, mesh), **kwargs)
    return ({"coords": node_sol[:, :2], "u": node_sol[:, 2:]}, losses)


@functools.lru_cache(maxsize=None)
def _node_loss_for(energy):
    """Memoized node-table loss adapter.  jit caches key on function
    identity, so a per-call closure recompiles the whole solve every
    call (~4 s at 6.4K through the remote compiler); one adapter per
    (hashable) energy keeps repeat solves warm — same lesson as
    ``linear.py:_u_loss_for``."""
    def loss(node, mask, mesh):
        return energy.total_from_nodes(grad_gate(node, mask), mesh)
    return loss
