"""Multi-chip auxiliary-space PCG: the unstructured flagship solver
composed with the device mesh.

The ingredients existed separately after round 2 — element-sharded
banded matvecs (``sharding.shard_map_banded_energy`` + CG,
``tests/test_sharding.py``) and the single-device auxiliary-space
preconditioner (``solve/auxspace.py``).  This module is the composition:

* **matvec** (the per-iteration cost, O(Ne)): the element-sharded
  blocked-window Pallas energy gradient — forward psum of scalar
  partials over ICI, communication-free single-pass recompute backward.
* **preconditioner** (O(N) elementwise + an ~(fine/2)^2 lattice
  V-cycle): runs REPLICATED.  The PCG state vectors are nodal arrays
  that come out of the psum-reduced matvec replicated, so the Jacobi
  term, the P/Pᵀ transfers, and the background V-cycle all compute
  redundantly per device with ZERO communication — the classic
  small-subproblem replication trade (same choice as the replicated
  coarse levels of ``sharded_mg.py``).  The V-cycle's work is ~1/4 of
  one fine matvec, so redundant compute costs a few percent while
  avoiding gather/scatter collectives entirely.

Exactness: the sharded matvec equals the single-device matvec up to
float reassociation, and the preconditioner is bit-identical, so
iteration counts and solutions match the single-device
``aux_pcg_solve`` (asserted in ``tests/test_sharding.py``).

The reference hot path this scales is ``/root/reference/src/loss.py:
55-116`` (the plate energy it minimizes with generic optimizers); the
reference itself has no distributed or linear-solver code (SURVEY §2/§5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ..models.structured_grid import StructuredGridP1
from ..solve.auxspace import _aux_pcg, build_aux_preconditioner
from . import sharding as sh

__all__ = ["aux_pcg_solve_sharded"]


@functools.lru_cache(maxsize=32)
def _sharded_u_loss(energy, dmesh: Mesh):
    """Memoized displacement-only adapter over the element-sharded
    banded energy.  Memoized on (energy, device-mesh): jit keys on
    function identity, so a fresh closure per call would recompile the
    whole PCG while_loop every call (CLAUDE.md lesson)."""
    loss = sh.shard_map_banded_energy(energy, dmesh)

    def u_loss(pu, coords, tri):
        return loss({"u": pu["u"], "coords": coords}, tri)

    return u_loss


@functools.lru_cache(maxsize=32)
def _sharded_lattice_u_loss(energy, dmesh: Mesh):
    """Memoized displacement-only adapter over the row-sharded lattice
    energy — the matvec for lattice-topology and hybrid lattice+collar
    meshes, which evaluate from node-table slices instead of assembly
    gathers (847K hybrid: 0.61 ms/step vs 51.6 ms generic)."""
    from .sharded_lattice import sharded_lattice_energy
    loss = sharded_lattice_energy(energy, dmesh)

    def u_loss(pu, coords, tri):
        return loss({"u": pu["u"], "coords": coords}, tri)

    return u_loss


def aux_pcg_solve_sharded(energy, mesh, params,
                          dmesh: Optional[Mesh] = None,
                          n_devices: Optional[int] = None,
                          bg_model: Optional[StructuredGridP1] = None,
                          bg_shape: Optional[Tuple[int, int]] = None,
                          pre=None, max_iters: int = 200,
                          tol: float = 1e-6) -> Tuple[dict, jax.Array]:
    """Auxiliary-space-preconditioned CG for the unstructured
    displacement problem, with every matvec element-sharded over the
    device mesh (see module docstring).

    Args:
      energy: a ``PlaneStressEnergy`` (supplies the quadratic fine
        operator; its E/nu also default the background operator so the
        Jacobi/coarse term ratio matches the fine energy).
      mesh: the ``TriMesh``; banded tables are rebuilt with
        device-divisible block counts if needed (``reband_for_shards``).
      params: ``{"coords", "u"}`` — coordinates frozen, ``u`` initial.
      dmesh / n_devices: the device mesh (default: all local devices).
      pre: prebuilt ``build_aux_preconditioner`` product to amortize
        setup across solves (must have been built against the SAME
        sharded loss/background model).

    Returns (solved params, per-iteration relative residual norms).
    """
    if dmesh is None:
        devs = jax.devices()
        n = int(n_devices or len(devs))
        dmesh = Mesh(np.asarray(devs[:n]), (sh.ELEM_AXIS,))
    D = int(np.prod(list(dmesh.shape.values())))

    if mesh.lattice is not None or getattr(mesh, "hybrid", None) \
            is not None:
        # lattice / hybrid lattice+collar meshes: matvecs ride the
        # row-sharded slice route — no banded tables needed
        u_loss = _sharded_lattice_u_loss(energy, dmesh)
    else:
        # gate on the SAME table shard_map_banded_energy will select
        # (paired preferred): an auto-built paired table with a
        # non-divisible block count must trigger a reband even when the
        # triangle tables happen to divide
        ba = (mesh.banded_paired if mesh.banded_paired is not None
              else mesh.banded)
        if (ba is None or ba.re_conn_rel is None
                or ba.starts.shape[0] % D or ba.re_nstarts.shape[0] % D):
            mesh = sh.reband_for_shards(mesh, D)
        u_loss = _sharded_u_loss(energy, dmesh)
    coords0 = params["coords"]
    up = {"u": params["u"]}
    args = (coords0, mesh)

    if bg_model is None:
        bg_model = StructuredGridP1(E=energy.E, nu=energy.nu)
    if pre is None:
        pre = build_aux_preconditioner(
            u_loss, up, args, mesh, bg_model=bg_model,
            bg_shape=bg_shape)
    sol, hist = _aux_pcg(u_loss, pre.bg_model or bg_model,
                         int(max_iters), float(tol), "u", up, args, pre)
    return {"coords": coords0, "u": sol["u"]}, hist
