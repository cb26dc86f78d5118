"""Generate the reference-run field snapshot for figure-level parity.

Runs the ACTUAL reference implementation (torch, imported from
/root/reference — not copied) on the measured-baseline proxy plate
(81x41 "up" lattice, hole-free: gmsh is not installable in this
environment, see PARITY.md), with the example-4 recipe
(``/root/reference/examples/example4.py:68-80``: torch LBFGS defaults,
30 epochs x max_iter 20), and saves the solved fields the reference's
result figures are drawn from (``src/plots.py:154-243``): nodal
displacements, node coordinates, and per-element centroid von Mises
stress.

The snapshot (tests/data/reference_snapshot_81x41.npz) is the stored
expected output for ``tests/test_figure_parity.py`` — SURVEY §4 names
the reference's ``figures/*.png`` as its de-facto expected outputs;
this is their quantitative form.

Usage: python tools/make_reference_snapshot.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from src.loss import EnergyLoss2D
    from src.models import PiecewiseLinearShapeNN2D

    from hidenn_fem_tpu.mesh.structured import proxy_plate_mesh

    mesh = proxy_plate_mesh(nx=81, ny=41)

    def t(a, dt):
        return torch.tensor(np.asarray(a), dtype=dt)

    torch.manual_seed(0)
    model = PiecewiseLinearShapeNN2D(
        t(mesh.coords, torch.float32),
        t(mesh.connectivity, torch.long),
        boundary_mask=t(mesh.geom_boundary_mask, torch.bool),
        dirichlet_mask=t(mesh.dirichlet_mask, torch.bool),
        u_fixed=0.0,
        neumann_edges=t(mesh.neumann_edges, torch.long),
    )
    loss_fn = EnergyLoss2D()          # E=10e9, nu=0.3 defaults

    optimizer = torch.optim.LBFGS(model.parameters())
    for epoch in range(30):
        def closure():
            optimizer.zero_grad()
            loss = loss_fn(model)
            loss.backward()
            return loss
        loss = optimizer.step(closure)
        print(f"epoch {epoch:02d}: loss {loss.item():.6e}")

    # centroid grad_u -> plane-stress von Mises, exactly the quantities
    # src/plots.py:177-205 renders
    n_elem = model.Nelems
    x_eval = torch.full((n_elem, 2), 1.0 / 3.0)
    elem_id = torch.arange(n_elem)
    _, _, grad_u = model(x_eval, elem_id)
    grad_u = grad_u.detach().numpy()
    eps_xx = grad_u[:, 0, 0]
    eps_yy = grad_u[:, 1, 1]
    eps_xy = 0.5 * (grad_u[:, 0, 1] + grad_u[:, 1, 0])
    E, nu = 10e9, 0.3
    sxx = E / (1 - nu ** 2) * (eps_xx + nu * eps_yy)
    syy = E / (1 - nu ** 2) * (eps_yy + nu * eps_xx)
    sxy = E / (1 + nu) * eps_xy
    von_mises = np.sqrt(sxx ** 2 - sxx * syy + syy ** 2 + 3 * sxy ** 2)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data",
        "reference_snapshot_81x41.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out,
        coords=model.coords.detach().numpy(),
        u_full=model.u_full.detach().numpy(),
        connectivity=np.asarray(mesh.connectivity),
        von_mises=von_mises,
        final_loss=np.float64(loss.item()),
    )
    print("wrote", out)
    print("max |u|:", np.abs(model.u_full.detach().numpy()).max())
    print("max von Mises:", von_mises.max(),
          "at element", int(von_mises.argmax()))


if __name__ == "__main__":
    main()
