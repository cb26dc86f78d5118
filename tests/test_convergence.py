"""h-convergence order of the P1 plane-stress solver.

Manufactured solution on the unit square, clamped on all four faces:

    u_exact(x, y) = (A sin(pi x) sin(pi y), 0)

With plane-stress constitutive matrix C (ops/elasticity.py), the balancing
body force is  b = -div sigma(u_exact):

    b_x = A pi^2 (C11 sin(pi x) sin(pi y) + C33 sin(pi x) sin(pi y))
    b_y = -A pi^2 (C33 + C12) cos(pi x) cos(pi y)

P1 elements must converge at O(h^2) in L2 — halving h shrinks the error
~4x.  This is the classic method-of-manufactured-solutions check the
reference lacks entirely (its only validation is visual, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

import hidenn_fem_tpu as ht

E, NU, A = 10.0, 0.3, 1e-2
C11 = E / (1 - NU ** 2)
C12 = NU * C11
C33 = 0.5 * (1 - NU) * C11
PI = np.pi


def u_exact(x):
    ux = A * jnp.sin(PI * x[:, 0]) * jnp.sin(PI * x[:, 1])
    return jnp.stack([ux, jnp.zeros_like(ux)], axis=1)


def body_force(x):
    s = jnp.sin(PI * x[:, 0]) * jnp.sin(PI * x[:, 1])
    c = jnp.cos(PI * x[:, 0]) * jnp.cos(PI * x[:, 1])
    bx = A * PI ** 2 * (C11 + C33) * s
    by = -A * PI ** 2 * (C33 + C12) * c
    return jnp.stack([bx, by], axis=1)


def _solve_l2_error(n):
    mesh = ht.generate_mesh(
        length=1.0, height=1.0, holes=(),
        boundaries={"left": 1, "right": 1, "up": 1, "down": 1},
        nx=n, ny=n)
    model = ht.TriangleP1()
    params = model.init(jax.random.PRNGKey(0), mesh)
    energy = ht.PlaneStressEnergy(model=model, E=E, nu=NU,
                                  body_force=body_force, backend="xla")
    coords0 = params["coords"]
    loss = lambda p: energy({"u": p["u"], "coords": coords0}, mesh)
    pf, _ = ht.run_lbfgs(loss, {"u": params["u"]}, num_steps=500)
    params = {"u": pf["u"], "coords": coords0}

    # L2 error sampled at element centroids, area-weighted
    coords = model.coords(params, mesh)
    conn = mesh.connectivity
    cent = coords[conn].mean(axis=1)
    u_full = model.u_full(params, mesh)
    uh_cent = u_full[conn].mean(axis=1)
    det, _ = model.element_fields(params, mesh)
    area = 0.5 * jnp.abs(det)
    err2 = jnp.sum(area * jnp.sum((uh_cent - u_exact(cent)) ** 2, axis=1))
    return float(jnp.sqrt(err2))


def test_p1_l2_convergence_is_second_order():
    e_coarse = _solve_l2_error(9)     # h
    e_fine = _solve_l2_error(17)      # h/2
    ratio = e_coarse / e_fine
    # O(h^2): expect ~4; demand clearly better than first order
    assert ratio > 3.0, (e_coarse, e_fine, ratio)
    # and the fine error is actually small relative to the field scale
    assert e_fine < 2e-2 * A, e_fine
