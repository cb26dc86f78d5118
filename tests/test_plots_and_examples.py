"""Smoke tests: every plotting entry point renders + saves, and every
example's main() runs end-to-end at reduced size."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hidenn_fem_tpu as ht
from hidenn_fem_tpu import plots


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path)


def test_all_plot_functions(outdir):
    # 1D
    model, params = ht.Linear1D.from_node_coords(np.linspace(0, 1, 12))
    params["u"] = jnp.asarray(np.sin(np.linspace(0, 1, 12)), jnp.float32)
    plots.plot_fem_solution(model, params, u_exact=np.sin,
                            save_path=f"{outdir}/s1.png")
    plots.plot_fem_derivative(model, params, u_exact=np.cos,
                              save_path=f"{outdir}/d1.png")
    # 2D structured
    m2, p2 = ht.Bilinear2D.create(np.linspace(0, 1, 6), np.linspace(0, 1, 7))
    plots.plot_2d_solution(m2, p2, n_eval=12, save_path=f"{outdir}/s2.png")
    plots.plot_2d_derivatives(m2, p2, n_eval=8, save_path=f"{outdir}/d2.png")
    # triangular + mesh plots
    mesh = ht.proxy_plate_mesh(nx=7, ny=5)
    tp = ht.TriangleP1()
    pp = tp.init(jax.random.PRNGKey(0), mesh)
    plots.plot_mesh(mesh, save_path=f"{outdir}/mesh.png")
    plots.plot_model_mesh(tp, pp, mesh, save_path=f"{outdir}/mm.png")
    plots.plot_displacement_magnitude(tp, pp, mesh,
                                      save_path=f"{outdir}/dm.png")
    plots.plot_von_mises(tp, pp, mesh, save_path=f"{outdir}/vm.png")
    for f in ("s1", "d1", "s2", "d2", "mesh", "mm", "dm", "vm"):
        assert os.path.getsize(f"{outdir}/{f}.png") > 0


def test_example1_small(outdir):
    from examples import example1
    from hidenn_fem_tpu.config import Projection1DConfig
    _, losses = example1.main(Projection1DConfig(n_nodes=20, epochs=50),
                              outdir=outdir)
    assert np.isfinite(np.asarray(losses)).all()


def test_example2_small(outdir):
    from examples import example2
    from hidenn_fem_tpu.config import Projection2DConfig
    _, losses = example2.main(
        Projection2DConfig(nx=8, ny=8, n_train_1d=20, batch_size=64,
                           epochs=50), outdir=outdir)
    assert np.isfinite(np.asarray(losses)).all()


def test_example3_small(outdir):
    from examples import example3
    from hidenn_fem_tpu.config import Bar1DConfig
    _, losses, err = example3.main(Bar1DConfig(n_nodes=25, epochs=200),
                                   outdir=outdir)
    assert np.isfinite(err)


def test_example4_small(outdir):
    from examples import example4
    from hidenn_fem_tpu.config import PlateConfig
    _, losses = example4.main(PlateConfig(nx=20, ny=10, lbfgs_steps=40),
                              outdir=outdir)
    assert np.isfinite(np.asarray(losses)).all()


def test_example11_small(outdir):
    from examples import example11_delaunay
    e = example11_delaunay.main(lc=0.15, outdir=outdir)
    assert np.isfinite(e) and e < 0      # traction does work
    assert os.path.getsize(f"{outdir}/ex11_von_mises.png") > 0


def test_example12_small(outdir):
    from examples import example12_hybrid
    e = example12_hybrid.main(lc=0.06, outdir=outdir)
    assert np.isfinite(e) and e < 0      # traction does work
    assert os.path.getsize(f"{outdir}/ex12_von_mises.png") > 0


def test_float64_energy_path():
    """f64 opt-in: model dtype + x64 mesh arrays run the XLA backend."""
    jax.config.update("jax_enable_x64", True)
    try:
        from hidenn_fem_tpu.mesh.types import TriMesh
        m0 = ht.proxy_plate_mesh(nx=7, ny=5)
        mesh = TriMesh.from_arrays(
            np.asarray(m0.coords), np.asarray(m0.connectivity),
            np.asarray(m0.geom_boundary_mask),
            np.asarray(m0.dirichlet_mask), np.asarray(m0.neumann_mask),
            np.asarray(m0.neumann_edges), dtype=jnp.float64)
        model = ht.TriangleP1(dtype=jnp.float64)
        params = model.init(jax.random.PRNGKey(0), mesh)
        energy = ht.PlaneStressEnergy(model=model)
        val, grads = jax.value_and_grad(lambda p: energy(p, mesh))(params)
        assert val.dtype == jnp.float64
        assert np.isfinite(float(val))
    finally:
        jax.config.update("jax_enable_x64", False)
