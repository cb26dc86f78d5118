"""HiDeNN-FEM-TPU: TPU-native Hierarchical Deep-learning Neural Network FEM.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
HiDeNN-FEM implementation (achraf-15/HiDeNN-FEM): FEM shape functions as
differentiable interpolants whose parameters are nodal values *and* nodal
coordinates, enabling r-adaptivity by gradient descent on the mesh itself —
redesigned TPU-first (pure functional models, scan-compiled solvers,
element-batch sharding over a device mesh, fused Pallas energy kernels).
"""

from .mesh.types import TriMesh
from .mesh.structured import generate_mesh, rectangle_tri_zigzag, \
    proxy_plate_mesh
from .mesh.gmsh_backend import generate_mesh_gmsh, have_gmsh
from .mesh.delaunay import (generate_mesh_delaunay,
                            generate_mesh_unstructured)
from .mesh.hybrid import generate_mesh_hybrid
from .models.linear1d import Linear1D
from .models.bilinear2d import Bilinear2D
from .models.triangle_p1 import TriangleP1
from .models.structured_grid import (StructuredGrid, StructuredGridP1,
                                     generate_structured_grid)
from .ops.quadrature import interval_gauss_points, \
    interval_gauss_points_m11, triangle_gauss_points
from .ops.elasticity import plane_stress_C, von_mises_plane_stress
from .ops.losses import l2_loss, bar_energy_1d, PlaneStressEnergy
from .solve.optimizers import adam, adam_per_group, lbfgs, freeze_groups
from .solve.drivers import minimize, run_optimizer, run_lbfgs, \
    alternating_solve, two_phase_solve
from .solve.linear import cg_solve, radapt_cg_solve, jacobi_diagonal, \
    jacobi_pcg_solve
from .solve.multigrid import mg_pcg_solve, build_hierarchy, \
    radapt_mg_solve
from .solve.auxspace import aux_pcg_solve, build_aux_preconditioner, \
    radapt_aux_solve
from .solve.nodespace import lbfgs_node_space

__version__ = "0.1.0"
