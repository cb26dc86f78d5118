from .quadrature import (interval_gauss_points, interval_gauss_points_m11,
                         triangle_gauss_points, TRIANGLE_RULE_DEGREE)
from .elasticity import (plane_stress_C, strain_voigt_from_grad,
                         stress_from_strain, energy_density,
                         von_mises_plane_stress)
from .losses import l2_loss, bar_energy_1d, PlaneStressEnergy
