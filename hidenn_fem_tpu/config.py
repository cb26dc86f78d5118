"""Problem configuration dataclasses (SURVEY.md §5 config plan).

The reference hard-codes every hyperparameter as literals inside example
scripts (grid sizes ``example1.py:25``, learning rates ``example4.py:54-57``,
material constants ``loss.py:9-10``, geometry ``mesh.py:9-12``).  Here each
example's recipe is a small dataclass with the reference values as
defaults, so runs are reproducible and parameterizable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple


@dataclasses.dataclass
class Projection1DConfig:
    """Example-1 recipe (``examples/example1.py:25-42``)."""
    n_nodes: int = 100
    n_train: int = 1000
    x0: float = 0.0
    xN: float = 1.0
    r_adapt: bool = True
    learning_rate: float = 5e-3
    epochs: int = 500


@dataclasses.dataclass
class Projection2DConfig:
    """Example-2 recipe (``examples/example2.py:12-48``)."""
    nx: int = 25
    ny: int = 25
    n_train_1d: int = 100
    batch_size: int = 1000
    r_adapt: bool = True
    learning_rate: float = 5e-3
    epochs: int = 5000
    seed: int = 0


@dataclasses.dataclass
class Bar1DConfig:
    """Example-3 recipe (``examples/example3.py:73-98``)."""
    length: float = 10.0
    youngs_modulus: float = 175.0
    u0: float = 0.0
    uN: float = 0.0
    n_nodes: int = 89
    n_gauss: int = 2
    r_adapt: bool = True
    learning_rate: float = 1e-4
    epochs: int = 4000


@dataclasses.dataclass
class PlateConfig:
    """Example-4 recipe (``examples/example4.py:14-80`` + ``loss.py:9-14``)."""
    length: float = 2.0
    height: float = 1.0
    holes: Sequence[Tuple[float, float, float]] = (
        (0.5, 0.7, 0.12), (1.0, 0.3, 0.15), (1.4, 0.6, 0.1))
    boundaries: Optional[Dict[str, int]] = None   # None -> reference default
    nx: int = 200
    ny: int = 100
    lc: float = 0.05                               # gmsh mesh size
    youngs_modulus: float = 10e9
    poisson_ratio: float = 0.3
    gauss_order: int = 4
    gauss_order_1d: int = 2
    traction_total: float = 100e3
    traction_length: float = 1.0
    lbfgs_steps: int = 600                         # = 30 epochs x max_iter 20
    seed: int = 0

    def make_boundaries(self) -> Dict[str, int]:
        return self.boundaries or {"up": 0, "down": 0, "right": 2,
                                   "left": 1}
