"""crdmodel_tpu — TPU-native reaction–diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of BlueFern/CRDModel
(reference: four C++ MPI+SUNDIALS monoliths simulating FitzHugh–Nagumo and
Goldbeter calcium reaction–diffusion systems on flat periodic rectangles and
torus surfaces; see /root/reference/src/*.cpp).

Design (TPU-first, not a port):
  - One generic solver core; model kinetics and surface geometry are *data*
    (pure functions + precomputed metric coefficient arrays) instead of four
    duplicated monoliths.
  - The hot RHS (curvilinear Laplacian + pointwise kinetics) is a single fused
    pass: XLA-fused jnp ops by default, a Pallas VMEM kernel for the fast path.
  - MPI Cartesian domain decomposition + halo exchange (reference
    src/FHNmodel_torus.cpp:708-950) becomes `jax.shard_map` over a 2D device
    Mesh with `lax.ppermute` halo shifts riding ICI.
  - SUNDIALS ARKode adaptive explicit RK (reference src/FHNmodel_torus.cpp:356-373)
    becomes a jit-compiled tableau-driven embedded ERK with WRMS error control
    inside `lax.while_loop`, cross-device norms via `lax.psum`.
  - Parameter sweeps are `jax.vmap` over batched configs (new capability).
"""

__version__ = "0.1.0"

from crdmodel_tpu.config import SimConfig, load_ini, config_from_ini
from crdmodel_tpu.core.grid import Grid, FlatGeometry, TorusGeometry
from crdmodel_tpu.core.problem import Problem, build_problem
from crdmodel_tpu.sim import simulate, SimResult
from crdmodel_tpu.steady import solve_steady_state, leading_eigenvalues

__all__ = [
    "solve_steady_state",
    "leading_eigenvalues",
    "SimConfig",
    "load_ini",
    "config_from_ini",
    "Grid",
    "FlatGeometry",
    "TorusGeometry",
    "Problem",
    "build_problem",
    "simulate",
    "SimResult",
    "__version__",
]
