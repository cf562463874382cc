"""cuddhelmholtz_tpu: a TPU-native spectral-element Helmholtz framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the CUDA
library ``arotem3/CuDDHelmholtz`` (mounted read-only at /root/reference):
matrix-free 2D spectral-element operators, restarted GMRES, and the DDH
substructured WaveHoltz domain-decomposition preconditioner -- built for
TPU hardware (MXU-batched element kernels, VMEM-resident Pallas wave cycles,
sharded multi-chip execution via jax.sharding).

Layer map (mirrors SURVEY.md section 1):
  utils/      quadrature rules, nodal bases           (reference L1-L2 host)
  mesh/       Mesh2D geometry + metric caches          (L2)
  spaces/     H1Space, FaceSpace, EnsembleSpace        (L3)
  ops/        Mass/Stiffness/FaceMass/functionals      (L4), Pallas kernels
  solvers/    GMRES(m), DDH preconditioner             (L5)
  models/     Poisson, coupled Helmholtz               (L5/L6)
  parallel/   device-mesh sharding of elements/subdomains
  examples/   drivers reproducing the reference configs (L6)
"""

from .mesh.io import load_mesh_dir, load_unstructured_square, to_file
from .mesh.mesh2d import Mesh2D
from .solvers.ddh import DDH
from .solvers.gmres import gmres
from .spaces.ensemble import EnsembleSpace
from .spaces.h1 import FaceSpace, H1Space
from .utils.basis import Basis
from .utils.quadrature import QuadratureRule

__version__ = "0.1.0"

__all__ = [
    "Basis",
    "DDH",
    "EnsembleSpace",
    "FaceSpace",
    "H1Space",
    "Mesh2D",
    "QuadratureRule",
    "gmres",
    "load_mesh_dir",
    "load_unstructured_square",
    "to_file",
]
