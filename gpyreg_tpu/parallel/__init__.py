"""Multi-chip parallelism: mesh construction, sharded NLML/predict/CG/
chains (``mesh``), and the distributed exact tier — row-sharded kernel
build + blocked Cholesky + serving (``dist_exact``)."""

from . import dist_exact
from . import mesh

__all__ = ["dist_exact", "mesh"]
