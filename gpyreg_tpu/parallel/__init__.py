"""Multi-chip parallelism: mesh construction and sharded NLML/predict."""

from . import mesh

__all__ = ["mesh"]
