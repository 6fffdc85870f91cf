"""Alias module for reference-compatible imports.

The reference exposes its GP class from ``gpyreg.gaussian_process``
(reference gpyreg/__init__.py:8); consumers doing
``from gpyreg.gaussian_process import GP`` can switch packages without
touching the import path shape.
"""

from .gp import GP, Posterior

__all__ = ["GP", "Posterior"]
