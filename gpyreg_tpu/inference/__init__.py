"""Device-resident inference algorithms: fully-jitted slice sampling
and batched multistart MAP optimization."""

from . import device_slice, map_optimize

__all__ = ["device_slice", "map_optimize"]
