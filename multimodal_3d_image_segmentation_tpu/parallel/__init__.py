from .mesh import (DATA_AXIS, SPATIAL_AXIS, batch_sharding, make_mesh,
                   replicated, volume_sharding)  # noqa: F401
from . import multihost  # noqa: F401
