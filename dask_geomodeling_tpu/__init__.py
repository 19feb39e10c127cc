"""dask_geomodeling_tpu: a TPU-native lazy raster & geometry engine.

Immutable, serializable Block graphs ("views") answer spatial/temporal
requests.  Raster value requests lower to jitted XLA programs over batches of
fixed-size HBM tiles (with Pallas kernels for stencils, warps and segment
reductions); geometry algebra runs on host.  Same capabilities as
nens/dask-geomodeling, designed TPU-first.
"""
from dask_geomodeling_tpu.config import config  # noqa
from dask_geomodeling_tpu.core import (  # noqa
    Block,
    DummyBlock,
    compute,
    construct,
    construct_multiple,
    tokenize,
)

# the reference exposes these subpackages at the top level
# (reference __init__.py:9-12): `import dask_geomodeling` then
# `dask_geomodeling.raster.Group(...)` must work here too
from dask_geomodeling_tpu import geometry, raster  # noqa

__version__ = "0.1.0"
