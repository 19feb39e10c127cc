from dask_geomodeling_tpu.core.tokens import tokenize, register_normalizer  # noqa
from dask_geomodeling_tpu.core.scheduler import (  # noqa
    get_sync,
    get_threaded,
    get_processes,
    get_scheduler,
)
from dask_geomodeling_tpu.core.graphs import (  # noqa
    Block,
    DummyBlock,
    arg,
    compute,
    construct,
    construct_multiple,
)
from dask_geomodeling_tpu.core.validate import expect_instance  # noqa
