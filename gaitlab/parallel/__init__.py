from gaitlab.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    param_shardings,
    shard_params,
)
from gaitlab.parallel.pipeline import (  # noqa: F401
    GRNetPipeline,
    split_variables,
)
