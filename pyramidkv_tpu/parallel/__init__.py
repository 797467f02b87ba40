from .mesh import (
    make_mesh,
    param_pspecs,
    param_shardings,
    shard_params,
    cache_pspec,
    data_pspec,
)
