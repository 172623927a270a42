from tpuserve.parallel.mesh import make_mesh, mesh_devices  # noqa: F401
from tpuserve.parallel.sharding import (  # noqa: F401
    cache_pspec,
    llama_param_pspecs,
    shard_llama_params,
)
