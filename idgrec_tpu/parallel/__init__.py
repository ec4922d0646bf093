from idgrec_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "replicated_sharding",
]
