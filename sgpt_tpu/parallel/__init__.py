from .mesh import make_mesh, default_mesh
from .sharding import param_specs, shard_params, data_spec, constrain

__all__ = ["make_mesh", "default_mesh", "param_specs", "shard_params",
           "data_spec", "constrain"]
