from .mesh import (make_mesh, column_spec, shard_atmosphere, shard_kdist,
                   replicate)

__all__ = ["make_mesh", "column_spec", "shard_atmosphere", "shard_kdist",
           "replicate"]
