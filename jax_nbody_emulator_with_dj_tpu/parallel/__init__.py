from .mesh import make_mesh
from .halo import halo_exchange
from .sharded_box import ShardedBoxConfig, ShardedBoxProcessor

__all__ = ["make_mesh", "halo_exchange", "ShardedBoxConfig", "ShardedBoxProcessor"]
