from .mesh import make_mesh, mesh_for_devices
from .halo import halo_exchange
from .sharded_box import ShardedBoxConfig, ShardedBoxProcessor
from .sharded_hierarchical import ShardedHierarchicalProcessor
from .distributed import initialize, make_sharded_box, box_spec

__all__ = [
    "make_mesh",
    "mesh_for_devices",
    "halo_exchange",
    "ShardedBoxConfig",
    "ShardedBoxProcessor",
    "ShardedHierarchicalProcessor",
    "initialize",
    "make_sharded_box",
    "box_spec",
]
