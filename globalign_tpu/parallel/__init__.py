from . import mesh, seqpar
from .mesh import BATCH_AXIS, make_pair_mesh, sharded_fill_costs
from .seqpar import STRIP_AXIS, make_strip_mesh, sharded_pair_cost

__all__ = [
    "mesh",
    "seqpar",
    "BATCH_AXIS",
    "make_pair_mesh",
    "sharded_fill_costs",
    "STRIP_AXIS",
    "make_strip_mesh",
    "sharded_pair_cost",
]
