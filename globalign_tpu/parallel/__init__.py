from .mesh import BATCH_AXIS, make_pair_mesh, sharded_fill_costs

__all__ = ["BATCH_AXIS", "make_pair_mesh", "sharded_fill_costs"]
