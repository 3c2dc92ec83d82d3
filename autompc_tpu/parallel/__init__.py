from .mesh import global_batch, make_mesh, pad_to_multiple, shard_vmap
from .fanout import (
    DirectTranscriptionFanout,
    JointSINDyQuadCostFanout,
    MPPIFanout,
    QuadCostFanout,
)
from .horizon import make_horizon_sharded_sqp_solver
