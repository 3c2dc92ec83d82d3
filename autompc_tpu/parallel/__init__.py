from .mesh import make_mesh, pad_to_multiple, shard_vmap
from .fanout import DirectTranscriptionFanout, MPPIFanout, QuadCostFanout
