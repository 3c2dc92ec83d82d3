"""Generate the cached cartpole tune asset (cartpole_v2 parity:
reference ships assets/cached_tunes/cartpole_tune_result.pkl,
cartpole_v2.py:146-153)."""
import sys
sys.path.insert(0, "tests"); import conftest  # CPU + x64 setup
import numpy as np
from autompc_tpu.benchmarks import CartpoleSwingupV2Benchmark
from autompc_tpu.control import IterativeLQRFactory
from autompc_tpu.costs import QuadCostFactory
from autompc_tpu.pipeline import Pipeline
from autompc_tpu.sysid import SINDy, SINDyFactory
from autompc_tpu.tuning import PipelineTuner
from autompc_tpu.utils.checkpoint import save_checkpoint

b = CartpoleSwingupV2Benchmark()
trajs = b.gen_trajs(seed=42, n_trajs=40, traj_len=80)
model = SINDy(b.system, method="lstsq", threshold=1e-3, trig_basis=True,
              trig_freq=1, trig_interaction=True, time_mode="discrete")
model.train(trajs)
pipeline = Pipeline(
    b.system, model,
    QuadCostFactory(b.system, goal=np.zeros(4)),
    IterativeLQRFactory(b.system),
)
task = b.task.copy()
tuner = PipelineTuner(surrogate_mode="pretrain", eval_batch=4, use_fanout=True)
controller, result = tuner.run(
    pipeline, task, trajs, n_iters=64, rng=np.random.default_rng(0),
    surrogate=model,
)
save_checkpoint(
    "assets/cached_tunes/cartpole_tune_result.ckpt",
    {
        "kind": "pipeline_tune_result",
        "inc_cfg": result.inc_cfg.get_dictionary(),
        "cfg_dicts": [c.get_dictionary() for c in result.cfgs],
        "costs": list(result.costs),
        "inc_costs": list(result.inc_costs),
    },
)
print("incumbent cost:", result.inc_costs[-1])
print("incumbent:", result.inc_cfg)
