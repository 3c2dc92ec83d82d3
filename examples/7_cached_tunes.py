"""Cached tune results: reuse a shipped incumbent instead of re-tuning.

Mirrors the reference's ICRA comparison workflow (reference:
benchmarks/cartpole_v2.py:146-153 `get_cached_tune_result` + the cached
cell of examples/0_MainDemo.ipynb, which exists because the full tune
"can take 5 or more hours"): load the shipped tune asset, inspect the
tuning curve, rebuild the incumbent pipeline from its stored
configuration, and evaluate it against the true dynamics — no tuning
run required. Covers both shipped assets: cartpole_v2 and halfcheetah.

Run: python examples/7_cached_tunes.py
(set FULL_EVAL=1 to also run the 120-step halfcheetah closed loop;
the cartpole evaluation always runs.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def curve_str(inc_costs, width=48):
    """Text sparkline of the incumbent-cost curve (bar height =
    improvement over the first iterate: taller is better)."""
    c = np.asarray(inc_costs, dtype=float)
    lo, hi = float(c.min()), float(c.max())
    span = (hi - lo) or 1.0
    marks = "▁▂▃▄▅▆▇█"
    idx = np.linspace(0, len(c) - 1, min(width, len(c))).astype(int)
    return "".join(
        marks[int((hi - c[i]) / span * (len(marks) - 1))] for i in idx
    )


def main():
    from autompc_tpu.benchmarks import (
        CartpoleSwingupV2Benchmark,
        HalfcheetahBenchmark,
    )
    from autompc_tpu.control import IterativeLQRFactory
    from autompc_tpu.costs import QuadCostFactory
    from autompc_tpu.pipeline import Pipeline
    from autompc_tpu.sysid import MLP, SINDy
    from autompc_tpu.utils import simulate

    # ---- cartpole_v2: load, inspect, rebuild, evaluate --------------
    b = CartpoleSwingupV2Benchmark()
    cached = b.get_cached_tune_result()
    print(f"cartpole_v2 cached tune: {len(cached['costs'])} iterations,")
    print(f"  incumbent curve  {curve_str(cached['inc_costs'])}  "
          "(taller = better)")
    print(f"  final incumbent cost {cached['inc_costs'][-1]:.3f}")

    # Rebuild the incumbent exactly as the tune produced it: same fixed
    # surrogate-trained model, same factories (tools/gen_cached_tunes.py).
    trajs = b.gen_trajs(seed=42, n_trajs=40, traj_len=80)
    model = SINDy(b.system, method="lstsq", threshold=1e-3, trig_basis=True,
                  trig_freq=1, trig_interaction=True, time_mode="discrete")
    model.train(trajs)
    pipeline = Pipeline(
        b.system, model,
        QuadCostFactory(b.system, goal=np.zeros(4)),
        IterativeLQRFactory(b.system),
    )
    space = pipeline.get_configuration_space()
    inc_cfg = space.configuration_from_dict(cached["inc_cfg"])
    controller, task, _ = pipeline(inc_cfg, b.task.copy(), trajs)
    traj = simulate(
        controller, b.task.get_init_obs(),
        term_cond=b.task.term_cond,
        dynamics=b.dynamics, max_steps=200,
    )
    metric = float(b.task.get_cost()(traj))
    print(f"  cached incumbent on true dynamics: metric {metric:.3f} "
          f"(box metric; lower is better)")

    # ---- halfcheetah: same workflow at MuJoCo-benchmark scale -------
    hc = HalfcheetahBenchmark()
    hc_cached = hc.get_cached_tune_result()
    print(f"\nhalfcheetah cached tune: {len(hc_cached['costs'])} iterations,")
    print(f"  incumbent curve  {curve_str(hc_cached['inc_costs'])}")
    print(f"  final incumbent cost {hc_cached['inc_costs'][-1]:.3f} "
          f"(200 - R; standing still = 200)")

    if os.environ.get("FULL_EVAL"):
        hc_trajs = hc.gen_trajs_batch(seed=0, n_trajs=48, traj_len=60).to_list()
        hc_model = MLP(hc.system, n_hidden_layers=2, hidden_size=64,
                       n_train_iters=40, n_batch=64)
        hc_model.train(hc_trajs)
        goal = np.asarray(hc.task.get_init_obs())
        hc_pipeline = Pipeline(
            hc.system, hc_model,
            QuadCostFactory(hc.system, goal=goal),
            IterativeLQRFactory(hc.system, horizon=8),
        )
        hc_space = hc_pipeline.get_configuration_space()
        hc_cfg = hc_space.configuration_from_dict(hc_cached["inc_cfg"])
        hc_task = hc.task.copy()
        hc_task.set_num_steps(120)
        hc_controller, _, _ = hc_pipeline(hc_cfg, hc_task, hc_trajs)
        hc_traj = simulate(
            hc_controller, hc.task.get_init_obs(),
            term_cond=hc_task.term_cond,
            dynamics=hc.dynamics, max_steps=120,
        )
        hc_metric = float(hc.task.get_cost()(hc_traj))
        print(f"  cached incumbent on true dynamics: metric {hc_metric:.3f}")
    else:
        print("  (set FULL_EVAL=1 to run the 120-step true-dynamics "
              "closed loop)")


if __name__ == "__main__":
    main()
