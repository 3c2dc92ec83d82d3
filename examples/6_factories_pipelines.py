"""Factories and pipelines: configuration spaces and composition.

Mirrors the reference walkthrough (reference:
examples/4_Factories_and_Pipelines.ipynb): every component family —
models, costs, controllers — has a Factory exposing a conditional
ConfigurationSpace; a Pipeline merges them under the ``_model:`` /
``_cost:`` / ``_ctrlr:`` prefixes and instantiates the full stack from
one joint configuration. Run: python examples/6_factories_pipelines.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
    from autompc_tpu.control import IterativeLQRFactory
    from autompc_tpu.costs import QuadCostFactory
    from autompc_tpu.pipeline import Pipeline
    from autompc_tpu.sysid import SINDyFactory

    benchmark = CartpoleSwingupBenchmark()
    system = benchmark.system

    # --- individual factories -------------------------------------
    model_factory = SINDyFactory(system)
    cs = model_factory.get_configuration_space()
    print("SINDy hyperparameters:", cs.get_hyperparameter_names())
    cfg = cs.get_default_configuration()
    # Conditional activation: lasso_alpha only exists under
    # method="lasso".
    cfg["method"] = "lasso"
    print("lasso_alpha active:", "lasso_alpha" in cfg)
    cfg["method"] = "lstsq"
    print("lasso_alpha active:", "lasso_alpha" in cfg)

    # A factory instantiates (and trains) its component from a config.
    trajs = benchmark.gen_trajs(seed=42, n_trajs=40, traj_len=60)
    cfg["trig_basis"] = "true"
    cfg["trig_interaction"] = "true"
    model = model_factory(cfg, trajs)
    print("trained model state dim:", model.state_dim)

    # --- the joint pipeline space ----------------------------------
    pipeline = Pipeline(
        system,
        SINDyFactory(system),
        QuadCostFactory(system, goal=np.zeros(4)),
        IterativeLQRFactory(system),
    )
    joint = pipeline.get_configuration_space()
    names = joint.get_hyperparameter_names()
    print(f"joint space: {len(names)} hyperparameters")
    print("  model:", [n for n in names if n.startswith("_model:")][:3], "...")
    print("  cost: ", [n for n in names if n.startswith("_cost:")][:3], "...")
    print("  ctrlr:", [n for n in names if n.startswith("_ctrlr:")])

    # One joint configuration instantiates the whole stack: the model
    # trains, the cost binds to the task, the controller is synthesized.
    joint_cfg = joint.get_default_configuration()
    joint_cfg["_model:trig_basis"] = "true"
    joint_cfg["_model:trig_interaction"] = "true"
    joint_cfg["_cost:theta_Q"] = 10.0
    joint_cfg["_ctrlr:horizon"] = 15
    controller, task, model = pipeline(joint_cfg, benchmark.task, trajs)
    print("controller horizon:", controller.horizon)
    print("cost Q[0,0]:", float(task.get_cost().get_cost_matrices()[0][0, 0]))


if __name__ == "__main__":
    main()
