"""Property-based fuzz of the configuration-space system.

Random spaces with layered conditional structure (chains, multi-parent
AndConjunctions, forbidden clauses) are generated from a seed, then the
core invariants the tuner relies on are checked on every sample:

1. activity consistency — a sampled/resolved configuration contains a
   hyperparameter iff its condition chain holds (fixed point of
   ``_resolve``);
2. legality — every value is legal for its hyperparameter and no
   forbidden clause is violated;
3. encode/decode roundtrip — the unit-hypercube encoding used by the
   batched BO tuner preserves the active set and the values (exactly for
   int/categorical, to float tolerance otherwise);
4. prefix-merge — ``add_configuration_space`` preserves hyperparameter/
   condition counts and parent-conditioning gates the whole subspace.

Condition cycles must be rejected at build time (the reference's
ConfigSpace package does the same; a cycle would otherwise recurse
``_is_active`` forever).
"""

import numpy as np
import pytest

from autompc_tpu.config import (
    AndConjunction,
    CategoricalHyperparameter,
    ConfigurationSpace,
    EqualsCondition,
    ForbiddenAndConjunction,
    ForbiddenEqualsClause,
    InCondition,
    UniformFloatHyperparameter,
    UniformIntegerHyperparameter,
    add_configuration_space,
)


def make_random_space(rng, n_params=12, p_cond=0.6, p_forbidden=0.3):
    """Random layered space: parameters are created in order; each may be
    conditioned on one or two earlier parameters (guaranteeing a DAG)."""
    cs = ConfigurationSpace()
    names = []
    for i in range(n_params):
        kind = rng.integers(3)
        name = f"p{i}"
        if kind == 0:
            hp = UniformFloatHyperparameter(
                name, 0.1, 10.0, log=bool(rng.integers(2))
            )
        elif kind == 1:
            hp = UniformIntegerHyperparameter(name, 1, 8)
        else:
            hp = CategoricalHyperparameter(name, ["a", "b", "c"])
        cs.add_hyperparameter(hp)
        cats = [n for n in names
                if isinstance(cs.get_hyperparameter(n),
                              CategoricalHyperparameter)]
        if cats and rng.uniform() < p_cond:
            if len(cats) >= 2 and rng.uniform() < 0.4:
                p1, p2 = rng.choice(cats, size=2, replace=False)
                cs.add_condition(AndConjunction(
                    EqualsCondition(name, p1, "a"),
                    InCondition(name, p2, ["a", "b"]),
                ))
            else:
                parent = str(rng.choice(cats))
                if rng.integers(2):
                    cs.add_condition(EqualsCondition(name, parent, "a"))
                else:
                    cs.add_condition(InCondition(name, parent, ["a", "b"]))
        names.append(name)
    cats = [n for n in names
            if isinstance(cs.get_hyperparameter(n),
                          CategoricalHyperparameter)]
    if len(cats) >= 2 and rng.uniform() < p_forbidden:
        c1, c2 = rng.choice(cats, size=2, replace=False)
        cs.add_forbidden_clause(ForbiddenAndConjunction(
            ForbiddenEqualsClause(c1, "c"),
            ForbiddenEqualsClause(c2, "c"),
        ))
    return cs


@pytest.mark.parametrize("seed", range(12))
def test_sampled_configs_satisfy_invariants(seed):
    rng = np.random.default_rng(seed)
    cs = make_random_space(rng)
    for cfg in cs.sample_configuration(rng, size=20) + [
        cs.get_default_configuration()
    ]:
        vals = cfg.get_dictionary()
        # 1. activity consistency: resolve is a fixed point.
        assert cs._resolve(vals) == vals
        for name in cs.get_hyperparameter_names():
            assert (name in vals) == cs._is_active(name, vals), (
                name, vals,
            )
        # 2. legality + forbidden.
        for name, v in vals.items():
            assert cs.get_hyperparameter(name).is_legal(v), (name, v)
        assert not cs._check_forbidden(vals)
        # 3. encode/decode roundtrip.
        rt = cs.decode(cs.encode(cfg))
        assert set(rt.keys()) == set(vals.keys())
        for name, v in vals.items():
            hp = cs.get_hyperparameter(name)
            if isinstance(hp, UniformFloatHyperparameter):
                assert rt[name] == pytest.approx(v, rel=1e-9)
            else:
                assert rt[name] == v


@pytest.mark.parametrize("seed", range(6))
def test_prefix_merge_preserves_structure(seed):
    rng = np.random.default_rng(100 + seed)
    sub = make_random_space(rng, n_params=8)
    parent_space = ConfigurationSpace()
    selector = parent_space.add_hyperparameter(
        CategoricalHyperparameter("model", ["sub", "other"])
    )
    add_configuration_space(
        parent_space, "_sub", sub,
        parent_hyperparameter={"parent": selector, "value": "sub"},
    )
    assert (
        len(parent_space.get_hyperparameters())
        == len(sub.get_hyperparameters()) + 1
    )
    for name in sub.get_hyperparameter_names():
        assert f"_sub:{name}" in parent_space.get_hyperparameter_names()
    # Parent gating: with model != "sub", no subspace parameter is active.
    cfg = parent_space.get_default_configuration()
    cfg["model"] = "other"
    assert all(not k.startswith("_sub:") for k in cfg.keys())
    cfg["model"] = "sub"
    sub_default = sub.get_default_configuration()
    assert {k for k in cfg.keys() if k.startswith("_sub:")} == {
        f"_sub:{k}" for k in sub_default.keys()
    }
    # Sampling the merged space stays invariant-clean.
    for cfg in parent_space.sample_configuration(rng, size=10):
        vals = cfg.get_dictionary()
        assert parent_space._resolve(vals) == vals
        if vals["model"] != "sub":
            assert all(not k.startswith("_sub:") for k in vals)


class TestConditionCycles:
    def _space_abc(self):
        cs = ConfigurationSpace()
        for n in ("a", "b", "c"):
            cs.add_hyperparameter(
                CategoricalHyperparameter(n, ["x", "y"])
            )
        return cs

    def test_two_cycle_rejected(self):
        cs = self._space_abc()
        cs.add_condition(EqualsCondition("a", "b", "x"))
        with pytest.raises(ValueError, match="[Cc]ycle"):
            cs.add_condition(EqualsCondition("b", "a", "x"))
        # the offending condition must not be left behind
        assert len(cs.get_conditions()) == 1

    def test_three_cycle_rejected(self):
        cs = self._space_abc()
        cs.add_condition(EqualsCondition("a", "b", "x"))
        cs.add_condition(EqualsCondition("b", "c", "x"))
        with pytest.raises(ValueError, match="[Cc]ycle"):
            cs.add_condition(EqualsCondition("c", "a", "x"))

    def test_self_cycle_rejected(self):
        cs = self._space_abc()
        with pytest.raises(ValueError, match="[Cc]ycle"):
            cs.add_condition(EqualsCondition("a", "a", "x"))

    def test_conjunction_cycle_rejected(self):
        cs = self._space_abc()
        cs.add_condition(EqualsCondition("b", "a", "x"))
        with pytest.raises(ValueError, match="[Cc]ycle"):
            cs.add_condition(AndConjunction(
                EqualsCondition("a", "c", "x"),
                EqualsCondition("a", "b", "x"),
            ))

    def test_diamond_is_fine(self):
        """Multi-parent DAGs (diamonds) are legal — only cycles reject."""
        cs = ConfigurationSpace()
        for n in ("root", "l", "r", "leaf"):
            cs.add_hyperparameter(
                CategoricalHyperparameter(n, ["x", "y"])
            )
        cs.add_condition(EqualsCondition("l", "root", "x"))
        cs.add_condition(EqualsCondition("r", "root", "x"))
        cs.add_condition(AndConjunction(
            EqualsCondition("leaf", "l", "x"),
            EqualsCondition("leaf", "r", "x"),
        ))
        cfg = cs.get_default_configuration()
        assert "leaf" in cfg
        cfg["root"] = "y"
        assert "l" not in cfg and "leaf" not in cfg
