"""Configuration-space system tests (conditions, prefix-merge, encoding)."""

import numpy as np
import pytest

from autompc_tpu.config import (
    CategoricalHyperparameter,
    Configuration,
    ConfigurationSpace,
    EqualsCondition,
    ForbiddenAndConjunction,
    ForbiddenEqualsClause,
    InCondition,
    UniformFloatHyperparameter,
    UniformIntegerHyperparameter,
    add_configuration_space,
    set_hyper_bounds,
    set_hyper_choices,
    set_hyper_constant,
    set_subspace_configuration,
)


def make_space():
    cs = ConfigurationSpace()
    method = CategoricalHyperparameter("method", ["lstsq", "lasso"], "lstsq")
    alpha = UniformFloatHyperparameter("lasso_alpha", 1e-5, 1e2, 1.0, log=True)
    degree = UniformIntegerHyperparameter("poly_degree", 2, 8, 3)
    cs.add_hyperparameters([method, alpha, degree])
    cs.add_condition(InCondition("lasso_alpha", "method", ["lasso"]))
    return cs


class TestHyperparameters:
    def test_float_unit_roundtrip(self):
        hp = UniformFloatHyperparameter("x", 0.0, 10.0, 5.0)
        assert hp.from_unit(hp.to_unit(7.3)) == pytest.approx(7.3)

    def test_log_scale(self):
        hp = UniformFloatHyperparameter("x", 1e-3, 1e3, log=True)
        assert hp.to_unit(1.0) == pytest.approx(0.5)
        assert hp.from_unit(0.5) == pytest.approx(1.0)
        assert hp.default_value == pytest.approx(1.0)

    def test_int_rounding(self):
        hp = UniformIntegerHyperparameter("k", 1, 10, 4)
        assert hp.from_unit(0.0) == 1
        assert hp.from_unit(1.0) == 10
        assert isinstance(hp.from_unit(0.37), int)

    def test_categorical(self):
        hp = CategoricalHyperparameter("c", ["a", "b", "c"])
        assert hp.from_unit(0.0) == "a"
        assert hp.from_unit(1.0) == "c"
        assert hp.default_value == "a"


class TestConditionals:
    def test_default_config_excludes_inactive(self):
        cs = make_space()
        cfg = cs.get_default_configuration()
        assert "lasso_alpha" not in cfg
        assert cfg["method"] == "lstsq"
        assert cfg["poly_degree"] == 3

    def test_activation_on_set(self):
        cs = make_space()
        cfg = cs.get_default_configuration()
        cfg["method"] = "lasso"
        assert "lasso_alpha" in cfg
        assert cfg["lasso_alpha"] == pytest.approx(1.0)
        cfg["method"] = "lstsq"
        assert "lasso_alpha" not in cfg

    def test_chained_conditions(self):
        cs = ConfigurationSpace()
        a = CategoricalHyperparameter("a", ["on", "off"], "off")
        b = CategoricalHyperparameter("b", ["x", "y"], "x")
        c = UniformFloatHyperparameter("c", 0.0, 1.0, 0.5)
        cs.add_hyperparameters([a, b, c])
        cs.add_condition(EqualsCondition("b", "a", "on"))
        cs.add_condition(EqualsCondition("c", "b", "y"))
        cfg = cs.get_default_configuration()
        assert "b" not in cfg and "c" not in cfg
        cfg["a"] = "on"
        assert "b" in cfg and "c" not in cfg
        cfg["b"] = "y"
        assert "c" in cfg

    def test_sampling_respects_conditions(self):
        cs = make_space()
        rng = np.random.default_rng(0)
        for cfg in cs.sample_configuration(rng, size=20):
            if cfg["method"] == "lasso":
                assert "lasso_alpha" in cfg
            else:
                assert "lasso_alpha" not in cfg


class TestForbidden:
    def test_sampling_avoids_forbidden(self):
        cs = ConfigurationSpace()
        a = CategoricalHyperparameter("a", ["p", "q"])
        b = CategoricalHyperparameter("b", ["r", "s"])
        cs.add_hyperparameters([a, b])
        cs.add_forbidden_clause(
            ForbiddenAndConjunction(
                ForbiddenEqualsClause("a", "p"), ForbiddenEqualsClause("b", "r")
            )
        )
        rng = np.random.default_rng(1)
        for cfg in cs.sample_configuration(rng, size=50):
            assert not (cfg["a"] == "p" and cfg["b"] == "r")


class TestPrefixMerge:
    def test_add_configuration_space(self):
        parent = ConfigurationSpace()
        sub = make_space()
        add_configuration_space(parent, "_model", sub)
        names = set(parent.get_hyperparameter_names())
        assert names == {"_model:method", "_model:lasso_alpha", "_model:poly_degree"}
        cfg = parent.get_default_configuration()
        cfg["_model:method"] = "lasso"
        assert "_model:lasso_alpha" in cfg

    def test_parent_conditioning(self):
        parent = ConfigurationSpace()
        selector = CategoricalHyperparameter("model", ["ARX", "SINDy"], "ARX")
        parent.add_hyperparameter(selector)
        sub = make_space()
        add_configuration_space(
            parent, "_SINDy", sub,
            parent_hyperparameter={"parent": "model", "value": "SINDy"},
        )
        cfg = parent.get_default_configuration()
        # ARX selected: whole SINDy subspace inactive
        assert "_SINDy:method" not in cfg
        cfg["model"] = "SINDy"
        assert "_SINDy:method" in cfg
        # conditional-inside-subspace still respected
        assert "_SINDy:lasso_alpha" not in cfg
        cfg["_SINDy:method"] = "lasso"
        assert "_SINDy:lasso_alpha" in cfg

    def test_subspace_extraction(self):
        parent = ConfigurationSpace()
        sub = make_space()
        add_configuration_space(parent, "_model", sub)
        cfg = parent.get_default_configuration()
        cfg["_model:poly_degree"] = 5
        sub_cfg = sub.get_default_configuration()
        set_subspace_configuration(cfg, "_model", sub_cfg)
        assert sub_cfg["poly_degree"] == 5


class TestEncoding:
    def test_roundtrip(self):
        cs = make_space()
        rng = np.random.default_rng(3)
        for cfg in cs.sample_configuration(rng, size=10):
            vec = cs.encode(cfg)
            assert vec.shape == (3,)
            back = cs.decode(vec)
            for key in cfg.keys():
                if isinstance(cfg[key], float):
                    assert back[key] == pytest.approx(cfg[key], rel=1e-6)
                else:
                    assert back[key] == cfg[key]

    def test_inactive_slots(self):
        cs = make_space()
        cfg = cs.get_default_configuration()
        vec = cs.encode(cfg)
        idx = cs.get_hyperparameter_names().index("lasso_alpha")
        assert vec[idx] == -1.0

    def test_batch(self):
        cs = make_space()
        cfgs = cs.sample_configuration(np.random.default_rng(5), size=4)
        X = cs.encode_batch(cfgs)
        assert X.shape == (4, 3)


class TestRebinding:
    def test_set_hyper_bounds(self):
        cs = make_space()
        set_hyper_bounds(cs, "poly_degree", 2, 4)
        hp = cs.get_hyperparameter("poly_degree")
        assert hp.upper == 4

    def test_set_hyper_choices(self):
        cs = make_space()
        set_hyper_choices(cs, "method", ["lstsq"])
        assert cs.get_hyperparameter("method").choices == ["lstsq"]

    def test_set_hyper_constant(self):
        cs = make_space()
        set_hyper_constant(cs, "poly_degree", 3)
        cfg = cs.get_default_configuration()
        assert cfg["poly_degree"] == 3


class TestShapeSignature:
    def test_signature_groups(self):
        cs = make_space()
        c1 = cs.get_default_configuration()
        c2 = cs.get_default_configuration()
        c2["lasso_alpha" if "lasso_alpha" in c2 else "poly_degree"] = 3
        assert c1.shape_signature() == c2.shape_signature()
        c3 = cs.get_default_configuration()
        c3["poly_degree"] = 8
        assert c1.shape_signature() != c3.shape_signature()


def test_from_unit_lands_inside_bounds():
    """Log-scale decode at u=1.0 must return exactly upper (pre-fix it
    returned upper + ~1e-11, which failed is_legal and broke a
    checkpoint round-trip through configuration_from_dict)."""
    from autompc_tpu.config.space import UniformFloatHyperparameter

    hp = UniformFloatHyperparameter("x", 1e-3, 1e4, log=True)
    for u in (0.0, 0.25, 0.5, 0.999999, 1.0):
        v = hp.from_unit(u)
        assert hp.is_legal(v), (u, v)
    assert hp.from_unit(1.0) == hp.upper
    # exp/log roundoff may land epsilon INSIDE at u=0 — legal either
    # way; the clamp only guarantees in-bounds.
    assert abs(hp.from_unit(0.0) - hp.lower) < 1e-12 * hp.lower + 1e-18


def test_configuration_from_dict_numpy_and_epsilon():
    """Checkpoint round-trips hand back 0-d numpy arrays and (from old
    snapshots) epsilon-out-of-bound floats; both must load."""
    import numpy as np

    from autompc_tpu.config.space import (
        ConfigurationSpace,
        UniformFloatHyperparameter,
    )

    cs = ConfigurationSpace()
    cs.add_hyperparameter(
        UniformFloatHyperparameter("a", 1e-3, 1e4, log=True)
    )
    cfg = cs.configuration_from_dict({"a": np.array(10000.00000000001)})
    assert cfg["a"] == 1e4
    cfg = cs.configuration_from_dict({"a": np.float64(0.5)})
    assert cfg["a"] == 0.5
