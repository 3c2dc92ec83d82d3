"""Convenience constructors (reference: autompc/utils/make_utils.py)."""

from __future__ import annotations


def _cfg_dict(configuration):
    if hasattr(configuration, "get_dictionary"):
        return configuration.get_dictionary()
    return dict(configuration)


def make_model(system, model, configuration, **kwargs):
    return model(system, **_cfg_dict(configuration), **kwargs)


def make_transformer(system, transformer, configuration):
    return transformer(system, **_cfg_dict(configuration))


def make_controller(system, task, model, controller, configuration, **kwargs):
    return controller(system, task, model, **_cfg_dict(configuration), **kwargs)
