"""Reference-layout alias: the reference exposes configuration-space
surgery as ``autompc.utils.cs_utils`` (reference: autompc/utils/
cs_utils.py:142-293); here the implementation lives in
``autompc_tpu.config.space``. This module re-exports it so migrating
imports work verbatim."""

from ..config.space import (  # noqa: F401
    add_configuration_space,
    set_subspace_configuration,
    set_hyper_bounds,
    set_hyper_choices,
    set_hyper_constant,
)
