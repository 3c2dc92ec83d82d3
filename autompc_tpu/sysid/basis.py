"""Basis-function library for SINDy/Koopman feature maps.

Re-creates the reference basis library (reference:
autompc/sysid/basis_funcs.py:8-126) as *vectorized jax feature maps*: a
``FeatureLibrary`` is built once from static config and evaluates
``Theta(z) -> (n_features,)`` for a combined input vector ``z = [x, u]``
as one traced expression. Gradients come from jax autodiff instead of the
reference's hand-written ``grad_func`` lambdas.

Feature enumeration order matches pysindy's CustomLibrary semantics used
by the reference (sindy.py:146-151): each basis function is applied to
every size-``n_args`` combination of input dimensions, in combination
order, functions in library order.
"""

from __future__ import annotations

import itertools
from typing import Callable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# A term is (name, fn) where fn maps the full input vector z -> scalar.
Term = Tuple[str, Callable]


def identity_terms(n_inputs: int) -> List[Term]:
    """x_i (basis_funcs.py:16-20)."""
    return [(f"z{i}", lambda z, i=i: z[i]) for i in range(n_inputs)]


def poly_terms(n_inputs: int, degree: int) -> List[Term]:
    """x_i^degree (basis_funcs.py:22-26)."""
    return [
        (f"z{i}^{degree}", lambda z, i=i, d=degree: z[i] ** d)
        for i in range(n_inputs)
    ]


def cross_terms(n_inputs: int, degree: int) -> List[Term]:
    """Products of powers over distinct variables with total degree
    ``degree`` (basis_funcs.py:28-95): for each multiset of positive
    exponents summing to ``degree`` (with >= 2 variables up to
    ``degree`` variables), applied to each combination of distinct
    input dimensions."""
    # Enumerate exponent tuples like the reference: compositions of
    # `degree` into k >= 1 positive parts, deduplicated as tuples.
    exps: List[Tuple[int, ...]] = []
    seen = set()

    def compositions(total, parts):
        if parts == 1:
            yield (total,)
            return
        for first in range(1, total - parts + 2):
            for rest in compositions(total - first, parts - 1):
                yield (first,) + rest

    for k in range(1, degree + 1):
        for exp in compositions(degree, k):
            if exp not in seen:
                seen.add(exp)
                exps.append(exp)

    terms: List[Term] = []
    for exp in exps:
        k = len(exp)
        if k == 1:
            # plain power handled by poly_terms; the reference's
            # cross-term generator also emits it — keep parity by
            # skipping only if exponent == degree handled there.
            continue
        for combo in itertools.combinations(range(n_inputs), k):
            name = " ".join(f"z{i}^{e}" for i, e in zip(combo, exp))

            def fn(z, combo=combo, exp=exp):
                val = 1.0
                for i, e in zip(combo, exp):
                    val = val * z[i] ** e
                return val

            terms.append((name, fn))
    return terms


def trig_terms(n_inputs: int, freq: int) -> List[Term]:
    """sin(freq x_i), cos(freq x_i) (basis_funcs.py:97-106)."""
    out: List[Term] = []
    for i in range(n_inputs):
        out.append((f"sin({freq} z{i})", lambda z, i=i, f=freq: jnp.sin(f * z[i])))
        out.append((f"cos({freq} z{i})", lambda z, i=i, f=freq: jnp.cos(f * z[i])))
    return out


def trig_interaction_terms(n_inputs: int, freq: int) -> List[Term]:
    """x_i sin(freq x_j) and x_i cos(freq x_j) for i != j
    (basis_funcs.py:108-126: both argument orders of each pair)."""
    out: List[Term] = []
    for i, j in itertools.combinations(range(n_inputs), 2):
        out.append(
            (f"z{i} sin({freq} z{j})", lambda z, i=i, j=j, f=freq: z[i] * jnp.sin(f * z[j]))
        )
        out.append(
            (f"z{j} sin({freq} z{i})", lambda z, i=i, j=j, f=freq: z[j] * jnp.sin(f * z[i]))
        )
        out.append(
            (f"z{i} cos({freq} z{j})", lambda z, i=i, j=j, f=freq: z[i] * jnp.cos(f * z[j]))
        )
        out.append(
            (f"z{j} cos({freq} z{i})", lambda z, i=i, j=j, f=freq: z[j] * jnp.cos(f * z[i]))
        )
    return out


class FeatureLibrary:
    """A static list of scalar feature terms over a combined input vector,
    evaluated as one vectorized map."""

    def __init__(self, terms: Sequence[Term]):
        self.names = [t[0] for t in terms]
        self._fns = [t[1] for t in terms]

    @property
    def n_features(self) -> int:
        return len(self._fns)

    def __call__(self, z):
        """z: (n_inputs,) -> (n_features,). Traceable."""
        return jnp.stack([fn(z) for fn in self._fns])

    @staticmethod
    def from_config(
        n_inputs: int,
        poly_basis: bool = False,
        poly_degree: int = 3,
        poly_cross_terms: bool = False,
        trig_basis: bool = False,
        trig_freq: int = 1,
        trig_interaction: bool = False,
    ) -> "FeatureLibrary":
        """Build the library the reference SINDy assembles from its
        hyperparameters (sindy.py:136-150): identity always; trig (+
        interactions) per frequency 1..trig_freq; polynomial powers
        2..poly_degree (+ cross terms)."""
        terms: List[Term] = list(identity_terms(n_inputs))
        if trig_basis:
            for freq in range(1, trig_freq + 1):
                terms += trig_terms(n_inputs, freq)
                if trig_interaction:
                    terms += trig_interaction_terms(n_inputs, freq)
        if poly_basis:
            for deg in range(2, poly_degree + 1):
                terms += poly_terms(n_inputs, deg)
            if poly_cross_terms:
                for deg in range(2, poly_degree + 1):
                    terms += cross_terms(n_inputs, deg)
        return FeatureLibrary(terms)


def finite_difference(x: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Second-order finite-difference time derivative along axis 0:
    centered in the interior, one-sided at the boundaries (the
    differentiation scheme the reference's continuous-time SINDy relies
    on via pysindy's FiniteDifference)."""
    interior = (x[2:] - x[:-2]) / (2 * dt)
    first = (-3 * x[0] + 4 * x[1] - x[2])[None] / (2 * dt)
    last = (3 * x[-1] - 4 * x[-2] + x[-3])[None] / (2 * dt)
    return jnp.concatenate([first, interior, last], axis=0)
