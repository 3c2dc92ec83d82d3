"""Native C++ random-forest surrogate tests."""

import numpy as np
import pytest

from autompc_tpu.native import NativeRandomForest, make_forest
from autompc_tpu.tuning.bo import RandomForestSurrogate


@pytest.mark.skipif(
    not NativeRandomForest.available(), reason="no C++ toolchain"
)
class TestNativeRF:
    def test_fits_and_predicts(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(0, 1, (300, 4))
        y = 2 * X[:, 0] + np.sin(5 * X[:, 1]) + 0.1 * rng.normal(size=300)
        rf = NativeRandomForest(rng=rng).fit(X, y)
        mu, sigma = rf.predict(X[:64])
        assert np.abs(mu - y[:64]).mean() < 0.4
        assert (sigma >= 0).all()
        assert np.isfinite(mu).all() and np.isfinite(sigma).all()

    def test_comparable_to_python(self):
        rng = np.random.default_rng(1)
        X = rng.uniform(0, 1, (250, 3))
        y = (X[:, 0] - 0.5) ** 2 + X[:, 1]
        native = NativeRandomForest(rng=np.random.default_rng(2)).fit(X, y)
        python = RandomForestSurrogate(rng=np.random.default_rng(2)).fit(X, y)
        Xq = rng.uniform(0, 1, (80, 3))
        mu_n, _ = native.predict(Xq)
        mu_p, _ = python.predict(Xq)
        true = (Xq[:, 0] - 0.5) ** 2 + Xq[:, 1]
        err_n = np.abs(mu_n - true).mean()
        err_p = np.abs(mu_p - true).mean()
        # same algorithm family -> comparable accuracy
        assert err_n < 2.0 * err_p + 0.05

    def test_refit_frees_previous(self):
        rng = np.random.default_rng(3)
        X = rng.uniform(0, 1, (100, 2))
        y = X[:, 0]
        rf = NativeRandomForest(rng=rng)
        rf.fit(X, y)
        rf.fit(X, 2 * y)  # refit must not leak/crash
        mu, _ = rf.predict(X[:5])
        assert np.isfinite(mu).all()

    def test_factory_prefers_native(self):
        f = make_forest()
        assert isinstance(f, NativeRandomForest)

    def test_speed_advantage(self):
        import time

        rng = np.random.default_rng(4)
        X = rng.uniform(0, 1, (400, 8))
        y = X @ rng.normal(size=8)
        t0 = time.perf_counter()
        NativeRandomForest(rng=np.random.default_rng(0)).fit(X, y).predict(X)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        RandomForestSurrogate(rng=np.random.default_rng(0)).fit(X, y).predict(X)
        t_python = time.perf_counter() - t0
        assert t_native < t_python
