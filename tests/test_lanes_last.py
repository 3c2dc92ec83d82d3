"""Lanes-last packed-carry iLQR path (round 4) vs the batch-major
reference paths.

The ``lanes_last=True`` solver keeps the whole iteration carry in the
Pallas kernels' native layout (xs (H+1, ds, B), us (H, B), jac packed
(H, ds*(ds+1), B)) — these tests pin it lane-for-lane against the
batch-major wrappers and the pure-XLA solver in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autompc_tpu.benchmarks import CartpoleSwingupBenchmark
from autompc_tpu.control.ilqr import (
    make_batched_ilqr_solver,
    make_scheduled_ilqr_solver,
    make_staged_ilqr_solver,
)
from autompc_tpu.costs import QuadCost
from autompc_tpu.ops.pallas_riccati import (
    pallas_tvlqr_backward_quad,
    pallas_tvlqr_backward_quad_ll,
)
from autompc_tpu.sysid import SINDy


@pytest.fixture(scope="module")
def setup():
    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=60, traj_len=80)
    model = SINDy(
        b.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    cost = QuadCost(
        b.system,
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        0.001 * jnp.eye(1),
        jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01])),
        goal=jnp.zeros(4),
    )
    bounds = b.task.get_ctrl_bounds()
    common = dict(
        H=8, ds=4, dc=1, obsdim=4, dt=b.system.dt,
        ubounds=(bounds[:, 0], bounds[:, 1]), max_iter=10,
    )
    return b, model, cost, common


def test_backward_quad_ll_matches_split():
    """The packed lanes-last backward wrapper reproduces the
    batch-major split-jac wrapper exactly (same kernel math, different
    stream layout)."""
    rng = np.random.default_rng(3)
    B, H, ds, obsdim = 8, 12, 4, 4
    Jx = jnp.asarray(rng.normal(size=(B, H, ds, ds)) * 0.3)
    Ju = jnp.asarray(rng.normal(size=(B, H, ds, 1)))
    xs = jnp.asarray(rng.normal(size=(B, H + 1, ds)))
    us = jnp.asarray(rng.normal(size=(B, H, 1)))
    Qd = jnp.asarray(rng.uniform(0.1, 2.0, (B, obsdim)))
    Rd = jnp.asarray(rng.uniform(0.1, 2.0, (B, 1)))
    Fd = jnp.asarray(rng.uniform(0.1, 2.0, (B, obsdim)))
    goal = jnp.asarray(rng.normal(size=(obsdim,)))
    dt = 0.05

    Ks_r, ks_r, lin_r, quad_r = pallas_tvlqr_backward_quad(
        Jx, Ju, xs, us, Qd, Rd, Fd, goal, dt, obsdim,
        block_b=B, interpret=True,
    )

    jac_p = jnp.transpose(
        jnp.concatenate([Jx, Ju], axis=-1), (1, 2, 3, 0)
    ).reshape(H, ds * (ds + 1), B)
    KsT, ksT, lin_l, quad_l = pallas_tvlqr_backward_quad_ll(
        jac_p, jnp.transpose(xs, (1, 2, 0)),
        jnp.transpose(us[:, :, 0], (1, 0)),
        Qd.T, Rd.T, Fd.T, goal, dt, obsdim,
        block_b=B, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(KsT, (2, 0, 1))[:, :, None, :]),
        np.asarray(Ks_r), rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(ksT, (1, 0))[:, :, None]),
        np.asarray(ks_r), rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(lin_l), np.asarray(lin_r),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(quad_l), np.asarray(quad_r),
                               rtol=1e-12)


def test_backward_quad_wide_matches_loop_kernel():
    """The streamed full-(8,128)-tile WIDE backward (auto at
    B % 1024 == 0) reproduces the whole-horizon loop kernel, with and
    without the in-kernel carry update."""
    rng = np.random.default_rng(17)
    # B=2048 exercises the S=16 (two-vreg) slab height; H=10 the
    # chunked-T unrolled cell (T=10); a second case below hits T=1.
    B, H, ds, obsdim = 2048, 10, 4, 4
    dsd = ds * (ds + 1)
    jac = jnp.asarray(rng.normal(0, 0.2, (H, dsd, B)))
    xs = jnp.asarray(rng.normal(size=(H + 1, ds, B)))
    us = jnp.asarray(rng.normal(size=(H, B)))
    Qd = jnp.asarray(rng.uniform(0.1, 2.0, (obsdim, B)))
    Rd = jnp.asarray(rng.uniform(0.1, 2.0, (1, B)))
    Fd = jnp.asarray(rng.uniform(0.1, 2.0, (obsdim, B)))
    goal = jnp.asarray(rng.normal(size=(obsdim,)))
    act = jnp.asarray(rng.uniform(size=B) > 0.3)
    oK = jnp.asarray(rng.normal(size=(H, ds, B)))
    ok_ = jnp.asarray(rng.normal(size=(H, B)))

    for carry in (None, (act, oK, ok_)):
        ref = pallas_tvlqr_backward_quad_ll(
            jac, xs, us, Qd, Rd, Fd, goal, 0.05, obsdim,
            block_b=B, interpret=True, carry=carry, wide="off",
        )
        wide = pallas_tvlqr_backward_quad_ll(
            jac, xs, us, Qd, Rd, Fd, goal, 0.05, obsdim,
            interpret=True, carry=carry, wide="on",
        )
        for r, w in zip(ref, wide):
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(r), rtol=1e-12, atol=1e-12
            )
    # T=1 (H prime) at S=8 (B=1024).
    Hp = 7
    refp = pallas_tvlqr_backward_quad_ll(
        jac[:Hp, :, :1024], xs[:Hp + 1, :, :1024], us[:Hp, :1024],
        Qd[:, :1024], Rd[:, :1024], Fd[:, :1024], goal, 0.05, obsdim,
        block_b=1024, interpret=True, wide="off",
    )
    widep = pallas_tvlqr_backward_quad_ll(
        jac[:Hp, :, :1024], xs[:Hp + 1, :, :1024], us[:Hp, :1024],
        Qd[:, :1024], Rd[:, :1024], Fd[:, :1024], goal, 0.05, obsdim,
        interpret=True, wide="on",
    )
    for r, w in zip(refp, widep):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(r), rtol=1e-12, atol=1e-12
        )


def test_fused_ll_io_matches_batch_major(setup):
    """pallas_fused_line_search(ll_io=True) == the batch-major call on
    the same state, including the packed-jac output."""
    from autompc_tpu.ops.pallas_linesearch import pallas_fused_line_search

    b, model, cost, common = setup
    rng = np.random.default_rng(11)
    B, H, ds = 4, 9, 4
    x0 = jnp.asarray(rng.uniform(-1, 1, (B, ds)))
    xs = jnp.asarray(rng.uniform(-1, 1, (B, H + 1, ds)))
    us = jnp.asarray(rng.uniform(-2, 2, (B, H, 1)))
    Ks = jnp.asarray(rng.normal(size=(B, H, 1, ds)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(B, H, 1)))
    alphas = 0.2 ** jnp.arange(5, dtype=x0.dtype)
    Q = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
    R = 0.001 * jnp.eye(1)
    F = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
    goal = jnp.zeros(4)
    obj0 = jnp.asarray(rng.uniform(5.0, 50.0, (B,)))
    lin_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    quad_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    ks_small = jnp.array([False, True, False, False])
    gts = model.library.grad_terms

    ref = pallas_fused_line_search(
        tuple(model.library._fns), x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        Q, R, F, goal, 0.05, obj0, lin_red, quad_red, ks_small,
        grad_terms=gts, block_b=B, interpret=True,
    )
    out = pallas_fused_line_search(
        tuple(model.library._fns),
        x0.T, jnp.transpose(xs, (1, 2, 0)),
        jnp.transpose(us[:, :, 0], (1, 0)),
        jnp.transpose(Ks[:, :, 0], (1, 2, 0)),
        jnp.transpose(ks[:, :, 0], (1, 0)),
        model.coeffs, alphas, -20.0, 20.0,
        Q, R, F, goal, 0.05, obj0, lin_red, quad_red, ks_small,
        grad_terms=gts, block_b=B, interpret=True, ll_io=True,
    )
    new_xsT, new_usT, obj_l, succ_l, fail_l, jac_p = out
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(new_xsT, (2, 0, 1))),
        np.asarray(ref[0]), rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(new_usT, (1, 0))[:, :, None]),
        np.asarray(ref[1]), rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(obj_l), np.asarray(ref[2]),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(succ_l), np.asarray(ref[3]))
    np.testing.assert_array_equal(np.asarray(fail_l), np.asarray(ref[4]))
    # Packed jac rows k*(ds+1)+j == (Jx | Ju).
    d = ds + 1
    jac = jnp.transpose(jac_p, (2, 0, 1)).reshape(B, H, ds, d)
    np.testing.assert_allclose(np.asarray(jac[..., :ds]),
                               np.asarray(ref[5]), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jac[..., ds:]),
                               np.asarray(ref[6]), rtol=1e-12, atol=1e-12)


def _ll_kwargs(model):
    return dict(
        backward="pallas",
        feature_spec=(model.library, "coeffs"),
        fuse_ls=True,
        lanes_last=True,
        pallas_interpret=True,
    )


def test_solver_ll_matches_batch_major_fused(setup):
    """End-to-end: the lanes-last solver == the batch-major fused
    solver lane-for-lane (identical kernel math through a different
    carry layout)."""
    b, model, cost, common = setup
    ll = make_batched_ilqr_solver(
        model.pred_core, cost, **_ll_kwargs(model), **common
    )
    ref = make_batched_ilqr_solver(
        model.pred_core, cost, backward="pallas",
        feature_spec=(model.library, "coeffs"), fuse_ls=True,
        pallas_interpret=True, **common
    )
    rng = np.random.default_rng(5)
    B = 8
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 4)))
    ug = jnp.zeros((B, common["H"], 1))
    out_l = jax.jit(ll)(model.params, x0s, ug)
    out_r = jax.jit(ref)(model.params, x0s, ug)
    np.testing.assert_array_equal(np.asarray(out_l[0]),
                                  np.asarray(out_r[0]))
    for i in (1, 2, 3, 4):
        np.testing.assert_allclose(
            np.asarray(out_l[i]), np.asarray(out_r[i]),
            rtol=1e-10, atol=1e-10,
        )


def test_scheduled_ll_matches_batched_ll(setup):
    """Device-side compaction gathers/scatters the lanes-last carry on
    its LAST axis — lane-for-lane equal to the uncompacted ll solve on
    CPU."""
    b, model, cost, common = setup
    batched = make_batched_ilqr_solver(
        model.pred_core, cost, **_ll_kwargs(model), **common
    )
    sched = make_scheduled_ilqr_solver(
        model.pred_core, cost, schedule=((3, 0.5),),
        **_ll_kwargs(model), **common
    )
    rng = np.random.default_rng(6)
    B = 8
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 4)))
    ug = jnp.zeros((B, common["H"], 1))
    out_b = jax.jit(batched)(model.params, x0s, ug)
    out_s = jax.jit(sched)(model.params, x0s, ug)
    np.testing.assert_array_equal(np.asarray(out_b[0]),
                                  np.asarray(out_s[0]))
    for i in (1, 2):
        np.testing.assert_allclose(
            np.asarray(out_b[i]), np.asarray(out_s[i]),
            rtol=1e-10, atol=1e-10,
        )


def test_ll_per_lane_cost_matches_batch_major(setup):
    """quad_cost_batch (per-lane diagonal costs, the tuning fan-out
    shape) through the lanes-last carry == the batch-major fused
    per-lane path."""
    b, model, cost, common = setup
    kw = dict(common)
    kw.pop("dt")
    ll = make_batched_ilqr_solver(
        model.pred_core, None, dt=b.system.dt,
        quad_cost_batch=True, quad_goal=jnp.zeros(4),
        **_ll_kwargs(model), **kw
    )
    ref = make_batched_ilqr_solver(
        model.pred_core, None, dt=b.system.dt,
        quad_cost_batch=True, quad_goal=jnp.zeros(4),
        backward="pallas", feature_spec=(model.library, "coeffs"),
        fuse_ls=True, pallas_interpret=True, **kw
    )
    rng = np.random.default_rng(9)
    B = 6  # deliberately != obsdim: a transposed-shape mixup must fail
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 4)))
    ug = jnp.zeros((B, common["H"], 1))
    cp = dict(
        Qdiag=jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
        Rdiag=jnp.asarray(rng.uniform(0.001, 0.01, (B, 1))),
        Fdiag=jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
    )
    out_l = jax.jit(ll)(model.params, x0s, ug, cp)
    out_r = jax.jit(ref)(model.params, x0s, ug, cp)
    np.testing.assert_array_equal(np.asarray(out_l[0]),
                                  np.asarray(out_r[0]))
    for i in (1, 2):
        np.testing.assert_allclose(
            np.asarray(out_l[i]), np.asarray(out_r[i]),
            rtol=1e-10, atol=1e-10,
        )


def test_ll_batch_params_matches_batch_major(setup):
    """batch_params=True (per-lane model coefficients — the JOINT
    fan-out shape) through the lanes-last carry == the batch-major
    fused per-lane path."""
    b, model, cost, common = setup
    kw = dict(common)
    kw.pop("dt")
    shared = dict(
        dt=b.system.dt, quad_cost_batch=True, quad_goal=jnp.zeros(4),
        batch_params=True,
    )
    ll = make_batched_ilqr_solver(
        model.pred_core, None, **shared, **_ll_kwargs(model), **kw
    )
    ref = make_batched_ilqr_solver(
        model.pred_core, None, **shared,
        backward="pallas", feature_spec=(model.library, "coeffs"),
        fuse_ls=True, pallas_interpret=True, **kw
    )
    rng = np.random.default_rng(13)
    B = 6
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 4)))
    ug = jnp.zeros((B, common["H"], 1))
    coeffs = jnp.asarray(model.coeffs)[None] * jnp.asarray(
        1.0 + 0.01 * rng.normal(size=(B, 1, 1))
    )
    params = {"coeffs": coeffs}
    cp = dict(
        Qdiag=jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
        Rdiag=jnp.asarray(rng.uniform(0.001, 0.01, (B, 1))),
        Fdiag=jnp.asarray(rng.uniform(0.5, 10.0, (B, 4))),
    )
    out_l = jax.jit(ll)(params, x0s, ug, cp)
    out_r = jax.jit(ref)(params, x0s, ug, cp)
    np.testing.assert_array_equal(np.asarray(out_l[0]),
                                  np.asarray(out_r[0]))
    for i in (1, 2):
        np.testing.assert_allclose(
            np.asarray(out_l[i]), np.asarray(out_r[i]),
            rtol=1e-10, atol=1e-10,
        )


def test_ll_validation():
    """lanes_last without the fused path raises the labeled error, and
    the staged driver refuses it."""
    b = CartpoleSwingupBenchmark()
    cost = QuadCost(
        b.system, jnp.eye(4), jnp.eye(1), jnp.eye(4), goal=jnp.zeros(4)
    )

    def dummy_pred(params, x, u):
        return x

    with pytest.raises(ValueError, match="lanes_last"):
        make_batched_ilqr_solver(
            dummy_pred, cost, H=4, ds=4, dc=1, obsdim=4, dt=0.05,
            lanes_last=True,
        )
    with pytest.raises(ValueError, match="staged"):
        make_staged_ilqr_solver(
            dummy_pred, cost, H=4, ds=4, dc=1, obsdim=4, dt=0.05,
            lanes_last=True,
        )


def test_wide_line_search_matches_fused(setup):
    """The WIDE split line search (objective-sweep kernel + XLA
    acceptance + re-roll/relin kernel) == the whole-horizon fused
    kernel's ll carry path, including masks, jac, and du2."""
    from autompc_tpu.ops.pallas_linesearch import (
        pallas_fused_line_search,
        pallas_fused_line_search_wide,
    )

    b, model, cost, common = setup
    rng = np.random.default_rng(23)
    B, H, ds, L = 1024, 10, 4, 5
    dsd = ds * (ds + 1)
    x0 = jnp.asarray(rng.uniform(-1, 1, (ds, B)))
    xs = jnp.asarray(rng.uniform(-1, 1, (H + 1, ds, B)))
    us = jnp.asarray(rng.uniform(-2, 2, (H, B)))
    Ks = jnp.asarray(rng.normal(size=(H, ds, B)) * 0.3)
    ks = jnp.asarray(rng.normal(size=(H, B)))
    alphas = 0.2 ** jnp.arange(L, dtype=x0.dtype)
    Q = jnp.diag(jnp.array([10.0, 0.1, 0.01, 0.01]))
    R = 0.001 * jnp.eye(1)
    goal = jnp.zeros(4)
    obj0 = jnp.asarray(rng.uniform(5.0, 50.0, (B,)))
    lin_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    quad_red = jnp.asarray(-rng.uniform(0.1, 5.0, (B,)))
    ks_small = jnp.asarray(rng.uniform(size=B) < 0.2)
    act = jnp.asarray(rng.uniform(size=B) > 0.3)
    old_jac = jnp.asarray(rng.normal(size=(H, dsd, B)))
    gts = model.library.grad_terms
    fns = tuple(model.library._fns)

    ref = pallas_fused_line_search(
        fns, x0, xs, us, Ks, ks,
        model.coeffs, alphas, -20.0, 20.0,
        Q, R, Q, goal, 0.05, obj0, lin_red, quad_red, ks_small,
        grad_terms=gts, block_b=B, interpret=True, ll_io=True,
        carry=(act, old_jac),
    )
    wide = pallas_fused_line_search_wide(
        fns, x0, xs, us, Ks, ks,
        model.coeffs, alphas, jnp.array([-20.0]), jnp.array([20.0]),
        Q, R, Q, goal, 0.05, obj0, lin_red, quad_red, ks_small,
        act, old_jac,
        grad_terms=gts, interpret=True,
    )
    names = ("xs", "us", "obj", "succ", "fail", "jac", "du2")
    for name, r, w in zip(names, ref, wide):
        if name in ("succ", "fail"):
            np.testing.assert_array_equal(
                np.asarray(w), np.asarray(r), err_msg=name
            )
        else:
            np.testing.assert_allclose(
                np.asarray(w), np.asarray(r), rtol=1e-9, atol=1e-9,
                err_msg=name,
            )


def test_solver_ll_bf16_jac_carry(setup):
    """jac_dtype="bf16" (half-stream jac carry, the B=131072 HBM fit):
    the solver runs with a bfloat16 packed-jac carry while gains and
    trajectories stay f32, and its solutions track the f32-jac solver
    closely (iLQR tolerates an inexact linearization — the line search
    re-evaluates the true objective in f32)."""
    b, model, cost, common = setup
    bf = make_batched_ilqr_solver(
        model.pred_core, cost, jac_dtype="bf16",
        **_ll_kwargs(model), **common
    )
    ref = make_batched_ilqr_solver(
        model.pred_core, cost, **_ll_kwargs(model), **common
    )
    rng = np.random.default_rng(11)
    B = 8
    x0s = jnp.asarray(rng.uniform(-1, 1, (B, 4)))
    ug = jnp.zeros((B, common["H"], 1))
    out_b = jax.jit(bf)(model.params, x0s, ug)
    out_r = jax.jit(ref)(model.params, x0s, ug)
    # Trajectories and gains keep the reference solver's full-precision
    # dtype (f32; f64 under the test suite's x64 mode) — only the jac
    # CARRY is bf16.
    assert out_b[1].dtype == out_r[1].dtype
    assert out_b[3].dtype == out_r[3].dtype
    # Most lanes converge identically; trajectories track within the
    # bf16 linearization's reach (the acceptance rule can flip a
    # knife-edge lane, so pin medians, not lane-for-lane equality).
    conv_b = np.asarray(out_b[0])
    conv_r = np.asarray(out_r[0])
    assert conv_b.mean() >= conv_r.mean() - 0.25
    err = np.median(
        np.abs(np.asarray(out_b[1]) - np.asarray(out_r[1]))
    )
    assert err < 0.05, err


def test_jac_dtype_validation():
    """jac_dtype="bf16" requires the lanes-last carry; bad values
    raise."""
    b = CartpoleSwingupBenchmark()
    trajs = b.gen_trajs_batch(seed=42, n_trajs=20, traj_len=40)
    model = SINDy(
        b.system, method="lstsq", threshold=1e-3,
        trig_basis=True, trig_freq=1, trig_interaction=True,
        time_mode="discrete",
    )
    model.train(trajs)
    kw = dict(H=8, ds=4, dc=1, obsdim=4, dt=b.system.dt)
    with pytest.raises(ValueError, match="lanes-last"):
        make_batched_ilqr_solver(
            model.pred_core, None, jac_dtype="bf16",
            quad_cost_batch=True, **kw
        )
    with pytest.raises(ValueError, match="jac_dtype"):
        make_batched_ilqr_solver(
            model.pred_core, None, jac_dtype="fp8",
            quad_cost_batch=True, **kw
        )
