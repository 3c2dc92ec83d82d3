"""Benchmark visualizers (reference: autompc/benchmarks/cartpole.py:63-114)."""

from __future__ import annotations

import numpy as np


def animate_cartpole(fig, ax, traj, dt, margin=5.0):
    """Matplotlib animation of a cartpole trajectory."""
    import matplotlib.animation as animation

    ax.plot([-10000, 10000.0], [0.0, 0.0], "k-", lw=1)
    ax.set_xlim([-10.0, 10.0])
    ax.set_ylim([-2.0, 2.0])
    ax.set_aspect("equal")

    (line,) = ax.plot([0.0, 0.0], [0.0, -1.0], "o-", lw=2)
    time_text = ax.text(0.02, 0.85, "", transform=ax.transAxes)
    ctrl_text = ax.text(0.7, 0.85, "", transform=ax.transAxes)

    obs = np.asarray(traj.obs)
    ctrls = np.asarray(traj.ctrls)
    theta_idx = traj.system.obs_index("theta")
    x_idx = traj.system.obs_index("x")

    def init():
        line.set_data([0.0, 0.0], [0.0, -1.0])
        time_text.set_text("")
        return line, time_text

    nframes = traj.size + 50

    def animate(i):
        i %= nframes
        i = min(i, traj.size - 1)
        if i == 0:
            ax.set_xlim([-10.0, 10.0])
        x = obs[i, x_idx]
        theta = obs[i, theta_idx]
        line.set_data(
            [x, x + np.sin(theta + np.pi)], [0, -np.cos(theta + np.pi)]
        )
        time_text.set_text(f"t={dt * i:.2f}")
        ctrl_text.set_text(f"u={ctrls[i, 0]:.2f}")
        xmin, xmax = ax.get_xlim()
        if x < xmin:
            ax.set_xlim([x - margin, x + 20.0 - margin])
        if x > xmax:
            ax.set_xlim([x - 20.0 + margin, x + margin])
        return line, time_text

    return animation.FuncAnimation(
        fig, animate, frames=6 * nframes, interval=dt * 1000.0,
        blit=False, init_func=init,
    )
