"""Arena rendering — the observability surface the reference gets from the
Stage GUI (``window`` block, ``worlds/stage1.world:53-75``).

Produces a matplotlib figure of one arena: wall segments, robot discs with
heading ticks, goals, and optionally the lidar scan of one robot.  Gated on
matplotlib being importable; everything else in the framework works without
it.
"""
from __future__ import annotations

import numpy as np


def render_arena(spec, pose, goal, scan=None, scan_robot: int = 0, ax=None):
    """pose (N, 3), goal (N, 2), optional scan (N, B) ranges in meters.

    Returns the matplotlib Axes.
    """
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.patches import Circle

    pose = np.asarray(pose)
    goal = np.asarray(goal)
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 7))
    seg_p = np.asarray(spec.seg_p)[np.asarray(spec.seg_valid)]
    seg_e = np.asarray(spec.seg_e)[np.asarray(spec.seg_valid)]
    for p, e in zip(seg_p, seg_e):
        ax.plot([p[0], p[0] + e[0]], [p[1], p[1] + e[1]], "k-", lw=1)
    cmap = plt.cm.tab20(np.linspace(0, 1, len(pose)))
    for i, (x, y, th) in enumerate(pose):
        ax.add_patch(Circle((x, y), spec.robot_radius, color=cmap[i],
                            alpha=0.9))
        ax.plot([x, x + 2 * spec.robot_radius * np.cos(th)],
                [y, y + 2 * spec.robot_radius * np.sin(th)],
                color="black", lw=1)
        ax.plot(goal[i, 0], goal[i, 1], "*", color=cmap[i], markersize=8)
    if scan is not None:
        i = scan_robot
        x, y, th = pose[i]
        b = len(scan[i])
        ang = th + np.linspace(-spec.fov / 2, spec.fov / 2, b)
        px = x + np.asarray(scan[i]) * np.cos(ang)
        py = y + np.asarray(scan[i]) * np.sin(ang)
        ax.plot(px, py, ".", color="red", markersize=1)
    ax.set_aspect("equal")
    return ax


def save_arena_png(path, spec, pose, goal, scan=None, scan_robot: int = 0):
    import matplotlib.pyplot as plt

    ax = render_arena(spec, pose, goal, scan, scan_robot)
    ax.figure.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(ax.figure)
    return path


def save_trajectory_gif(path, spec, poses, goal, every: int = 1,
                        duration_ms: int = 80):
    """Animate a trajectory — the reference's demo-GIF equivalent
    (README.md:5).  poses: (T, N, 3) array of per-step poses."""
    import io

    import matplotlib.pyplot as plt
    from PIL import Image

    frames = []
    poses = np.asarray(poses)
    for t in range(0, len(poses), every):
        ax = render_arena(spec, poses[t], goal)
        buf = io.BytesIO()
        ax.figure.savefig(buf, format="png", dpi=80, bbox_inches="tight")
        plt.close(ax.figure)
        buf.seek(0)
        frames.append(Image.open(buf).convert("P"))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    return path
