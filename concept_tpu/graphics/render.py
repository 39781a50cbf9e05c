"""Renders: 2D projections (PNG + HDF5 + ANSI terminal) and 3D scatter.

TPU-native counterpart of reference src/graphics.py (render2D :1027 with
projection/enhancement/terminal output :1901-1969; render3D :1970-3518).
The density projection is computed on device (deposit + axis sum); image
post-processing (colormap, enhancement, PNG) is host-side matplotlib.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from concept_tpu.grid.interp import deposit


def project_density(pos, gridsize: int, boxsize: float, axis: int = 2,
                    order: int = 2, extent=None):
    """Deposit particles and project along ``axis`` → (n, n) image.

    extent: optional (lo, hi) slab bounds along the projection axis
    (reference render2D_options 'extent', graphics.py:1374)."""
    if extent is not None:
        lo, hi = extent
        x = pos[:, axis]
        sel = (x >= lo) & (x < hi)
        w = jnp.where(sel, 1.0, 0.0)
    else:
        w = 1.0
    grid = deposit(pos, w, gridsize, boxsize, order=order)
    return np.asarray(jnp.sum(grid, axis=axis))


def enhance(img: np.ndarray, clip_percentile: float = 99.5, log: bool = True):
    """Contrast enhancement ~ reference's gridsize-independent enhancement
    (graphics.py:1568): log-scale + percentile clipping → [0,1]."""
    img = np.asarray(img, dtype=np.float64)
    if log:
        img = np.log1p(img / max(img.mean(), 1e-300))
    hi = np.percentile(img, clip_percentile)
    lo = img.min()
    return np.clip((img - lo) / max(hi - lo, 1e-300), 0, 1)


def render2D(
    pos,
    gridsize: int,
    boxsize: float,
    filename: str | None = None,
    axis: int = 2,
    colormap: str = "inferno",
    terminal: bool = False,
    terminal_resolution: int = 80,
    save_data: bool = False,
    extent=None,
):
    """Full render2D: returns the enhanced image; optionally saves PNG,
    HDF5 data dump and/or prints an ANSI block (reference
    render2D_select data/image/terminal image)."""
    img = project_density(pos, gridsize, boxsize, axis=axis, extent=extent)
    enhanced = enhance(img)
    if filename:
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(filename, enhanced.T[::-1], cmap=colormap)
        if save_data:
            import h5py

            with h5py.File(filename.rsplit(".", 1)[0] + ".hdf5", "w") as f:
                f.create_dataset("data", data=img)
                f.attrs["axis"] = axis
                f.attrs["boxsize"] = boxsize
    if terminal:
        print(terminal_render(enhanced, terminal_resolution, colormap))
    return enhanced


def terminal_render(enhanced: np.ndarray, resolution: int = 80,
                    colormap: str = "inferno") -> str:
    """ANSI 256-color terminal image (reference graphics.py:1901-1969;
    replayable from logs with the play utility)."""
    import matplotlib

    matplotlib.use("Agg")

    n = enhanced.shape[0]
    res = min(resolution, n)
    # downsample by block averaging; 2 rows per character via ▀
    step = max(1, n // res)
    img = enhanced[::step, ::step]
    cmap = matplotlib.colormaps.get_cmap(colormap)
    rgb = (np.asarray(cmap(img))[:, :, :3] * 255).astype(int)
    lines = []
    h = img.shape[1]
    for j in range(h - 2, -1, -2):
        line = []
        for i in range(img.shape[0]):
            top = rgb[i, j + 1]
            bot = rgb[i, j]
            line.append(
                f"\033[38;2;{top[0]};{top[1]};{top[2]}m"
                f"\033[48;2;{bot[0]};{bot[1]};{bot[2]}m▀"
            )
        lines.append("".join(line) + "\033[0m")
    return "\n".join(lines)


def render3D(
    pos,
    boxsize: float,
    filename: str,
    resolution: int = 1080,
    elevation: float = 20.0,
    azimuth: float = -60.0,
    color: str = "lime",
    background: str = "black",
    max_particles: int = 200_000,
    depthshade: bool = True,
):
    """3D particle scatter render (reference graphics.py:1970-3518,
    simplified: subsampled scatter with depth shading)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = np.asarray(pos)
    if len(p) > max_particles:
        idx = np.random.default_rng(0).choice(len(p), max_particles, replace=False)
        p = p[idx]
    fig = plt.figure(figsize=(resolution / 100, resolution / 100), dpi=100)
    ax = fig.add_subplot(projection="3d", facecolor=background)
    fig.patch.set_facecolor(background)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=0.1, c=color, alpha=0.35,
               depthshade=depthshade)
    ax.view_init(elev=elevation, azim=azimuth)
    ax.set_xlim(0, boxsize)
    ax.set_ylim(0, boxsize)
    ax.set_zlim(0, boxsize)
    ax.set_axis_off()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    fig.savefig(filename, facecolor=background, bbox_inches="tight")
    plt.close(fig)
    return filename


def plot_bispec(out: dict, filename: str, treelevel=None, a: float = 1.0):
    """B(k) plot for a 1-parameter triangle family (reference
    graphics.py:179 plot_bispec)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    k1 = out["triangles"][:, 0]
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(k1, np.abs(out["B"]), "o-", label="simulation |B|")
    if treelevel is not None:
        ax.loglog(k1, np.abs(treelevel), ":", label="tree level")
    ax.set_xlabel("k₁")
    ax.set_ylabel("B(k₁,k₂,k₃)")
    ax.set_title(f"a = {a:.4g}")
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    fig.savefig(filename, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return filename


def plot_powerspec(pk: dict, filename: str, linear=None, a: float = 1.0):
    """P(k) plot (reference graphics.py:45 plot_powerspec)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.loglog(pk["k"], pk["power"], label="simulation")
    if "power_corrected" in pk:
        ax.loglog(pk["k"], np.maximum(pk["power_corrected"], 1e-300), "--",
                  label="corrected")
    if linear is not None:
        ax.loglog(pk["k"], linear, ":", label="linear")
    ax.set_xlabel("k")
    ax.set_ylabel("P(k)")
    ax.set_title(f"a = {a:.4g}")
    ax.legend()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    fig.savefig(filename, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return filename
