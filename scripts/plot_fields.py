#!/usr/bin/env python
"""Plot the simulator's output artifacts (PNG via matplotlib).

The reference's outputs are gnuplot-oriented text files the user is meant
to plot by hand (SURVEY.md L7: the Nominals are "eyeball/plot regression"
data; the blank-line row separators at main.cu:968 are gnuplot's grid
format).  This utility renders them directly:

    python scripts/plot_fields.py fluid  <it>-fluid.dat [--cilia <it>-cilia.dat] [--out o.png]
    python scripts/plot_fields.py flux   <run>-flux.dat [more-flux.dat ...] [--out o.png]
    python scripts/plot_fields.py cilia  <it>-cilia.dat [--out o.png]
    python scripts/plot_fields.py movie  <Raw/P/c dir> [--cilia-dir <Cilia/P/c dir>] [--fps 4]

Formats parsed (io/writers.py, byte-compatible with main.cu:954-1004):
    fluid: "x y ux uy |u| rho" per cell, blank line after each grid row
    cilia: "x y us vs eps" per Lagrangian node
    flux:  "t Q" per output interval

Chart choices (scientific-plot variant of the dataviz rules): velocity
magnitude is a MAGNITUDE -> one perceptually-uniform, CVD-safe
sequential colormap (viridis), dark = large; the flux curve is a single
series -> the title names it, no legend box unless several files are
overlaid; cilia node state (eps) is encoded by marker SHAPE + color,
never color alone; grids are recessive; one axis per figure.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _load_columns(path, ncols):
    """Whitespace table -> float array, skipping blank lines.  pandas' C
    parser when available (np.loadtxt on a 8192^2 snapshot's 67M lines
    costs minutes and GBs); np.loadtxt otherwise."""
    try:
        import pandas as pd

        d = pd.read_csv(path, sep=r"\s+", header=None,
                        skip_blank_lines=True).to_numpy(np.float64)
    except ImportError:
        d = np.loadtxt(path)
    if d.ndim != 2 or d.shape[1] != ncols:
        raise ValueError(f"{path}: expected {ncols} columns")
    return d


def read_fluid(path):
    """Parse <it>-fluid.dat -> dict of [Y, X] arrays (x, y in scaled um;
    velocities in scaled mm/s; see cfg.x_scale / s_scale).

    The x/y coordinate AXES are rebuilt uniformly from the first/last
    parsed values: the file's 6-significant-digit formatting makes large
    coordinates unevenly spaced (0.062/0.0625/0.063 at x >= 1600 cells),
    which matplotlib's streamplot rejects."""
    d = _load_columns(path, 6)
    xs = d[:, 0]
    wraps = xs[1:] < xs[:-1]
    xdim = int(np.argmax(wraps)) + 1 if wraps.any() else d.shape[0]
    if d.shape[0] % xdim:
        raise ValueError(f"{path}: {d.shape[0]} rows not a multiple of the "
                         f"inferred XDIM {xdim}")
    ydim = d.shape[0] // xdim
    g = d.reshape(ydim, xdim, 6)
    x_ax = np.linspace(g[0, 0, 0], g[0, -1, 0], xdim)
    y_ax = np.linspace(g[0, 0, 1], g[-1, 0, 1], ydim)
    return {
        "x_ax": x_ax, "y_ax": y_ax, "ux": g[..., 2], "uy": g[..., 3],
        "umag": g[..., 4], "rho": g[..., 5],
    }


def read_cilia(path):
    """Parse <it>-cilia.dat -> (s [Ns,2], u_s [Ns,2], eps [Ns])."""
    d = _load_columns(path, 5)
    return d[:, 0:2], d[:, 2:4], d[:, 4].astype(int)


def plot_fluid(args):
    plt = _mpl()
    f = read_fluid(args.path)
    fig, ax = plt.subplots(figsize=(10, 3.2 + 6.0 * f["umag"].shape[0]
                                    / max(1, f["umag"].shape[1])))
    x_ax, y_ax = f["x_ax"], f["y_ax"]
    ext = [x_ax[0], x_ax[-1], y_ax[0], y_ax[-1]]
    im = ax.imshow(f["umag"], origin="lower", extent=ext, cmap="viridis",
                   aspect="equal", interpolation="nearest")
    fig.colorbar(im, ax=ax, label="|u| [scaled mm/s]", shrink=0.9)
    # sparse streamline overlay for direction (thin, recessive)
    ax.streamplot(x_ax, y_ax, f["ux"], f["uy"],
                  density=0.8, color="white", linewidth=0.6,
                  arrowsize=0.7)
    if args.cilia:
        s, _, eps = read_cilia(args.cilia)
        on, off = eps == 1, eps == 0
        ax.plot(s[on, 0], s[on, 1], ".", ms=3, color="#ff7f0e",
                label="cilia nodes (active)")
        if off.any():
            ax.plot(s[off, 0], s[off, 1], "x", ms=3, color="#ff7f0e",
                    alpha=0.6, label="cilia nodes (masked)")
        ax.legend(loc="upper right", fontsize=8, framealpha=0.8)
    ax.set_xlim(ext[0], ext[1])
    ax.set_ylim(ext[2], ext[3])
    ax.set_xlabel("x [scaled um]")
    ax.set_ylabel("y [scaled um]")
    ax.set_title(f"velocity magnitude — {os.path.basename(args.path)}")
    _save(fig, args)


def plot_cilia(args):
    plt = _mpl()
    s, u_s, eps = read_cilia(args.path)
    fig, ax = plt.subplots(figsize=(9, 4))
    on, off = eps == 1, eps == 0
    ax.plot(s[on, 0], s[on, 1], ".", ms=4, color="#1f77b4",
            label="active (eps=1)")
    if off.any():
        ax.plot(s[off, 0], s[off, 1], "x", ms=4, color="#d62728",
                label="masked (eps=0)")
    ax.quiver(s[:, 0], s[:, 1], u_s[:, 0], u_s[:, 1],
              angles="xy", width=0.002, color="#555555", alpha=0.7)
    ax.set_xlabel("x [scaled um]")
    ax.set_ylabel("y [scaled um]")
    ax.set_title(f"cilia nodes + boundary velocity — "
                 f"{os.path.basename(args.path)}")
    ax.legend(loc="upper right", fontsize=8)
    ax.grid(alpha=0.2)
    _save(fig, args)


def plot_movie(args):
    """Animated GIF over a BigData run's <it>-fluid.dat snapshots (one
    frame per interval, shared color scale; optional cilia overlays)."""
    import glob as globmod
    import io as iomod
    import re

    from PIL import Image

    plt = _mpl()
    pat = re.compile(r"(\d+)-fluid\.dat$")
    paths = sorted(
        (p for p in globmod.glob(os.path.join(args.path, "*-fluid.dat"))
         if pat.search(p)),
        key=lambda p: int(pat.search(p).group(1)))
    if len(paths) < 2:
        raise SystemExit(f"need >= 2 <it>-fluid.dat files in {args.path}")
    fields = [read_fluid(p) for p in paths]
    vmax = max(float(f["umag"].max()) for f in fields)
    frames = []
    for p, f in zip(paths, fields):
        it = pat.search(p).group(1)
        x_ax, y_ax = f["x_ax"], f["y_ax"]
        fig, ax = plt.subplots(figsize=(8, 2.6 + 5.0 * len(y_ax)
                                        / max(1, len(x_ax))))
        im = ax.imshow(f["umag"], origin="lower", vmin=0.0, vmax=vmax,
                       extent=[x_ax[0], x_ax[-1], y_ax[0], y_ax[-1]],
                       cmap="viridis", aspect="equal",
                       interpolation="nearest")
        fig.colorbar(im, ax=ax, label="|u| [scaled mm/s]", shrink=0.9)
        if args.cilia_dir:
            cp = os.path.join(args.cilia_dir, f"{it}-cilia.dat")
            if os.path.exists(cp):
                s, _, eps = read_cilia(cp)
                ax.plot(s[eps == 1, 0], s[eps == 1, 1], ".", ms=3,
                        color="#ff7f0e")
        ax.set_title(f"it = {it}")
        ax.set_xlim(x_ax[0], x_ax[-1])
        ax.set_ylim(y_ax[0], y_ax[-1])
        ax.set_xlabel("x [scaled um]")
        ax.set_ylabel("y [scaled um]")
        buf = iomod.BytesIO()
        fig.savefig(buf, format="png", dpi=args.dpi, bbox_inches="tight")
        plt.close(fig)
        buf.seek(0)
        frames.append(Image.open(buf).convert("RGB"))
    out = args.out or os.path.join(args.path, "movie.gif")
    # pad frames to one size (bbox_inches='tight' can vary by a pixel)
    w = max(f.width for f in frames)
    h = max(f.height for f in frames)
    frames = [_paste_center(f, w, h) for f in frames]
    frames[0].save(out, save_all=True, append_images=frames[1:],
                   duration=int(1000 / args.fps), loop=0)
    print(out)


def _paste_center(img, w, h):
    from PIL import Image

    canvas = Image.new("RGB", (w, h), "white")
    canvas.paste(img, ((w - img.width) // 2, (h - img.height) // 2))
    return canvas


def plot_flux(args):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 4))
    paths = [args.path] + (args.more or [])
    for p in paths:
        d = np.loadtxt(p)
        d = d.reshape(-1, 2)
        ax.plot(d[:, 0], d[:, 1], lw=2,
                label=os.path.basename(p) if len(paths) > 1 else None)
    ax.set_xlabel("t [ms]")
    ax.set_ylabel("cumulative net flux Q [scaled]")
    ax.set_title("net flux" if len(paths) > 1
                 else f"net flux — {os.path.basename(args.path)}")
    if len(paths) > 1:
        ax.legend(fontsize=8)
    ax.grid(alpha=0.25)
    _save(fig, args)


def _save(fig, args):
    out = args.out or (os.path.splitext(args.path)[0] + ".png")
    fig.savefig(out, dpi=args.dpi, bbox_inches="tight")
    print(out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    pf = sub.add_parser("fluid", help="velocity-magnitude heatmap")
    pf.add_argument("path")
    pf.add_argument("--cilia", default=None,
                    help="overlay a matching <it>-cilia.dat")
    pc = sub.add_parser("cilia", help="cilia nodes + boundary velocity")
    pc.add_argument("path")
    px = sub.add_parser("flux", help="flux time series (overlay several)")
    px.add_argument("path")
    px.add_argument("more", nargs="*", default=None)
    pm = sub.add_parser("movie",
                        help="animated GIF over a BigData run's snapshots")
    pm.add_argument("path", help="directory holding <it>-fluid.dat files")
    pm.add_argument("--cilia-dir", default=None,
                    help="directory holding matching <it>-cilia.dat files")
    pm.add_argument("--fps", type=float, default=4.0)
    for q in (pf, pc, px, pm):
        q.add_argument("--out", default=None,
                       help="output PNG/GIF (default: alongside the input)")
        q.add_argument("--dpi", type=int, default=150)

    args = p.parse_args(argv)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        print("matplotlib is not available in this environment",
              file=sys.stderr)
        return 2
    {"fluid": plot_fluid, "cilia": plot_cilia, "flux": plot_flux,
     "movie": plot_movie}[args.cmd](args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
