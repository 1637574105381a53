"""Hinton diagrams for (complex or real) matrices.

Reference parity: forest/benchmarking/plotting/hinton.py (hinton:12,
hinton_real:52) — square sizes encode magnitudes; for complex matrices the
color encodes the phase, for real matrices sign maps to a two-color scheme.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import matplotlib as mpl
import matplotlib.pyplot as plt
from matplotlib import cm
from matplotlib.colors import Normalize

__all__ = ["hinton", "hinton_real"]

ANGLE_MAPPER = cm.ScalarMappable(norm=Normalize(vmin=-np.pi, vmax=np.pi))


def hinton(matrix: np.ndarray, max_weight: float = 1.0, ax=None):
    """Hinton diagram of a complex matrix: size = |w|, color = arg(w)."""
    ax = ax if ax is not None else plt.gca()
    matrix = np.asarray(matrix)
    if not max_weight:
        max_weight = 2 ** np.ceil(np.log(np.abs(matrix).max()) / np.log(2))

    ax.patch.set_facecolor("lightgrey")
    ax.set_aspect("equal", "box")
    ax.xaxis.set_major_locator(plt.NullLocator())
    ax.yaxis.set_major_locator(plt.NullLocator())

    for (x, y), w in np.ndenumerate(matrix):
        color = ANGLE_MAPPER.to_rgba(np.arctan2(np.real(w), np.imag(w)))
        size = np.sqrt(np.abs(w) / max_weight)
        rect = plt.Rectangle([x - size / 2, y - size / 2], size, size,
                             facecolor=color, edgecolor=color)
        ax.add_patch(rect)

    ax.set_xlim((-max_weight / 2, matrix.shape[0] - max_weight / 2))
    ax.set_ylim((-max_weight / 2, matrix.shape[1] - max_weight / 2))
    ax.autoscale_view()
    ax.invert_yaxis()
    return ax


def _blob(x, y, area, color):
    hs = np.sqrt(max(area, 0)) / 2
    xcorners = np.array([x - hs, x + hs, x + hs, x - hs])
    ycorners = np.array([y - hs, y - hs, y + hs, y + hs])
    plt.fill(xcorners, ycorners, color=color)


def hinton_real(matrix: np.ndarray, max_weight: Optional[float] = None,
                xlabels: Optional[List[str]] = None,
                ylabels: Optional[List[str]] = None,
                title: Optional[str] = None, ax=None, cmap=None,
                label_top: bool = True):
    """Hinton diagram of a real matrix: size = |w|, two colors for the sign."""
    fig = None
    if ax is None:
        fig, ax = plt.subplots(1, 1, figsize=(8, 6))
    matrix = np.asarray(matrix)

    backgnd_gray = "gainsboro"
    if cmap is None:
        cmap = cm.RdBu
    cneg = cmap(0)
    cpos = cmap(256)
    cmap = mpl.colors.ListedColormap([cneg, backgnd_gray, cpos])

    if title and fig:
        ax.set_title(title, y=1.1, fontsize=18)
    ax.set_aspect("equal", "box")
    ax.set_frame_on(False)

    height, width = matrix.shape
    if max_weight is None:
        max_weight = 1.25 * max(abs(np.diag(matrix)))
        if max_weight <= 0.0:
            max_weight = 1.0

    bounds = [-max_weight, -0.0001, 0.0001, max_weight]
    tick_loc = [-max_weight / 2, 0, max_weight / 2]

    ax.fill(np.array([0, width, width, 0]), np.array([0, 0, height, height]),
            color=cmap(1))
    for x in range(width):
        for y in range(height):
            w = matrix[x, y]
            color = cmap(2) if np.real(w) > 0.0 else cmap(0)
            _blob(x + 0.5, height - y - 0.5,
                  min(1, abs(w) / max_weight), color)

    norm = mpl.colors.BoundaryNorm(bounds, cmap.N)
    cax, _ = mpl.colorbar.make_axes(ax, shrink=0.75, pad=.1)
    mpl.colorbar.ColorbarBase(cax, norm=norm, cmap=cmap, boundaries=bounds,
                              ticks=tick_loc).set_ticklabels(["$-$", "$0$", "$+$"])
    cax.tick_params(labelsize=14)
    ax.xaxis.set_major_locator(plt.IndexLocator(1, 0.5))
    if xlabels:
        ax.set_xticklabels(xlabels)
        if label_top:
            ax.xaxis.tick_top()
    ax.tick_params(axis="x", labelsize=14)
    ax.yaxis.set_major_locator(plt.IndexLocator(1, 0.5))
    if ylabels:
        ax.set_yticklabels(list(reversed(ylabels)))
    ax.tick_params(axis="y", labelsize=14)
    return fig, ax
