"""Pauli-basis visualizations of states and processes.

Reference parity: forest/benchmarking/plotting/state_process.py —
plot_pauli_rep_of_state:10, plot_pauli_bar_rep_of_state:70,
plot_pauli_transfer_matrix:90.
"""
from __future__ import annotations

import itertools

import numpy as np
import matplotlib.pyplot as plt
from matplotlib.colors import LinearSegmentedColormap

__all__ = ["plot_pauli_rep_of_state", "plot_pauli_bar_rep_of_state",
           "plot_pauli_transfer_matrix", "rigetti_3_color_cm"]

THREE_COLOR_MAP = ["#48737F", "#FFFFFF", "#D6619E"]
rigetti_3_color_cm = LinearSegmentedColormap.from_list(
    "fbtpu", THREE_COLOR_MAP[::-1], N=100)


def plot_pauli_rep_of_state(state_pl_basis, ax, labels, title):
    """Heat-strip visualization of a state's Pauli-Liouville coefficients."""
    state_pl_basis = np.asarray(state_pl_basis)
    if len(state_pl_basis.shape) == 1:
        raise ValueError("You must pass in a (N by 1) or a (1 by N) numpy.ndarray")
    if np.iscomplexobj(state_pl_basis):
        raise ValueError("You must pass in a real vector")

    im = ax.imshow(state_pl_basis, interpolation="nearest", cmap="RdBu",
                   vmin=-1 / 2, vmax=1 / 2)
    dim = len(labels)
    rows, cols = state_pl_basis.shape
    if rows > cols:
        cb = plt.colorbar(im, ax=ax, ticks=[-1 / 2, -1 / 4, 0, 1 / 4, 1 / 2])
        cb.ax.yaxis.set_tick_params(pad=35)
        ax.set_xlabel("Coefficient")
        ax.set_xticks([])
        ax.set_yticks(range(dim))
        ax.set_ylabel("Pauli Operator")
        ax.set_yticklabels(labels)
    else:
        plt.colorbar(im, ax=ax, ticks=[-1 / 2, -1 / 4, 0, 1 / 4, 1 / 2],
                     orientation="horizontal", pad=0.22)
        ax.set_ylabel("Coefficient")
        ax.set_yticks([])
        ax.set_xticks(range(dim))
        ax.set_xlabel("Pauli Operator")
        ax.set_xticklabels(labels)
    ax.set_title(title)
    ax.grid(False)


def plot_pauli_bar_rep_of_state(state_pl_basis, ax, labels, title):
    """Bar-graph visualization of a state's Pauli-Liouville coefficients."""
    dim = len(labels)
    ax.bar(np.arange(dim) - .4, np.real(np.asarray(state_pl_basis)).ravel(),
           width=.8)
    ax.set_xticks(range(dim))
    ax.set_xlabel("Pauli Operator")
    ax.set_ylabel("Coefficient")
    ax.set_title(title)
    ax.set_xticklabels(labels, rotation=45)
    ax.grid(False)


def plot_pauli_transfer_matrix(ptransfermatrix, ax, labels=None, title="",
                               fontsizes: int = 16):
    """Heatmap of a Pauli transfer matrix with IXYZ-product labels."""
    ptransfermatrix = np.real_if_close(np.asarray(ptransfermatrix))
    im = ax.imshow(ptransfermatrix, interpolation="nearest", cmap="RdBu",
                   vmin=-1, vmax=1)
    if labels is None:
        dim_squared = ptransfermatrix.shape[0]
        num_qubits = int(np.log2(np.sqrt(dim_squared)))
        labels = ["".join(x) for x in
                  itertools.product("IXYZ", repeat=num_qubits)]
    else:
        dim_squared = len(labels)

    cb = plt.colorbar(im, ax=ax,
                      ticks=[-1, -3 / 4, -1 / 2, -1 / 4, 0, 1 / 4, 1 / 2,
                             3 / 4, 1])
    cb.ax.yaxis.set_tick_params(pad=35)
    ax.set_xticks(range(dim_squared))
    ax.set_xlabel("Input Pauli Operator", fontsize=fontsizes)
    ax.set_yticks(range(dim_squared))
    ax.set_ylabel("Output Pauli Operator", fontsize=fontsizes)
    ax.set_title(title, fontsize=int(np.floor(1.2 * fontsizes)), pad=15)
    ax.set_xticklabels(labels, rotation=45,
                       fontsize=int(np.floor(0.7 * fontsizes)))
    ax.set_yticklabels(labels, fontsize=int(np.floor(0.7 * fontsizes)))
    ax.grid(False)
    return ax
