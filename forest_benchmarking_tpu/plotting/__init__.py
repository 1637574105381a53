"""Plotting (host-side matplotlib, like the reference's plotting package)."""
from forest_benchmarking_tpu.plotting.hinton import hinton, hinton_real  # noqa: F401
from forest_benchmarking_tpu.plotting.state_process import (  # noqa: F401
    plot_pauli_bar_rep_of_state, plot_pauli_rep_of_state,
    plot_pauli_transfer_matrix)
from forest_benchmarking_tpu.analysis.fitting import plot_figure_for_fit  # noqa: F401
