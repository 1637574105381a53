"""Example: Hinton diagrams and Pauli-Liouville visualizations.

Mirrors the reference's hinton_plots and state_and_process_plots notebooks.
Figures are written to PNG files (headless Agg backend).

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/plotting.py').read())"
"""
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import jax.numpy as jnp

from forest_benchmarking_tpu.ops import kraus2choi, choi2pauli_liouville
from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map
from forest_benchmarking_tpu.plotting import (
    hinton, plot_pauli_rep_of_state, plot_pauli_transfer_matrix)

# Hinton diagram of the Bell state density matrix
bell = np.zeros((4, 4), dtype=complex)
bell[0, 0] = bell[0, 3] = bell[3, 0] = bell[3, 3] = 0.5
fig, ax = plt.subplots()
hinton(bell, ax=ax)
ax.set_title("Bell state (Hinton)")
fig.savefig("/tmp/hinton_bell.png", dpi=72)
print("wrote /tmp/hinton_bell.png")

# Pauli-Liouville strip of |+>
plus = np.array([[0.5, 0.5], [0.5, 0.5]])
plus_pl = np.array([[1.0, 1.0, 0.0, 0.0]]) / np.sqrt(2)  # (I + X)/sqrt(2) coords
fig, ax = plt.subplots()
plot_pauli_rep_of_state(plus_pl, ax, ["I", "X", "Y", "Z"], "|+> state")
fig.savefig("/tmp/pauli_rep_plus.png", dpi=72)
print("wrote /tmp/pauli_rep_plus.png")

# Pauli transfer matrix of a depolarizing channel
ptm = np.real(np.asarray(choi2pauli_liouville(
    kraus2choi(jnp.asarray(np.stack(depolarizing_kraus_map(0.3)))))))
fig, ax = plt.subplots()
plot_pauli_transfer_matrix(ptm, ax, title="depolarizing p=0.3")
fig.savefig("/tmp/ptm_depolarizing.png", dpi=72)
print("wrote /tmp/ptm_depolarizing.png")
print("PTM diagonal:", np.round(np.diag(ptm), 3))
