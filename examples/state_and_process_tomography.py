"""Example: state and process tomography end-to-end on the in-process QVM.

Run on CPU (full float64) with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/state_and_process_tomography.py').read())"
"""
import numpy as np
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit, H, CNOT, RY
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu import distance_measures as dm
from forest_benchmarking_tpu.ops import (
    kraus2choi, choi2pauli_liouville, project_state_matrix_to_physical)
from forest_benchmarking_tpu.tomography import do_tomography
from forest_benchmarking_tpu.sim.statevector import run_statevector

qvm = QVM(seed=42)

# --- state tomography of a Bell state -------------------------------------
bell = Circuit([H(0), CNOT(0, 1)])
rho_est, expt, results = do_tomography(qvm, bell, [0, 1], "state",
                                       num_shots=4000)
rho_est = project_state_matrix_to_physical(rho_est)

psi = np.asarray(run_statevector(bell, [0, 1]))
rho_true = jnp.asarray(np.outer(psi, psi.conj()))
print(f"state tomography: fidelity to true Bell state = "
      f"{float(dm.fidelity(rho_true, rho_est)):.4f}")

# --- process tomography of RY(0.7) ----------------------------------------
gate = Circuit([RY(0.7, 0)])
choi_est, expt, results = do_tomography(qvm, gate, [0], "process",
                                        num_shots=3000)
from forest_benchmarking_tpu.circuits import gate_matrix
choi_true = kraus2choi(jnp.asarray(gate_matrix("RY", (0.7,)))[None])
pf = dm.process_fidelity(choi2pauli_liouville(choi_true),
                         choi2pauli_liouville(choi_est))
print(f"process tomography: average gate fidelity = {float(pf):.4f}")
