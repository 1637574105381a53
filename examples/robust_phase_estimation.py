"""Example: robust phase estimation of an RZ rotation angle.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/robust_phase_estimation.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.circuits import Circuit, RZ, RX
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.robust_phase_estimation import (
    do_rpe, bloch_rotation_to_eigenvectors, get_change_of_basis_from_eigvecs,
    change_of_basis_matrix_to_circuit, get_variance_upper_bound)

qvm = QVM(seed=11)

# estimate an RZ angle (eigenvectors are the computational basis: no change of basis)
angle = 1.234
estimates, expts, results = do_rpe(qvm, Circuit([RZ(angle, 0)]), [Circuit()],
                                   [(0,)], num_depths=6,
                                   multiplicative_factor=10.0)
bound = np.sqrt(get_variance_upper_bound(6, multiplicative_factor=10.0))
print(f"RZ angle: true {angle}, estimated {estimates[(0,)]:.4f} "
      f"(variance bound std {bound:.4f})")

# estimate an RX angle via a change of basis mapping |0>,|1> to the X eigenvectors
evecs = bloch_rotation_to_eigenvectors(np.pi / 2, 0)
cob = change_of_basis_matrix_to_circuit([0], get_change_of_basis_from_eigvecs(evecs))
angle = 0.777
estimates, _, _ = do_rpe(qvm, Circuit([RX(angle, 0)]), [cob], [(0,)],
                         num_depths=6, multiplicative_factor=10.0)
print(f"RX angle: true {angle}, estimated {estimates[(0,)]:.4f}")
