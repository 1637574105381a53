"""Example: readout-error characterization (confusion matrices).

Mirrors the reference's readout example: estimate single-qubit and joint
confusion matrices on a simulator with asymmetric readout noise, then
marginalize the joint matrix back down to one qubit.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/readout_characterization.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.circuits import Circuit
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.readout import (
    estimate_confusion_matrix, estimate_joint_confusion_in_set,
    marginalize_confusion_matrix)


class NoisyReadoutQVM(QVM):
    """Inject asymmetric readout noise on every qubit at run time."""

    def run(self, circuit, qubits, num_shots):
        noisy = circuit.copy()
        for q in qubits:
            noisy.define_noisy_readout(q, p00=0.97, p11=0.90)
        return super().run(noisy, qubits, num_shots)


qvm = NoisyReadoutQVM(seed=0)

cm = estimate_confusion_matrix(qvm, qubit=0, num_shots=20000)
print("1Q confusion matrix (expect diag ~ [0.97, 0.90]):")
print(np.round(cm, 3))

joint = estimate_joint_confusion_in_set(qvm, qubits=[0, 1], joint_group_size=2,
                                        num_shots=5000)
cm01 = joint[(0, 1)]
print("\njoint (0,1) confusion matrix diagonal:", np.round(np.diag(cm01), 3))

marg = marginalize_confusion_matrix(cm01, all_qubits=[0, 1],
                                    marginal_subset=(0,))
print("\nmarginalized back to qubit 0 (matches 1Q estimate):")
print(np.round(marg, 3))
