"""Example: benchmarking with the CDKM ripple-carry adder (classical logic).

Mirrors the reference's ripple_carry_adder example notebook: run an n-bit
adder over every pair of summands, report per-pair success probability and
the Hamming-weight distribution of output errors, in both the Z (computational)
and X bases.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/ripple_carry_adder.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.classical_logic import (
    get_n_bit_adder_results, get_success_probabilities_from_results,
    get_error_hamming_distributions_from_results)

qvm = QVM(seed=0)

for in_x_basis in (False, True):
    basis = "X" if in_x_basis else "Z"
    results = get_n_bit_adder_results(qvm, n_bits=2, in_x_basis=in_x_basis,
                                      num_shots=100)
    probs = get_success_probabilities_from_results(results)
    print(f"{basis}-basis 2-bit adder: mean success over all "
          f"{len(probs)} summand pairs = {np.mean(probs):.3f}")

# noiseless distribution of output-error Hamming weights is a delta at 0
distrs = get_error_hamming_distributions_from_results(results)
mean_distr = np.mean(distrs, axis=0)
print(f"error Hamming-weight distribution (noiseless): {np.round(mean_distr, 3)}")

# with noisy readout, success degrades and error weights spread out
class NoisyReadoutQVM(QVM):
    def run(self, circuit, qubits, num_shots):
        noisy = circuit.copy()
        for q in qubits:
            noisy.define_noisy_readout(q, p00=0.95, p11=0.92)
        return super().run(noisy, qubits, num_shots)


results = get_n_bit_adder_results(NoisyReadoutQVM(seed=1), n_bits=2,
                                  num_shots=100)
probs = get_success_probabilities_from_results(results)
distrs = get_error_hamming_distributions_from_results(results)
print(f"with 5-8% readout error: mean success = {np.mean(probs):.3f}, "
      f"error weights {np.round(np.mean(distrs, axis=0), 3)}")
