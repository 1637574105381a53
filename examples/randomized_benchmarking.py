"""Example: standard RB with injected noise, recovering the decay parameter.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/randomized_benchmarking.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.circuits import Gate
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.noise import pauli_kraus_map
from forest_benchmarking_tpu.randomized_benchmarking import (
    generate_rb_experiment_sequences, group_sequences_into_parallel_experiments,
    acquire_rb_data, get_stats_by_qubit_group, fit_rb_results,
    rb_decay_to_gate_error)

expected_decay = 0.9
kraus = pauli_kraus_map([expected_decay + 0.1 / 4] + [0.1 / 4] * 3)

qubits = (0,)
depths = [d for d in [2, 6, 10, 16, 24] for _ in range(10)]
sequences = generate_rb_experiment_sequences(qubits, depths, random_seed=1)

# attach a depolarizing channel once per Clifford via a no-op noise gate
eye = np.eye(2, dtype=complex)
for seq in sequences:
    for circ in seq:
        circ.gates.append(Gate("noise", (), (0,), matrix=tuple(map(tuple, eye))))
        circ.define_noisy_gate("noise", (0,), kraus)

expts = group_sequences_into_parallel_experiments([sequences], [qubits])
qvm = QVM(seed=7)
results = acquire_rb_data(qvm, expts, num_shots=100)
stats = get_stats_by_qubit_group([qubits], results)[qubits]
fit = fit_rb_results(depths, stats["expectation"], stats["std_err"])

decay = fit.params["decay"].value
print(f"injected decay {expected_decay}, recovered {decay:.4f} "
      f"+- {fit.params['decay'].stderr:.4f}")
print(f"average Clifford error: {rb_decay_to_gate_error(decay, 2):.4f}")

# --- interleaved RB: bound the fidelity of a specific gate [IRB]
from forest_benchmarking_tpu.circuits import Circuit, X as XGate
from forest_benchmarking_tpu.randomized_benchmarking import (
    do_rb, interleaved_gate_fidelity_bounds, unitarity_to_rb_decay)

qvm2 = QVM(seed=11)
depths2 = [d for d in [2, 6, 10, 16] for _ in range(8)]
std_decays, _, _ = do_rb(qvm2, [(0,)], depths2, num_shots=300, random_seed=2)
irb_decays, _, _ = do_rb(qvm2, [(0,)], depths2,
                         interleaved_gate=Circuit([XGate(0)]),
                         num_shots=300, random_seed=3)
lo, hi = interleaved_gate_fidelity_bounds(std_decays[(0,)], irb_decays[(0,)],
                                          dim=2)
print(f"interleaved X gate fidelity bounds (noiseless sim): "
      f"[{lo:.4f}, {hi:.4f}]")

# --- unitarity RB: purity decay separates coherent from stochastic noise
unit_decays, _, _ = do_rb(qvm2, [(0,)], depths2, is_unitarity_expt=True,
                          num_shots=300, random_seed=4)
u = unit_decays[(0,)]
print(f"unitarity (noiseless sim, expect ~1): {u:.4f}; "
      f"implied RB-decay bound {unitarity_to_rb_decay(u, 2):.4f}")
