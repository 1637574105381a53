"""Example: quantum volume, both the per-circuit API and the batched kernel.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/quantum_volume.py').read())"
"""
import numpy as np
import jax

from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.quantum_volume import (
    measure_quantum_volume, measure_quantum_volume_batched,
    extract_quantum_volume_from_results)

# fully-batched ideal-device scan (one jit per depth)
results = measure_quantum_volume_batched(jax.random.PRNGKey(0), max_depth=4,
                                         num_circuits=120, num_shots=300)
for depth, (prob, conf) in results.items():
    print(f"depth {depth}: heavy-output prob {prob:.3f} "
          f"(lower bound {conf:.3f})")
print("quantum volume (ideal device):",
      extract_quantum_volume_from_results(results))

# per-circuit path through the QVM (supports noise models)
rng = np.random.RandomState(0)
qvm = QVM(seed=1)
results = measure_quantum_volume(qvm, qubits=[0, 1, 2], num_circuits=100,
                                 num_shots=100, depths=[2, 3], rng=rng)
print("per-circuit path:", {d: round(p, 3) for d, (p, _) in results.items()})

# noisy device, batched: density-matrix evolution with a 2Q depolarizing
# channel after every Haar gate — one dispatch per depth, no per-circuit
# recompiles (heavy sets still come from the ideal circuits)
from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map

ks = depolarizing_kraus_map(0.08)
two_q = np.stack([np.kron(a, b) for a in ks for b in ks])
noisy = measure_quantum_volume_batched(jax.random.PRNGKey(0), max_depth=3,
                                       num_circuits=80, num_shots=200,
                                       kraus=two_q)
print("noisy batched (8% depolarizing):",
      {d: round(p, 3) for d, (p, _) in noisy.items()},
      "-> QV", extract_quantum_volume_from_results(noisy))

# restricted connectivity: route model circuits onto a line topology with
# SWAP chains; noisy SWAPs then price the routing overhead
from forest_benchmarking_tpu.quantum_volume import (
    topology_restricted_program_generator)

line_gen = topology_restricted_program_generator([(0, 1), (1, 2)])
line_res = measure_quantum_volume(QVM(seed=2), qubits=[0, 1, 2],
                                  program_generator=line_gen,
                                  num_circuits=100, num_shots=100,
                                  depths=[3], rng=np.random.RandomState(1))
print("line-topology routed (ideal gates):",
      {d: round(p, 3) for d, (p, _) in line_res.items()})
