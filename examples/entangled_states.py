"""Example: GHZ and graph states (entangled-state benchmarks).

Mirrors the reference's entangled_states examples: build a GHZ state over a
CNOT tree and count Bell-consistent outcomes; build a graph state and sweep
the focal-node measurement angle to trace out the expected cosine fringe.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/entangled_states.py').read())"
"""
import networkx as nx
import numpy as np

from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.entangled_states import (
    create_ghz_program, ghz_state_statistics, create_graph_state,
    measure_graph_state)

qvm = QVM(seed=0)

# GHZ over a 5-qubit star-shaped CNOT tree
tree = nx.DiGraph([(0, 1), (0, 2), (1, 3), (1, 4)])
program, qubits = create_ghz_program(tree)
bitstrings = qvm.run(program, qubits, num_shots=2000)
stats = ghz_state_statistics(bitstrings)
print(f"GHZ(5): {stats['bell']}/{stats['total']} Bell-consistent outcomes")

# graph state on a path; rotate the focal node by RY(theta) and read the
# stabilizer fringe: <Z_f Z_n1 Z_n2> = -sin(theta) * <X_f Z_n1 Z_n2> where
# X_f Z_n1 Z_n2 is a +1 stabilizer of the graph state (the Z-Z part has zero
# expectation), so the joint parity traces a clean sine in theta even though
# the focal marginal stays maximally mixed.
graph = nx.path_graph(3)
state_prep = create_graph_state(graph)
for theta in np.linspace(0, np.pi, 5):
    meas, order = measure_graph_state(graph, focal_node=1, theta=theta)
    shots = np.asarray(qvm.run(state_prep + meas, order, num_shots=2000))
    parity = float(np.mean(1 - 2 * (np.sum(shots, axis=1) % 2)))
    print(f"theta={theta:5.2f}: <ZZZ> = {parity:+.3f}  "
          f"(expected {-np.sin(theta):+.3f})")
