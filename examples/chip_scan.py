"""Example: scan a whole device graph in a handful of simultaneous campaigns.

The flagship "simultaneous characterization" workflow (the analog of the
reference's examples/chip_scan.ipynb): given a chip topology, characterize
EVERY qubit and EVERY edge with a few merged experiments instead of one
experiment per qubit/pair —

  1. readout confusion matrices for every qubit;
  2. single-shot simultaneous 1Q state tomography of all qubits at once
     (one merged ObservablesExperiment via merge_disjoint_experiments,
     results re-bucketed per qubit with get_results_by_qubit_groups);
  3. simultaneous T1 on all qubits under an injected decoherence model;
  4. simultaneous single-qubit RB on all qubits in one campaign;
  5. two-qubit process tomography on a set of disjoint edges (a graph
     matching) in one merged acquisition.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/chip_scan.py').read())"
"""
import numpy as np
import jax.numpy as jnp

from forest_benchmarking_tpu.circuits import Circuit, RX, CZ
from forest_benchmarking_tpu.distance_measures import fidelity
from forest_benchmarking_tpu.observable_estimation import (
    estimate_observables, get_results_by_qubit_groups,
    merge_disjoint_experiments)
from forest_benchmarking_tpu.ops.superoperator_transformations import kraus2choi
from forest_benchmarking_tpu.qubit_spectroscopy import do_t1_or_t2, MICROSECOND
from forest_benchmarking_tpu.randomized_benchmarking import (
    do_rb, rb_decay_to_gate_error)
from forest_benchmarking_tpu.readout import estimate_joint_confusion_in_set
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.tomography import (
    generate_state_tomography_experiment, generate_process_tomography_experiment,
    iterative_mle_state_estimate, pgdb_process_estimate)

# ----- the chip: a 2x3 lattice ------------------------------------------------
#   0 - 1 - 2
#   |   |   |
#   3 - 4 - 5
QUBITS = [0, 1, 2, 3, 4, 5]
EDGES = [(0, 1), (1, 2), (0, 3), (1, 4), (2, 5), (3, 4), (4, 5)]
MATCHING = [(0, 1), (2, 5), (3, 4)]      # disjoint edges -> one campaign

qvm = QVM(seed=11, t1s={q: 20e-6 for q in QUBITS},
          t2s={q: 15e-6 for q in QUBITS})

# ----- 1. readout characterization, all qubits -------------------------------
confusion = estimate_joint_confusion_in_set(qvm, qubits=QUBITS,
                                            num_shots=400, joint_group_size=1)
worst_f00 = min(confusion[(q,)][0, 0] for q in QUBITS)
print(f"readout: worst p(0|0) across {len(QUBITS)} qubits = {worst_f00:.3f}")

# ----- 2. simultaneous 1Q state tomography -----------------------------------
# characterize the RX(pi/2) state on every qubit with ONE merged experiment
# (disjoint qubit sets share acquisition shots)
merged = merge_disjoint_experiments([
    generate_state_tomography_experiment(Circuit([RX(np.pi / 2, q)]), [q])
    for q in QUBITS])
results = list(estimate_observables(qvm, merged, num_shots=400))
by_qubit = get_results_by_qubit_groups(results, [(q,) for q in QUBITS])
fids = []
for q in QUBITS:
    rho = iterative_mle_state_estimate(by_qubit[(q,)], [q], maxiter=2000)
    target = np.array([[0.5, 0.5j], [-0.5j, 0.5]])  # RX(pi/2)|0>
    fids.append(float(np.real(fidelity(jnp.asarray(target), rho))))
print(f"state tomo: {len(QUBITS)} qubits in one campaign, "
      f"min F(|+y-ish>) = {min(fids):.4f}")

# ----- 3. simultaneous T1 ----------------------------------------------------
times = np.linspace(1e-6, 30e-6, 6)
t1s, _, _ = do_t1_or_t2(qvm, QUBITS, times, kind="t1", num_shots=200)
t1_us = {q: t for q, t in t1s.items()}
print("T1 (us), injected 20:", {q: round(t, 1) for q, t in t1_us.items()})

# ----- 4. simultaneous 1Q RB -------------------------------------------------
groups = [(q,) for q in QUBITS]
depths = [d for d in [2, 8, 16] for _ in range(4)]
decays, _, _ = do_rb(qvm, groups, depths, num_shots=60, random_seed=5)
errs = {g[0]: rb_decay_to_gate_error(d, 1) for g, d in decays.items()}
print(f"simultaneous RB on {len(groups)} qubits: max avg gate error "
      f"{max(errs.values()):.2e}")

# ----- 5. process tomography on a graph matching -----------------------------
cz_expts = [generate_process_tomography_experiment(Circuit([CZ(a, b)]), [a, b])
            for (a, b) in MATCHING]
merged_cz = merge_disjoint_experiments(cz_expts)
cz_results = list(estimate_observables(qvm, merged_cz, num_shots=300))
by_edge = get_results_by_qubit_groups(cz_results, MATCHING)
cz_choi = kraus2choi(jnp.asarray(np.diag([1, 1, 1, -1]).astype(complex))[None])
for (a, b) in MATCHING:
    est = pgdb_process_estimate(by_edge[(a, b)], [a, b], maxiter=200)
    f_pro = float(np.real(fidelity(cz_choi / 4, est / 4)))
    print(f"edge ({a},{b}): CZ process fidelity {f_pro:.3f}")

print(f"chip scan complete: {len(QUBITS)} qubits + {len(MATCHING)} edges in "
      "5 merged campaigns")
