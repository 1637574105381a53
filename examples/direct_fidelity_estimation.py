"""Example: direct fidelity estimation of states and processes.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/direct_fidelity_estimation.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.circuits import Circuit, Gate, H, CNOT
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.sim.noise import depolarizing_kraus_map
from forest_benchmarking_tpu.direct_fidelity_estimation import do_dfe

qvm = QVM(seed=0)

# exhaustive state DFE of a noiseless GHZ state
ghz = Circuit([H(0), CNOT(0, 1), CNOT(1, 2)])
(fid, err), expt, results = do_dfe(qvm, ghz, [0, 1, 2], "state",
                                   num_shots=1000)
print(f"GHZ state fidelity (noiseless): {fid:.4f} +/- {err:.4f} "
      f"({len(expt)} settings)")

# state DFE with depolarizing noise: fidelity of (1-p)|+><+| + p I/2 is 1-p/2
p = 0.15
eye = np.eye(2, dtype=complex)
noisy_plus = Circuit([H(0), Gate("noise", (), (0,),
                                 matrix=tuple(map(tuple, eye)))])
noisy_plus.define_noisy_gate("noise", (0,), depolarizing_kraus_map(p))
(fid, err), _, _ = do_dfe(qvm, noisy_plus, [0], "state", num_shots=20000)
print(f"depolarized |+>: expected {1 - p / 2:.3f}, "
      f"measured {fid:.4f} +/- {err:.4f}")

# Monte Carlo process DFE of a CNOT (constant number of settings)
rng = np.random.RandomState(1)
(fid, err), expt, _ = do_dfe(qvm, Circuit([CNOT(0, 1)]), [0, 1], "process",
                             mc_n_terms=40, num_shots=500, rng=rng)
print(f"CNOT avg gate fidelity (MC DFE, {len(expt)} settings): "
      f"{fid:.4f} +/- {err:.4f}")
