"""Example: T1/T2 spectroscopy with an injected decoherence model, plus Rabi.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/qubit_spectroscopy.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.qubit_spectroscopy import (
    MICROSECOND, do_t1_or_t2, generate_rabi_experiments, fit_rabi_results,
    acquire_qubit_spectroscopy_data, get_stats_by_qubit)

# simulator with an injected decoherence model: T1 = 18 us, T2 = 11 us
qvm = QVM(seed=0, t1s={0: 18e-6}, t2s={0: 11e-6})

times = np.linspace(1e-6, 50e-6, 20)
t1s, _, _ = do_t1_or_t2(qvm, [0], times, "t1", num_shots=3000)
print(f"T1: injected 18.0 us, measured {t1s[0]:.1f} us")

times = np.linspace(0.5e-6, 25e-6, 25)
t2s, _, _ = do_t1_or_t2(qvm, [0], times, "t2_echo", num_shots=3000)
print(f"T2 (echo): injected 11.0 us, measured {t2s[0]:.1f} us")

# Rabi: perfectly calibrated RX
angles = np.linspace(0, 2 * np.pi, 20)
expts = generate_rabi_experiments([0], angles)
results = acquire_qubit_spectroscopy_data(qvm, expts, num_shots=2000)
stats = get_stats_by_qubit(results)
fit = fit_rabi_results(angles, stats[0]["expectation"], stats[0]["std_err"])
print(f"Rabi frequency ratio (actual/intended): "
      f"{fit.params['frequency'].value:.4f}")

# --- CZ phase Ramsey: estimate the effective RZ the CZ imparts on one qubit
from forest_benchmarking_tpu.qubit_spectroscopy import (
    generate_cz_phase_ramsey_experiments, fit_cz_phase_ramsey_results)

angles = np.linspace(0, 2 * np.pi, 25)
cz_expts = generate_cz_phase_ramsey_experiments([0, 1], 0, angles)
cz_results = acquire_qubit_spectroscopy_data(qvm, cz_expts, num_shots=2000)
cz_stats = get_stats_by_qubit(cz_results)
cz_fit = fit_cz_phase_ramsey_results(angles, cz_stats[0]["expectation"],
                                     cz_stats[0]["std_err"])
print(f"CZ-imparted RZ on qubit 0 (control in |0>, expect ~0): "
      f"{cz_fit.params['offset'].value:.4f} rad")
