"""Example: the observable-estimation data model, grouping, and calibration.

Mirrors the reference's observable_estimation notebook: build an
ObservablesExperiment, group compatible settings into tensor-product bases
(fewer runs), estimate expectations on the simulator, and calibrate away
readout error with symmetrized calibration runs.

Run on CPU with:
    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               jax.config.update('jax_enable_x64', True); \
               exec(open('examples/observable_estimation.py').read())"
"""
import numpy as np

from forest_benchmarking_tpu.circuits import Circuit, H, CNOT
from forest_benchmarking_tpu.paulis import PauliTerm
from forest_benchmarking_tpu.sim import QVM
from forest_benchmarking_tpu.observable_estimation import (
    ExperimentSetting, ObservablesExperiment, zeros_state, group_settings,
    estimate_observables, calibrate_observable_estimates)

# Bell state; estimate XX, YY, ZZ, ZI (expect +1, -1, +1, 0)
program = Circuit([H(0), CNOT(0, 1)])
qubits = [0, 1]
settings = [ExperimentSetting(zeros_state(qubits), PauliTerm(obs))
            for obs in ([(0, "X"), (1, "X")], [(0, "Y"), (1, "Y")],
                        [(0, "Z"), (1, "Z")], [(0, "Z")])]
expt = ObservablesExperiment(settings, program)
print(f"ungrouped: {len(expt)} runs")
grouped = group_settings(expt)
print(f"grouped into tensor-product bases: {len(grouped)} runs")

qvm = QVM(seed=0)
results = list(estimate_observables(qvm, grouped, num_shots=4000))
for r in results:
    print(f"  <{r.setting.observable}> = {r.expectation:+.3f} "
          f"+/- {r.std_err:.3f}")

# readout calibration: with asymmetric readout noise the raw estimates shrink;
# calibration divides out the measured symmetrized readout attenuation


class NoisyReadoutQVM(QVM):
    def run(self, circuit, qubits, num_shots):
        noisy = circuit.copy()
        for q in qubits:
            noisy.define_noisy_readout(q, p00=0.95, p11=0.90)
        return super().run(noisy, qubits, num_shots)


noisy = NoisyReadoutQVM(seed=1)
raw = list(estimate_observables(noisy, grouped, num_shots=4000))
cal = list(calibrate_observable_estimates(noisy, raw, num_shots=4000))
print("\nwith 5-10% readout error (raw -> calibrated):")
for r0, r1 in zip(raw, cal):
    print(f"  <{r0.setting.observable}>: {r0.expectation:+.3f} -> "
          f"{r1.expectation:+.3f}")
