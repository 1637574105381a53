"""In-process JAX simulator replacing the reference's QVM/quilc server stack.

Reference parity: the execution backend the reference reaches over RPC
(qc.run / qc.run_symmetrized_readout, observable_estimation.py:907,1016;
NumpyWavefunctionSimulator, quantum_volume.py:9) is rebuilt here as on-device
statevector / density-matrix evolution plus shot sampling — no process boundary.
"""
from forest_benchmarking_tpu.sim.statevector import (  # noqa: F401
    run_statevector, statevector_probabilities, all_bitstrings)
from forest_benchmarking_tpu.sim.density import (  # noqa: F401
    run_density_matrix, density_probabilities, apply_confusion)
from forest_benchmarking_tpu.sim.qvm import QVM  # noqa: F401
