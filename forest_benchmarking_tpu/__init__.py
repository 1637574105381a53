"""forest_benchmarking_tpu: a TPU-native QCVV estimator framework in JAX.

Rebuilds the capabilities of rigetti/forest-benchmarking as batched jit/vmap
kernels: operator tools, distance measures, tomography (linear inversion,
iterative MLE, PGDB), randomized benchmarking, DFE, RPE, qubit spectroscopy,
quantum volume, readout characterization, and an on-device shot-sampling
simulator replacing the reference's QVM/quilc client-server stack.
"""
__version__ = "0.1.0"
