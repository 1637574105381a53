"""Batched, jit/vmap-safe operator tools (the L1 math-kernel layer).

Reference parity: forest/benchmarking/operator_tools/__init__.py — same
re-export surface, rebuilt TPU-first (see each module's docstring).
"""
from forest_benchmarking_tpu.ops.apply_superoperator import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.calculational import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.channel_approximation import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.compose_superoperators import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.project_state_matrix import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.project_superoperators import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.random_operators import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.superoperator_transformations import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.validate_operator import *  # noqa: F401,F403
from forest_benchmarking_tpu.ops.validate_superoperator import *  # noqa: F401,F403
