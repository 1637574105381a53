from forest_benchmarking_tpu.classical_logic.primitives import *  # noqa: F401,F403
from forest_benchmarking_tpu.classical_logic.ripple_carry_adder import *  # noqa: F401,F403
