"""Performance subsystem: native roofline cost model + trace replay.

The analytical analog of the reference's behavioral simulator
(spatten_hardware/simulator/src/bert.cpp) and RTL cycle counts
(sim/TestSpAtten.scala) — used for CI perf regression and for replaying the
reference's published workload CSVs against TPU hardware parameters.
"""

from spatten_tpu.perf.cost_model import (
    HwParams,
    CostResult,
    estimate_cost,
    dense_bytes,
    TPU_V5E,
)

__all__ = ["HwParams", "CostResult", "estimate_cost", "dense_bytes",
           "TPU_V5E"]
