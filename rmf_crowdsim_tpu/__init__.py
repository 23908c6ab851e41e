"""rmf_crowdsim_tpu — a TPU-native crowd-simulation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the Rust
reference (open-rmf/rmf_crowdsim): Simulation/Agent stepping, pluggable
high-level and local planners (Zanlungo social forces), a uniform-grid
spatial index, SourceSink streaming with Poisson/monotonic generators, an
EventListener observability API, and an RMF-building-YAML A* route planner
— with agent state in fixed-capacity SoA arrays so the whole step runs
jitted (and under lax.scan / shard_map for rollouts and multi-chip).
"""

from .core.config import GridConfig, SimConfig
from .core.simulation import (
    AgentView,
    EventListener,
    NeighborTruncationError,
    OutOfBoundsError,
    Simulation,
)
from .core.state import SimState, StepEvents, make_state
from .core.step import SimParams, build_step
from .models.highlevel import (
    ConstantVelocity,
    HighLevelPlanner,
    HLResult,
    ParityVelocity,
    RouteTable,
    WaypointFollow,
)
from .models.local import LocalPlanner, NoLocalPlan, Zanlungo, ZanlungoParams
from .models.rmf import RMFPlanner
from .models.source_sink import (
    MonotonicCrowd,
    PoissonCrowd,
    SourceParams,
    SourceSink,
)

__version__ = "0.1.0"

__all__ = [
    "AgentView",
    "ConstantVelocity",
    "EventListener",
    "GridConfig",
    "HighLevelPlanner",
    "HLResult",
    "LocalPlanner",
    "MonotonicCrowd",
    "NeighborTruncationError",
    "NoLocalPlan",
    "OutOfBoundsError",
    "ParityVelocity",
    "PoissonCrowd",
    "RMFPlanner",
    "RouteTable",
    "SimConfig",
    "SimParams",
    "SimState",
    "Simulation",
    "SourceParams",
    "SourceSink",
    "StepEvents",
    "WaypointFollow",
    "Zanlungo",
    "ZanlungoParams",
    "build_step",
    "make_state",
]
