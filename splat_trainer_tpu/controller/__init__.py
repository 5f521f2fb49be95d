from .point_state import PointState
from .target import TargetConfig
from .mcmc import MCMCConfig
from .disabled import DisabledConfig

__all__ = ["PointState", "TargetConfig", "MCMCConfig", "DisabledConfig"]
