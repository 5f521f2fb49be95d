from .corrector import CorrectorConfig, NilCorrector, NilCorrectorConfig
from .bilateral import BilateralCorrector, BilateralCorrectorConfig

__all__ = ["CorrectorConfig", "NilCorrector", "NilCorrectorConfig",
           "BilateralCorrector", "BilateralCorrectorConfig"]
