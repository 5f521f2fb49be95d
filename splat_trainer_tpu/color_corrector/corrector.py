"""Color corrector contract + no-op implementation.

Capability equivalent of /root/reference/splat_trainer/color_corrector/
corrector.py:8-39. The reference defines this but never wires it into its
Trainer (SURVEY.md #32); here the corrector is applied inside the loss when
enabled (trainer config `color_corrector`).
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass


class CorrectorConfig(ABC):
    @abstractmethod
    def create(self, num_images: int):
        ...


@dataclass(frozen=True)
class NilCorrectorConfig(CorrectorConfig):
    def create(self, num_images: int):
        return NilCorrector()


class NilCorrector:
    """No-op corrector."""

    params = None
    opt_state = None

    def correct(self, params, image, image_idx):
        return image

    def reg_loss(self, params):
        return 0.0
