"""No-op densification controller that still accumulates statistics
(reference /root/reference/splat_trainer/controller/disabled.py:10-37)."""

from dataclasses import dataclass

from splat_trainer_tpu.config import Progress


@dataclass(frozen=True)
class DisabledConfig:
    def make_controller(self, start_points: int, target_points: int,
                        progress: Progress) -> "DisabledController":
        return DisabledController()


class DisabledController:
    def should_densify(self, progress: Progress) -> bool:
        return False

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict):
        pass
