from .adam import AdamState, adam_init, adam_update
from .sparse_adam import RowAdamState, row_adam_init, row_adam_update
from .vis_laprop import (
    PointOptimizerState,
    ParamGroup,
    point_optimizer_init,
    point_optimizer_update,
)

__all__ = [
    "AdamState", "adam_init", "adam_update",
    "RowAdamState", "row_adam_init", "row_adam_update",
    "PointOptimizerState", "ParamGroup",
    "point_optimizer_init", "point_optimizer_update",
]
