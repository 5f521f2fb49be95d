"""Logger framework: ABC, composite fan-out, in-memory state tree.

Capability equivalent of /root/reference/splat_trainer/logger/logger.py:
13-324. The key design is kept: `LoggerWithState` always pairs the user's
logger with an in-memory `StateLogger`, and the trainer *reads its own logs
back* for the progress bar and abort logic — logging doubles as the metric
bus (trainer.py:611-631, 696-704).
"""

from abc import ABC, abstractmethod
from collections import defaultdict
from dataclasses import dataclass
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class StepValue:
    step: int
    value: Any


class Logger(ABC):
    """Logging contract (reference logger.py:13-55)."""

    def step(self, progress):
        ...

    @abstractmethod
    def log_value(self, name: str, value, step: Optional[int] = None):
        ...

    def log_values(self, name: str, values: Dict[str, Any],
                   step: Optional[int] = None):
        for k, v in values.items():
            self.log_value(f"{name}/{k}", v, step)

    def log_image(self, name: str, image, caption: Optional[str] = None,
                  step: Optional[int] = None, compressed: bool = True):
        ...

    def log_histogram(self, name: str, values, step: Optional[int] = None):
        ...

    def log_cloud(self, name: str, points, colors=None,
                  step: Optional[int] = None):
        ...

    def log_evaluations(self, name: str, rows: Dict[str, Dict[str, float]],
                        step: Optional[int] = None):
        ...

    def log_config(self, config: dict):
        ...

    def log_json(self, name: str, data: dict):
        ...

    def close(self):
        ...


class NullLogger(Logger):
    def log_value(self, name, value, step=None):
        pass


class CompositeLogger(Logger):
    """Fan out to several loggers (reference logger.py:59-106)."""

    def __init__(self, *loggers: Logger):
        self.loggers = list(loggers)

    def _fan(self, method, *args, **kwargs):
        for lg in self.loggers:
            getattr(lg, method)(*args, **kwargs)

    def step(self, progress):
        self._fan("step", progress)

    def log_value(self, name, value, step=None):
        self._fan("log_value", name, value, step)

    def log_values(self, name, values, step=None):
        self._fan("log_values", name, values, step)

    def log_image(self, name, image, caption=None, step=None, compressed=True):
        self._fan("log_image", name, image, caption, step, compressed)

    def log_histogram(self, name, values, step=None):
        self._fan("log_histogram", name, values, step)

    def log_cloud(self, name, points, colors=None, step=None):
        self._fan("log_cloud", name, points, colors, step)

    def log_evaluations(self, name, rows, step=None):
        self._fan("log_evaluations", name, rows, step)

    def log_config(self, config):
        self._fan("log_config", config)

    def log_json(self, name, data):
        self._fan("log_json", name, data)

    def close(self):
        self._fan("close")


class StateLogger(Logger):
    """In-memory latest-value tree, queryable by path
    (reference StateLogger/StateTree, logger.py:145-282)."""

    def __init__(self):
        self._values: Dict[str, StepValue] = {}
        self._step = 0

    def step(self, progress):
        self._step = progress.step

    def log_value(self, name, value, step=None):
        if hasattr(value, "item"):
            value = value.item()
        self._values[name] = StepValue(step if step is not None else self._step,
                                       value)

    def __contains__(self, prefix: str) -> bool:
        return any(k == prefix or k.startswith(prefix + "/")
                   for k in self._values)

    def __getitem__(self, prefix: str):
        """Exact key -> StepValue; prefix -> dict of suffix -> StepValue."""
        if prefix in self._values:
            return self._values[prefix]
        sub = {k[len(prefix) + 1:]: v for k, v in self._values.items()
               if k.startswith(prefix + "/")}
        if not sub:
            raise KeyError(prefix)
        return sub


class HistoryLogger(Logger):
    """Appends series per key (reference logger.py:285-308)."""

    def __init__(self):
        self.history = defaultdict(list)
        self._step = 0

    def step(self, progress):
        self._step = progress.step

    def log_value(self, name, value, step=None):
        if hasattr(value, "item"):
            value = value.item()
        self.history[name].append((step if step is not None else self._step,
                                   value))


class LoggerWithState(CompositeLogger):
    """User logger + StateLogger readback (reference logger.py:311-324)."""

    def __init__(self, logger: Logger):
        self.state = StateLogger()
        super().__init__(self.state, logger)

    def __contains__(self, prefix):
        return prefix in self.state

    def __getitem__(self, prefix):
        return self.state[prefix]
