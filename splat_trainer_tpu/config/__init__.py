"""Config primitives: training progress and time-varying hyperparameter schedules.

Mirrors the capability of the reference schedule DSL
(/root/reference/splat_trainer/config/__init__.py:24-204): `Progress`,
`Varying` hierarchy (Constant/Linear/LogDecay/LogLinear/Piecewise/SmoothStep/
Between) evaluated at normalized progress t = step/total_steps.

These are evaluated on the *host* each step; the resulting scalars are fed to
the jitted train step as traced arguments so learning-rate changes never
trigger recompilation.
"""

from abc import ABC, abstractmethod
from dataclasses import dataclass
import math
from typing import Generic, List, Mapping, Sequence, Tuple, TypeVar, Union

T = TypeVar("T")


def clamp(x: float, min_val: float, max_val: float) -> float:
    return max(min_val, min(x, max_val))


def smoothstep(t: float, a: float, b: float, interval: Tuple[float, float] = (0.0, 1.0)) -> float:
    r = interval[1] - interval[0]
    t = clamp((t - interval[0]) / r, 0.0, 1.0)
    return a + (b - a) * (3 * t ** 2 - 2 * t ** 3)


@dataclass(kw_only=True, frozen=True)
class Progress:
    """Normalized training progress (reference config/__init__.py:24-34)."""
    step: int
    total_steps: int
    logging_step: bool = False

    @property
    def t(self) -> float:
        return clamp(self.step / self.total_steps, 0.0, 1.0)

    def __float__(self) -> float:
        return float(self.t)


class Varying(ABC, Generic[T]):
    """A value that varies over normalized training progress t in [0,1]."""

    @abstractmethod
    def __call__(self, t: float) -> T:
        ...

    def __mul__(self, scale: float) -> "Varying[T]":
        raise NotImplementedError

    def __truediv__(self, scale: float) -> "Varying[T]":
        return self * (1.0 / scale)


class Constant(Varying[T]):
    def __init__(self, value: T):
        self.value = value

    def __call__(self, t: float) -> T:
        return self.value

    def __mul__(self, scale: float) -> "Constant":
        return Constant(self.value * scale)

    def __repr__(self):
        return f"Constant({self.value})"


class Linear(Varying[T]):
    def __init__(self, start: T, end: T):
        self.start, self.end = start, end

    def __call__(self, t: float) -> T:
        return self.start * (1 - t) + self.end * t

    def __mul__(self, scale: float) -> "Linear":
        return Linear(self.start * scale, self.end * scale)

    def __repr__(self):
        return f"Linear({self.start}, {self.end})"


class LogDecay(Varying[T]):
    """start * factor**t — exponential decay over training."""

    def __init__(self, start: T, factor: T):
        self.start, self.factor = start, factor

    def __call__(self, t: float) -> T:
        return self.start * self.factor ** t

    def __mul__(self, scale: float) -> "LogDecay":
        return LogDecay(self.start * scale, self.factor)

    def __repr__(self):
        return f"LogDecay({self.start}, {self.factor})"


class LogLinear(Varying[T]):
    """Geometric interpolation between start and end."""

    def __init__(self, start: T, end: T):
        assert start > 0 and end > 0, "LogLinear requires positive endpoints"
        self.start, self.end = start, end

    def __call__(self, t: float) -> T:
        return math.exp(math.log(self.start) * (1 - t) + math.log(self.end) * t)

    def __mul__(self, scale: float) -> "LogLinear":
        return LogLinear(self.start * scale, self.end * scale)

    def __repr__(self):
        return f"LogLinear({self.start}, {self.end})"


class Piecewise(Varying[T]):
    """Step function: value changes at breakpoints [(t_min, next_value), ...]."""

    def __init__(self, start: T, steps: Sequence[Tuple[float, T]], scale: float = 1.0):
        self.start = start
        self.steps = [tuple(s) for s in steps]
        self.scale = scale

    def __call__(self, t: float) -> T:
        value = self.start
        for t_min, next_value in self.steps:
            if t < t_min:
                break
            value = next_value
        result = value * self.scale
        return type(value)(result) if isinstance(value, int) else result

    def __mul__(self, scale: float) -> "Piecewise":
        return Piecewise(self.start, self.steps, self.scale * scale)

    def __repr__(self):
        return f"Piecewise({self.start}, {self.steps}, {self.scale})"


class SmoothStep(Varying[float]):
    def __init__(self, start: float, end: float):
        self.start, self.end = start, end

    def __call__(self, t: float) -> float:
        return smoothstep(t, self.start, self.end)

    def __mul__(self, scale: float) -> "SmoothStep":
        return SmoothStep(self.start * scale, self.end * scale)

    def __repr__(self):
        return f"SmoothStep({self.start}, {self.end})"


class Between(Varying[T]):
    """Remaps t from [t_start, t_end] to [0,1] before evaluating the inner schedule."""

    def __init__(self, t_start: float, t_end: float, varying: Varying[T]):
        self.t_start, self.t_end = t_start, t_end
        self.varying = varying

    def __call__(self, t: float) -> T:
        t = clamp((t - self.t_start) / (self.t_end - self.t_start), 0.0, 1.0)
        return self.varying(t)

    def __repr__(self):
        return f"Between({self.t_start}, {self.t_end}, {self.varying})"


VaryingFloat = Union[Varying, float]
VaryingInt = Union[Varying, int]


def eval_varying(value, t) -> T:
    t = float(t)
    return value(t) if isinstance(value, Varying) else value


def eval_varyings(value, t: float):
    """Recursively evaluate all Varying leaves inside nested dict/list structures."""
    if isinstance(value, Mapping):
        return {k: eval_varyings(v, t) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return type(value)(eval_varyings(v, t) for v in value)
    if isinstance(value, Varying):
        return value(t)
    return value
