"""Config primitives: training progress and time-varying hyperparameter schedules.

Covers the capability of the reference schedule DSL
(/root/reference/splat_trainer/config/__init__.py:24-204) — the YAML-facing
schedule names (Constant/Linear/LogDecay/LogLinear/Piecewise/SmoothStep/
Between) are kept because run configs spell them — but the machinery is this
codebase's own: every schedule is a frozen dataclass curve with a single
`at(t)` method, scalar gain is one generic `Scaled` combinator (instead of a
per-class `__mul__`), piecewise lookup is a bisect, and reprs are the
auto-generated dataclass ones.

Schedules are evaluated on the *host* each step; the resulting scalars are
fed to the jitted train step as traced arguments so learning-rate changes
never trigger recompilation.
"""

import bisect
from dataclasses import dataclass
from typing import Mapping, Tuple, Union


def clamp(x: float, lo: float, hi: float) -> float:
    return lo if x < lo else hi if x > hi else x


def _hermite01(t: float) -> float:
    """Cubic smoothstep easing on [0,1]."""
    t = clamp(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def smoothstep(t: float, a: float, b: float,
               interval: Tuple[float, float] = (0.0, 1.0)) -> float:
    """Ease from a to b as t crosses `interval`."""
    lo, hi = interval
    return a + (b - a) * _hermite01((t - lo) / (hi - lo))


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


@dataclass(frozen=True)
class Schedule:
    """A scalar-valued curve over normalized progress t ∈ [0, 1].

    Subclasses implement `at`. Calling the schedule delegates to `at`;
    multiplying by a scalar wraps it in `Scaled` (folding nested gains).
    """

    def at(self, t: float):
        raise NotImplementedError(type(self).__name__)

    def __call__(self, t: float):
        return self.at(t)

    def __mul__(self, gain: float) -> "Schedule":
        return Scaled(self, gain)

    __rmul__ = __mul__

    def __truediv__(self, divisor: float) -> "Schedule":
        return self * (1.0 / divisor)


@dataclass(frozen=True)
class Scaled(Schedule):
    """`base` with its output multiplied by `gain` — the one scaling combinator."""
    base: Schedule
    gain: float

    def at(self, t: float):
        return self.base.at(t) * self.gain

    def __mul__(self, gain: float) -> "Scaled":
        return Scaled(self.base, self.gain * gain)


@dataclass(frozen=True)
class Constant(Schedule):
    value: float

    def at(self, t: float):
        return self.value


@dataclass(frozen=True)
class Linear(Schedule):
    """Affine ramp from `start` at t=0 to `end` at t=1."""
    start: float
    end: float

    def at(self, t: float):
        return self.start + (self.end - self.start) * t


@dataclass(frozen=True)
class LogDecay(Schedule):
    """Exponential decay: start at t=0, start*factor at t=1."""
    start: float
    factor: float

    def at(self, t: float):
        return self.start * self.factor ** t


@dataclass(frozen=True)
class LogLinear(Schedule):
    """Geometric ramp: start at t=0, end at t=1 (both must be positive)."""
    start: float
    end: float

    def __post_init__(self):
        if not (self.start > 0 and self.end > 0):
            raise ValueError("LogLinear endpoints must be positive")

    def at(self, t: float):
        return self.start * (self.end / self.start) ** t


@dataclass(frozen=True)
class SmoothStep(Schedule):
    """Cubic ease from `start` to `end` over the whole run."""
    start: float
    end: float

    def at(self, t: float):
        return self.start + (self.end - self.start) * _hermite01(t)


@dataclass(frozen=True)
class Piecewise(Schedule):
    """Right-continuous step function.

    `steps` is a sequence of (t_threshold, value) pairs; the schedule holds
    `start` until t reaches the first threshold, then each value in turn.
    Values keep their Python type (ints stay ints) so interval schedules can
    be used directly as step counts.
    """
    start: float
    steps: Tuple[Tuple[float, float], ...]

    def __post_init__(self):
        steps = tuple((float(th), v) for th, v in self.steps)
        if list(steps) != sorted(steps, key=lambda s: s[0]):
            raise ValueError("Piecewise thresholds must be ascending")
        object.__setattr__(self, "steps", steps)

    def at(self, t: float):
        values = [self.start] + [v for _, v in self.steps]
        i = bisect.bisect_right([th for th, _ in self.steps], t)
        return values[i]


@dataclass(frozen=True)
class Between(Schedule):
    """Evaluate `inner` with t remapped from [t_start, t_end] onto [0, 1],
    clamping outside the window (holds inner(0) before, inner(1) after)."""
    t_start: float
    t_end: float
    inner: Schedule

    def at(self, t: float):
        u = clamp((t - self.t_start) / (self.t_end - self.t_start), 0.0, 1.0)
        return self.inner.at(u)


# Back-compatible aliases: call sites and YAML refer to "Varying" schedules.
Varying = Schedule
VaryingFloat = Union[Schedule, float]
VaryingInt = Union[Schedule, int]


def eval_varying(value, t):
    """Evaluate a schedule-or-plain-value at progress t."""
    return value.at(float(t)) if isinstance(value, Schedule) else value


def eval_varyings(value, t: float):
    """Recursively evaluate all schedule leaves inside nested dict/list trees."""
    if isinstance(value, Mapping):
        return {k: eval_varyings(v, t) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return type(value)(eval_varyings(v, t) for v in value)
    if isinstance(value, Schedule):
        return value.at(t)
    return value
