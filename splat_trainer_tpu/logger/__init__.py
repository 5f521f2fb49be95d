from .logger import (
    CompositeLogger, HistoryLogger, Logger, LoggerWithState, NullLogger,
    StateLogger,
)
from .histogram import Histogram

__all__ = [
    "Logger", "CompositeLogger", "NullLogger", "StateLogger",
    "HistoryLogger", "LoggerWithState", "Histogram",
]
