"""Viewer contract (reference /root/reference/splat_trainer/viewer/
viewer.py:7-40)."""

from abc import ABC, abstractmethod
from dataclasses import dataclass


class ViewerConfig(ABC):
    @abstractmethod
    def create_viewer(self, trainer) -> "Viewer":
        ...


class Viewer(ABC):
    def update(self):
        ...

    def spin(self):
        """Block serving the viewer after training finishes."""

    def close(self):
        ...


@dataclass(frozen=True)
class NullViewerConfig(ViewerConfig):
    def create_viewer(self, trainer) -> "NullViewer":
        return NullViewer()


class NullViewer(Viewer):
    pass
