from .types import (
    Gaussians3D,
    Gaussians2D,
    CameraParams,
    RasterConfig,
    RenderedPoints,
    Rendering,
)

__all__ = [
    "Gaussians3D",
    "Gaussians2D",
    "CameraParams",
    "RasterConfig",
    "RenderedPoints",
    "Rendering",
]
