from .dataset import RigScanDataset

__all__ = ["RigScanDataset"]
