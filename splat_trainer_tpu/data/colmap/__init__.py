from .dataset import COLMAPDataset

__all__ = ["COLMAPDataset"]
