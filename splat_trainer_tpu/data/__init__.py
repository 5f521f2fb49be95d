from .dataset import Dataset, ImageView
from .normalization import Normalization, NormalizationConfig

__all__ = ["Dataset", "ImageView", "Normalization", "NormalizationConfig"]
