from .viewer import NullViewer, NullViewerConfig, Viewer, ViewerConfig
from .web import WebViewer, WebViewerConfig

__all__ = ["Viewer", "ViewerConfig", "NullViewer", "NullViewerConfig",
           "WebViewer", "WebViewerConfig"]
