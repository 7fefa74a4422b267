from . import checkpoint, estimator  # noqa: F401
from .estimator import SlidingWindowEstimator, WindowConfig  # noqa: F401
