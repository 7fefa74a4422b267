from . import losses, residuals  # noqa: F401
