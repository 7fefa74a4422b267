from . import bspline  # noqa: F401
