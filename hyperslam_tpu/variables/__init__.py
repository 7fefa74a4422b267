from . import nplie, s2, se3, so3  # noqa: F401
