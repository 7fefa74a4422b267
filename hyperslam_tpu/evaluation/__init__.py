from . import harness, metrics  # noqa: F401
