from . import ba, problem  # noqa: F401
from .problem import (CameraCalib, Factors, ImuCalib, InertialFactors, Masks,  # noqa: F401
                      Params, PriorFactors, SolverConfig, VisualFactors)
