"""ecRad-TPU: a TPU-native atmospheric radiation framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
ECMWF ecRad radiation scheme (gas/cloud/aerosol optics + five radiative
transfer solvers), designed for TPU hardware: columns shard over device
meshes, g-points fill vector lanes, level recurrences are parallel scans.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    DriverConfig,
    Entrapment,
    GasModel,
    IceModel,
    LiquidModel,
    Overlap,
    PdfShape,
    RadiationConfig,
    Solver,
    load_config_from_namelist,
    load_driver_config_from_namelist,
)
from .types import (  # noqa: F401
    Aerosol,
    Cloud,
    Flux,
    GasConcs,
    SingleLevel,
    Thermodynamics,
)
