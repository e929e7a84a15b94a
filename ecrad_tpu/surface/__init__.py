from .properties import (ITileFlat, ITileVegetation, ITileUrban3D,
                         SurfaceDescription, read_surface,
                         print_surface_representation)
from .flux import SurfaceFlux
from .intermediate import (SurfaceIntermediate, calc_boundary_conditions,
                           partition_fluxes)

__all__ = [
    "ITileFlat", "ITileVegetation", "ITileUrban3D", "SurfaceDescription",
    "read_surface", "print_surface_representation", "SurfaceFlux",
    "SurfaceIntermediate", "calc_boundary_conditions", "partition_fluxes",
]
