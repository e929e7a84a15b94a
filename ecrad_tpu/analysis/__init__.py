from .io import load_fluxes, load_inputs, derive_fields
from .compare import compare_outputs, format_report

__all__ = ["load_fluxes", "load_inputs", "derive_fields",
           "compare_outputs", "format_report"]
