"""Minimal NetCDF reader/writer without the netCDF4 package.

Classic NetCDF (CDF-1/2) files are handled by scipy.io; NetCDF4/HDF5 files
by h5py. This covers every data file shipped with the reference (all are
classic format) plus HDF5 outputs if requested.

Reference parity: utilities/easy_netcdf.F90 (the OO wrapper with flexible
variable lookup and implicit transposes). Unlike the Fortran, arrays are
returned in C order exactly as stored (dimensions as listed in the file).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _is_hdf5(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(8) == b"\x89HDF\r\n\x1a\n"


class NetcdfFile:
    """Read-only NetCDF file with case-insensitive variable lookup."""

    def __init__(self, path: str):
        self.path = path
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._h5 = None
        self._sp = None
        if _is_hdf5(path):
            import h5py
            self._h5 = h5py.File(path, "r")
        else:
            from scipy.io import netcdf_file
            self._sp = netcdf_file(path, "r", mmap=False)

    # -- introspection -----------------------------------------------------
    def variables(self) -> List[str]:
        if self._h5 is not None:
            return list(self._h5.keys())
        return list(self._sp.variables.keys())

    def exists(self, name: str) -> bool:
        return self._resolve(name) is not None

    def _resolve(self, name: str) -> Optional[str]:
        names = self.variables()
        if name in names:
            return name
        lower = name.lower()
        for n in names:
            if n.lower() == lower:
                return n
        return None

    def dimensions(self) -> Dict[str, int]:
        if self._h5 is not None:
            dims = {}
            for k, v in self._h5.items():
                if hasattr(v, "shape"):
                    for i, s in enumerate(v.shape):
                        dims[f"{k}_{i}"] = s
            return dims
        return {k: (v if v is not None else -1)
                for k, v in self._sp.dimensions.items()}

    def dim(self, name: str) -> int:
        if self._sp is not None:
            d = self._sp.dimensions.get(name)
            if d is None:
                # unlimited dim: find from a variable
                for v in self._sp.variables.values():
                    if name in v.dimensions:
                        return v.shape[list(v.dimensions).index(name)]
            return d
        raise KeyError(name)

    # -- reading -----------------------------------------------------------
    def read(self, name: str, default=None) -> np.ndarray:
        """Read a variable as float64 ndarray (ints stay int)."""
        resolved = self._resolve(name)
        if resolved is None:
            if default is not None:
                return default
            raise KeyError(f"variable '{name}' not in {self.path}")
        if self._h5 is not None:
            data = np.asarray(self._h5[resolved])
        else:
            var = self._sp.variables[resolved]
            data = np.asarray(var[...]).copy()
            scale = getattr(var, "scale_factor", None)
            offset = getattr(var, "add_offset", None)
            if scale is not None or offset is not None:
                data = data * (scale if scale is not None else 1.0) + (
                    offset if offset is not None else 0.0)
        if data.dtype.kind == "f":
            data = data.astype(np.float64)
        return data

    def read_any(self, names: Sequence[str], default=None) -> Tuple[
            Optional[np.ndarray], Optional[str]]:
        """Try several variable names, return (data, found_name)."""
        for n in names:
            if self.exists(n):
                return self.read(n), n
        return default, None

    def attr(self, varname: str, attrname: str, default=None):
        resolved = self._resolve(varname)
        if resolved is None:
            return default
        if self._h5 is not None:
            val = self._h5[resolved].attrs.get(attrname, default)
        else:
            val = getattr(self._sp.variables[resolved], attrname, default)
        if isinstance(val, bytes):
            val = val.decode()
        return val

    def global_attr(self, attrname: str, default=None):
        if self._h5 is not None:
            return self._h5.attrs.get(attrname, default)
        val = getattr(self._sp, attrname, default)
        if isinstance(val, bytes):
            val = val.decode()
        return val

    def close(self):
        if self._h5 is not None:
            self._h5.close()
        if self._sp is not None:
            self._sp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_netcdf(path: str, dims: Dict[str, int],
                 variables: Dict[str, Tuple[Tuple[str, ...], np.ndarray]],
                 attrs: Optional[Dict[str, Dict[str, str]]] = None,
                 global_attrs: Optional[Dict[str, str]] = None) -> None:
    """Write a classic NetCDF3 (64-bit offset) file via scipy.

    variables: name -> (dim_names, array). attrs: name -> {attr: value}.
    """
    from scipy.io import netcdf_file
    attrs = attrs or {}
    with netcdf_file(path, "w", version=2) as f:
        for dname, dlen in dims.items():
            f.createDimension(dname, dlen)
        for vname, (vdims, data) in variables.items():
            data = np.asarray(data)
            if data.dtype == np.float64:
                data = data.astype(np.float32)
            typecode = {np.dtype(np.float32): "f",
                        np.dtype(np.int32): "i",
                        np.dtype(np.int64): "i"}.get(data.dtype, "f")
            if data.dtype == np.int64:
                data = data.astype(np.int32)
            var = f.createVariable(vname, typecode, vdims)
            var[...] = data
            for aname, aval in attrs.get(vname, {}).items():
                setattr(var, aname, aval)
        for aname, aval in (global_attrs or {}).items():
            setattr(f, aname, aval)
