"""Offline CLI driver: `python -m ecrad_tpu.driver config.nam in.nc out.nc`.

Reference parity: driver/ecrad_driver.F90 — reads the two namelists, the
NetCDF input, runs the radiation scheme (with an nrepeat benchmarking
loop and wall-clock timing) and writes the flux output. Instead of the
reference's OpenMP column-block loop, columns are sharded over all local
devices with jax.sharding (data parallel — columns are embarrassingly
parallel, SURVEY §2.8).
"""
from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import (load_config_from_namelist,
                     load_driver_config_from_namelist)
from .interface import radiation, setup_radiation
from .io.input_reader import read_input
from .io.output import save_fluxes
from .parallel.sharding import shard_columns


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ecrad_tpu",
        description="TPU-native ecRad: offline radiation driver")
    ap.add_argument("namelist")
    ap.add_argument("input_nc")
    ap.add_argument("output_nc")
    ap.add_argument("--no-jit", action="store_true")
    args = ap.parse_args(argv)

    config = load_config_from_namelist(args.namelist)
    driver_config = load_driver_config_from_namelist(args.namelist)

    if driver_config.iverbose >= 2:
        print(f"Reading {args.input_nc}")
    single_level, thermo, gas, cloud, aerosol = read_input(
        args.input_nc, driver_config)
    ncol = single_level.ncol

    istart = max(driver_config.istartcol - 1, 0)
    iend = driver_config.iendcol if driver_config.iendcol > 0 else ncol
    if istart > 0 or iend < ncol:
        sl = jax.tree.map(lambda x: x[istart:iend]
                          if hasattr(x, "shape") and x.ndim > 0 else x,
                          single_level)
        single_level, thermo, gas, cloud, aerosol = (
            sl,
            jax.tree.map(lambda x: x[istart:iend], thermo),
            jax.tree.map(lambda x: x[istart:iend], gas),
            jax.tree.map(lambda x: x[istart:iend], cloud),
            jax.tree.map(lambda x: x[istart:iend], aerosol))

    # cloud effective-size overrides (driver/ecrad_driver.F90:190-215)
    dc = driver_config
    if dc.cloud_separation_scale_toa > 0.0 and \
            dc.cloud_separation_scale_surface > 0.0:
        cloud = cloud.param_cloud_effective_separation_eta(
            thermo, dc.cloud_separation_scale_surface,
            dc.cloud_separation_scale_toa,
            dc.cloud_separation_scale_power,
            dc.cloud_inhom_separation_factor)
    elif dc.low_inv_effective_size > 0.0 or \
            dc.middle_inv_effective_size > 0.0 or \
            dc.high_inv_effective_size > 0.0:
        cloud = cloud.create_inv_cloud_effective_size_eta(
            thermo, dc.low_inv_effective_size,
            dc.middle_inv_effective_size, dc.high_inv_effective_size,
            0.8, 0.45)
    if dc.effective_size_scaling > 0.0 and \
            cloud.inv_cloud_effective_size is not None:
        cloud = cloud.replace(
            inv_cloud_effective_size=cloud.inv_cloud_effective_size
            / dc.effective_size_scaling)

    # input physical-bounds checking (driver/ecrad_driver.F90:245-254)
    from .utils.checks import clamp_inputs, validate_inputs
    findings = validate_inputs(single_level, thermo, gas, cloud, aerosol)
    for msg in findings:
        print(f"Warning: input {msg}")
    if findings and driver_config.do_correct_unphysical_inputs:
        single_level, thermo, gas, cloud, aerosol = clamp_inputs(
            single_level, thermo, gas, cloud, aerosol)

    if driver_config.iverbose >= 2:
        print("Setting up radiation scheme")
    setup = setup_radiation(config)

    # shard columns across local devices (pure data parallelism)
    if driver_config.do_parallel and len(jax.devices()) > 1:
        single_level, thermo, gas, cloud, aerosol = shard_columns(
            (single_level, thermo, gas, cloud, aerosol))

    fn = (lambda *a: radiation(setup, *a)) if args.no_jit else jax.jit(
        lambda *a: radiation(setup, *a))

    flux = None
    for jrepeat in range(max(driver_config.nrepeat, 1)):
        t0 = time.time()
        flux = fn(single_level, thermo, gas, cloud, aerosol)
        jax.block_until_ready(flux)
        elapsed = time.time() - t0
        if driver_config.iverbose >= 1:
            print(f"Time elapsed in radiative transfer: "
                  f"{elapsed:.6f} seconds")

    from .utils.checks import validate_fluxes
    for msg in validate_fluxes(flux):
        print(f"Warning: output {msg}")

    if driver_config.iverbose >= 2:
        print(f"Writing {args.output_nc}")
    save_fluxes(args.output_nc, jax.device_get(flux), thermo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
