"""Look-up-table sampling of the cloud water PDF for McICA.

Reference parity: radiation/radiation_pdf_sampler.F90 — a 2-D LUT
(fractional standard deviation x CDF -> optical-depth scaling) read from
data/mcica_{gamma,lognormal}.nc, sampled bilinearly.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import RadiationConfig
from ..io.netcdf import NetcdfFile


@dataclass
class PdfSampler:
    val: np.ndarray            # (ncdf, nfsd)
    fsd1: float
    inv_fsd_interval: float

    @property
    def ncdf(self):
        return self.val.shape[0]

    @property
    def nfsd(self):
        return self.val.shape[1]


def setup_pdf_sampler(config: RadiationConfig) -> PdfSampler:
    with NetcdfFile(config.cloud_pdf_file) as f:
        fsd = f.read("fsd")
        val = f.read("x")
    # stored (nfsd, ncdf) or (ncdf, nfsd)? reference reads (ncdf, nfsd)
    if val.shape[0] == len(fsd):
        val = val.T
    return PdfSampler(val=val, fsd1=float(fsd[0]),
                      inv_fsd_interval=float(1.0 / (fsd[1] - fsd[0])))


def sample_pdf(sampler: PdfSampler, fsd, cdf):
    """Bilinear LUT sample (radiation_pdf_sampler.F90:123-155).

    fsd/cdf broadcastable arrays; returns od_scaling of same shape."""
    val = jnp.asarray(sampler.val, fsd.dtype)
    ncdf, nfsd = sampler.val.shape
    wcdf = cdf * (ncdf - 1) + 1.0
    icdf = jnp.clip(jnp.floor(wcdf).astype(jnp.int32), 1, ncdf - 1)
    wcdf = jnp.clip(wcdf - icdf, 0.0, 1.0)
    wfsd = (fsd - sampler.fsd1) * sampler.inv_fsd_interval + 1.0
    ifsd = jnp.clip(jnp.floor(wfsd).astype(jnp.int32), 1, nfsd - 1)
    wfsd = jnp.clip(wfsd - ifsd, 0.0, 1.0)
    # flat gather from (ncdf*nfsd,)
    flat = val.reshape(-1)
    i00 = (icdf - 1) * nfsd + (ifsd - 1)
    v00 = flat[i00]
    v01 = flat[i00 + 1]
    v10 = flat[i00 + nfsd]
    v11 = flat[i00 + nfsd + 1]
    return ((1.0 - wcdf) * (1.0 - wfsd) * v00
            + (1.0 - wcdf) * wfsd * v01
            + wcdf * (1.0 - wfsd) * v10
            + wcdf * wfsd * v11)
