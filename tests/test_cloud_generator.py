"""Statistical tests of the stochastic cloud generator
(analogue of driver/test_cloud_generator.F90: 2000-ish samples through
the generator, checking the statistics the algorithm guarantees)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.config import Overlap, RadiationConfig
from ecrad_tpu.solvers.cloud_generator import cloud_generator
from ecrad_tpu.solvers.pdf_sampler import setup_pdf_sampler


@pytest.fixture(scope="module")
def pdf(reference_data_dir):
    cfg = RadiationConfig(directory_name=reference_data_dir).consolidated()
    return setup_pdf_sampler(cfg)


def make_profile(ncol=64, nlev=30):
    frac = np.zeros((ncol, nlev), np.float32)
    frac[:, 10:14] = [0.3, 0.6, 0.6, 0.2]
    frac[:, 20:22] = 0.4
    overlap = np.full((ncol, nlev - 1), 0.8, np.float32)
    fsd = np.full((ncol, nlev), 0.75, np.float32)
    return (jnp.asarray(frac), jnp.asarray(overlap), jnp.asarray(fsd))


@pytest.mark.parametrize("scheme", [Overlap.EXPONENTIAL_RANDOM,
                                    Overlap.MAXIMUM_RANDOM,
                                    Overlap.EXPONENTIAL_EXPONENTIAL])
def test_generator_statistics(pdf, scheme):
    frac, overlap, fsd = make_profile()
    ncol, nlev = frac.shape
    ng = 112
    iseed = jnp.arange(1, ncol + 1, dtype=jnp.int32)
    od_scaling, tcc = jax.jit(
        lambda s: cloud_generator(ng, s, scheme, 1e-6, frac, overlap,
                                  0.5, fsd, pdf))(iseed)
    od_scaling = np.asarray(od_scaling)
    tcc = np.asarray(tcc)
    # 1) every subcolumn contains cloud somewhere (trigger guarantees it)
    assert (od_scaling.sum(axis=1) > 0).all()
    # 2) cloud occurs only in cloudy layers
    clear = np.asarray(frac)[:, :, None] == 0.0
    assert np.abs(od_scaling[np.broadcast_to(clear,
                                             od_scaling.shape)]).max() == 0
    # 3) layer cloud frequency ~ frac / tcc (subcolumns sample the
    # cloudy part of the gridbox)
    cloudy_freq = (od_scaling > 0).mean(axis=(0, 2))
    expect = np.asarray(frac)[0] / tcc.mean()
    sel = np.asarray(frac)[0] > 0
    np.testing.assert_allclose(cloudy_freq[sel], expect[sel], rtol=0.2)
    # 4) od scaling has mean ~1 over cloudy samples (PDF property)
    vals = od_scaling[od_scaling > 0]
    assert 0.8 < vals.mean() < 1.2
    # 5) per-column determinism: same seed -> same field
    od2, _ = jax.jit(
        lambda s: cloud_generator(ng, s, scheme, 1e-6, frac, overlap,
                                  0.5, fsd, pdf))(iseed)
    np.testing.assert_array_equal(od_scaling, np.asarray(od2))
    # different seeds -> different fields
    od3, _ = jax.jit(
        lambda s: cloud_generator(ng, s, scheme, 1e-6, frac, overlap,
                                  0.5, fsd, pdf))(iseed + 1000)
    assert np.abs(od_scaling - np.asarray(od3)).max() > 0


def test_generator_vertical_correlation(pdf):
    """Higher overlap parameter -> more vertically correlated cloud."""
    frac, overlap, fsd = make_profile(ncol=128)
    ng = 112
    iseed = jnp.arange(1, 129, dtype=jnp.int32)

    def run(alpha):
        ov = jnp.full_like(overlap, alpha)
        od, _ = cloud_generator(ng, iseed, Overlap.EXPONENTIAL_RANDOM,
                                1e-6, frac, ov, 0.5, fsd, pdf)
        return np.asarray(od) > 0

    hi = run(0.99)
    lo = run(0.01)

    def pair_corr(mask):
        a = mask[:, 11, :].ravel()
        b = mask[:, 12, :].ravel()
        return np.corrcoef(a, b)[0, 1]

    assert pair_corr(hi) > pair_corr(lo) + 0.1


def test_pdf_fast_path_matches_lut(pdf):
    """The Chebyshev fast path must track the reference's bilinear LUT
    sampling closely over the physically occupied range."""
    import itertools
    from ecrad_tpu.solvers.pdf_sampler import sample_pdf, sample_pdf_fast
    rng = np.random.RandomState(7)
    ncol, nlev, ng = 8, 9, 16
    fsd = jnp.asarray(rng.uniform(0.05, 2.0, (ncol, nlev)), jnp.float32)
    cdf = jnp.asarray(rng.uniform(0.001, 0.999, (ncol, nlev, ng)),
                      jnp.float32)
    lut = np.asarray(sample_pdf(pdf, fsd[..., None] * jnp.ones((1, 1, ng)),
                                cdf))
    fast = np.asarray(sample_pdf_fast(pdf, fsd, cdf))
    # error metric: relative where the scaling is significant
    err = np.abs(fast - lut) / np.maximum(lut, 0.05)
    assert err.max() < 0.02, err.max()
    # means must agree tightly (unbiased optical depth)
    assert abs(fast.mean() - lut.mean()) / lut.mean() < 2e-3
