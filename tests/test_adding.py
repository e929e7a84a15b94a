"""Unit tests for two-stream + adding: closed-form and scan-vs-sequential."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.solvers.adding import (
    _affine_scan,
    _moebius_scan_albedo,
    adding_lw,
    adding_sw,
    lw_no_scattering_fluxes,
)
from ecrad_tpu.solvers import two_stream as ts


def random_layers(ncol=3, nlev=20, ng=8, seed=0):
    rng = np.random.RandomState(seed)
    # physically valid: R, T >= 0, R + T <= 1
    r = rng.uniform(0.0, 0.4, (ncol, nlev, ng))
    t = rng.uniform(0.0, 1.0, (ncol, nlev, ng)) * (1 - r)
    su = rng.uniform(0, 10, (ncol, nlev, ng))
    sd = rng.uniform(0, 10, (ncol, nlev, ng))
    emis = rng.uniform(20, 50, (ncol, ng))
    alb = rng.uniform(0, 0.3, (ncol, ng))
    return map(jnp.asarray, (r, t, su, sd, emis, alb))


def test_affine_scan_matches_loop():
    rng = np.random.RandomState(1)
    a = rng.uniform(0.5, 1.0, (2, 10, 3))
    b = rng.uniform(-1, 1, (2, 10, 3))
    x0 = rng.uniform(-1, 1, (2, 3))
    got = np.asarray(_affine_scan(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(x0), axis=-2))
    want = np.zeros((2, 11, 3))
    want[:, 0] = x0
    for k in range(10):
        want[:, k + 1] = a[:, k] * want[:, k] + b[:, k]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_affine_scan_reverse():
    rng = np.random.RandomState(2)
    a = rng.uniform(0.5, 1.0, (10,))[None, :, None]
    b = rng.uniform(-1, 1, (10,))[None, :, None]
    xn = np.array([[0.7]])
    got = np.asarray(_affine_scan(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(xn), axis=-2, reverse=True))
    want = np.zeros(11)
    want[10] = 0.7
    for k in range(9, -1, -1):
        want[k] = a[0, k, 0] * want[k + 1] + b[0, k, 0]
    np.testing.assert_allclose(got[0, :, 0], want, rtol=1e-5)


def test_moebius_albedo_matches_loop():
    r, t, su, sd, emis, alb = random_layers()
    got = np.asarray(_moebius_scan_albedo(r, t, alb, axis=-2))
    r, t, alb = map(np.asarray, (r, t, alb))
    nlev = r.shape[1]
    want = np.zeros((r.shape[0], nlev + 1, r.shape[2]))
    want[:, nlev] = alb
    for j in range(nlev - 1, -1, -1):
        inv = 1.0 / (1.0 - want[:, j + 1] * r[:, j])
        want[:, j] = r[:, j] + t[:, j] ** 2 * want[:, j + 1] * inv
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_adding_lw_scan_vs_sequential():
    r, t, su, sd, emis, alb = random_layers()
    fu1, fd1 = adding_lw(r, t, su, sd, emis, alb, method="scan")
    fu2, fd2 = adding_lw(r, t, su, sd, emis, alb, method="sequential")
    np.testing.assert_allclose(np.asarray(fu1), np.asarray(fu2),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fd1), np.asarray(fd2),
                               rtol=1e-4, atol=1e-3)


def test_adding_lw_single_layer_analytic():
    """One layer: closed-form adding."""
    r = jnp.full((1, 1, 1), 0.2)
    t = jnp.full((1, 1, 1), 0.5)
    su = jnp.full((1, 1, 1), 3.0)
    sd = jnp.full((1, 1, 1), 4.0)
    emis = jnp.full((1, 1), 30.0)
    alb = jnp.full((1, 1), 0.1)
    fu, fd = adding_lw(r, t, su, sd, emis, alb)
    # by hand: A1=0.1, s1=30; inv=1/(1-0.1*0.2)
    inv = 1 / (1 - 0.1 * 0.2)
    a0 = 0.2 + 0.5 ** 2 * 0.1 * inv
    s0 = 3.0 + 0.5 * (30.0 + 0.1 * 4.0) * inv
    fd1 = (0.5 * 0.0 + 0.2 * 30.0 + 4.0) * inv
    fu1 = 0.1 * fd1 + 30.0
    np.testing.assert_allclose(float(fu[0, 0, 0]), s0, rtol=1e-6)
    np.testing.assert_allclose(float(fd[0, 1, 0]), fd1, rtol=1e-6)
    np.testing.assert_allclose(float(fu[0, 1, 0]), fu1, rtol=1e-6)
    np.testing.assert_allclose(float(a0 * 0.0 + s0), float(fu[0, 0, 0]))


def test_lw_no_scattering_energy():
    """Opaque isothermal atmosphere: fluxes tend to the Planck source."""
    nlev, ng = 30, 4
    planck = 100.0
    od = jnp.full((1, nlev, ng), 2.0)
    trans, su, sd = ts.lw_no_scattering_transmittance(
        od, jnp.full((1, nlev, ng), planck), jnp.full((1, nlev, ng),
                                                      planck))
    emis = jnp.full((1, ng), planck)  # black surface at same T
    alb = jnp.zeros((1, ng))
    fu, fd = lw_no_scattering_fluxes(trans, su, sd, emis, alb)
    # deep inside, up and down fluxes = planck
    np.testing.assert_allclose(np.asarray(fd[0, -1]), planck, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fu[0, 5:]), planck, rtol=1e-3)
    # TOA down flux = 0
    np.testing.assert_allclose(np.asarray(fd[0, 0]), 0.0, atol=1e-6)


def test_adding_sw_conservation():
    """Non-absorbing atmosphere + black surface: absorbed = incoming."""
    rng = np.random.RandomState(3)
    ncol, nlev, ng = 2, 15, 4
    mu0 = jnp.asarray(rng.uniform(0.3, 1.0, (ncol,)))
    od = jnp.asarray(rng.uniform(0.01, 1.0, (ncol, nlev, ng)))
    ssa = jnp.ones((ncol, nlev, ng))  # conservative scattering
    g = jnp.asarray(rng.uniform(0, 0.8, (ncol, nlev, ng)))
    g1, g2, g3 = ts.sw_gammas(mu0[:, None, None], ssa, g)
    rd, td, rdir, tdd, tdir = ts.sw_reftrans(mu0[:, None, None], od, ssa,
                                             g1, g2, g3)
    inc = jnp.ones((ncol, ng)) * 100.0
    alb_d = jnp.zeros((ncol, ng))
    fu, fdd, fdir = adding_sw(rd, td, rdir, tdd, tdir, inc, alb_d, alb_d,
                              mu0)
    # Energy: at TOA, up + (net absorbed by surface) = incoming*mu0
    toa_in = np.broadcast_to(100.0 * np.asarray(mu0)[:, None], (ncol, ng))
    toa_up = np.asarray(fu[:, 0, :])
    surf_dn = np.asarray(fdd[:, -1, :] + fdir[:, -1, :])
    np.testing.assert_allclose(toa_up + surf_dn, toa_in, rtol=2e-3)


def test_sw_reftrans_thin_limit():
    """Optically thin layer: trans_dir_dir ~ 1 - od/mu0."""
    od = jnp.full((1, 1, 1), 1e-4)
    ssa = jnp.full((1, 1, 1), 0.5)
    g = jnp.full((1, 1, 1), 0.5)
    mu0 = 0.8
    g1, g2, g3 = ts.sw_gammas(mu0, ssa, g)
    rd, td, rdir, tdd, tdir = ts.sw_reftrans(mu0, od, ssa, g1, g2, g3)
    np.testing.assert_allclose(float(tdir[0, 0, 0]), 1 - 1e-4 / 0.8,
                               rtol=1e-5)
    assert float(rd[0, 0, 0]) < 1e-4


def test_lw_reftrans_limits():
    """Thick absorbing layer: R->0, T->0, src_up -> planck_top."""
    od = jnp.full((1, 1, 4), 50.0)
    ssa = jnp.zeros((1, 1, 4))
    g = jnp.zeros((1, 1, 4))
    g1, g2 = ts.lw_gammas(ssa, g)
    pt = jnp.full((1, 1, 4), 80.0)
    pb = jnp.full((1, 1, 4), 120.0)
    r, t, su, sd = ts.lw_reftrans(od, g1, g2, pt, pb)
    assert float(t.max()) < 1e-10
    assert float(r.max()) < 1e-10
    # emission from top of a thick layer approaches planck at the top...
    # with linear-in-tau it is planck_top + (pb-pt)/(od*(g1+g2));
    # for pure absorption g1 = 1.66, g2 = 0
    expect = 80.0 + (120.0 - 80.0) / (50.0 * 1.66)
    np.testing.assert_allclose(np.asarray(su), expect, rtol=1e-4)
