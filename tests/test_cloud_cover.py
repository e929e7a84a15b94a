"""Cloud-cover math vs straightforward numpy transcriptions."""
import numpy as np
import jax.numpy as jnp
import pytest

from ecrad_tpu.solvers.cloud_cover import (
    MIN_FRAC,
    beta2alpha,
    cum_cloud_cover_exp_exp,
    cum_cloud_cover_exp_ran,
    cum_cloud_cover_max_ran,
)


def np_pair_cc(frac, alpha):
    f1, f2 = frac[:-1], frac[1:]
    return alpha * np.maximum(f1, f2) + (1 - alpha) * (f1 + f2 - f1 * f2)


def np_cum_exp_ran(frac, alpha):
    nlev = len(frac)
    pcc = np_pair_cc(frac, alpha)
    cum = np.zeros(nlev)
    cum[0] = frac[0]
    cum_product = 1.0 - frac[0]
    for i in range(nlev - 1):
        if frac[i] >= 1.0 - 1.2e-6:
            cum_product = 0.0
        else:
            cum_product *= (1 - pcc[i]) / (1 - frac[i])
        cum[i + 1] = 1 - cum_product
    return cum, pcc


def np_cum_exp_exp(frac, alpha):
    """Transcription of cum_cloud_cover_exp_exp
    (radiation_cloud_cover.F90:283-...)."""
    nlev = len(frac)
    pcc = np_pair_cc(frac, alpha)
    cum = np.zeros(nlev)
    # object detection
    objs = []  # (itop, imax, ibase) 0-based
    j = 0
    while j < nlev:
        if frac[j] > MIN_FRAC:
            itop = j
            j += 1
            while j < nlev and frac[j] >= frac[j - 1]:
                j += 1
            imax = j - 1
            while j < nlev and frac[j] <= frac[j - 1] \
                    and frac[j] > MIN_FRAC:
                j += 1
            ibase = j - 1
            objs.append([itop, imax, ibase])
        else:
            j += 1
    if not objs:
        return cum, np.zeros(nlev - 1)
    nobj = len(objs)
    alpha_obj = np.zeros(nobj)
    for k in range(nobj - 1):
        alpha_obj[k] = np.prod(alpha[objs[k][1]:objs[k + 1][1]])
    cc_obj = np.zeros(nobj)
    for k, (itop, imax, ibase) in enumerate(objs):
        cum[itop] = frac[itop]
        for lev in range(itop, ibase):
            if frac[lev] >= 1.0 - 1.2e-6:
                cum[lev + 1] = 1.0
            else:
                cum[lev + 1] = 1 - (1 - cum[lev]) * (1 - pcc[lev]) / (
                    1 - frac[lev])
        cc_obj[k] = cum[ibase]
    # merging
    i_base = [o[2] for o in objs]
    i_top = [o[0] for o in objs]
    nxt = list(range(1, nobj + 1))
    active = [True] * nobj
    n = nobj
    while n > 1:
        # linked-list traversal: consider slots with 1-based index < n
        # (the reference's `do while (jobj < nobj)` quirk)
        amax = 0.0
        j = 0
        jj = 0
        while jj + 1 < n:  # 0-based slot jj, 1-based jj+1 < remaining n
            if alpha_obj[jj] > amax:
                amax = alpha_obj[jj]
                j = jj
            jj = nxt[jj]
        k2 = nxt[j]
        cum[i_base[j] + 1:i_top[k2]] = cum[i_base[j]]
        cc_pair = (alpha_obj[j] * max(cc_obj[j], cc_obj[k2])
                   + (1 - alpha_obj[j])
                   * (cc_obj[j] + cc_obj[k2] - cc_obj[j] * cc_obj[k2]))
        scaling = min(max((cc_pair - cc_obj[j])
                          / max(MIN_FRAC, cc_obj[k2]), 0.0), 1.0)
        for lev in range(i_top[k2], i_base[k2] + 1):
            cum[lev] = cum[i_base[j]] + cum[lev] * scaling
        cc_obj[j] = cc_pair
        i_base[j] = i_base[k2]
        nxt[j] = nxt[k2]
        alpha_obj[j] = alpha_obj[k2]
        active[k2] = False
        n -= 1
    cum[i_base[0] + 1:] = cum[i_base[0]]
    pcc_out = np.maximum(pcc, frac[:-1] + cum[1:] - cum[:-1])
    return np.minimum(cum, 1.0), pcc_out


def random_profiles(ncol=6, nlev=30, seed=0):
    rng = np.random.RandomState(seed)
    frac = np.zeros((ncol, nlev))
    for c in range(ncol):
        nclouds = rng.randint(1, 4)
        for _ in range(nclouds):
            top = rng.randint(0, nlev - 4)
            depth = rng.randint(2, 6)
            peak = rng.uniform(0.2, 1.0)
            prof = peak * np.sin(np.linspace(0.1, np.pi - 0.1, depth))
            frac[c, top:top + depth] = np.maximum(frac[c, top:top + depth],
                                                  prof)
    alpha = rng.uniform(0.3, 0.99, (ncol, nlev - 1))
    return frac, alpha


def test_exp_ran_matches_numpy():
    frac, alpha = random_profiles()
    cum, pcc = cum_cloud_cover_exp_ran(jnp.asarray(frac),
                                       jnp.asarray(alpha))
    for c in range(frac.shape[0]):
        want_cum, want_pcc = np_cum_exp_ran(frac[c], alpha[c])
        np.testing.assert_allclose(np.asarray(cum[c]), want_cum,
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pcc[c]), want_pcc,
                                   rtol=1e-5, atol=1e-7)


def test_max_ran_bounds():
    frac, alpha = random_profiles(seed=1)
    cum, pcc = cum_cloud_cover_max_ran(jnp.asarray(frac))
    cum = np.asarray(cum)
    # cumulative cover is monotone and bounded by [max frac, 1]
    assert (np.diff(cum, axis=1) >= -1e-6).all()
    assert (cum[:, -1] <= 1.0).all()
    assert (cum[:, -1] >= frac.max(axis=1) - 1e-6).all()


def test_exp_exp_matches_numpy():
    frac, alpha = random_profiles(seed=2)
    cum, pcc = cum_cloud_cover_exp_exp(jnp.asarray(frac),
                                       jnp.asarray(alpha))
    for c in range(frac.shape[0]):
        want_cum, want_pcc = np_cum_exp_exp(frac[c], alpha[c])
        np.testing.assert_allclose(
            np.asarray(cum[c]), want_cum, rtol=1e-4, atol=1e-5,
            err_msg=f"column {c}")
        np.testing.assert_allclose(np.asarray(pcc[c]), want_pcc,
                                   rtol=1e-4, atol=1e-5)


def test_exp_exp_no_cloud():
    frac = jnp.zeros((2, 10))
    alpha = jnp.full((2, 9), 0.8)
    cum, pcc = cum_cloud_cover_exp_exp(frac, alpha)
    assert float(jnp.abs(cum).max()) == 0.0


def test_beta2alpha_identity():
    # beta=1 -> alpha=1
    assert float(beta2alpha(jnp.asarray(1.0), jnp.asarray(0.3),
                            jnp.asarray(0.5))) == 1.0
    # equal fractions -> alpha=beta
    np.testing.assert_allclose(
        float(beta2alpha(jnp.asarray(0.7), jnp.asarray(0.4),
                         jnp.asarray(0.4))), 0.7, rtol=1e-6)
