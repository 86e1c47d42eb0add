"""Metric parity: PSNR/SSIM vs scikit-image (if available), ESS sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from fbs_tpu.metrics import psnr, ssim, autocorr, ess


def _imgs():
    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (28, 28, 1))
    img = jnp.clip(ref + 0.1 * jax.random.normal(jax.random.PRNGKey(1), ref.shape), 0, 1)
    return np.asarray(ref, np.float64), np.asarray(img, np.float64)


def test_psnr_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    ref, img = _imgs()
    expected = skimage.peak_signal_noise_ratio(ref, img, data_range=1.0)
    npt.assert_allclose(float(psnr(jnp.asarray(ref), jnp.asarray(img))), expected, rtol=1e-5)


def test_ssim_matches_skimage():
    skimage = pytest.importorskip("skimage.metrics")
    ref, img = _imgs()
    expected = skimage.structural_similarity(ref[..., 0], img[..., 0],
                                             data_range=1.0, win_size=7)
    got = float(ssim(jnp.asarray(ref), jnp.asarray(img), win_size=7))
    npt.assert_allclose(got, expected, rtol=1e-4)


def test_psnr_infinite_for_identical():
    ref, _ = _imgs()
    assert float(psnr(jnp.asarray(ref), jnp.asarray(ref))) > 100


def test_ess_iid_near_n():
    x = jax.random.normal(jax.random.PRNGKey(2), (4000, 3))
    val = float(ess(x))
    assert 2000 < val <= 4000 * 1.5


def test_ess_matches_ar1_oracle():
    """Geyer ESS vs the analytic AR(1) value n (1-phi) / (1+phi)."""
    phi, n = 0.5, 50000
    rng = np.random.default_rng(1)
    eps = rng.normal(size=(n, 2))
    x = np.zeros((n, 2))
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]
    expected = n * (1 - phi) / (1 + phi)
    val = float(ess(jnp.asarray(x), max_lag=500))
    npt.assert_allclose(val, expected, rtol=0.12)


def test_autocorr_decays_for_ar1():
    rho = 0.9
    n = 20000
    eps = np.random.default_rng(0).normal(size=n)
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + eps[i]
    ac = np.asarray(autocorr(jnp.asarray(x[:, None]), max_lag=5))
    npt.assert_allclose(ac, [rho ** (k + 1) for k in range(5)], atol=5e-2)
