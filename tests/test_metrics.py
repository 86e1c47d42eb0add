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


def _ssim_oracle(ref2d, img2d, data_range=1.0, win_size=7, k1=0.01, k2=0.03):
    """Independent SSIM oracle: the published algorithm (Wang et al. 2004) in
    NumPy + ``scipy.ndimage.uniform_filter`` — the exact computational path
    of skimage's ``structural_similarity(gaussian_weights=False)``, which is
    a thin wrapper over the same scipy filter.  Windows are means over
    ``win_size`` squares with unbiased sample covariances; the score is the
    mean of the SSIM map over pixels whose window lies fully inside the
    image (skimage's ``crop(pad)``)."""
    from scipy.ndimage import uniform_filter

    pad = (win_size - 1) // 2
    cov_norm = win_size ** 2 / (win_size ** 2 - 1.0)
    f = lambda x: uniform_filter(x, size=win_size)
    ux, uy = f(ref2d), f(img2d)
    vx = cov_norm * (f(ref2d * ref2d) - ux * ux)
    vy = cov_norm * (f(img2d * img2d) - uy * uy)
    vxy = cov_norm * (f(ref2d * img2d) - ux * uy)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return s[pad:-pad, pad:-pad].mean()


def test_psnr_matches_oracle():
    """PSNR vs the definition (skimage's peak_signal_noise_ratio)."""
    ref, img = _imgs()
    expected = 10.0 * np.log10(1.0 / np.mean((ref - img) ** 2))
    npt.assert_allclose(float(psnr(jnp.asarray(ref), jnp.asarray(img))), expected, rtol=1e-5)


def test_ssim_matches_oracle():
    ref, img = _imgs()
    expected = _ssim_oracle(ref[..., 0], img[..., 0])
    got = float(ssim(jnp.asarray(ref), jnp.asarray(img), win_size=7))
    npt.assert_allclose(got, expected, rtol=1e-4)


def test_ssim_matches_skimage():
    """The original third-party parity check, when skimage is installed."""
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


def test_compactor_numpy_twins_match_metrics():
    """The jax-free autocorr/ESS twins in experiments/compact_results.py
    (the chip queue must not import jax — a second tunnel client wedges the
    running experiment) agree with fbs_tpu.metrics on an AR(1) chain."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "compact_results",
        os.path.join(os.path.dirname(__file__), "..", "experiments",
                     "compact_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(7)
    n, d, phi = 4000, 5, 0.6
    x = np.zeros((n, d))
    for t in range(1, n):
        x[t] = phi * x[t - 1] + rng.normal(size=d)

    npt.assert_allclose(mod._autocorr_np(x, max_lag=50),
                        np.asarray(autocorr(jnp.asarray(x), max_lag=50)),
                        rtol=1e-5, atol=1e-6)
    npt.assert_allclose(mod._ess_np(x), float(ess(jnp.asarray(x))),
                        rtol=1e-5)
