"""Quality metrics, implemented natively in JAX.

The reference computes PSNR/SSIM via scikit-image and LPIPS via a torch
AlexNet on the host (``experiments/tabulators/tabulate_imgs.py:1-80``) —
host-bound and single-image.  These are jit/vmap-friendly device
implementations; Gaussian-divergence metrics live in :mod:`fbs_tpu.math`.

LPIPS requires pretrained AlexNet weights; a hook is provided that consumes
any torch ``lpips`` result if the caller supplies one (kept out of the
device path on purpose — see ``tabulators``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray

__all__ = ["psnr", "ssim", "autocorr", "ess"]


def psnr(ref: JArray, img: JArray, data_range: float = 1.0) -> JArray:
    """Peak signal-to-noise ratio, matching skimage's definition."""
    mse = jnp.mean((ref.astype(jnp.float32) - img.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _uniform_filter(x: JArray, size: int) -> JArray:
    """Mean filter over the two leading spatial dims of (H, W, C)."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    x4 = jnp.moveaxis(x, -1, 0)[:, None]  # (C, 1, H, W) -> conv as NCHW
    out = jax.lax.conv_general_dilated(
        x4, kernel.transpose(3, 2, 0, 1), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.moveaxis(out[:, 0], 0, -1)


def ssim(ref: JArray, img: JArray, data_range: float = 1.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> JArray:
    """Structural similarity index for (H, W, C) images.

    Matches skimage's ``structural_similarity`` with ``gaussian_weights=False``
    (uniform window, per-channel mean) to float tolerance.
    """
    ref = ref.astype(jnp.float32)
    img = img.astype(jnp.float32)

    np_ = win_size ** 2
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter(ref, win_size)
    uy = _uniform_filter(img, win_size)
    uxx = _uniform_filter(ref * ref, win_size)
    uyy = _uniform_filter(img * img, win_size)
    uxy = _uniform_filter(ref * img, win_size)

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def autocorr(samples: JArray, max_lag: int = 100) -> JArray:
    """Normalised autocorrelation per lag for a (n, ...) MCMC chain, max'd
    over the state dims — the mixing diagnostic of
    ``tabulators/plot_autocorrs_toy.py``.  FFT-based (static shapes)."""
    n = samples.shape[0]
    x = samples.reshape(n, -1)
    x = x - jnp.mean(x, axis=0)

    # Autocovariance via Wiener-Khinchin with zero padding.
    nfft = 2 * n
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[: max_lag + 1].real
    acov = acov / jnp.arange(n, n - max_lag - 1, -1)[:, None]  # unbiased counts
    rho = acov[1:] / jnp.maximum(acov[0], 1e-12)
    return jnp.max(rho, axis=1)


def ess(samples: JArray, max_lag: int = 200, reduce: str = "min") -> JArray:
    """Effective sample size, Geyer initial-monotone-sequence estimator
    (the single-chain version of numpyro/Stan's ``effective_sample_size``):
    per state dimension, sum the lag-pair autocorrelations
    ``G_k = rho_{2k} + rho_{2k+1}`` until the first negative pair, enforcing
    monotone decrease, with the biased (1/n) autocovariance normalisation.

    ``reduce``: 'min' (conservative scalar, default), 'mean', or 'none'
    (per-dim array).
    """
    n = samples.shape[0]
    x = samples.reshape(n, -1).astype(jnp.float64 if jax.config.jax_enable_x64
                                      else jnp.float32)
    x = x - jnp.mean(x, axis=0)

    max_lag = min(max_lag, n - 2)
    nfft = 2 * n
    f = jnp.fft.rfft(x, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[: max_lag + 1].real / n
    rho = acov / jnp.maximum(acov[:1], 1e-30)  # rho[0] = 1, per dim

    npairs = (max_lag + 1) // 2
    pairs = rho[: 2 * npairs].reshape(npairs, 2, -1).sum(axis=1)  # G_k per dim
    positive = jnp.cumprod(pairs > 0.0, axis=0)
    # Initial monotone sequence: running minimum over the positive prefix.
    monotone = jax.lax.cummin(jnp.where(positive, pairs, 0.0), axis=0)
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(positive, monotone, 0.0), axis=0)
    ess_d = n / jnp.maximum(tau, 1.0)
    if reduce == "min":
        return jnp.min(ess_d)
    if reduce == "mean":
        return jnp.mean(ess_d)
    return ess_d
