"""Toy Bayesian datasets (reference ``fbs/data/bayesian.py``)."""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.data.base import Dataset
from fbs_tpu.typing import JArray, JKey

__all__ = ["Crescent"]


class Crescent(Dataset):
    r"""2-D Gaussian prior with a crescent-shaped nonlinear emission:
    ``phi ~ N(m, cov)``,
    ``Y | phi ~ N(phi_1 / psi + 0.5 (phi_0^2 + psi^2), xi)``.
    """

    def __init__(self, n: int = 10, psi: float = 1.0, xi: float = 1.0):
        self.n = n
        self.psi = psi
        self.m = jnp.array([0.0, 0.0])
        self.cov = jnp.array([[2.0, 0.0],
                              [0.0, 1.0]])
        self.cov_is_diag = True
        self.xi = xi

    def sampler(self, key: JKey, batch_size: int) -> Tuple[JArray, JArray]:
        key, subkey = jax.random.split(key)
        xs = self.m + jax.random.normal(subkey, (batch_size, 2)) @ jnp.linalg.cholesky(self.cov)
        key, subkey = jax.random.split(key)
        ys = (jax.vmap(self.emission, in_axes=[0, None])(xs, self.psi)
              + math.sqrt(self.xi) * jax.random.normal(subkey, (batch_size,)))
        return xs, ys

    @staticmethod
    def emission(phi, psi):
        return phi[1] / psi + 0.5 * (phi[0] ** 2 + psi ** 2)

    def log_prior_pdf(self, phi):
        if self.cov_is_diag:
            # Note: scale is the std = sqrt of the covariance diagonal (the
            # reference passes the variance as the scale at
            # ``fbs/data/bayesian.py:39`` — a bug its loose Langevin test
            # does not catch; fixed here and pinned by an autodiff oracle).
            return jnp.sum(jax.scipy.stats.norm.logpdf(phi, self.m,
                                                       jnp.sqrt(jnp.diag(self.cov))))
        return jax.scipy.stats.multivariate_normal.logpdf(phi, self.m, self.cov)

    def log_cond_pdf_likelihood(self, y, phi):
        return jnp.sum(jax.scipy.stats.norm.logpdf(y, self.emission(phi, self.psi),
                                                   math.sqrt(self.xi)))

    def score(self, xy):
        """Analytic joint score of (phi, y) via autodiff of the exact joint."""
        phi, y = xy[..., :2], xy[..., -1]
        return (jnp.hstack([jax.grad(self.log_prior_pdf)(phi), jnp.array(0.0)])
                + jnp.hstack(jax.grad(self.log_cond_pdf_likelihood, argnums=[1, 0])(y, phi)))

    def posterior(self, phi_mesh: JArray, y: JArray):
        """Normalised posterior density on a mesh (trapezoid quadrature)."""

        def energy(phi):
            return jnp.exp(self.log_prior_pdf(phi) + self.log_cond_pdf_likelihood(y, phi))

        evals = jax.vmap(jax.vmap(energy))(phi_mesh)
        z = jax.scipy.integrate.trapezoid(
            jax.scipy.integrate.trapezoid(evals, phi_mesh[0, :, 0], axis=0),
            phi_mesh[:, 0, 1])
        return evals / z

    @staticmethod
    def unpack(xy):
        return xy[..., :2], xy[..., -1]
