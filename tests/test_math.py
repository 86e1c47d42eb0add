"""Sanity checks for the Gaussian divergences (reference ``tests/test_utils.py``)."""
import jax
import jax.numpy as jnp
import numpy.testing as npt


from fbs_tpu.math import bures_dist, kl, sqrtm


def test_kl_and_bures_zero_for_identical_gaussians():
    m = jnp.array([0.3, -0.7])
    cov = jnp.array([[1.5, 0.2], [0.2, 0.9]])
    npt.assert_allclose(kl(m, cov, m, cov), 0.0, atol=1e-10)
    npt.assert_allclose(bures_dist(m, cov, m, cov), 0.0, atol=1e-8)


def test_kl_positive_and_correct_scalar():
    # KL(N(0, 1) || N(1, 2)) closed form.
    m0, c0 = jnp.array([0.0]), jnp.array([[1.0]])
    m1, c1 = jnp.array([1.0]), jnp.array([[2.0]])
    expected = 0.5 * (1 / 2 + 1 / 2 - 1 + jnp.log(2.0))
    npt.assert_allclose(kl(m0, c0, m1, c1) / 2, expected, rtol=1e-10)


def test_sqrtm():
    cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    s = sqrtm(cov)
    npt.assert_allclose(s @ s, cov, atol=1e-10)
