"""Frequency tests for unconditional and conditional resampling schemes,
following the reference's strategy (``tests/test_cond_resamplings.py``):
unbiasedness via bincounts, and the Bayes-consistency check for conditional
variants — draw the pivot from the weights, conditionally resample, and check
that (a) slot j always equals the pivot and (b) the aggregate index marginal
is still the weights.

Unlike the reference, the conditional *systematic* scheme is implemented (the
reference raises NotImplementedError) and is covered here too.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest


from fbs_tpu.samplers.resampling import systematic, stratified, multinomial, killing
from fbs_tpu.samplers.csmc import resamplings as cond

UNCOND = {"systematic": systematic, "stratified": stratified,
          "multinomial": multinomial, "killing": killing}
COND = {"multinomial": cond.multinomial, "killing": cond.killing,
        "systematic": cond.systematic}


def _weights(n):
    w = jnp.cos(jnp.linspace(0, 2 * jnp.pi, n)) + 1
    return w / jnp.sum(w)


@pytest.mark.parametrize("name", list(UNCOND))
@pytest.mark.parametrize("seed", [42, 666])
def test_unconditional_unbiased(name, seed):
    key = jax.random.PRNGKey(seed)
    n = 1000
    weights = _weights(n)
    keys = jax.random.split(key, 50_000)
    indices = jax.jit(jax.vmap(lambda k: UNCOND[name](weights, k)))(keys)
    bincount = np.bincount(np.asarray(indices).ravel(), minlength=n)
    npt.assert_allclose(bincount / bincount.sum(), weights, atol=1e-3)


@pytest.mark.parametrize("name", list(COND))
@pytest.mark.parametrize("seed", [42, 666])
@pytest.mark.parametrize("j", [0, 5, 50])
def test_conditional_bayes_consistency(name, seed, j):
    N = 100
    key = jax.random.PRNGKey(seed)
    weights = _weights(N)

    def bayes_sample(k):
        k1, k2 = jax.random.split(k)
        i = jax.random.choice(k1, N, p=weights)
        return i, COND[name](k2, weights, i, j, True)

    keys = jax.random.split(key, 100_000)
    pivot, indices = jax.jit(jax.vmap(bayes_sample))(keys)

    # Slot j is always the pivot.
    npt.assert_array_equal(np.asarray(indices[:, j]), np.asarray(pivot))
    # Aggregate marginal of the remaining slots stays the weights.
    mask = np.ones(N, dtype=bool)
    mask[j] = False
    rest = np.asarray(indices)[:, mask].ravel()
    bincount = np.bincount(rest, minlength=N)
    npt.assert_allclose(bincount / bincount.sum(), weights, atol=2e-3)


@pytest.mark.parametrize("name", list(COND))
def test_conditional_reduces_to_unconditional(name):
    """conditional=False matches the plain scheme's statistics."""
    N = 64
    key = jax.random.PRNGKey(0)
    weights = _weights(N)
    keys = jax.random.split(key, 50_000)
    idx = jax.jit(jax.vmap(lambda k: COND[name](k, weights, 3, 7, False)))(keys)
    bincount = np.bincount(np.asarray(idx).ravel(), minlength=N)
    npt.assert_allclose(bincount / bincount.sum(), weights, atol=2e-3)


def test_killing_identity_under_uniform_weights():
    """Killing leaves indices untouched when weights are uniform."""
    N = 32
    weights = jnp.ones(N) / N
    idx = killing(weights, jax.random.PRNGKey(1))
    npt.assert_array_equal(np.asarray(idx), np.arange(N))
