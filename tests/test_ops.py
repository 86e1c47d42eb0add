"""Pallas kernel tests (interpreter mode on CPU): the fused resampler matches
the XLA cumsum+searchsorted reference exactly under a shared offset, and the
fused path simulator matches the closed-form moments."""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt


from fbs_tpu.ops import resample_indices_pallas, simulate_linear_sde_path_pallas
from fbs_tpu.samplers.resampling import _systematic_or_stratified


def test_pallas_resampler_matches_reference_semantics():
    """Same key -> the pallas kernel and the XLA reference compute the same
    CDF inversion (they share the jax.random uniform draw)."""
    key = jax.random.PRNGKey(0)
    n = 256
    w = jax.random.uniform(jax.random.PRNGKey(1), (n,)) + 0.01
    w = w / jnp.sum(w)

    w32 = w.astype(jnp.float32)
    for systematic in (True, False):
        # Shared explicit offsets so the comparison is exact regardless of
        # the ambient x64 setting (the XLA path draws default-dtype uniforms).
        u = jax.random.uniform(key, () if systematic else (n,), dtype=jnp.float32)
        idx_ref = jnp.clip(
            jnp.searchsorted(jnp.cumsum(w32),
                             (jnp.arange(n, dtype=jnp.float32) + u) / n),
            0, n - 1)
        idx_pallas = resample_indices_pallas(jnp.log(w32), systematic=systematic,
                                             u=u, interpret=True)
        npt.assert_array_equal(np.asarray(idx_pallas), np.asarray(idx_ref))


def test_pallas_path_simulator_matches_scan():
    """With explicit noise, the fused kernel reproduces the lax.scan
    reference path bit-for-bit (interpreter mode; the in-kernel PRNG path is
    validated statistically on real TPU by bench.py)."""
    d = 128
    K = 64
    key = jax.random.PRNGKey(0)
    F = 0.97
    sq = 0.2
    x0 = jnp.linspace(-1, 1, d, dtype=jnp.float32)
    Fs = jnp.full((K,), F, dtype=jnp.float32)
    sqs = jnp.full((K,), sq, dtype=jnp.float32)
    noise = jax.random.normal(key, (K, d), dtype=jnp.float32)

    path = simulate_linear_sde_path_pallas(jnp.int32(0), x0, Fs, sqs,
                                           noise=noise, interpret=True)
    assert path.shape == (K + 1, d)

    def ref_step(x, elem):
        f, s, n = elem
        x = f * x + s * n
        return x, x

    _, ref = jax.lax.scan(ref_step, x0, (Fs, sqs, noise))
    ref = jnp.concatenate([x0[None], ref], axis=0)
    npt.assert_allclose(np.asarray(path), np.asarray(ref), rtol=1e-6)
