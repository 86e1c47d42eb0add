"""Multi-chain restoration Gibbs: shapes, finiteness, chain independence."""
import jax
import jax.numpy as jnp
import numpy as np


def test_restoration_gibbs_chains():
    from fbs_tpu.applications import RestorationSampler
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.sdes import StationaryLinLinearSDE

    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (8, 16, 16, 1))
    dataset = ImageRestore.from_array(xs, task="inpaint-6")

    T = 1.0
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    unet = UNet(dt=T / 20, dim=8, dim_mults=(1, 2))
    param, _, nn_score = make_st_nn(key, unet, (16, 16, 1), batch_size=2)

    nsteps, nparticles, nchains = 6, 4, 3
    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=nn_score,
                                 param=param, T=T, nsteps=nsteps,
                                 nparticles=nparticles)
    _, y0, mask = dataset.sampler(jax.random.PRNGKey(1))

    step = sampler.make_gibbs_chains(y0, mask, nchains, explicit_backward=True)

    x0s = jnp.zeros((nchains, *dataset.unobs_shape))
    us_stars = jnp.zeros((nchains, nsteps + 1, *dataset.unobs_shape))
    bs_stars = jnp.zeros((nchains, nsteps + 1), dtype=int)

    state = (x0s, us_stars, bs_stars)
    keys = jax.random.split(jax.random.PRNGKey(2), nchains)
    state, (x0s_out, accs) = step(keys, state)
    assert x0s_out.shape == (nchains, *dataset.unobs_shape)
    assert bool(jnp.all(jnp.isfinite(x0s_out)))
    # Different chain keys -> different states.
    assert not np.allclose(np.asarray(x0s_out[0]), np.asarray(x0s_out[1]))
