"""Training-loop tests: DSM score training reduces the loss on a toy
Gaussian target, the IPF losses have zero gradient at the true drift
(the reference's oracle, ``tests/test_sdes.py:258-314``), and the DSB trainer
runs an IPF iteration end to end on tiny shapes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from fbs_tpu.dsb import ipf_loss_cont, ipf_loss_cont_v
from fbs_tpu.sdes import StationaryConstLinearSDE, make_linear_sde, make_linear_sde_law_loss


def test_ipf_losses_zero_grad_at_true_drift():
    """For an OU process, simulating with the true drift and regressing the
    true (time-reversed mean-matching) drift gives (near-)zero gradient."""
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)

    # Parametrise drift as param * x; truth is param = -0.5.
    def drift_fn(x, t, param):
        return param * x

    key = jax.random.PRNGKey(0)
    init_samples = jax.random.normal(key, (512, 4))
    ts = jnp.linspace(0.0, 0.5, 17)

    for loss in (ipf_loss_cont, ipf_loss_cont_v):
        def loss_at(param):
            return loss(jax.random.PRNGKey(1), param, jnp.asarray(-0.5),
                        init_samples, ts, drift_fn, drift_fn,
                        lambda t: 1.0)

        # The loss should be (locally) minimised near the self-consistent
        # drift: gradient at the matching parameter is much smaller than at a
        # perturbed one.
        g_true = abs(float(jax.grad(loss_at)(jnp.asarray(-0.5))))
        g_off = abs(float(jax.grad(loss_at)(jnp.asarray(0.5))))
        assert g_true < 0.2 * g_off, (g_true, g_off)


def test_train_score_model_reduces_loss():
    from fbs_tpu.applications import train_score_model
    from fbs_tpu.data import ImageRestore

    key = jax.random.PRNGKey(0)

    # Toy "dataset" of flat vectors disguised as a Dataset.
    class VecData:
        def __init__(self, xs):
            self.xs = xs
            self.n = xs.shape[0]

        def init_enumeration(self, key_, batch_size):
            n_chunks = self.n // batch_size
            self.perm_inds = jnp.array_split(
                jax.random.permutation(key_, batch_size * n_chunks), n_chunks)
            return self.perm_inds

        def enumerate_subset(self, i, perm_inds=None, key=None):
            perm_inds = perm_inds if perm_inds is not None else self.perm_inds
            return self.xs[perm_inds[i]]

    data = VecData(jax.random.normal(key, (256, 4)) * 0.5 + 1.0)
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)

    def nn_fn(x, t, param):
        # Affine score model: param = (scale, shift).
        return param[0] * x + param[1]

    loss_fn = make_linear_sde_law_loss(sde, nn_fn, t0=0.0, T=1.0, nsteps=8,
                                       random_times=True, loss_type="score")
    init_param = jnp.zeros((2,))

    losses = []
    param, ema = train_score_model(
        jax.random.PRNGKey(1), data, loss_fn, init_param,
        batch_size=64, nepochs=3, lr=5e-2, schedule="const",
        log_every=1, log_fn=lambda s: losses.append(float(s.split()[-1])))

    assert losses[-1] < losses[0] * 0.9
    assert param.shape == (2,) and ema.shape == (2,)


def test_dsb_trainer_runs_one_iteration():
    from fbs_tpu.applications import DSBTrainer

    key = jax.random.PRNGKey(0)

    class VecData:
        def __init__(self, xs):
            self.xs = xs
            self.n = xs.shape[0]

        def init_enumeration(self, key_, batch_size):
            n_chunks = self.n // batch_size
            self.perm_inds = jnp.array_split(
                jax.random.permutation(key_, batch_size * n_chunks), n_chunks)
            return self.perm_inds

        def enumerate_subset(self, i, perm_inds=None, key=None):
            perm_inds = perm_inds if perm_inds is not None else self.perm_inds
            return self.xs[perm_inds[i]]

    data = VecData(jax.random.normal(key, (64, 3)) + 2.0)
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)

    def nn_drift(x, t, param):
        return param[0] * x + param[1]

    trainer = DSBTrainer(dataset=data, sde=sde, nn_drift=nn_drift,
                         state_shape=(3,), T=0.5, train_nsteps=4,
                         batch_size=16, nepochs=1, lr=1e-2, schedule="const",
                         vmap_loss=True, log_every=1000)

    pf, pb = trainer.train(jax.random.PRNGKey(1),
                           jnp.zeros((2,)), jnp.zeros((2,)), nsbs=2)
    assert pf.shape == (2,) and pb.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(pf))) and bool(jnp.all(jnp.isfinite(pb)))

    # Warm-start: re-running iteration 1 from iteration-0 params consumes the
    # same per-iteration key stream (the only difference from the continuous
    # run is the fresh optimiser state, which is not checkpointed).
    pf0, pb0 = trainer.train(jax.random.PRNGKey(1),
                             jnp.zeros((2,)), jnp.zeros((2,)), nsbs=1)
    pf1, pb1 = trainer.train(jax.random.PRNGKey(1), pf0, pb0, nsbs=2, start_sb=1)
    assert pf1.shape == (2,) and bool(jnp.all(jnp.isfinite(pf1)))
    assert bool(jnp.all(jnp.isfinite(pb1)))
    assert not jnp.allclose(pf1, pf0)  # iteration 1 actually ran


def test_remat_loss_matches_and_grads():
    """remat=True gives the same loss/grads (recompute changes memory, not
    math)."""
    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)

    def nn_fn(x, t, param):
        return param[0] * x + param[1]

    key = jax.random.PRNGKey(0)
    x0s = jax.random.normal(key, (16, 4))
    param = jnp.array([0.3, -0.1])

    l_plain = make_linear_sde_law_loss(sde, nn_fn, t0=0.0, T=1.0, nsteps=6,
                                       random_times=False, loss_type="score")
    l_remat = make_linear_sde_law_loss(sde, nn_fn, t0=0.0, T=1.0, nsteps=6,
                                       random_times=False, loss_type="score",
                                       remat=True)
    v1, g1 = jax.value_and_grad(l_plain)(param, key, x0s)
    v2, g2 = jax.value_and_grad(l_remat)(param, key, x0s)
    npt.assert_allclose(float(v1), float(v2), rtol=1e-7)
    npt.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-7)
