"""Linear forward-noising SDEs and their exact discretisations.

TPU-native rebuild of the reference's ``fbs/sdes/linear.py:9-227``.  Design
changes relative to the reference:

- Each SDE class carries its own exact one-step discretisation
  ``discretise(t, s) -> (F, Q)`` as a method, replacing the reference's
  ``isinstance`` dispatch chain (reference ``fbs/sdes/linear.py:169-184``).
- The Doob h-transform ``bridge_drift`` is computed in closed form from the
  discretisation (``grad_x log N(target; F x, Q) = F (target - F x) / Q``)
  instead of via ``jax.grad`` of a logpdf (reference
  ``fbs/sdes/linear.py:36-45``): one fewer traced autodiff graph inside the
  Euler-Maruyama scan body, which matters because the bridge drift runs at
  ``integration_nsteps=100`` substeps inside the Gibbs kernel.
- ``simulate_cond_forward`` precomputes the per-step ``(F, sqrt(Q))`` tables
  for the whole grid outside the ``lax.scan`` so the scan body is a pure
  fused multiply-add on the VPU — no transcendentals inside the hot loop.

All formulas cross-checked against the reference's closed forms, and pinned by
``tests/test_sdes.py`` statistical oracles.
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.typing import JArray, JKey, FloatScalar

__all__ = [
    "LinearSDE",
    "StationaryConstLinearSDE",
    "StationaryLinLinearSDE",
    "StationaryExpLinearSDE",
    "make_linear_sde",
    "make_ou_sde",
    "make_linear_sde_law_loss",
    "make_ou_score_matching_loss",
    "make_gaussian_bw_sb",
]


class LinearSDE:
    """Marker base class for linear (in state) forward SDEs."""

    def drift(self, x, t):
        raise NotImplementedError

    def dispersion(self, t):
        raise NotImplementedError

    def discretise(self, t, s):
        """Exact transition ``X_t | X_s = x ~ N(F x, Q)``; returns ``(F, Q)``."""
        raise NotImplementedError

    def mean(self, t, s, m0):
        return self.discretise(t, s)[0] * m0

    def variance(self, t, s):
        return self.discretise(t, s)[1]

    def bridge_drift(self, x, t, target, T):
        """Doob h-transform drift pinning the process at ``X_T = target``.

        Closed form of ``drift + g^2 * grad_x log N(target; F x, Q)`` with
        ``(F, Q) = discretise(T, t)`` (replaces the autodiff formulation at
        reference ``fbs/sdes/linear.py:36-45``).
        """
        F, Q = self.discretise(T, t)
        score_h = F * (target - F * x) / Q
        return self.drift(x, t) + self.dispersion(t) ** 2 * score_h


class StationaryConstLinearSDE(LinearSDE):
    """``dX = a X dt + b dW`` with ``a < 0`` (OU process); stationary variance
    ``-b^2 / (2 a)``.  Reference ``fbs/sdes/linear.py:13-45``."""

    def __init__(self, a: FloatScalar, b: FloatScalar):
        self.a, self.b = a, b

    def drift(self, x, t):
        return self.a * x

    def dispersion(self, t):
        return self.b

    def discretise(self, t, s):
        a, b = self.a, self.b
        F = jnp.exp(a * (t - s))
        Q = b ** 2 / (2 * a) * (jnp.exp(2 * a * (t - s)) - 1.0)
        return F, Q


class StationaryLinLinearSDE(LinearSDE):
    r"""VP-style schedule: ``dX = -0.5 \beta(t) X dt + \sqrt{\beta(t)} dW``
    with linear ``\beta(t)`` ramp from ``beta_min`` at ``t0`` to ``beta_max``
    at ``T``.  Reference ``fbs/sdes/linear.py:48-92``."""

    def __init__(self, beta_min: FloatScalar, beta_max: FloatScalar,
                 t0: FloatScalar, T: FloatScalar):
        self.beta_min, self.beta_max, self.t0, self.T = beta_min, beta_max, t0, T

    def beta(self, t):
        bmin, bmax, t0, T = self.beta_min, self.beta_max, self.t0, self.T
        return (bmax - bmin) / (T - t0) * t + (bmin * T - bmax * t0) / (T - t0)

    def beta_integral(self, t, s):
        bmin, bmax, t0, T = self.beta_min, self.beta_max, self.t0, self.T
        return 0.5 * (t - s) * ((bmax - bmin) / (T - t0) * (t + s)
                                + 2.0 * (bmin * T - bmax * t0) / (T - t0))

    def drift(self, x, t):
        return -0.5 * self.beta(t) * x

    def dispersion(self, t):
        return jnp.sqrt(self.beta(t))

    def discretise(self, t, s):
        r = self.beta_integral(t, s)
        return jnp.exp(-0.5 * r), 1.0 - jnp.exp(-r)


class StationaryExpLinearSDE(LinearSDE):
    """Exponentially time-rescaled OU: ``a(t) = a e^{c (t - z)}``,
    ``b(t) = b e^{c (t - z) / 2}`` with ``b^2 / a = -2 sigma^2``.
    Reference ``fbs/sdes/linear.py:95-112,178-182``."""

    def __init__(self, a: FloatScalar, b: FloatScalar, c: FloatScalar, z: FloatScalar):
        self.a, self.b, self.c, self.z = a, b, c, z

    def drift(self, x, t):
        return self.a * jnp.exp(self.c * (t - self.z)) * x

    def dispersion(self, t):
        return self.b * jnp.exp(self.c * (t - self.z) / 2.0)

    def discretise(self, t, s):
        a, b, c, z = self.a, self.b, self.c, self.z
        stationary_var = -b ** 2 / (2 * a)
        r = a * (jnp.exp(c * (t - z)) - jnp.exp(c * (s - z))) / c
        return jnp.exp(r), stationary_var * (1.0 - jnp.exp(2.0 * r))


def make_linear_sde(sde: LinearSDE):
    """Build ``(discretise_linear_sde, cond_score_t_0, simulate_cond_forward)``
    for a linear SDE (reference ``fbs/sdes/linear.py:165-227``)."""

    def discretise_linear_sde(t, s):
        return sde.discretise(t, s)

    def cond_score_t_0(x: JArray, t, x0: JArray, s):
        F, Q = discretise_linear_sde(t, s)
        return -(x - F * x0) / Q

    def simulate_cond_forward(key: JKey, x0: JArray, ts: JArray,
                              t0: float = None, keep_path: bool = True) -> JArray:
        """Sample ``X_{t_0}, ..., X_{t_K}`` given ``X_{t_0} = x0``.

        With ``keep_path=True`` the output is one consistent trajectory; with
        ``keep_path=False`` each time receives an independent marginal draw
        (conditioned on ``x0`` at ``t0``), matching reference
        ``fbs/sdes/linear.py:190-225``.
        """
        if keep_path:
            # Precompute the transition tables for the whole grid; the scan
            # body is then a single fused multiply-add.
            Fs, Qs = jax.vmap(discretise_linear_sde)(ts[1:], ts[:-1])
            sqrt_Qs = jnp.sqrt(Qs)
            rnds = jax.random.normal(key, (ts.shape[0] - 1, *x0.shape))
            # Promote the carry up front so x64 coefficient tables cannot
            # change the carry dtype mid-scan (a no-op when dtypes agree).
            x0 = x0.astype(jnp.result_type(x0.dtype, Fs.dtype, rnds.dtype))

            def scan_body(x, elem):
                F, sq, rnd = elem
                x = F * x + sq * rnd
                return x, x

            _, path = jax.lax.scan(scan_body, x0, (Fs, sqrt_Qs, rnds))
            return jnp.concatenate([x0[jnp.newaxis], path], axis=0)
        else:
            Fs, Qs = discretise_linear_sde(ts, t0)
            rnds = jax.random.normal(key, (*ts.shape, *x0.shape))
            return Fs * x0 + jnp.sqrt(Qs) * rnds

    return discretise_linear_sde, cond_score_t_0, simulate_cond_forward


def make_ou_sde(a, b):
    """Constant-OU specialisation, kept for parity with reference
    ``fbs/sdes/linear.py:115-162``; cross-checked against ``make_linear_sde``
    in the tests."""

    def discretise_ou_sde(t):
        return jnp.exp(a * t), b ** 2 / (2 * a) * (jnp.exp(2 * a * t) - 1.0)

    def cond_score_t_0(x: JArray, t, x0: JArray):
        F, Q = discretise_ou_sde(t)
        return -(x - F * x0) / Q

    def simulate_cond_forward(key: JKey, x0: JArray, ts: JArray,
                              keep_path: bool = True) -> JArray:
        if keep_path:
            dts = jnp.diff(ts)
            Fs, Qs = discretise_ou_sde(dts)
            sqrt_Qs = jnp.sqrt(Qs)
            rnds = jax.random.normal(key, (dts.shape[0], *x0.shape))

            def scan_body(x, elem):
                F, sq, rnd = elem
                x = F * x + sq * rnd
                return x, x

            _, path = jax.lax.scan(scan_body, x0, (Fs, sqrt_Qs, rnds))
            return jnp.concatenate([x0[jnp.newaxis], path], axis=0)
        else:
            Fs, Qs = discretise_ou_sde(ts)
            rnds = jax.random.normal(key, (*ts.shape, *x0.shape))
            return Fs[:, None] * x0[None, :] + jnp.sqrt(Qs)[:, None] * rnds

    return discretise_ou_sde, cond_score_t_0, simulate_cond_forward


def make_linear_sde_law_loss(sde: LinearSDE,
                             nn_fn: Callable,
                             t0: float = 0.,
                             T: float = 2.,
                             nsteps: int = 100,
                             random_times: bool = True,
                             loss_type: str = "score",
                             save_mem: bool = False,
                             remat: bool = False) -> Callable:
    """Denoising-score-matching / IPF losses over forward paths.

    Rebuild of reference ``fbs/sdes/linear.py:230-365`` with one TPU-first
    change: the network is evaluated once over the flattened
    ``(batch * ntimes)`` axis instead of a ``vmap`` over the time axis
    (reference ``fbs/sdes/linear.py:285-287``) — one large batched matmul for
    the MXU rather than ``nsteps`` smaller ones.

    ``loss_type`` is one of ``'score'`` (weighted DSM), ``'ipf'``
    (mean-matching), ``'ipf-score'`` (one-step score).  ``save_mem=True`` ties
    the batch and time axes: each sample gets a single random time.
    ``remat=True`` wraps the network in ``jax.checkpoint`` — activations are
    recomputed in the backward pass (trade FLOPs for HBM; useful for the
    CelebA-HQ-128/256 training batches).
    """
    discretise_linear_sde, cond_score_t_0, simulate_cond_forward = make_linear_sde(sde)
    eps = 1e-5  # smallest offset that stays stable in f32

    if remat:
        nn_fn = jax.checkpoint(nn_fn)

    def score_scale(t, s):
        return discretise_linear_sde(t, s)[1]

    def _nn_eval_over_path(param, fwd_paths, ts_eval):
        # fwd_paths: (n, K, ...); ts_eval: (K,)
        n, K = fwd_paths.shape[:2]
        state_shape = fwd_paths.shape[2:]
        flat_x = fwd_paths.reshape(n * K, *state_shape)
        flat_t = jnp.tile(ts_eval, (n,))
        out = nn_fn(flat_x, flat_t, param)
        return out.reshape(n, K, *state_shape)

    def loss_fn(param, key, x0s):
        nsamples = x0s.shape[0]
        state_shape = x0s.shape[1:]
        key_ts, key_fwd = jax.random.split(key, num=2)

        if random_times:
            ts = jnp.concatenate([
                jnp.array([t0]),
                jnp.sort(jax.random.uniform(key_ts, (nsteps - 1,), minval=t0 + eps, maxval=T)),
                jnp.array([T]),
            ])
        else:
            ts = jnp.linspace(t0, T, nsteps + 1)
        scales = score_scale(ts[1:], ts[0])

        keys = jax.random.split(key_fwd, num=nsamples)
        fwd_paths = jax.vmap(lambda k, x: simulate_cond_forward(k, x, ts, keep_path=True))(
            keys, x0s)  # (n, K + 1, ...)
        nn_evals = _nn_eval_over_path(param, fwd_paths[:, 1:], ts[1:])  # (n, K, ...)

        state_axes = tuple(range(2, 2 + len(state_shape)))
        if loss_type == "score":
            cond_score_evals = jax.vmap(cond_score_t_0,
                                        in_axes=[1, 0, None, None],
                                        out_axes=1)(fwd_paths[:, 1:], ts[1:], fwd_paths[:, 0], ts[0])
            return jnp.mean(jnp.mean((nn_evals - cond_score_evals) ** 2, axis=state_axes)
                            * scales[None, :])
        elif loss_type == "ipf":
            def fwd_transition(x, t, s):
                return discretise_linear_sde(t, s)[0] * x

            fwd_transition = jax.vmap(fwd_transition, in_axes=[1, 0, 0], out_axes=1)
            fwd_evals1 = fwd_transition(fwd_paths[:, :-1], ts[1:], ts[:-1])
            fwd_evals2 = fwd_transition(fwd_paths[:, 1:], ts[1:], ts[:-1])
            return jnp.mean((nn_evals - (fwd_paths[:, 1:] + fwd_evals1 - fwd_evals2)) ** 2)
        elif loss_type == "ipf-score":
            cond_score_evals = jax.vmap(cond_score_t_0,
                                        in_axes=[1, 0, 1, 0],
                                        out_axes=1)(fwd_paths[:, 1:], ts[1:], fwd_paths[:, :-1], ts[:-1])
            return jnp.mean((nn_evals - cond_score_evals) ** 2)
        else:
            raise NotImplementedError(f"Loss {loss_type} not implemented.")

    def loss_fn_save_mem(param, key, x0s):
        nsamples = x0s.shape[0]
        state_shape = x0s.shape[1:]
        key_ts, key_fwd = jax.random.split(key, num=2)

        if random_times:
            ts = jnp.concatenate([
                jnp.sort(jax.random.uniform(key_ts, (nsamples - 1,), minval=t0 + eps, maxval=T)),
                jnp.array([T]),
            ])
        else:
            dt = (T - t0) / nsamples
            ts = jnp.linspace(t0 + dt, T, nsamples)
        scales = score_scale(ts, t0)

        keys = jax.random.split(key_fwd, num=nsamples)
        fwd_samples = jax.vmap(lambda k, x, t: simulate_cond_forward(k, x, t, t0=t0, keep_path=False))(
            keys, x0s, ts)  # (n, ...)
        nn_evals = nn_fn(fwd_samples, ts, param)  # (n, ...)

        state_axes = tuple(range(1, 1 + len(state_shape)))
        if loss_type == "score":
            cond_score_evals = jax.vmap(cond_score_t_0,
                                        in_axes=[0, 0, 0, None])(fwd_samples, ts, x0s, t0)
            return jnp.mean(jnp.mean((nn_evals - cond_score_evals) ** 2, axis=state_axes) * scales)
        else:
            raise NotImplementedError(
                f"Loss {loss_type} with save_mem not implemented (reference supports 'score' only in practice).")

    return loss_fn_save_mem if save_mem else loss_fn


def make_ou_score_matching_loss(a, b, nn_score, t0: float = 0., T: float = 2.,
                                nsteps: int = 100, random_times: bool = True):
    """Legacy OU DSM loss (reference ``fbs/sdes/linear.py:368-394``)."""
    discretise_ou_sde, cond_score_t_0, simulate_cond_forward = make_ou_sde(a, b)

    def score_scale(t):
        return discretise_ou_sde(t)[1]

    def loss_fn(param, key, x0s):
        nsamples = x0s.shape[0]
        key_ts, key_fwd = jax.random.split(key, num=2)

        if random_times:
            ts = jnp.concatenate([
                jnp.array([t0]),
                jnp.sort(jax.random.uniform(key_ts, (nsteps - 1,), minval=t0, maxval=T)),
                jnp.array([T]),
            ])
        else:
            ts = jnp.linspace(t0, T, nsteps + 1)
        scales = score_scale(ts[1:])

        keys = jax.random.split(key_fwd, num=nsamples)
        fwd_paths = jax.vmap(simulate_cond_forward, in_axes=[0, 0, None])(keys, x0s, ts)
        nn_evals = jax.vmap(nn_score, in_axes=[1, 0, None], out_axes=1)(fwd_paths[:, 1:], ts[1:], param)
        cond_score_evals = jax.vmap(jax.vmap(cond_score_t_0,
                                             in_axes=[0, 0, None]),
                                    in_axes=[0, None, 0])(fwd_paths[:, 1:], ts[1:], fwd_paths[:, 0])
        return jnp.mean(jnp.mean((nn_evals - cond_score_evals) ** 2, axis=-1) * scales[None, :])

    return loss_fn


def make_gaussian_bw_sb(mean0: JArray, cov0: JArray, mean1: JArray, cov1: JArray,
                        sig: float = 1.) -> Tuple[Callable, Callable, Callable]:
    """Closed-form Gaussian Schrodinger bridge with Brownian reference on
    [0, 1]; returns ``(marginal_mean, marginal_cov, drift)``.

    Formulas from Table 1 of "The Schrodinger Bridge between Gaussian Measures
    has a Closed Form" (Bunne et al., 2023); reference
    ``fbs/sdes/linear.py:397-457``.
    """
    from fbs_tpu.math import sqrtm

    d = mean0.shape[0]
    sqrt0 = sqrtm(cov0)

    D_sig = sqrtm(4.0 * sqrt0 @ cov1 @ sqrt0 + sig ** 4 * jnp.eye(d))
    C_sig = 0.5 * (sqrt0 @ jnp.linalg.solve(sqrt0.T, D_sig.T).T - sig ** 2 * jnp.eye(d))

    def kappa(t, _):
        return t * sig ** 2

    def r(t):
        return t

    def r_bar(t):
        return 1.0 - t

    def rho(t):
        return t

    def marginal_mean(t):
        return r_bar(t) * mean0 + r(t) * mean1

    def marginal_cov(t):
        return (r_bar(t) ** 2 * cov0 + r(t) ** 2 * cov1
                + r(t) * r_bar(t) * (C_sig + C_sig.T)
                + kappa(t, t) * (1.0 - rho(t)) * jnp.eye(d))

    def s(t):
        pt = r(t) * cov1 + r_bar(t) * C_sig
        qt = r_bar(t) * cov0 + r(t) * C_sig
        return pt - qt.T - sig ** 2 * rho(t) * jnp.eye(d)

    def drift(x, t):
        mt = marginal_mean(t)
        chol_t = jax.scipy.linalg.cho_factor(marginal_cov(t))
        return s(t).T @ jax.scipy.linalg.cho_solve(chol_t, x - mt) - mean0 + mean1

    return marginal_mean, marginal_cov, drift
