"""Gaussian Schrodinger-bridge conditional-sampling ablation.

Rebuild of reference ``experiments/sb/{gibbs,filter}.py``: a GP-regression
target transported to a random full-covariance Gaussian reference by the
closed-form Brownian-reference SB (``make_gaussian_bw_sb``).  The forward
process is *non-separable*, so the y-path sampler is the heuristic
"noise x0, pin y0, simulate" used by the reference (``sb/gibbs.py:146-150``),
and forward simulation is Euler-Maruyama with substeps rather than an exact
transition.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.samplers import (bootstrap_filter, bootstrap_backward_smoother,
                              gibbs_kernel, stratified)
from fbs_tpu.sdes import euler_maruyama, make_gaussian_bw_sb
from fbs_tpu.typing import JArray, JKey

__all__ = ["GaussianSBToy"]


@dataclass
class GaussianSBToy:
    """GP-regression toy under a closed-form Gaussian SB forward process."""
    d: int = 10
    ell: float = 1.0
    sigma: float = 1.0
    obs_var: float = 0.1
    T: float = 1.0
    nsteps: int = 100
    integration_nsteps: int = 10
    ref_seed: int = 1

    def __post_init__(self):
        d = self.d
        zs = jnp.linspace(0.0, 5.0, d)
        self.zs = zs
        self.cov_mat = self.sigma ** 2 * jnp.exp(-jnp.abs(zs[None, :] - zs[:, None]) / self.ell)
        self.joint_mean = jnp.zeros((2 * d,))
        self.joint_cov = jnp.block([
            [self.cov_mat, self.cov_mat],
            [self.cov_mat, self.cov_mat + self.obs_var * jnp.eye(d)],
        ])
        # Random full-covariance reference (reference ``sb/gibbs.py:62-67``).
        self.ref_m = jnp.ones((2 * d,))
        a_ = jax.random.normal(jax.random.PRNGKey(self.ref_seed), (2 * d, 2 * d))
        self.ref_cov = a_ @ a_.T
        self._chol_ref_y = jax.scipy.linalg.cho_factor(self.ref_cov[d:, d:])

        self.ts = jnp.linspace(0.0, self.T, self.nsteps + 1)
        self.dt = self.T / self.nsteps

        self.marginal_mean, self.marginal_cov, self.drift = make_gaussian_bw_sb(
            self.joint_mean, self.joint_cov, self.ref_m, self.ref_cov, sig=1.0)
        self._build_closures()

    def exact_posterior(self, y0: JArray) -> Tuple[JArray, JArray]:
        chol = jax.scipy.linalg.cho_factor(self.cov_mat + self.obs_var * jnp.eye(self.d))
        mean = self.cov_mat @ jax.scipy.linalg.cho_solve(chol, y0)
        cov = self.cov_mat - self.cov_mat @ jax.scipy.linalg.cho_solve(chol, self.cov_mat)
        return mean, cov

    def draw_data(self, key: JKey) -> Tuple[JArray, JArray]:
        key_f, key_y = jax.random.split(key)
        fs = jnp.linalg.cholesky(self.cov_mat) @ jax.random.normal(key_f, (self.d,))
        y0 = fs + jnp.sqrt(self.obs_var) * jax.random.normal(key_y, (self.d,))
        return fs, y0

    def dispersion(self, _):
        return 1.0

    def score(self, z, t):
        mt, covt = self.marginal_mean(t), self.marginal_cov(t)
        chol = jax.scipy.linalg.cho_factor(covt)
        return -jax.scipy.linalg.cho_solve(chol, z - mt)

    def _build_closures(self):
        d, dt, T = self.d, self.dt, self.T

        def unpack(xy):
            return xy[..., :d], xy[..., d:]

        def reverse_drift(uv, t):
            return -self.drift(uv, T - t) + self.dispersion(T - t) ** 2 * self.score(uv, T - t)

        def _drift_parts(us_prev, v_prev, t_prev):
            vs = jnp.broadcast_to(v_prev, (us_prev.shape[0], d))
            joint = jnp.concatenate([us_prev, vs], axis=-1)
            drift = jax.vmap(reverse_drift, in_axes=[0, None])(joint, t_prev)
            return drift[..., :d], drift[..., d:]

        def transition_sampler(us_prev, v_prev, t_prev, key_):
            drift_u, _ = _drift_parts(us_prev, v_prev, t_prev)
            return us_prev + drift_u * dt + jnp.sqrt(dt) * jax.random.normal(key_, us_prev.shape)

        def _norm_logpdf(x, mean, std):
            z = (x - mean) / std
            return jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * math.log(2 * math.pi), axis=-1)

        def transition_logpdf(u, us_prev, v_prev, t_prev):
            drift_u, _ = _drift_parts(us_prev, v_prev, t_prev)
            return _norm_logpdf(u, us_prev + drift_u * dt, jnp.sqrt(dt))

        def likelihood_logpdf(v, us_prev, v_prev, t_prev):
            _, drift_v = _drift_parts(us_prev, v_prev, t_prev)
            return _norm_logpdf(v, v_prev + drift_v * dt, jnp.sqrt(dt))

        def fused_kernel(us_prev, v, v_prev, t_prev, key_):
            drift_u, drift_v = _drift_parts(us_prev, v_prev, t_prev)
            sq = jnp.sqrt(dt)
            us = us_prev + drift_u * dt + sq * jax.random.normal(key_, us_prev.shape)
            return us, _norm_logpdf(v, v_prev + drift_v * dt, sq)

        def ref_sampler(key_, yT, n):
            m = self.ref_m[:d] + self.ref_cov[:d, d:] @ jax.scipy.linalg.cho_solve(
                self._chol_ref_y, yT - self.ref_m[d:])
            cov = self.ref_cov[:d, :d] - self.ref_cov[:d, d:] @ jax.scipy.linalg.cho_solve(
                self._chol_ref_y, self.ref_cov[d:, :d])
            return m + jax.random.normal(key_, (n, d)) @ jnp.linalg.cholesky(cov)

        def fwd_sampler(key_, x0_, y0_):
            xy0 = jnp.concatenate([x0_, y0_])
            return euler_maruyama(key_, xy0, self.ts, self.drift, self.dispersion,
                                  integration_nsteps=self.integration_nsteps,
                                  return_path=True)

        def fwd_ys_sampler_heuristic(key_, y0_):
            key_x0, key_em = jax.random.split(key_)
            x0_ = jax.random.normal(key_x0, (d,))
            return fwd_sampler(key_em, x0_, y0_)[:, d:]

        self.unpack = unpack
        self.transition_sampler = transition_sampler
        self.transition_logpdf = transition_logpdf
        self.likelihood_logpdf = likelihood_logpdf
        self.fused_kernel = fused_kernel
        self.ref_sampler = ref_sampler
        self.fwd_sampler = fwd_sampler
        self.fwd_ys_sampler_heuristic = fwd_ys_sampler_heuristic

    def make_gibbs(self, y0: JArray, nparticles: int,
                   explicit_backward: bool = False, use_fused: bool = True):
        """Jitted ``(init(key), step(key, state))`` for the SB Gibbs chain."""

        @jax.jit
        def init(key_):
            key_fwd, key_bwd, key_bf = jax.random.split(key_, num=3)
            vs = self.fwd_ys_sampler_heuristic(key_fwd, y0)[::-1]
            uss = bootstrap_filter(self.transition_sampler, self.likelihood_logpdf,
                                   vs, self.ts, self.ref_sampler, key_bf, nparticles,
                                   stratified, log=True, return_last=False)[0]
            x0 = uss[-1, 0]
            us_star = bootstrap_backward_smoother(key_bwd, uss, vs, self.ts,
                                                  self.transition_logpdf)
            bs_star = jnp.zeros((self.nsteps + 1,), dtype=int)
            return x0, us_star, bs_star

        kernel = partial(gibbs_kernel, ts=self.ts, fwd_sampler=self.fwd_sampler,
                         sde=None, unpack=self.unpack, nparticles=nparticles,
                         transition_sampler=self.transition_sampler,
                         transition_logpdf=self.transition_logpdf,
                         likelihood_logpdf=self.likelihood_logpdf,
                         marg_y=False, explicit_backward=explicit_backward,
                         explicit_final=False,
                         fused_kernel=self.fused_kernel if use_fused else None)

        @jax.jit
        def step(key_, state):
            x0, us_star, bs_star = state
            x0, us_star, bs_star, acc = kernel(key_, x0, y0, us_star, bs_star)
            return (x0, us_star, bs_star), (x0, acc)

        return init, step

    def filter_sample(self, key: JKey, y0: JArray, nparticles: int) -> JArray:
        key_fwd, key_bf = jax.random.split(key)
        vs = self.fwd_ys_sampler_heuristic(key_fwd, y0)[::-1]
        us, _ = bootstrap_filter(self.transition_sampler, self.likelihood_logpdf,
                                 vs, self.ts, self.ref_sampler, key_bf, nparticles,
                                 stratified, log=True, return_last=True)
        return us[0]
