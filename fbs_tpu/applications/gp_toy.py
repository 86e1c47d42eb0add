"""GP-regression toy: conditional sampling with an exact analytic joint score.

Centralises the model the reference rebuilds in each of
``experiments/toy/gp_{gibbs,pmcmc,filter,twisted,csgm,kf}.py``: a d-dim
exponential-kernel GP prior with iid Gaussian observations; the joint
``(f, y)`` is Gaussian so the noising marginals and scores are closed-form,
and the exact posterior is available for evaluation.

All methods run with chains vmapped *and* (optionally) the chain axis sharded
over a mesh — the reference only vmaps chains on a single device
(``toy/gp_gibbs.py:172-173``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fbs_tpu.samplers import (
    bootstrap_filter, bootstrap_backward_smoother, gibbs_kernel, pmcmc_kernel,
    twisted_smc, stratified,
)
from fbs_tpu.sdes.linear import LinearSDE, make_linear_sde
from fbs_tpu.typing import JArray, JKey

__all__ = ["GPRegressionToy"]


@dataclass
class GPRegressionToy:
    """d-dimensional GP regression toy with analytic everything."""
    d: int = 10
    ell: float = 1.0
    sigma: float = 1.0
    obs_var: float = 1.0
    T: float = 1.0
    nsteps: int = 200
    sde: Optional[LinearSDE] = None

    def __post_init__(self):
        d = self.d
        self.zs = jnp.linspace(0.0, 5.0, d)
        self.cov_mat = self.cov_fn(self.zs, self.zs)
        self.joint_mean = jnp.zeros((2 * d,))
        self.joint_cov = jnp.block([
            [self.cov_mat, self.cov_mat],
            [self.cov_mat, self.cov_mat + self.obs_var * jnp.eye(d)],
        ])
        self.ts = jnp.linspace(0.0, self.T, self.nsteps + 1)
        self.dt = self.T / self.nsteps
        if self.sde is None:
            from fbs_tpu.sdes import StationaryConstLinearSDE
            self.sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
        (self.discretise_linear_sde, self.cond_score_t_0,
         self.simulate_cond_forward) = make_linear_sde(self.sde)
        self._build_closures()

    def cov_fn(self, z1, z2):
        return self.sigma ** 2 * jnp.exp(-jnp.abs(z1[None, :] - z2[:, None]) / self.ell)

    # ---- data + exact posterior ----------------------------------------

    def draw_data(self, key: JKey) -> Tuple[JArray, JArray]:
        """Draw latent f and observation y0."""
        key_f, key_y = jax.random.split(key)
        fs = jnp.linalg.cholesky(self.cov_mat) @ jax.random.normal(key_f, (self.d,))
        y0 = fs + jnp.sqrt(self.obs_var) * jax.random.normal(key_y, (self.d,))
        return fs, y0

    def exact_posterior(self, y0: JArray) -> Tuple[JArray, JArray]:
        chol = jax.scipy.linalg.cho_factor(self.cov_mat + self.obs_var * jnp.eye(self.d))
        mean = self.cov_mat @ jax.scipy.linalg.cho_solve(chol, y0)
        cov = self.cov_mat - self.cov_mat @ jax.scipy.linalg.cho_solve(chol, self.cov_mat)
        return mean, cov

    # ---- noising closures ----------------------------------------------

    def forward_m_cov(self, t):
        F_, Q_ = self.discretise_linear_sde(t, self.ts[0])
        return F_ * self.joint_mean, F_ ** 2 * self.joint_cov + Q_ * jnp.eye(2 * self.d)

    def score(self, z, t):
        mt, covt = self.forward_m_cov(t)
        chol = jax.scipy.linalg.cho_factor(covt)
        return -jax.scipy.linalg.cho_solve(chol, z - mt)

    def _build_closures(self):
        d, dt, T = self.d, self.dt, self.T
        sde = self.sde

        def unpack(xy):
            return xy[..., :d], xy[..., d:]

        def reverse_drift(uv, t):
            return -sde.drift(uv, T - t) + sde.dispersion(T - t) ** 2 * self.score(uv, T - t)

        def reverse_dispersion(t):
            return sde.dispersion(T - t)

        def _drift_parts(us_prev, v_prev, t_prev):
            vs = jnp.broadcast_to(v_prev, (us_prev.shape[0], d))
            joint = jnp.concatenate([us_prev, vs], axis=-1)
            drift = jax.vmap(reverse_drift, in_axes=[0, None])(joint, t_prev)
            return drift[..., :d], drift[..., d:]

        def transition_sampler(us_prev, v_prev, t_prev, key_):
            drift_u, _ = _drift_parts(us_prev, v_prev, t_prev)
            return (us_prev + drift_u * dt
                    + jnp.sqrt(dt) * reverse_dispersion(t_prev)
                    * jax.random.normal(key_, us_prev.shape))

        def transition_logpdf(u, us_prev, v_prev, t_prev):
            drift_u, _ = _drift_parts(us_prev, v_prev, t_prev)
            std = jnp.sqrt(dt) * reverse_dispersion(t_prev)
            z = (u - (us_prev + drift_u * dt)) / std
            return jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * math.log(2 * math.pi), axis=-1)

        def likelihood_logpdf(v, us_prev, v_prev, t_prev):
            _, drift_v = _drift_parts(us_prev, v_prev, t_prev)
            std = jnp.sqrt(dt) * reverse_dispersion(t_prev)
            z = (v - (v_prev + drift_v * dt)) / std
            return jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * math.log(2 * math.pi), axis=-1)

        def fused_kernel(us_prev, v, v_prev, t_prev, key_):
            drift_u, drift_v = _drift_parts(us_prev, v_prev, t_prev)
            std = jnp.sqrt(dt) * reverse_dispersion(t_prev)
            us = us_prev + drift_u * dt + std * jax.random.normal(key_, us_prev.shape)
            z = (v - (v_prev + drift_v * dt)) / std
            log_ws = jnp.sum(-0.5 * z ** 2 - jnp.log(std) - 0.5 * math.log(2 * math.pi), axis=-1)
            return us, log_ws

        # Terminal reference: exact Gaussian conditional u_T | v_T.
        m_ref, cov_ref = self.forward_m_cov(T)
        chol_ref = jax.scipy.linalg.cho_factor(cov_ref[d:, d:])

        def ref_sampler(key_, yT, n):
            m_ = m_ref[:d] + cov_ref[:d, d:] @ jax.scipy.linalg.cho_solve(chol_ref, yT - m_ref[d:])
            cov_ = cov_ref[:d, :d] - cov_ref[:d, d:] @ jax.scipy.linalg.cho_solve(
                chol_ref, cov_ref[d:, :d])
            return m_ + jax.random.normal(key_, (n, d)) @ jnp.linalg.cholesky(cov_)

        def fwd_sampler(key_, x0_, y0_):
            return self.simulate_cond_forward(key_, jnp.concatenate([x0_, y0_]), self.ts)

        def fwd_ys_sampler(key_, y0_):
            return self.simulate_cond_forward(key_, y0_, self.ts)

        self.unpack = unpack
        self.reverse_drift = reverse_drift
        self.transition_sampler = transition_sampler
        self.transition_logpdf = transition_logpdf
        self.likelihood_logpdf = likelihood_logpdf
        self.fused_kernel = fused_kernel
        self.ref_sampler = ref_sampler
        self.fwd_sampler = fwd_sampler
        self.fwd_ys_sampler = fwd_ys_sampler

    # ---- methods --------------------------------------------------------

    def make_gibbs(self, y0: JArray, nparticles: int,
                   explicit_backward: bool = False, explicit_final: bool = False,
                   marg_y: bool = False, use_fused: bool = True,
                   nchains: int = 1):
        """Returns jitted ``(init(key) -> state, step(key, state) -> (state, x0s))``
        with the chain axis vmapped (reference ``toy/gp_gibbs.py:152-190``)."""

        def gibbs_one_init(key_):
            key_fwd, key_bwd, key_bf = jax.random.split(key_, num=3)
            path_y = self.fwd_ys_sampler(key_fwd, y0)
            vs = path_y[::-1]
            uss = bootstrap_filter(self.transition_sampler, self.likelihood_logpdf,
                                   vs, self.ts, self.ref_sampler, key_bf, nparticles,
                                   stratified, log=True, return_last=False)[0]
            x0 = uss[-1, 0]
            us_star = bootstrap_backward_smoother(key_bwd, uss, vs, self.ts,
                                                  self.transition_logpdf)
            bs_star = jnp.zeros((self.nsteps + 1,), dtype=int)
            return x0, us_star, bs_star

        kernel = partial(gibbs_kernel, ts=self.ts, fwd_sampler=self.fwd_sampler,
                         sde=self.sde, unpack=self.unpack, nparticles=nparticles,
                         transition_sampler=self.transition_sampler,
                         transition_logpdf=self.transition_logpdf,
                         likelihood_logpdf=self.likelihood_logpdf,
                         marg_y=marg_y, explicit_backward=explicit_backward,
                         explicit_final=explicit_final,
                         fused_kernel=self.fused_kernel if use_fused else None)

        def gibbs_one_step(key_, state):
            x0, us_star, bs_star = state
            x0, us_star, bs_star, acc = kernel(key_, x0, y0, us_star, bs_star)
            return (x0, us_star, bs_star), (x0, acc)

        init = jax.jit(jax.vmap(gibbs_one_init))
        step = jax.jit(jax.vmap(gibbs_one_step))
        return init, step

    def make_pmcmc(self, y0: JArray, nparticles: int, delta: Optional[float] = None):
        kernel = partial(pmcmc_kernel, y0=y0, ts=self.ts,
                         fwd_ys_sampler=self.fwd_ys_sampler, sde=self.sde,
                         ref_sampler=self.ref_sampler,
                         transition_sampler=self.transition_sampler,
                         likelihood_logpdf=self.likelihood_logpdf,
                         resampling=stratified, nparticles=nparticles, delta=delta)
        return jax.jit(jax.vmap(kernel))

    def filter_sample(self, key: JKey, y0: JArray, nparticles: int) -> JArray:
        """One conditional draw by filtering the reversed y-path."""
        key_fwd, key_bf = jax.random.split(key)
        vs = self.fwd_ys_sampler(key_fwd, y0)[::-1]
        us, _ = bootstrap_filter(self.transition_sampler, self.likelihood_logpdf,
                                 vs, self.ts, self.ref_sampler, key_bf, nparticles,
                                 stratified, log=True, return_last=True)
        return us[0]

    def twisted_sample(self, key: JKey, y0: JArray, nparticles: int) -> JArray:
        """Twisted-SMC baseline with exact-Gaussian twisting."""
        d, dt, T, ts = self.d, self.dt, self.T, self.ts
        sde = self.sde

        def twisting_logpdf_one(y, uv, t):
            # p(y | uv_t) under the exact joint-Gaussian denoising estimate.
            F, Q = self.discretise_linear_sde(T - t, ts[0])
            denoise = uv + self.reverse_drift(uv, t) * dt
            obs = denoise[d:]
            return jnp.sum(jax.scipy.stats.norm.logpdf(
                y, obs, jnp.sqrt(F ** 2 * self.sigma ** 2 + Q)))

        def twisting_logpdf(y, uvs, t):
            return jax.vmap(lambda uv: twisting_logpdf_one(y, uv, t))(uvs)

        def reverse_cond_drift(uv, t, y):
            return (self.reverse_drift(uv, t)
                    + sde.dispersion(T - t) ** 2
                    * jax.grad(twisting_logpdf_one, argnums=1)(y, uv, t))

        def transition_logpdf(uvs, uvs_prev, t_prev):
            def f(uv, uv_prev):
                m = uv_prev + self.reverse_drift(uv_prev, t_prev) * dt
                return jnp.sum(jax.scipy.stats.norm.logpdf(
                    uv, m, jnp.sqrt(dt) * sde.dispersion(T - t_prev)))
            return jax.vmap(f)(uvs, uvs_prev)

        def init_sampler(key_, n):
            m_ref, cov_ref = self.forward_m_cov(T)
            return m_ref + jax.random.normal(key_, (n, 2 * d)) @ jnp.linalg.cholesky(cov_ref)

        def prop_sampler(key_, uvs, t, y):
            m = uvs + jax.vmap(lambda uv: reverse_cond_drift(uv, t, y))(uvs) * dt
            return m + jnp.sqrt(dt) * sde.dispersion(T - t) * jax.random.normal(
                key_, uvs.shape)

        def prop_logpdf(uvs, uvs_prev, t, y):
            def f(uv, uv_prev):
                m = uv_prev + reverse_cond_drift(uv_prev, t, y) * dt
                return jnp.sum(jax.scipy.stats.norm.logpdf(
                    uv, m, jnp.sqrt(dt) * sde.dispersion(T - t)))
            return jax.vmap(f)(uvs, uvs_prev)

        key_filter, key_select = jax.random.split(key)
        uvs, log_ws = twisted_smc(key_filter, y0, ts, init_sampler,
                                  transition_logpdf, twisting_logpdf,
                                  prop_sampler, prop_logpdf,
                                  resampling=stratified, nparticles=nparticles)
        uv = jax.random.choice(key_select, uvs, p=jnp.exp(log_ws), axis=0)
        return uv[:d]

    def csgm_sample(self, key: JKey, y0: JArray) -> JArray:
        """Conditional-score-matching baseline: substitute a forward-marginal
        draw of y into the joint score (reference ``toy/gp_csgm.py``)."""
        d, dt, T, ts = self.d, self.dt, self.T, self.ts
        sde = self.sde

        def reverse_drift_csgm(u, t, key_):
            F, Q = self.discretise_linear_sde(T - t, ts[0])
            v_hat = F * y0 + jnp.sqrt(Q) * jax.random.normal(key_, (d,))
            uv = jnp.concatenate([u, v_hat])
            score_u = self.score(uv, T - t)[:d]
            return -sde.drift(u, T - t) + sde.dispersion(T - t) ** 2 * score_u

        key_init, key_scan, key_est = jax.random.split(key, 3)
        u0 = jax.random.normal(key_init, (d,))
        rnds = jax.random.normal(key_scan, (self.nsteps, d))
        key_ests = jax.random.split(key_est, self.nsteps)

        def scan_body(u, elem):
            rnd, t, kd = elem
            u = (u + reverse_drift_csgm(u, t, kd) * dt
                 + sde.dispersion(T - t) * jnp.sqrt(dt) * rnd)
            return u, None

        return jax.lax.scan(scan_body, u0, (rnds, ts[:-1], key_ests))[0]
