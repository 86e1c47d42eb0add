r"""Cross-check fbs_tpu samplers against the reference implementation under
shared PRNG keys — the acceptance criterion in BASELINE.json ("samplers
matching CPU reference trajectories to numerical tolerance under shared PRNG
keys").

Requires the reference repo on sys.path (read-only mount at /root/reference
in the build environment); skips gracefully otherwise.  Run on CPU.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

REF = "/root/reference"


def _model():
    """Shared 2-D Gaussian conditional model (closures used by both stacks)."""
    from fbs_tpu.sdes import StationaryConstLinearSDE, make_linear_sde

    m0 = jnp.array([-1.0, 1.0])
    cov0 = jnp.array([[2.0, 0.4], [0.4, 0.5]])
    y0 = jnp.array([0.0])
    T, nsteps = 1.0, 50
    ts = jnp.linspace(0, T, nsteps + 1)
    dt = T / nsteps

    sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    disc, _, sim_fwd = make_linear_sde(sde)

    def fwd_m_cov(t):
        F, Q = disc(t, 0.0)
        return F * m0, F ** 2 * cov0 + Q * jnp.eye(2)

    def score(z, t):
        mt, covt = fwd_m_cov(t)
        return -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(covt), z - mt)

    def unpack(xy):
        return xy[..., :1], xy[..., 1:]

    def rev_drift(uv, t):
        return -sde.drift(uv, T - t) + sde.dispersion(T - t) ** 2 * score(uv, T - t)

    def rev_disp(t):
        return sde.dispersion(T - t)

    def transition_sampler(us, v_prev, t_prev, key_):
        drift_u = jax.vmap(lambda u: unpack(rev_drift(jnp.concatenate([u, v_prev]), t_prev))[0])(us)
        return us + drift_u * dt + math.sqrt(dt) * rev_disp(t_prev) * jax.random.normal(key_, us.shape)

    def transition_logpdf(u, us_prev, v_prev, t_prev):
        def f(u_prev):
            m = u_prev + unpack(rev_drift(jnp.concatenate([u_prev, v_prev]), t_prev))[0] * dt
            return jnp.sum(jax.scipy.stats.norm.logpdf(u, m, math.sqrt(dt) * rev_disp(t_prev)))
        return jax.vmap(f)(us_prev)

    def likelihood_logpdf(v, us_prev, v_prev, t_prev):
        def f(u_prev):
            m = v_prev + unpack(rev_drift(jnp.concatenate([u_prev, v_prev]), t_prev))[1] * dt
            return jnp.sum(jax.scipy.stats.norm.logpdf(v, m, math.sqrt(dt) * rev_disp(t_prev)))
        return jax.vmap(f)(us_prev)

    def fwd_sampler(key_, x0_, y0_):
        return sim_fwd(key_, jnp.concatenate([x0_, y0_]), ts)

    def init_sampler(key_, v0, n):
        return jax.random.normal(key_, (n, 1))

    return dict(sde=sde, ts=ts, dt=dt, y0=y0, unpack=unpack,
                transition_sampler=transition_sampler,
                transition_logpdf=transition_logpdf,
                likelihood_logpdf=likelihood_logpdf,
                fwd_sampler=fwd_sampler, init_sampler=init_sampler)


def main():
    sys.path.insert(0, REF)
    try:
        import fbs  # noqa: F401
    except ImportError:
        print("reference not available; skipping cross-check")
        return

    m = _model()
    key = jax.random.PRNGKey(666)
    nparticles = 16

    # ---- bootstrap filter ----
    from fbs.samplers.smc import bootstrap_filter as ref_filter
    from fbs.samplers.resampling import stratified as ref_strat
    from fbs_tpu.samplers import bootstrap_filter, stratified

    vs = jax.vmap(lambda t: jnp.array([0.1 * t]))(m["ts"])  # deterministic vs
    r = ref_filter(m["transition_sampler"], m["likelihood_logpdf"], vs, m["ts"],
                   m["init_sampler"], key, nparticles, ref_strat,
                   log=True, return_last=False)[0]
    o = bootstrap_filter(m["transition_sampler"], m["likelihood_logpdf"], vs, m["ts"],
                         m["init_sampler"], key, nparticles, stratified,
                         log=True, return_last=False)[0]
    print(f"bootstrap_filter: max |diff| = {float(jnp.max(jnp.abs(r - o))):.3e}")

    # ---- CSMC forward pass ----
    from fbs.samplers.csmc.csmc import forward_pass as ref_fwd
    from fbs.samplers.csmc.resamplings import killing as ref_killing
    from fbs_tpu.samplers.csmc.csmc import forward_pass
    from fbs_tpu.samplers.csmc.resamplings import killing

    nsteps = m["ts"].shape[0] - 1
    us_star = jnp.zeros((nsteps + 1, 1))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    def init_sampler2(key_, n):
        return jax.random.normal(key_, (n, 1))

    def init_lik(v0, u0s, v1):
        return -math.log(nparticles) * jnp.ones(u0s.shape[0])

    rA, rW, rU = ref_fwd(key, us_star, bs_star, vs, m["ts"], init_sampler2, init_lik,
                         m["transition_sampler"], m["likelihood_logpdf"],
                         ref_killing, nparticles)
    oA, oW, oU = forward_pass(key, us_star, bs_star, vs, m["ts"], init_sampler2, init_lik,
                              m["transition_sampler"], m["likelihood_logpdf"],
                              killing, nparticles)
    print(f"csmc forward_pass: max |u diff| = {float(jnp.max(jnp.abs(rU - oU))):.3e}, "
          f"ancestors equal = {bool(jnp.all(rA == oA))}")

    # ---- Gibbs kernel ----
    from fbs.samplers import gibbs_kernel as ref_gibbs
    from fbs_tpu.samplers import gibbs_kernel

    x0 = jnp.array([0.3])
    common = dict(ts=m["ts"], fwd_sampler=m["fwd_sampler"], sde=m["sde"],
                  unpack=m["unpack"], nparticles=nparticles,
                  transition_sampler=m["transition_sampler"],
                  transition_logpdf=m["transition_logpdf"],
                  likelihood_logpdf=m["likelihood_logpdf"],
                  marg_y=False, explicit_backward=True, explicit_final=False)
    r_out = ref_gibbs(key, x0, m["y0"], us_star, bs_star, **common)
    o_out = gibbs_kernel(key, x0, m["y0"], us_star, bs_star, **common)
    print(f"gibbs_kernel: max |x0 diff| = {float(jnp.max(jnp.abs(r_out[0] - o_out[0]))):.3e}, "
          f"max |us_star diff| = {float(jnp.max(jnp.abs(r_out[1] - o_out[1]))):.3e}, "
          f"bs equal = {bool(jnp.all(r_out[2] == o_out[2]))}")


def extra_checks():
    """pMCMC kernel and gibbs_init agreement."""
    sys.path.insert(0, REF)
    m = _model()
    key = jax.random.PRNGKey(31)
    nparticles = 16

    from fbs.samplers.smc import pmcmc_kernel as ref_pmcmc
    from fbs.samplers.resampling import stratified as ref_strat
    from fbs_tpu.samplers import pmcmc_kernel, stratified

    def ref_sampler(key_, yT, n):
        return jax.random.normal(key_, (n, 1))

    def fwd_ys_sampler(key_, y0_):
        from fbs_tpu.sdes import make_linear_sde
        _, _, sim = make_linear_sde(m["sde"])
        return sim(key_, y0_, m["ts"])

    uT = jnp.array([0.2])
    ys = fwd_ys_sampler(jax.random.PRNGKey(5), m["y0"])
    common = dict(y0=m["y0"], ts=m["ts"], fwd_ys_sampler=fwd_ys_sampler, sde=m["sde"],
                  ref_sampler=ref_sampler, transition_sampler=m["transition_sampler"],
                  likelihood_logpdf=m["likelihood_logpdf"], nparticles=nparticles,
                  delta=0.1)
    r = ref_pmcmc(key, uT, 0.0, ys, resampling=ref_strat, **common)
    o = pmcmc_kernel(key, uT, 0.0, ys, resampling=stratified, **common)
    print(f"pmcmc_kernel: max |uT diff| = {float(jnp.max(jnp.abs(r[0] - o[0]))):.3e}, "
          f"|log_ell diff| = {float(jnp.abs(r[1] - o[1])):.3e}, "
          f"max |ys diff| = {float(jnp.max(jnp.abs(r[2] - o[2]))):.3e}")

    from fbs.samplers import gibbs_init as ref_init
    from fbs_tpu.samplers import gibbs_init

    common = dict(x0_shape=(1,), ts=m["ts"], fwd_sampler=m["fwd_sampler"], sde=m["sde"],
                  unpack=m["unpack"], transition_sampler=m["transition_sampler"],
                  transition_logpdf=m["transition_logpdf"],
                  likelihood_logpdf=m["likelihood_logpdf"], nparticles=nparticles,
                  method="smoother", marg_y=False)
    rx, rus = ref_init(key, m["y0"], **common)
    ox, ous = gibbs_init(key, m["y0"], **common)
    print(f"gibbs_init: max |x0 diff| = {float(jnp.max(jnp.abs(rx - ox))):.3e}, "
          f"max |us_star diff| = {float(jnp.max(jnp.abs(rus - ous))):.3e}")


if __name__ == "__main__":
    main()
    extra_checks()
