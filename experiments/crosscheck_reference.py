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


def resampling_checks():
    """Per-scheme key parity for every unconditional and conditional
    resampling the reference implements."""
    sys.path.insert(0, REF)
    import fbs.samplers.resampling as ref_r
    import fbs.samplers.csmc.resamplings as ref_cr
    import fbs_tpu.samplers.resampling as our_r
    import fbs_tpu.samplers.csmc.resamplings as our_cr

    key = jax.random.PRNGKey(11)
    w = jax.random.uniform(jax.random.PRNGKey(12), (64,))
    w = w / w.sum()

    for name in ("systematic", "stratified", "multinomial", "killing"):
        r = getattr(ref_r, name)(w, key)
        o = getattr(our_r, name)(w, key)
        print(f"resampling {name}: indices equal = {bool(jnp.all(r == o))}")

    for name in ("multinomial", "killing"):
        r = getattr(ref_cr, name)(key, w, 3, 5, conditional=True)
        o = getattr(our_cr, name)(key, w, 3, 5, conditional=True)
        print(f"cond resampling {name}: indices equal = {bool(jnp.all(r == o))}")


def twisted_check():
    """Twisted SMC agreement on the 2-D toy with shared twisting closures."""
    sys.path.insert(0, REF)
    from fbs.samplers.smc import twisted_smc as ref_twisted
    from fbs.samplers.resampling import stratified as ref_strat
    from fbs_tpu.samplers import twisted_smc, stratified

    m = _model()
    ts, dt, T = m["ts"], m["dt"], 1.0
    sde = m["sde"]
    nparticles = 16
    data_variance = 1.0

    def score(z, t):
        return -z / (1.0 + t)

    def rev_drift(uv, t):
        return -sde.drift(uv, T - t) + sde.dispersion(T - t) ** 2 * score(uv, T - t)

    def rev_disp(t):
        return sde.dispersion(T - t)

    def twisting_logpdf(y, uv, t):
        denoise = uv + rev_drift(uv, t) * dt
        return jnp.sum(jax.scipy.stats.norm.logpdf(y, denoise[1:], jnp.sqrt(data_variance)))

    def twisting_logpdf_vmap(y, uvs, t):
        return jax.vmap(lambda uv: twisting_logpdf(y, uv, t))(uvs)

    def rev_cond_drift(uv, t, y):
        return rev_drift(uv, t) + jax.grad(twisting_logpdf, argnums=1)(y, uv, t)

    def transition_logpdf(u, u_prev, t_prev):
        def f(u_, u_prev_):
            return jnp.sum(jax.scipy.stats.norm.logpdf(
                u_, u_prev_ + rev_drift(u_prev_, t_prev) * dt, jnp.sqrt(dt) * rev_disp(t_prev)))
        return jax.vmap(f)(u, u_prev)

    def init_sampler(key_, n):
        return jax.random.normal(key_, (n, 2))

    def prop_sampler(key_, uvs, t, y):
        m_ = uvs + jax.vmap(lambda uv: rev_cond_drift(uv, t, y))(uvs) * dt
        return m_ + jnp.sqrt(dt) * rev_disp(t) * jax.random.normal(key_, uvs.shape)

    def prop_logpdf(u, u_prev, t, y):
        def f(u_, u_prev_):
            m_ = u_prev_ + rev_cond_drift(u_prev_, t, y) * dt
            return jnp.sum(jax.scipy.stats.norm.logpdf(u_, m_, jnp.sqrt(dt) * rev_disp(t)))
        return jax.vmap(f)(u, u_prev)

    key = jax.random.PRNGKey(21)
    y = jnp.array([0.4])
    r_us, r_ws = ref_twisted(key, y, ts, init_sampler, transition_logpdf,
                             twisting_logpdf_vmap, prop_sampler, prop_logpdf,
                             ref_strat, nparticles)
    o_us, o_ws = twisted_smc(key, y, ts, init_sampler, transition_logpdf,
                             twisting_logpdf_vmap, prop_sampler, prop_logpdf,
                             stratified, nparticles)
    print(f"twisted_smc: max |u diff| = {float(jnp.max(jnp.abs(r_us - o_us))):.3e}, "
          f"max |log_w diff| = {float(jnp.max(jnp.abs(r_ws - o_ws))):.3e}")


def image_shape_checks():
    """MNIST-shaped (28x28) checks: mask generation parity, full Gibbs sweep
    through the mask-algebra closures (fused kernel on our side), and the
    CSGM baseline — the paths the round-1 crosscheck left untested."""
    sys.path.insert(0, REF)
    from functools import partial
    import math as pymath

    import fbs.data.images as ref_images
    from fbs.sdes import make_linear_sde as ref_make_linear_sde
    from fbs.sdes.linear import StationaryConstLinearSDE as RefConstSDE
    from fbs.samplers import gibbs_kernel as ref_gibbs

    import fbs_tpu.data.images as our_images
    from fbs_tpu.sdes import StationaryConstLinearSDE, make_linear_sde
    from fbs_tpu.applications import RestorationSampler

    shape = (28, 28, 1)
    ref_ds = ref_images.ImageRestore("inpaint-15", shape)
    our_ds = our_images.ImageRestore("inpaint-15", shape)

    # ---- mask generation parity (jittable rebuild vs setdiff1d original) ----
    mkey = jax.random.PRNGKey(41)
    r_mask = ref_ds.gen_mask(mkey)
    o_mask = our_ds.gen_mask(mkey)
    ok_inpaint = (bool(jnp.all(r_mask.unobs_inds_ravelled == o_mask.unobs_inds_ravelled))
                  and bool(jnp.all(r_mask.obs_inds_ravelled == o_mask.obs_inds_ravelled)))
    ref_sr = ref_images.ImageRestore("supr-4", shape)
    our_sr = our_images.ImageRestore("supr-4", shape)
    r_m2 = ref_sr.gen_mask(mkey)
    o_m2 = our_sr.gen_mask(mkey)
    ok_supr = (bool(jnp.all(r_m2.unobs_inds_ravelled == o_m2.unobs_inds_ravelled))
               and bool(jnp.all(r_m2.obs_inds_ravelled == o_m2.obs_inds_ravelled)))
    print(f"mask gen: inpaint equal = {ok_inpaint}, supr equal = {ok_supr}")

    # ---- shared analytic "score network" and SDEs ----
    T, nsteps, nparticles = 1.0, 8, 6
    ts = jnp.linspace(0, T, nsteps + 1)
    dt = T / nsteps

    def nn_score(uv, t, param):
        return -uv / (1.0 + t)

    ref_sde = RefConstSDE(a=-0.5, b=1.0)
    our_sde = StationaryConstLinearSDE(a=-0.5, b=1.0)
    _, _, ref_sim = ref_make_linear_sde(ref_sde)

    # ---- reference-script closures (inpainting.py:98-192, per-particle vmap) ----
    dataset, mask = ref_ds, r_mask
    x_shape = dataset.unobs_shape

    def reverse_drift(uv, t):
        return (-ref_sde.drift(uv, T - t)
                + ref_sde.dispersion(T - t) ** 2 * nn_score(uv, T - t, None))

    def reverse_drift_u(u, v, t, mask_):
        return dataset.unpack(reverse_drift(dataset.concat(u, v, mask_), t), mask_)[0]

    def reverse_drift_v(v, u, t, mask_):
        return dataset.unpack(reverse_drift(dataset.concat(u, v, mask_), t), mask_)[1]

    def reverse_dispersion(t):
        return ref_sde.dispersion(T - t)

    def transition_sampler(us_prev, v_prev, t_prev, key_, mask_):
        f = jax.vmap(lambda u: reverse_drift_u(u, v_prev, t_prev, mask_))
        return (us_prev + f(us_prev) * dt
                + pymath.sqrt(dt) * reverse_dispersion(t_prev)
                * jax.random.normal(key_, us_prev.shape))

    def transition_logpdf(u, u_prev, v_prev, t_prev, mask_):
        def f(u_prev_):
            return jnp.sum(jax.scipy.stats.norm.logpdf(
                u, u_prev_ + reverse_drift_u(u_prev_, v_prev, t_prev, mask_) * dt,
                pymath.sqrt(dt) * reverse_dispersion(t_prev)))
        return jax.vmap(f)(u_prev)

    def likelihood_logpdf(v, u_prev, v_prev, t_prev, mask_):
        def f(u_prev_):
            cond_m = v_prev + reverse_drift_v(v_prev, u_prev_, t_prev, mask_) * dt
            return jnp.sum(jax.scipy.stats.norm.logpdf(
                v, cond_m, pymath.sqrt(dt) * reverse_dispersion(t_prev)))
        return jax.vmap(f)(u_prev)

    def fwd_sampler(key_, x0_, y0_, mask_):
        return ref_sim(key_, dataset.concat(x0_, y0_, mask_), ts)

    def unpack(xy, mask_):
        return dataset.unpack(xy, mask_)

    # ---- our application-layer sampler (fused kernel path) ----
    sampler = RestorationSampler(dataset=our_ds, sde=our_sde, nn_score=nn_score,
                                 param=None, T=T, nsteps=nsteps,
                                 nparticles=nparticles, use_fused=True)

    key = jax.random.PRNGKey(42)
    img_key, y_key = jax.random.split(key)
    test_img = jax.random.uniform(img_key, shape)
    x_true, y0 = our_ds.unpack(test_img, o_mask)

    x0 = jnp.zeros(x_shape)
    us_star = jnp.zeros((nsteps + 1, *x_shape))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    # explicit_final=True: the image config of record is gibbs-eb-ef
    # (``imgs_gibbs.sh:37``); the reference's ef=False path rejects the
    # ``mask_`` kwarg in its init_likelihood_logpdf (latent reference bug —
    # ours forwards kwargs, see ``fbs_tpu/samplers/gibbs.py:136``).
    gkey = jax.random.PRNGKey(43)
    r_out = ref_gibbs(gkey, x0, y0, us_star, bs_star, ts=ts, fwd_sampler=fwd_sampler,
                      sde=ref_sde, unpack=unpack, nparticles=nparticles,
                      transition_sampler=transition_sampler,
                      transition_logpdf=transition_logpdf,
                      likelihood_logpdf=likelihood_logpdf,
                      marg_y=False, explicit_backward=True, explicit_final=True,
                      mask_=mask)
    o_out = sampler.gibbs_step(gkey, x0, y0, us_star, bs_star, o_mask,
                               explicit_backward=True, explicit_final=True)
    print(f"gibbs_kernel (28x28 mask closures, fused): "
          f"max |x0 diff| = {float(jnp.max(jnp.abs(r_out[0] - o_out[0]))):.3e}, "
          f"max |us_star diff| = {float(jnp.max(jnp.abs(r_out[1] - o_out[1]))):.3e}, "
          f"bs equal = {bool(jnp.all(r_out[2] == o_out[2]))}")

    # ---- CSGM baseline (reference script loop inpainting_csgm.py:86-119) ----
    ref_disc, _, _ = ref_make_linear_sde(ref_sde)
    y_shape = (shape[0] * shape[1] - x_shape[0], x_shape[1])

    def reverse_drift_csgm(u, t, mask_, key_, y0_):
        F, Q = ref_disc(T - t, ts[0])
        v_hat = F * y0_ + jnp.sqrt(Q) * jax.random.normal(key_, y_shape)
        uv = dataset.concat(u, v_hat, mask_)
        return (-ref_sde.drift(u, T - t)
                + ref_sde.dispersion(T - t) ** 2
                * dataset.unpack(nn_score(uv, T - t, None), mask_)[0])

    def euler_maruyama(key_, u0, mask_, y0_):
        def scan_body(u, elem):
            rnd, t, key_drift = elem
            u = (u + reverse_drift_csgm(u, t, mask_, key_drift, y0_) * dt
                 + reverse_dispersion(t) * pymath.sqrt(dt) * rnd)
            return u, None
        key_scan, key_est = jax.random.split(key_)
        key_ests = jax.random.split(key_est, num=nsteps)
        rnds = jax.random.normal(key_scan, (nsteps, *x_shape))
        return jax.lax.scan(scan_body, u0, (rnds, ts[:-1], key_ests))[0]

    def ref_csgm(key_, y, mask_):
        key_init, key_sde = jax.random.split(key_, num=2)
        u0 = jax.random.normal(key_init, x_shape)
        return euler_maruyama(key_sde, u0, mask_, y)

    ckey = jax.random.PRNGKey(44)
    r_x0 = ref_csgm(ckey, y0, mask)
    o_x0 = sampler.csgm_sample(ckey, y0, o_mask)
    print(f"csgm (28x28): max |x0 diff| = {float(jnp.max(jnp.abs(r_x0 - o_x0))):.3e}")


if __name__ == "__main__":
    main()
    extra_checks()
    resampling_checks()
    twisted_check()
    image_shape_checks()
