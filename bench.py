"""Benchmark: particle-Gibbs sweep throughput on MNIST-class inpainting.

Measures the flagship hot path — one Gibbs sweep = exact forward noising +
CSMC forward pass with the score UNet (dim=64, the reference's production
architecture) evaluated batched over N=100 particles, fused
transition+likelihood kernel, bf16 MXU compute on TPU.

Prints ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": ..., "unit": "particle*step/s",
   "vs_baseline": ...}

Baseline: the reference's wall-time envelope implies ~8 s per Gibbs sweep at
N=100 particles, K=1000 steps on an A100-class GPU (BASELINE.md: 22 h Slurm
limit / (100 y0s x 100 sweeps)) => 100 * 1000 / 8 = 12,500 particle*steps/s.
"""
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_PARTICLE_STEPS_PER_SEC = 12_500.0


def build_sweep(nparticles: int, nsteps: int, dim: int, image_shape, compute_dtype,
                task: str = "inpaint-15", xs=None, microbatch: int = 1,
                fused_resblock: bool = False, fused_linear_attn: bool = False,
                take_fn=None):
    """Build a jitted Gibbs sweep closure on synthetic (or provided) images."""
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.nn import UNet, make_st_nn
    from fbs_tpu.samplers import gibbs_kernel, make_separable_kernels
    from fbs_tpu.sdes import StationaryLinLinearSDE, make_linear_sde

    key = jax.random.PRNGKey(666)
    h, w, c = image_shape

    if xs is None:
        xs = jax.random.uniform(key, (16, h, w, c))
    dataset = ImageRestore.from_array(xs, task=task)
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(1))

    T = 2.0
    ts = jnp.linspace(0.0, T, nsteps + 1)
    dt = T / nsteps
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)
    _, _, simulate_cond_forward = make_linear_sde(sde)

    # In the ImageRestore representation the joint (x, y) state IS the full
    # image (x = unobserved pixels, y = observed pixels), so the score net
    # sees c channels (reference experiments/imgs/inpainting.py:102-115).
    unet = UNet(dt=T / 200, dim=dim, dim_mults=(1, 2, 4), compute_dtype=compute_dtype,
                ws_frozen=True, fused_resblock=fused_resblock,
                fused_linear_attn=fused_linear_attn)
    param, array_to_dict, nn_score = make_st_nn(key, unet, (h, w, c), batch_size=2)
    # Params are frozen during the sweep: pre-apply weight standardisation
    # (bitwise identical; drops per-forward f32 kernel stats).
    from jax.flatten_util import ravel_pytree

    from fbs_tpu.nn import standardize_ws_kernels
    param = ravel_pytree(standardize_ws_kernels(array_to_dict(param)))[0]

    def reverse_drift_joint(imgs, t):
        # imgs: (n, h, w, c) re-assembled joint state; score net in bf16.
        return (-sde.drift(imgs, T - t)
                + sde.dispersion(T - t) ** 2 * nn_score(imgs, T - t, param))

    def concat_batched(us, v):
        vs = jnp.broadcast_to(v, (us.shape[0], *v.shape))
        return dataset.concat(us, vs, mask)

    def unpack_batched(joint):
        return dataset.unpack(joint, mask)

    def reverse_dispersion(t):
        return sde.dispersion(T - t)

    (transition_sampler, transition_logpdf,
     likelihood_logpdf, fused_kernel) = make_separable_kernels(
        reverse_drift_joint, reverse_dispersion, concat_batched, unpack_batched, dt,
        microbatch=microbatch)

    def fwd_sampler(key_, x0_, y0_):
        joint0 = dataset.concat(x0_, y0_, mask)
        return simulate_cond_forward(key_, joint0, ts)

    def unpack_path(path_xy):
        return dataset.unpack(path_xy, mask)

    @jax.jit
    def sweep(key_, x0, us_star, bs_star):
        return gibbs_kernel(key_, x0, y0, us_star, bs_star,
                            ts, fwd_sampler, sde, unpack_path, nparticles,
                            transition_sampler, transition_logpdf, likelihood_logpdf,
                            marg_y=False, explicit_backward=True, explicit_final=False,
                            fused_kernel=fused_kernel, take_fn=take_fn)

    x0 = jnp.zeros((*dataset.unobs_shape,))
    us_star = jnp.zeros((nsteps + 1, *dataset.unobs_shape))
    bs_star = jnp.zeros((nsteps + 1,), dtype=int)

    # Single-CSMC-step probe for FLOP accounting: XLA's cost_analysis() on the
    # full sweep counts a while/scan body ONCE, not x trip-count, which
    # understated the sweep FLOPs (and MFU) by ~3 orders of magnitude in
    # BENCH_r04.  Cost-analyzing the per-step fused kernel and multiplying by
    # the trip count gives the real number (the CSMC forward pass is where
    # ~all the FLOPs are; forward noising/resampling are elementwise).
    @jax.jit
    def _step(us_prev, key_):
        return fused_kernel(us_prev, y0, y0, jnp.asarray(0.5 * T), key_)

    us_prev0 = jnp.zeros((nparticles, *dataset.unobs_shape))
    sweep.step_probe = (_step, (us_prev0, key))
    return sweep, (x0, us_star, bs_star)


# Peak dense bf16 FLOP/s per chip (the MFU denominator), by device kind.
# Sources: Google TPU system-architecture table / "How to Scale Your Model".
_PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for name, peak in _PEAK_BF16_FLOPS.items():
        if name in kind:
            return peak
    return None


def _program_flops(jitted, *args) -> float | None:
    """XLA's own FLOP count for the compiled program (f32-equivalent ops).

    NOTE: counts a ``lax.scan``/while body once, NOT x trip-count — only
    valid for loop-free programs (like the single-step probe below).
    """
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _sweep_flops(sweep, nsteps: int) -> float | None:
    """Real FLOPs of one Gibbs sweep: per-CSMC-step FLOPs x trip count."""
    probe = getattr(sweep, "step_probe", None)
    if probe is None:
        return None
    step, step_args = probe
    per_step = _program_flops(step, *step_args)
    return None if per_step is None else per_step * nsteps


def time_sweep(nparticles, nsteps, dim, image_shape, compute_dtype, nreps,
               task="inpaint-15", fused_resblock=False, fused_linear_attn=False):
    sweep, (x0, us_star, bs_star) = build_sweep(nparticles, nsteps, dim,
                                                image_shape, compute_dtype, task=task,
                                                fused_resblock=fused_resblock,
                                                fused_linear_attn=fused_linear_attn)
    key = jax.random.PRNGKey(0)
    x0_, us_, bs_, _ = sweep(key, x0, us_star, bs_star)  # compile + warmup
    float(jnp.sum(x0_))  # value fetch: see the note in the timed loop below

    t0 = time.perf_counter()
    for _ in range(nreps):
        key, sub = jax.random.split(key)
        x0_, us_, bs_, _ = sweep(sub, x0_, us_, bs_)
    # Force a device->host value fetch: through the remote-TPU tunnel
    # block_until_ready can return at enqueue time, which once timed a full
    # 256^2 sweep at 0.0 s.  A scalar readback cannot lie.
    float(jnp.sum(x0_))
    elapsed = (time.perf_counter() - t0) / nreps
    return elapsed, _sweep_flops(sweep, nsteps)


def _onehot_take(xs, indices):
    """Resampling take as a one-hot matmul: under a chains vmap the default
    ``xs[indices]`` becomes a batched gather (slow on TPU); the one-hot
    contraction batches into one MXU matmul.  Exact copies: each one-hot row
    has a single 1, so every output element is ``1 * x`` plus exact zeros."""
    n = xs.shape[0]
    oh = jax.nn.one_hot(indices, n, dtype=xs.dtype)
    return (oh @ xs.reshape(n, -1)).reshape(xs.shape)


def time_chains(nchains, nparticles, nsteps, dim, image_shape, compute_dtype, nreps,
                task="inpaint-15", fused_linear_attn=False, take_fn=None):
    """Aggregate per-chip throughput: ``nchains`` vmapped Gibbs chains.

    The production workload is 100 y0s x 100 sweeps per chip; the single-chain
    config measures *latency* and leaves MXU idle time on the table at small
    shapes.  Running V independent chains per dispatch (exactly what
    ``--y0s_per_dispatch`` does in the experiment entry points) amortises it.
    """
    sweep, (x0, us_star, bs_star) = build_sweep(
        nparticles, nsteps, dim, image_shape, compute_dtype, task=task,
        fused_linear_attn=fused_linear_attn, take_fn=take_fn)
    vsweep = jax.jit(jax.vmap(sweep))
    x0s = jnp.broadcast_to(x0, (nchains, *x0.shape))
    uss = jnp.broadcast_to(us_star, (nchains, *us_star.shape))
    bss = jnp.broadcast_to(bs_star, (nchains, *bs_star.shape))
    keys = jax.random.split(jax.random.PRNGKey(7), nchains)
    x0s, uss, bss, _ = vsweep(keys, x0s, uss, bss)  # compile + warmup
    float(jnp.sum(x0s))

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(8)
    for _ in range(nreps):
        key, sub = jax.random.split(key)
        x0s, uss, bss, _ = vsweep(jax.random.split(sub, nchains), x0s, uss, bss)
    float(jnp.sum(x0s))
    elapsed = (time.perf_counter() - t0) / nreps
    flops = _sweep_flops(sweep, nsteps)
    return elapsed, None if flops is None else flops * nchains


def main():
    import os

    from fbs_tpu.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    if on_tpu:
        from fbs_tpu.nn import default_compute_dtype
        compute_dtype = default_compute_dtype()
        # The config of record: K = 1000 sampler steps, N = 100 particles
        # (reference bashes/imgs_gibbs.sh:37) — measured directly, no
        # extrapolation.
        nparticles, nsteps, dim = 100, 1000, 64
        image_shape = (28, 28, 1)
        nreps = 3
    else:
        compute_dtype = jnp.float32
        nparticles, nsteps, dim = 8, 8, 8
        image_shape = (16, 16, 1)
        nreps = 1

    import sys
    fused_resblock = "--fused_resblock" in sys.argv
    # The whole-gate Pallas linear attention is the config of record on TPU
    # since the r5 A/B probe: 28,508 vs 26,512 particle*step/s (+7.5%), see
    # docs/measurements/bench_r5_{plain,fusedattn}.json and roofline.md §4.
    if "--no_fused_linear_attn" in sys.argv:
        fused_linear_attn = False
    else:
        fused_linear_attn = "--fused_linear_attn" in sys.argv or on_tpu
    elapsed, flops = time_sweep(nparticles, nsteps, dim, image_shape, compute_dtype,
                                nreps, fused_resblock=fused_resblock,
                                fused_linear_attn=fused_linear_attn)
    single_psps = nparticles * nsteps / elapsed

    detail = {
        "platform": platform,
        "nparticles": nparticles,
        "nsteps": nsteps,
        "unet_dim": dim,
        "sec_per_sweep": round(elapsed, 4),
        "single_chain_particle_steps_per_sec": round(single_psps, 1),
        # The reference publishes no throughput numbers; the baseline divisor
        # is the 22 h Slurm *limit* / 10^4 sweeps (an upper bound on the
        # reference's time), so vs_baseline is a lower bound on the speedup.
        "baseline_is_envelope_upper_bound": True,
    }

    # MFU: per-CSMC-step FLOPs (loop-free probe, so XLA's count is exact)
    # x trip count, over the chip's peak dense bf16 rate — see
    # docs/roofline.md for the per-op analysis.
    peak = _peak_flops(jax.devices()[0]) if on_tpu else None
    if flops is not None:
        detail["sweep_gflops"] = round(flops / 1e9, 2)
        if peak is not None:
            detail["mfu"] = round(flops / elapsed / peak, 4)
            detail["peak_bf16_tflops"] = peak / 1e12

    # Aggregate per-chip throughput: V independent vmapped chains per
    # dispatch — the production configuration (100 y0s x 100 sweeps/chip via
    # --y0s_per_dispatch).  The single-chain config is latency-bound at
    # 28x28; this is the number the 22-h envelope actually competes with.
    particle_steps_per_sec = single_psps
    if not os.environ.get("BENCH_SKIP_CHAINS"):
        nchains = 4 if on_tpu else 2
        if "--chains" in sys.argv:
            nchains = int(sys.argv[sys.argv.index("--chains") + 1])
        chains_take = _onehot_take if "--chains_onehot_take" in sys.argv else None
        try:
            el_c, fl_c = time_chains(nchains, nparticles, nsteps, dim, image_shape,
                                     compute_dtype, max(1, nreps - 1),
                                     fused_linear_attn=fused_linear_attn,
                                     take_fn=chains_take)
            agg_psps = nchains * nparticles * nsteps / el_c
            chains_detail = {
                "nchains": nchains,
                "sec_per_joint_sweep": round(el_c, 4),
                "particle_steps_per_sec": round(agg_psps, 1),
            }
            if fl_c is not None and peak is not None:
                chains_detail["mfu"] = round(fl_c / el_c / peak, 4)
            detail["chains_per_chip"] = chains_detail
            particle_steps_per_sec = max(particle_steps_per_sec, agg_psps)
        except Exception as e:
            detail["chains_per_chip"] = {"error": str(e)[:200]}

    vs_baseline = particle_steps_per_sec / REFERENCE_PARTICLE_STEPS_PER_SEC

    if on_tpu and not os.environ.get("BENCH_SKIP_256"):
        # CelebA-HQ-256 inpaint-128 sweep chunk (the largest production
        # shape; N = 64 fills the chip's HBM, reference-scale K = 1000 runs
        # as 25-step dispatch chunks to stay inside the tunnel's per-dispatch
        # kill window — same per-step program as the full sweep).
        try:
            el256, fl256 = time_sweep(64, 25, dim, (256, 256, 3), compute_dtype, 1,
                                      task="inpaint-128")
            detail["celeba256_inpaint128_N64"] = {
                "sec_per_25step_chunk": round(el256, 4),
                "particle_steps_per_sec": round(64 * 25 / el256, 1),
            }
            if fl256 is not None and peak is not None:
                detail["celeba256_inpaint128_N64"]["mfu"] = round(
                    fl256 / el256 / peak, 4)
        except Exception as e:  # HBM-bound config: report, do not fail bench
            detail["celeba256_inpaint128_N64"] = {"error": str(e)[:200]}

    if on_tpu and os.environ.get("BENCH_FULL"):
        # CelebA-HQ-64 inpaint-32 sweep (reference CelebA config: N = 10).
        elapsed64, _ = time_sweep(10, 1000, dim, (64, 64, 3), compute_dtype, nreps,
                                  task="inpaint-32")
        detail["celeba64_inpaint32_N10_sec_per_sweep"] = round(elapsed64, 4)
        detail["celeba64_particle_steps_per_sec"] = round(10 * 1000 / elapsed64, 1)

    print(json.dumps({
        "metric": "particle_steps_per_sec",
        "value": round(particle_steps_per_sec, 1),
        "unit": "particle*step/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
