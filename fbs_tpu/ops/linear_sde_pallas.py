"""Fused Pallas TPU kernel for linear-SDE forward path simulation.

The forward-noising simulator (``fbs_tpu.sdes.linear.simulate_cond_forward``)
is a length-K scan of ``x <- F_k x + sqrt(Q_k) xi_k``.  Under XLA this keeps
the carry in HBM and invokes a separate PRNG kernel per step.  This kernel
runs the whole path in one ``pallas_call``:

- the state lives in a VMEM scratch buffer across a sequential grid over
  steps (TPU grids execute in order, so the carry persists),
- Gaussian noise is generated *in kernel* from the on-core PRNG
  (``pltpu.prng_random_bits`` + Box-Muller), so no noise tensor ever touches
  HBM,
- each step writes exactly one output row.

The draws are distribution-equal (not bit-equal) to the ``jax.random``
reference path; statistical checks pin the moments.  Off-TPU (interpreter
mode) the on-core PRNG is stubbed, so an explicit ``noise`` input is
supported for exact testing of the scan body.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fbs_tpu.typing import JArray

__all__ = ["simulate_linear_sde_path_pallas"]

_TWO_PI = 2.0 * math.pi


def _uniform_from_bits(bits):
    # uint32 -> (0, 1) float32 with 24-bit resolution, strictly positive.
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal(shape):
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _make_kernel(use_prng: bool):
    if use_prng:
        def kernel(seed_ref, x0_ref, F_ref, sq_ref, out_ref, state):
            k = pl.program_id(0)

            @pl.when(k == 0)
            def _():
                pltpu.prng_seed(seed_ref[0])
                state[:] = x0_ref[:]

            x = state[:]
            x = F_ref[0, 0] * x + sq_ref[0, 0] * _normal(x.shape)
            state[:] = x
            out_ref[:] = x
    else:
        def kernel(seed_ref, x0_ref, F_ref, sq_ref, noise_ref, out_ref, state):
            k = pl.program_id(0)

            @pl.when(k == 0)
            def _():
                state[:] = x0_ref[:]

            x = state[:]
            x = F_ref[0, 0] * x + sq_ref[0, 0] * noise_ref[:]
            state[:] = x
            out_ref[:] = x
    return kernel


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def simulate_linear_sde_path_pallas(seed: JArray, x0: JArray,
                                    Fs: JArray, sqrt_Qs: JArray,
                                    noise: Optional[JArray] = None,
                                    interpret: bool = False) -> JArray:
    """Simulate ``x_{k+1} = F_k x_k + sqrt(Q_k) xi_k`` for all K steps in one
    fused kernel.

    Parameters
    ----------
    seed : int32 scalar array — seed for the in-kernel PRNG (ignored when
        ``noise`` is given).
    x0 : (d,) initial state.
    Fs, sqrt_Qs : (K,) per-step transition scalars.
    noise : optional (K, d) pre-drawn standard normals.  Required in
        interpreter mode (the emulated on-core PRNG returns zeros).

    Returns
    -------
    (K + 1, d) path including ``x0``.
    """
    d = x0.shape[0]
    K = Fs.shape[0]
    x0_2d = x0.astype(jnp.float32)[None, :]  # (1, d)

    use_prng = noise is None
    kernel = _make_kernel(use_prng)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                               # seed
        pl.BlockSpec((1, d), lambda k: (0, 0), memory_space=pltpu.VMEM),     # x0
        pl.BlockSpec((1, 1), lambda k: (k, 0), memory_space=pltpu.SMEM),     # F_k
        pl.BlockSpec((1, 1), lambda k: (k, 0), memory_space=pltpu.SMEM),     # sqrtQ_k
    ]
    args = [jnp.asarray(seed, jnp.int32).reshape(1), x0_2d,
            Fs.astype(jnp.float32)[:, None], sqrt_Qs.astype(jnp.float32)[:, None]]
    if not use_prng:
        in_specs.append(pl.BlockSpec((1, d), lambda k: (k, 0), memory_space=pltpu.VMEM))
        args.append(noise.astype(jnp.float32))

    steps_out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d), lambda k: (k, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
        interpret=interpret or not _on_tpu(),
    )(*args)

    return jnp.concatenate([x0_2d, steps_out], axis=0)
