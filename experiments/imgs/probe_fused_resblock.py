"""Bisect which fused_resblock shape breaks the remote Mosaic compile.

``python bench.py --fused_resblock`` dies inside the axon remote compile
helper (HTTP 500, no diagnostics).  This probe compiles ONE fused_resblock
jit per distinct (H, W, Cin_x, Cin_skip, Cout) instance that the dim-64
``dim_mults=(1, 2, 4)`` UNet actually emits, smallest first, and reports
ok/fail per shape so the failure is attributable.

Each attempt is a small, short-lived helper job (safe to run at a queue
boundary).  Timing per successful shape is also printed (batch 104), which
directly measures the kernel-vs-XLA ResBlock cost the roofline predicts.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp

from fbs_tpu.compile_cache import enable as _enable

_enable()

B = int(os.environ.get("PROBE_BATCH", "104"))

# (tag, h, w, cin_x, cin_skip, cout) — the dim-64 (1,2,4) UNet instances
# (down path, mid, up path with skip concat, final).
SHAPES = [
    ("down0", 28, 28, 64, 0, 64),
    ("down1", 14, 14, 128, 0, 128),
    ("mid", 7, 7, 256, 0, 256),
    ("up1_skip", 14, 14, 256, 128, 128),
    ("up0_skip", 28, 28, 128, 64, 64),
    ("final_skip", 28, 28, 64, 64, 64),
]


def main():
    from fbs_tpu.ops.resblock_pallas import fused_resblock, resblock_reference

    interp = jax.default_backend() != "tpu"
    for tag, h, w, cx, cs, co in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, h, w, cx), jnp.bfloat16)
        skip = (jax.random.normal(key, (B, h, w, cs), jnp.bfloat16)
                if cs else None)
        film = jax.random.normal(key, (B, 2 * co), jnp.bfloat16)
        cin = cx + cs
        w1 = jax.random.normal(key, (3, 3, cin, co)) * 0.05
        w2 = jax.random.normal(key, (3, 3, co, co)) * 0.05
        b = jnp.zeros((co,))
        g = jnp.ones((co,))
        wsc = (jax.random.normal(key, (cin, co)) * 0.05) if cin != co else None
        bsc = jnp.zeros((co,)) if cin != co else None
        try:
            t0 = time.perf_counter()
            out = fused_resblock(x, skip, film, w1, b, g, b, w2, b, g, b,
                                 wsc, bsc, interpret=interp)
            float(jnp.sum(out))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(10):
                out = fused_resblock(x, skip, film, w1, b, g, b, w2, b, g, b,
                                     wsc, bsc, interpret=interp)
            float(jnp.sum(out))
            per = (time.perf_counter() - t0) / 10
            # Numerical parity on the same backend (bf16 matmuls in the
            # kernel vs f32 reference => loose tolerance; catches layout
            # bugs, not rounding).
            ref = resblock_reference(
                jnp.asarray(x, jnp.float32),
                None if skip is None else jnp.asarray(skip, jnp.float32),
                jnp.asarray(film, jnp.float32), w1, b, g, b, w2, b, g, b,
                wsc, bsc)
            err = float(jnp.max(jnp.abs(out - ref))
                        / (jnp.max(jnp.abs(ref)) + 1e-9))
            print(f"{tag}: OK compile {compile_s:.1f}s run {per * 1e3:.3f} ms "
                  f"rel_err {err:.2e} (B={B} {h}x{w} {cin}->{co})", flush=True)
        except Exception as e:
            print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
