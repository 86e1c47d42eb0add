"""Cross-platform TPU lowering gate for the fused ResBlock kernel.

``jax.export(platforms=['tpu'])`` runs the full client-side Pallas->Mosaic
lowering on CPU, which is exactly the stage that rejected round 3's first
kernel on the real chip (block shapes whose last two dims were neither
(8, 128)-aligned nor full-size — e.g. the FiLM operand carrying the batch
tile bb=13 in its sublane slot).  This test locks the two lowering classes:
a bb=8 instance and a bb=13/4 instance (batch 104 divisors), one with a
skip input and channel-changing shortcut.

The numerical parity of the kernel is tested separately
(tests/test_nn.py::test_fused_resblock_unet_matches_plain); this gate is
about *lowerability* for the TPU target, which interpret-mode tests cannot
see.
"""
import functools

import jax
import jax.numpy as jnp
import pytest

from fbs_tpu.ops.resblock_pallas import fused_resblock

B = 104  # the flagship sweep's batch (N=100 + conditional + padding)

# (tag, h, w, cin_x, cin_skip, cout) — dim-64 (1,2,4) UNet instances that
# exercise both batch-tile classes and the skip/shortcut path.
SHAPES = [
    ("down0", 28, 28, 64, 0, 64),        # bb = 8
    ("mid", 7, 7, 256, 0, 256),          # bb = 8 via row-alignment rule
    ("up0_skip", 28, 28, 128, 64, 64),   # skip + shortcut, small tile
]


@pytest.mark.parametrize("tag,h,w,cx,cs,co", SHAPES)
def test_fused_resblock_lowers_for_tpu(tag, h, w, cx, cs, co):
    x = jnp.zeros((B, h, w, cx), jnp.bfloat16)
    skip = jnp.zeros((B, h, w, cs), jnp.bfloat16) if cs else None
    film = jnp.zeros((B, 2 * co), jnp.bfloat16)
    cin = cx + cs
    w1 = jnp.zeros((3, 3, cin, co))
    w2 = jnp.zeros((3, 3, co, co))
    b = jnp.zeros((co,))
    g = jnp.ones((co,))
    wsc = jnp.zeros((cin, co)) if cin != co else None
    bsc = jnp.zeros((co,)) if cin != co else None
    f = functools.partial(fused_resblock, groups=8, eps=1e-6,
                          dot_dtype=jnp.bfloat16, interpret=False)
    exported = jax.export.export(jax.jit(f), platforms=["tpu"])(
        x, skip, film, w1, b, g, b, w2, b, g, b, wsc, bsc)
    assert exported.platforms == ("tpu",)
