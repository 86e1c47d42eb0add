"""Validation of the JAX LPIPS port (fbs_tpu/metrics_lpips.py).

The official pretrained weights are unobtainable offline, so the tests pin
what CAN be pinned here:

1. architecture parity — a hand-written torch twin of the LPIPS(AlexNet)
   graph (the ``lpips`` package's computation, reference
   ``tabulate_imgs.py:49-80``) produces the same distances as the JAX port
   under shared random weights, which validates that loading the official
   state dicts via ``params_from_torch_state_dicts`` reproduces torch LPIPS;
2. metric sanity of the random-feature fallback — zero self-distance,
   symmetry, monotonicity in distortion strength.
"""
import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from fbs_tpu.metrics_lpips import (lpips_distance, params_from_torch_state_dicts,
                                   random_params)

torch = pytest.importorskip("torch")


def _torch_lpips(params, img0, img1):
    """LPIPS(AlexNet) computed in torch with the given param dict."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    convs = [(64, 3, 11, 4, 2), (192, 64, 5, 1, 2), (384, 192, 3, 1, 1),
             (256, 384, 3, 1, 1), (256, 256, 3, 1, 1)]

    def prep(x):
        x = torch.tensor(np.asarray(x, np.float32))[None]
        if x.shape[-1] == 1:
            x = x.repeat(1, 1, 1, 3)
        return x.permute(0, 3, 1, 2) * 2 - 1

    def taps(x):
        x = (x - shift) / scale
        out = []
        for i, (_, _, _, s, p) in enumerate(convs):
            w = torch.tensor(np.asarray(params[f"conv{i}_w"], np.float32))
            b = torch.tensor(np.asarray(params[f"conv{i}_b"], np.float32))
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            out.append(x)
            if i in (0, 1, 4):
                x = F.max_pool2d(x, 3, 2)
        return out

    def unit(f):
        return f / torch.sqrt((f ** 2).sum(1, keepdim=True) + 1e-10)

    with torch.no_grad():
        total = 0.0
        for i, (f0, f1) in enumerate(zip(taps(prep(img0)), taps(prep(img1)))):
            d = (unit(f0) - unit(f1)) ** 2
            w = torch.tensor(np.asarray(params[f"lin{i}_w"], np.float32))
            total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean(dim=(1, 2))
    return float(total)


def test_jax_lpips_matches_torch_twin():
    params = random_params(seed=3)
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)

    ours = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    theirs = _torch_lpips(params, a, b)
    npt.assert_allclose(ours, theirs, rtol=2e-4)


def test_jax_lpips_matches_torch_twin_grayscale():
    params = random_params(seed=5)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (64, 64, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    npt.assert_allclose(float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b))),
                        _torch_lpips(params, a, b), rtol=2e-4)


def test_state_dict_conversion_roundtrip():
    """Torch-layout state dicts load into the identical param dict."""
    params = random_params(seed=7)
    feature_idx = [0, 3, 6, 8, 10]
    alexnet_sd = {}
    lpips_sd = {}
    for i, fi in enumerate(feature_idx):
        alexnet_sd[f"features.{fi}.weight"] = np.asarray(params[f"conv{i}_w"])
        alexnet_sd[f"features.{fi}.bias"] = np.asarray(params[f"conv{i}_b"])
        lpips_sd[f"lin{i}.model.1.weight"] = np.asarray(
            params[f"lin{i}_w"]).reshape(1, -1, 1, 1)
    loaded = params_from_torch_state_dicts(alexnet_sd, lpips_sd)
    for k in params:
        npt.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))


def test_fallback_metric_sanity():
    params = random_params(seed=0)
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)

    assert float(lpips_distance(params, a, a)) == pytest.approx(0.0, abs=1e-6)

    dists = []
    for sigma in (0.05, 0.15, 0.4):
        b = np.clip(a + rng.normal(0, sigma, a.shape).astype(np.float32), 0, 1)
        d01 = float(lpips_distance(params, a, b))
        d10 = float(lpips_distance(params, b, a))
        npt.assert_allclose(d01, d10, rtol=1e-5)
        dists.append(d01)
    assert dists[0] < dists[1] < dists[2]
