"""End-to-end artifact-contract smoke test.

Runs the real ``experiments/imgs/inpainting.py`` entry point on a tiny
synthetic dataset + randomly initialised checkpoint, then feeds its artifacts
to ``experiments/tabulators/tabulate_imgs.py`` and asserts a PSNR/SSIM row
comes out — the contract the reference establishes at
``/root/reference/experiments/imgs/inpainting.py:215-216`` (``-true.npz``)
and consumes at ``/root/reference/experiments/tabulators/tabulate_imgs.py:30-80``.
"""
import os
import sys

import jax
import numpy as np
import pytest


def _run_main(module, argv):
    old = sys.argv
    sys.argv = [module.__file__] + argv
    try:
        module.main()
    finally:
        sys.argv = old


@pytest.mark.parametrize("method", ["gibbs-eb"])
def test_inpainting_then_tabulate(tmp_path, monkeypatch, capsys, method):
    from fbs_tpu.nn import UNet, make_st_nn

    monkeypatch.chdir(tmp_path)

    # Tiny dataset in the reference mnist.npz layout (X/X_test, (n, 784)).
    os.makedirs("datasets")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.0, 1.0, (8, 784)).astype(np.float32)
    np.savez("datasets/mnist.npz", X=imgs, X_test=imgs)

    # Randomly initialised checkpoint matching the script's UNet config.
    os.makedirs("checkpoints")
    unet = UNet(dt=2.0 / 200, dim=8, upsampling="pixel_shuffle")
    param, _, _ = make_st_nn(jax.random.PRNGKey(0), unet, (28, 28, 1), batch_size=2)
    np.savez("checkpoints/mnist_lin_0.npz", param=np.asarray(param),
             ema_param=np.asarray(param))

    from experiments.imgs import inpainting
    _run_main(inpainting, [
        "--ny0s", "1", "--nsamples", "2", "--test_nsteps", "4",
        "--nparticles", "4", "--unet_dim", "8", "--test_epoch", "0",
        "--method", method,
    ])

    head = f"./imgs/results_inpainting/mnist-15-lin-4-0"
    truth = np.load(head + "-true.npz")
    assert truth["test_img"].shape == (28, 28, 1)
    assert os.path.exists(head + f"-{method}.npy")
    assert os.path.exists(head + "-gibbs-init.npy")
    assert np.load(head + f"-{method}.npy").shape == (2, 28, 28, 1)

    from experiments.tabulators import tabulate_imgs
    capsys.readouterr()
    _run_main(tabulate_imgs, [
        "--task", "inpainting", "--dataset", "mnist", "--size", "15",
        "--nparticles", "4", "--method", method, "--ny0s", "1",
        "--results_dir", "./imgs/results_inpainting",
    ])
    out = capsys.readouterr().out
    assert "PSNR" in out and "SSIM" in out, out


@pytest.mark.parametrize("method", ["gibbs-eb", "filter", "pmcmc-0.01"])
def test_inpainting_multi_y0_dispatch(tmp_path, monkeypatch, capsys, method):
    """The vmapped-over-y0 loop (--y0s_per_dispatch) writes the same artifact
    contract as the sequential loop, for every method family."""
    from fbs_tpu.nn import UNet, make_st_nn

    monkeypatch.chdir(tmp_path)

    os.makedirs("datasets")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.0, 1.0, (8, 784)).astype(np.float32)
    np.savez("datasets/mnist.npz", X=imgs, X_test=imgs)

    os.makedirs("checkpoints")
    unet = UNet(dt=2.0 / 200, dim=8, upsampling="pixel_shuffle")
    param, _, _ = make_st_nn(jax.random.PRNGKey(0), unet, (28, 28, 1), batch_size=2)
    np.savez("checkpoints/mnist_lin_0.npz", param=np.asarray(param),
             ema_param=np.asarray(param))

    from experiments.imgs import inpainting
    _run_main(inpainting, [
        "--ny0s", "2", "--nsamples", "4", "--test_nsteps", "4",
        "--nparticles", "4", "--unet_dim", "8", "--test_epoch", "0",
        "--method", method, "--y0s_per_dispatch", "2",
        "--sweeps_per_dispatch", "2",
    ])

    tag = "pmcmc-0.01" if "pmcmc" in method else method
    for k in (0, 1):
        head = f"./imgs/results_inpainting/mnist-15-lin-4-{k}"
        assert np.load(head + "-true.npz")["test_img"].shape == (28, 28, 1)
        stack = np.load(head + f"-{tag}.npy")
        assert stack.shape == (4, 28, 28, 1)
        assert np.isfinite(stack).all()


def test_timechunked_gibbs_sweep_bitwise():
    """gibbs_step_timechunked (bounded dispatches, chunked CSMC scan) is
    bitwise identical to the single-dispatch gibbs_step under shared keys."""
    import jax.numpy as jnp
    from fbs_tpu.applications import RestorationSampler
    from fbs_tpu.data import ImageRestore
    from fbs_tpu.sdes import StationaryLinLinearSDE

    key = jax.random.PRNGKey(42)
    xs = jax.random.uniform(key, (4, 8, 8, 1))
    dataset = ImageRestore.from_array(xs, task="inpaint-3")
    test_img, y0, mask = dataset.sampler(jax.random.PRNGKey(1))

    T = 2.0
    sde = StationaryLinLinearSDE(beta_min=0.02, beta_max=5.0, t0=0.0, T=T)

    def drift_override(uv, t):
        return -sde.drift(uv, T - t) - 0.5 * uv

    sampler = RestorationSampler(dataset=dataset, sde=sde, nn_score=None,
                                 param=None, T=T, nsteps=7, nparticles=5,
                                 reverse_drift_override=drift_override)

    x0 = jnp.zeros(dataset.unobs_shape)
    us_star = jnp.zeros((8, *dataset.unobs_shape))
    bs_star = jnp.zeros((8,), dtype=int)
    k = jax.random.PRNGKey(7)

    ref = sampler.gibbs_step(k, x0, y0, us_star, bs_star, mask,
                             explicit_backward=True, explicit_final=False)
    for spd in (3, 7):  # ragged and exact chunkings
        got = sampler.gibbs_step_timechunked(k, x0, y0, us_star, bs_star, mask,
                                             steps_per_dispatch=spd,
                                             explicit_final=False)
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), spd

    ref_ef = sampler.gibbs_step(k, x0, y0, us_star, bs_star, mask,
                                explicit_backward=True, explicit_final=True)
    got_ef = sampler.gibbs_step_timechunked(k, x0, y0, us_star, bs_star, mask,
                                            steps_per_dispatch=4,
                                            explicit_final=True)
    for a, b in zip(ref_ef, got_ef):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("script,tag", [("inpainting_csgm", "csgm"),
                                        ("inpainting_twisted", "twisted")])
def test_oneshot_baselines_sample_batched(tmp_path, monkeypatch, script, tag):
    """csgm/twisted with --samples_per_dispatch: vmapped sample batches write
    the same artifact contract."""
    import importlib
    from fbs_tpu.nn import UNet, make_st_nn

    monkeypatch.chdir(tmp_path)
    os.makedirs("datasets")
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.0, 1.0, (8, 784)).astype(np.float32)
    np.savez("datasets/mnist.npz", X=imgs, X_test=imgs)
    os.makedirs("checkpoints")
    unet = UNet(dt=2.0 / 200, dim=8, upsampling="pixel_shuffle")
    param, _, _ = make_st_nn(jax.random.PRNGKey(0), unet, (28, 28, 1), batch_size=2)
    np.savez("checkpoints/mnist_lin_0.npz", param=np.asarray(param),
             ema_param=np.asarray(param))

    mod = importlib.import_module(f"experiments.imgs.{script}")
    _run_main(mod, [
        "--ny0s", "1", "--nsamples", "3", "--test_nsteps", "4",
        "--nparticles", "4", "--unet_dim", "8", "--test_epoch", "0",
        "--samples_per_dispatch", "2",
    ])
    stack = np.load(f"./imgs/results_inpainting/mnist-15-lin-4-0-{tag}.npy")
    assert stack.shape == (3, 28, 28, 1)
    assert np.isfinite(stack).all()


@pytest.mark.parametrize("task,script_name,extra", [
    ("inpaint", "inpainting", ["--rect_size", "32"]),
    ("supr", "supr", ["--rate", "2"]),
])
def test_celeba64_entry_contract(tmp_path, monkeypatch, capsys, task, script_name, extra):
    """The CelebA-64 sampling entries (the reference's celeba table configs,
    ``/root/reference/experiments/bashes/imgs_gibbs.sh:21-39``) run end to
    end: CelebAHQRestore load, 64^2 mask algebra, multi-y0 dispatch, the
    artifact contract, and the tabulator row including the LPIPS column
    (non-MNIST resolutions compute it)."""
    from fbs_tpu.nn import UNet, make_st_nn

    monkeypatch.chdir(tmp_path)

    os.makedirs("datasets")
    rng = np.random.default_rng(0)
    np.save("datasets/celeba_hq64.npy",
            rng.uniform(0.0, 1.0, (8, 64, 64, 3)).astype(np.float32))

    os.makedirs("checkpoints")
    unet = UNet(dt=2.0 / 200, dim=8, upsampling="pixel_shuffle")
    param, _, _ = make_st_nn(jax.random.PRNGKey(0), unet, (64, 64, 3), batch_size=2)
    np.savez("checkpoints/celeba-64_lin_0.npz", param=np.asarray(param),
             ema_param=np.asarray(param))

    import importlib
    module = importlib.import_module(f"experiments.imgs.{script_name}")
    _run_main(module, [
        "--dataset", "celeba-64", "--ny0s", "2", "--nsamples", "2",
        "--test_nsteps", "4", "--nparticles", "2", "--unet_dim", "8",
        "--test_epoch", "0", "--method", "gibbs-eb-ef",
        "--y0s_per_dispatch", "2", "--sweeps_per_dispatch", "1", *extra,
    ])

    size = "32" if task == "inpaint" else "2"
    results_dir = "results_inpainting" if task == "inpaint" else "results_supr"
    for k in range(2):
        head = f"./imgs/{results_dir}/celeba-64-{size}-lin-2-{k}"
        truth = np.load(head + "-true.npz")
        assert truth["test_img"].shape == (64, 64, 3)
        assert np.load(head + "-gibbs-eb-ef.npy").shape == (2, 64, 64, 3)

    from experiments.tabulators import tabulate_imgs
    capsys.readouterr()
    _run_main(tabulate_imgs, [
        "--task", "inpainting" if task == "inpaint" else "supr",
        "--dataset", "celeba-64", "--size", size,
        "--nparticles", "2", "--method", "gibbs-eb-ef", "--ny0s", "2",
        "--results_dir", f"./imgs/{results_dir}",
    ])
    out = capsys.readouterr().out
    assert "PSNR" in out and "SSIM" in out, out
    assert "lpips" in out.lower(), out


def test_tabulator_default_block_sweep(tmp_path, monkeypatch, capsys):
    """`tabulate_imgs.py` with no flags sweeps every dataset block —
    MNIST at inpaint-15/N in {10,100} and CelebA-64 at inpaint-32/
    N in {2,10} (the reference's table grid,
    /root/reference/experiments/bashes/imgs_gibbs.sh:21-39) — so CelebA
    cells appear in the default tabulation as soon as artifacts exist."""
    rng = np.random.default_rng(0)

    def fake_cell(prefix, shape):
        img = rng.uniform(0.0, 1.0, shape).astype(np.float32)
        np.savez(str(tmp_path / f"{prefix}-true.npz"), test_img=img)
        np.save(str(tmp_path / f"{prefix}-gibbs-eb-ef.npy"),
                np.stack([img, np.clip(img + 0.1, 0, 1)]))

    fake_cell("mnist-15-lin-10-0", (28, 28, 1))
    fake_cell("celeba-64-32-lin-2-0", (64, 64, 3))

    from experiments.tabulators import tabulate_imgs
    capsys.readouterr()
    _run_main(tabulate_imgs, [
        "--task", "inpainting", "--method", "gibbs-eb-ef",
        "--results_dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "mnist inpainting-15 gibbs-eb-ef N=10" in out, out
    assert "celeba-64 inpainting-32 gibbs-eb-ef N=2" in out, out
