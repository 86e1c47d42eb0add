r"""Inpainting conditional sampling (Gibbs / pMCMC / filter).

TPU-native counterpart of reference ``experiments/imgs/inpainting.py``.
Methods: ``filter``, ``gibbs``, ``gibbs-eb``, ``gibbs-eb-ef``, ``pmcmc``,
``pmcmc-<delta>``.  Run from the ``experiments`` folder.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.imgs.common import base_parser, build_sampler, save_image


def main():
    parser = base_parser("Inpainting.")
    parser.add_argument("--rect_size", type=int, default=15)
    parser.add_argument("--method", type=str, default="gibbs",
                        help="filter | gibbs[-eb][-ef] | pmcmc[-delta]")
    parser.add_argument("--init_method", type=str, default="smoother")
    parser.add_argument("--marg", action="store_true", default=False)
    args = parser.parse_args()

    task = f"inpaint-{args.rect_size}"
    sampler, dataset, (key, data_key), resolution, nchannels = build_sampler(args, task)
    nsteps = args.test_nsteps
    nsamples = args.nsamples

    delta = None
    if "pmcmc" in args.method and len(args.method.split("-")) > 1:
        delta = float(args.method.split("-")[-1])
    eb = "eb" in args.method
    ef = "ef" in args.method

    for k in range(args.ny0s):
        data_key, subkey = jax.random.split(data_key)
        if k < args.start_from:
            continue
        print(f"Running conditional sampler for {k}-th test sample.")
        test_img, test_y0, mask = dataset.sampler(subkey)
        head = f"./imgs/results_inpainting/{args.dataset}-{args.rect_size}-{args.sde}-{args.nparticles}-{k}"
        save_image(head + "-true.png", test_img, nchannels)
        save_image(head + "-corrupt.png",
                   dataset.concat(jnp.zeros(dataset.unobs_shape), test_y0, mask), nchannels)

        restored_imgs = np.zeros((nsamples, resolution, resolution, nchannels))

        if args.method == "filter":
            for i in range(nsamples):
                key, subkey = jax.random.split(key)
                x0, _ = sampler.filter_init(subkey, test_y0, mask, marg_y=args.marg)
                restored = dataset.concat(x0, test_y0, mask)
                restored_imgs[i] = restored
                save_image(head + f"-filter-{i}.png", restored, nchannels)
                print(f"{task} | filter | iter: {i}")
            np.save(head + "-filter", restored_imgs)
        elif "gibbs" in args.method:
            key, subkey = jax.random.split(key)
            x0, us_star = sampler.gibbs_init(subkey, test_y0, mask,
                                             method=args.init_method, marg_y=args.marg)
            bs_star = jnp.zeros((nsteps + 1,), dtype=int)
            for i in range(nsamples):
                key, subkey = jax.random.split(key)
                x0, us_star, bs_star, acc = sampler.gibbs_step(
                    subkey, x0, test_y0, us_star, bs_star, mask,
                    explicit_backward=eb, explicit_final=ef, marg_y=args.marg)
                restored = dataset.concat(x0, test_y0, mask)
                restored_imgs[i] = restored
                save_image(head + f"-{args.method}-{i}.png", restored, nchannels)
                print(f"{task} | Gibbs | iter: {i}, acc: {jnp.mean(acc):.3f}")
            np.save(head + f"-{args.method}", restored_imgs)
        elif "pmcmc" in args.method:
            key, subkey = jax.random.split(key)
            x0, log_ell = jnp.zeros(dataset.unobs_shape), 0.0
            ys = sampler.fwd_ys_sampler(subkey, test_y0)
            for i in range(nsamples):
                key, subkey = jax.random.split(key)
                x0, log_ell, ys, state = sampler.pmcmc_step(subkey, x0, log_ell, ys,
                                                            test_y0, mask, delta=delta)
                restored = dataset.concat(x0, test_y0, mask)
                restored_imgs[i] = restored
                save_image(head + f"-pmcmc-{delta}-{i}.png", restored, nchannels)
                print(f"{task} | pMCMC {delta} | iter: {i}, "
                      f"acc_prob: {float(state.acceptance_prob):.3f}")
            np.save(head + f"-pmcmc-{delta}", restored_imgs)
        else:
            raise ValueError(f"Unknown method {args.method}")


if __name__ == "__main__":
    main()
