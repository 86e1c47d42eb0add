r"""Generate a synthetic handwritten-digits dataset in the ``mnist.npz`` layout.

The reference obtains ``mnist.npz`` (keys ``X`` (60000, 784), ``X_test``
(10000, 784), values in [0, 1]) from HuggingFace
(``/root/reference/experiments/datasets/README.md``).  This environment has no
network egress, so this script synthesises an equivalent dataset locally:
digits 0-9 rendered from the system's TrueType fonts at high resolution, then
pushed through the classic MNIST-style augmentation pipeline — random affine
(rotation/shear/scale/translation) composed with an elastic deformation field
(Simard et al. 2003, "Best practices for convolutional neural networks applied
to visual document analysis") — and downsampled to 28x28 with bilinear
anti-aliasing.  Intensity/gamma jitter adds stroke-weight variation.

The output drops into every consumer of ``datasets/mnist.npz`` unchanged
(training, inpainting/supr experiments, tabulators).

Usage::

    python datasets/make_synthetic_digits.py [--ntrain 60000 --ntest 10000]
"""
import argparse
import glob
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from PIL import Image, ImageDraw, ImageFont
from scipy.ndimage import gaussian_filter, map_coordinates

BASE = 64          # hi-res glyph canvas
OUT = 28           # output resolution
_GLYPHS = None     # per-process cache: (nglyphs, 10, BASE, BASE)


def _find_fonts():
    candidates = []
    for pattern in ("/usr/share/fonts/truetype/dejavu/*.ttf",
                    "/opt/venv/lib/python*/site-packages/matplotlib/mpl-data/fonts/ttf/*.ttf"):
        candidates.extend(sorted(glob.glob(pattern)))
    fonts = []
    for path in candidates:
        name = os.path.basename(path)
        # Skip symbol/math faces with no usable digit glyphs.
        if any(s in name for s in ("Sym", "cmex", "cmsy", "Display", "NonUni")):
            continue
        try:
            ImageFont.truetype(path, 40)
        except Exception:
            continue
        fonts.append(path)
    if not fonts:
        raise RuntimeError("no usable TrueType fonts found")
    return fonts


def _render_glyphs():
    """Render each digit in each font, centred on a BASE x BASE canvas."""
    fonts = _find_fonts()
    glyphs = np.zeros((len(fonts), 10, BASE, BASE), np.float32)
    for fi, path in enumerate(fonts):
        font = ImageFont.truetype(path, 44)
        for d in range(10):
            img = Image.new("L", (BASE, BASE), 0)
            draw = ImageDraw.Draw(img)
            left, top, right, bottom = draw.textbbox((0, 0), str(d), font=font)
            draw.text(((BASE - (right - left)) / 2 - left,
                       (BASE - (bottom - top)) / 2 - top), str(d), 255, font=font)
            glyphs[fi, d] = np.asarray(img, np.float32) / 255.0
    return glyphs


def _make_digit(rng, glyphs):
    nfonts = glyphs.shape[0]
    digit = rng.integers(0, 10)
    base = glyphs[rng.integers(0, nfonts), digit]

    # Output pixel grid in 28-space, centred.
    yy, xx = np.mgrid[0:OUT, 0:OUT].astype(np.float32)
    cx = cy = (OUT - 1) / 2.0
    x = xx - cx
    y = yy - cy

    # Random affine in 28-space: rotation, shear, anisotropic scale, shift.
    theta = rng.uniform(-0.25, 0.25)
    shear = rng.uniform(-0.25, 0.25)
    sx = rng.uniform(0.70, 1.00) * rng.uniform(0.9, 1.1)
    sy = rng.uniform(0.70, 1.00) * rng.uniform(0.9, 1.1)
    tx = rng.uniform(-1.5, 1.5)
    ty = rng.uniform(-1.5, 1.5)
    ct, st = np.cos(theta), np.sin(theta)
    # inverse map: output coord -> source coord
    xs = (ct * x + st * y + shear * y) / sx + tx
    ys = (-st * x + ct * y) / sy + ty

    # Elastic deformation (Simard-style) in 28-space.
    alpha = rng.uniform(2.0, 5.0)
    sigma = rng.uniform(3.5, 5.0)
    dx = gaussian_filter(rng.uniform(-1, 1, (OUT, OUT)), sigma) * alpha
    dy = gaussian_filter(rng.uniform(-1, 1, (OUT, OUT)), sigma) * alpha
    xs = xs + dx
    ys = ys + dy

    # Map 28-space -> hi-res base coords (glyph occupies ~44px of BASE).
    scale = BASE / (OUT + 4.0)
    coords = np.stack([(ys + cy + 2.0) * scale, (xs + cx + 2.0) * scale])
    img = map_coordinates(base, coords, order=1, mode="constant", cval=0.0)

    # Stroke-weight / intensity variation.
    img = gaussian_filter(img, rng.uniform(0.4, 0.9))
    img = np.clip(img * rng.uniform(1.2, 2.2), 0.0, 1.0)
    img = img ** rng.uniform(0.7, 1.3)
    img = img * rng.uniform(0.85, 1.0)
    return img.astype(np.float32), digit


def _worker(seed_count):
    seed, count = seed_count
    global _GLYPHS
    if _GLYPHS is None:
        _GLYPHS = _render_glyphs()
    rng = np.random.default_rng(seed)
    imgs = np.zeros((count, OUT * OUT), np.float32)
    labels = np.zeros((count,), np.int32)
    for i in range(count):
        img, digit = _make_digit(rng, _GLYPHS)
        imgs[i] = img.reshape(-1)
        labels[i] = digit
    return imgs, labels


def generate(n, seed, workers):
    chunk = 2000
    jobs = [(seed + i, min(chunk, n - i * chunk))
            for i in range((n + chunk - 1) // chunk)]
    if workers <= 1:
        results = [_worker(j) for j in jobs]
    else:
        with ProcessPoolExecutor(max_workers=workers) as ex:
            results = list(ex.map(_worker, jobs))
    xs = np.concatenate([r[0] for r in results])
    ys = np.concatenate([r[1] for r in results])
    return xs[:n], ys[:n]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ntrain", type=int, default=60000)
    parser.add_argument("--ntest", type=int, default=10000)
    parser.add_argument("--seed", type=int, default=666)
    parser.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    parser.add_argument("--out", type=str, default="./datasets/mnist.npz")
    parser.add_argument("--preview", type=str, default="",
                        help="Also save an 8x8 preview grid PNG here.")
    args = parser.parse_args()

    xs, ys = generate(args.ntrain, args.seed, args.workers)
    xs_test, ys_test = generate(args.ntest, args.seed + 10 ** 6, args.workers)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, X=xs, X_test=xs_test, y=ys, y_test=ys_test)
    print(f"saved {args.out}: X {xs.shape}, X_test {xs_test.shape}, "
          f"mean {xs.mean():.3f}, max {xs.max():.3f}")

    if args.preview:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(8, 8, figsize=(8, 8))
        for i, ax in enumerate(axes.ravel()):
            ax.imshow(xs[i].reshape(OUT, OUT), cmap="gray", vmin=0, vmax=1)
            ax.axis("off")
        fig.savefig(args.preview, dpi=120, bbox_inches="tight")
        print(f"preview saved to {args.preview}")


if __name__ == "__main__":
    main()
