r"""Generate a synthetic portrait dataset in the ``celeba_hq.npy`` layout.

The reference obtains CelebA-HQ from an external download and converts it to
``celeba_hq{64,128}.npy`` (``/root/reference/experiments/datasets/celebaHQ/convert.py``).
This environment has no network egress, so this script synthesises a stand-in
portrait dataset with the same container format: procedurally composed
portraits (background gradient, hair, skin-tone head ellipse with shading,
eyes/brows/nose/mouth, shoulders) with randomised geometry, palette, and
illumination.  The images are multi-scale and structured — background
low-frequency fields, sharp facial-feature edges — which is what matters for
exercising the score-model + restoration pipeline at CelebA resolutions.

Output: ``celeba_hq.npy`` uint8 (n, 256, 256, 3); feed it through
``celebahq_convert.py`` to produce ``celeba_hq{64,128,256}.npy`` float32.

Usage::

    python datasets/make_synthetic_faces.py --n 3000
    python datasets/celebahq_convert.py --resolutions 64 256
"""
import argparse
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from scipy.ndimage import gaussian_filter

RES = 256


def _grid():
    y, x = np.mgrid[0:RES, 0:RES].astype(np.float32)
    return x / RES, y / RES  # in [0, 1)


def _ellipse_alpha(x, y, cx, cy, rx, ry, theta=0.0, soft=0.015):
    """Soft-edged rotated ellipse alpha in [0, 1]."""
    ct, st = np.cos(theta), np.sin(theta)
    dx, dy = x - cx, y - cy
    u = (ct * dx + st * dy) / rx
    v = (-st * dx + ct * dy) / ry
    d = np.sqrt(u * u + v * v)
    return np.clip((1.0 - d) / soft, 0.0, 1.0) ** 0.5


def _blend(img, color, alpha):
    return img * (1.0 - alpha[..., None]) + np.asarray(color, np.float32) * alpha[..., None]


def _lowfreq(rng, scale, strength):
    f = gaussian_filter(rng.standard_normal((RES, RES)).astype(np.float32), scale)
    f /= max(np.abs(f).max(), 1e-6)
    return f * strength


def _skin_tone(rng):
    base = rng.uniform(0.25, 0.95)
    return np.array([base * rng.uniform(0.95, 1.05),
                     base * rng.uniform(0.72, 0.85),
                     base * rng.uniform(0.55, 0.72)], np.float32)


def _make_portrait(rng):
    x, y = _grid()

    # Background: directional two-colour gradient + low-frequency field.
    c0 = rng.uniform(0.05, 0.95, 3).astype(np.float32)
    c1 = np.clip(c0 + rng.uniform(-0.5, 0.5, 3), 0.0, 1.0).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    t = np.clip((np.cos(ang) * x + np.sin(ang) * y + 1.0) / 2.0, 0, 1)
    img = c0 * (1 - t[..., None]) + c1 * t[..., None]
    img += _lowfreq(rng, rng.uniform(20, 60), rng.uniform(0.02, 0.12))[..., None]

    cx = 0.5 + rng.uniform(-0.06, 0.06)
    cy = 0.45 + rng.uniform(-0.05, 0.05)
    head_rx = rng.uniform(0.16, 0.22)
    head_ry = head_rx * rng.uniform(1.25, 1.45)
    tilt = rng.uniform(-0.12, 0.12)

    # Shoulders / torso.
    shirt = rng.uniform(0.05, 0.9, 3).astype(np.float32)
    sh_alpha = _ellipse_alpha(x, y, cx, cy + head_ry + rng.uniform(0.38, 0.48),
                              rng.uniform(0.30, 0.42), rng.uniform(0.28, 0.38), soft=0.02)
    img = _blend(img, shirt, sh_alpha)

    # Hair: larger ellipse behind the head (maybe bald: low alpha).
    hair = np.array([rng.uniform(0.02, 0.55)] * 3, np.float32)
    hair *= np.array([1.0, rng.uniform(0.6, 1.0), rng.uniform(0.3, 1.0)], np.float32)
    if rng.random() > 0.1:
        ha = _ellipse_alpha(x, y, cx, cy - head_ry * rng.uniform(0.05, 0.25),
                            head_rx * rng.uniform(1.15, 1.5),
                            head_ry * rng.uniform(1.05, 1.35), tilt, soft=0.03)
        # Long hair: extend downwards on the sides.
        if rng.random() > 0.5:
            ha = np.maximum(ha, _ellipse_alpha(
                x, y, cx, cy + rng.uniform(0.15, 0.3),
                head_rx * rng.uniform(1.3, 1.7), head_ry * rng.uniform(1.2, 1.6),
                tilt, soft=0.04) * (y > cy))
        img = _blend(img, hair, ha)

    # Neck.
    skin = _skin_tone(rng)
    neck = _ellipse_alpha(x, y, cx, cy + head_ry * 1.15, head_rx * 0.45,
                          head_ry * 0.5, 0.0, soft=0.02)
    img = _blend(img, skin * 0.92, neck)

    # Head with vertical shading.
    head_a = _ellipse_alpha(x, y, cx, cy, head_rx, head_ry, tilt)
    shade = 1.0 - 0.25 * np.clip((y - (cy - head_ry)) / (2 * head_ry), 0, 1)
    lit = np.clip(skin[None, None, :] * shade[..., None]
                  + _lowfreq(rng, 30, 0.05)[..., None], 0, 1)
    img = img * (1 - head_a[..., None]) + lit * head_a[..., None]

    # Face forehead hairline (fringe).
    if rng.random() > 0.35:
        fr = _ellipse_alpha(x, y, cx, cy - head_ry * rng.uniform(0.75, 0.95),
                            head_rx * rng.uniform(0.8, 1.05),
                            head_ry * rng.uniform(0.25, 0.45), tilt, soft=0.02)
        img = _blend(img, hair, fr * head_a)

    # Eyes.
    eye_dy = -head_ry * rng.uniform(0.05, 0.18)
    eye_dx = head_rx * rng.uniform(0.38, 0.5)
    eye_rx = head_rx * rng.uniform(0.18, 0.25)
    eye_ry = eye_rx * rng.uniform(0.45, 0.65)
    iris = rng.uniform(0.05, 0.6, 3).astype(np.float32) * np.array([0.7, 0.8, 1.0])
    for sx in (-1, 1):
        ex = cx + sx * eye_dx + tilt * eye_dy * sx
        ey = cy + eye_dy
        img = _blend(img, (0.95, 0.95, 0.95), _ellipse_alpha(x, y, ex, ey, eye_rx, eye_ry, soft=0.02))
        img = _blend(img, iris, _ellipse_alpha(x, y, ex, ey, eye_ry * 0.75, eye_ry * 0.75, soft=0.03))
        img = _blend(img, (0.02, 0.02, 0.02), _ellipse_alpha(x, y, ex, ey, eye_ry * 0.35, eye_ry * 0.35, soft=0.05))
        # Brow.
        img = _blend(img, hair * 0.7, _ellipse_alpha(
            x, y, ex, ey - eye_ry * rng.uniform(1.8, 2.6),
            eye_rx * rng.uniform(0.9, 1.2), eye_ry * rng.uniform(0.25, 0.45),
            tilt + sx * rng.uniform(-0.1, 0.25), soft=0.03))

    # Nose: subtle darker streak.
    img = _blend(img, skin * 0.82, 0.6 * _ellipse_alpha(
        x, y, cx, cy + head_ry * rng.uniform(0.12, 0.22),
        head_rx * 0.08, head_ry * rng.uniform(0.18, 0.28), tilt, soft=0.05))

    # Mouth.
    mouth = np.array([rng.uniform(0.5, 0.85), rng.uniform(0.15, 0.35),
                      rng.uniform(0.2, 0.4)], np.float32)
    img = _blend(img, mouth, _ellipse_alpha(
        x, y, cx, cy + head_ry * rng.uniform(0.5, 0.62),
        head_rx * rng.uniform(0.3, 0.45), head_ry * rng.uniform(0.05, 0.1),
        tilt, soft=0.03))

    # Global illumination field + sensor noise + anti-alias blur.
    img *= 1.0 + _lowfreq(rng, 50, rng.uniform(0.03, 0.1))[..., None]
    img = gaussian_filter(img, (rng.uniform(0.5, 1.2),) * 2 + (0,))
    img += rng.standard_normal(img.shape).astype(np.float32) * rng.uniform(0.003, 0.01)
    return np.clip(img, 0.0, 1.0)


def _worker(seed_count):
    seed, count = seed_count
    rng = np.random.default_rng(seed)
    out = np.zeros((count, RES, RES, 3), np.uint8)
    for i in range(count):
        out[i] = (_make_portrait(rng) * 255).round().astype(np.uint8)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=3000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    parser.add_argument("--out", type=str, default="./datasets/celeba_hq.npy")
    parser.add_argument("--preview", type=str, default="")
    args = parser.parse_args()

    chunk = 100
    jobs = [(args.seed + i, min(chunk, args.n - i * chunk))
            for i in range((args.n + chunk - 1) // chunk)]
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        parts = list(ex.map(_worker, jobs))
    data = np.concatenate(parts)[:args.n]

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.save(args.out, data)
    print(f"saved {args.out}: {data.shape} uint8, mean {data.mean() / 255:.3f}")

    if args.preview:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(4, 4, figsize=(8, 8))
        for i, ax in enumerate(axes.ravel()):
            ax.imshow(data[i])
            ax.axis("off")
        fig.savefig(args.preview, dpi=110, bbox_inches="tight")
        print(f"preview saved to {args.preview}")


if __name__ == "__main__":
    main()
