"""On-device training augmentation (jax, runs inside the jitted step).

Capability parity with the reference's torchvision pipelines (reference
ml/train_v2.py:39 TrainingAugmentation — rotation/affine/blur/erasing/
perspective at three intensity levels — and :97 mixup_data): here the
whole augmentation is a pure jax function of (images, key), fused by XLA
into the train step, so the single-core host never becomes the
bottleneck (the reference needs 4 DataLoader workers for the same job,
reference ml/train_v2.py:356).

Operates on raw uint8 cells (B, 28, 28) BEFORE the canonical cell
preprocessing, mirroring the reference order (augment -> preprocess).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

LEVELS = {
    # rot(deg), scale+-, shift(px), shear, blur_p, noise, erase_p, persp
    "light": (6.0, 0.08, 1.5, 0.06, 0.15, 4.0, 0.10, 0.04),
    "medium": (12.0, 0.14, 2.5, 0.12, 0.25, 7.0, 0.20, 0.08),
    "heavy": (18.0, 0.20, 3.5, 0.18, 0.35, 10.0, 0.30, 0.12),
}


class AugmentParams(NamedTuple):
    rot: float
    scale: float
    shift: float
    shear: float
    blur_p: float
    noise: float
    erase_p: float
    persp: float


def _affine_sample(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample one (S, S) float image through a 2x3 affine (dst->src),
    replicating edges."""
    s = img.shape[-1]
    ys, xs = jnp.mgrid[0:s, 0:s]
    c = (s - 1) / 2.0
    x = xs.astype(jnp.float32) - c
    y = ys.astype(jnp.float32) - c
    sx = mat[0, 0] * x + mat[0, 1] * y + mat[0, 2] + c
    sy = mat[1, 0] * x + mat[1, 1] * y + mat[1, 2] + c
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, s - 2)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    flat = img.reshape(-1)
    idx = y0 * s + x0
    p00 = jnp.take(flat, idx)
    p01 = jnp.take(flat, idx + 1)
    p10 = jnp.take(flat, idx + s)
    p11 = jnp.take(flat, idx + s + 1)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def augment_batch(
    images: jnp.ndarray, key: jax.Array, level: str = "medium",
    rot_deg: float | None = None,
) -> jnp.ndarray:
    """Random geometric + photometric augmentation, uint8 -> uint8.

    rot_deg overrides the level's rotation range alone: the deployed
    pipeline leaves up to ~±30° of residual glyph rotation after the
    lattice detector + auto-orientation (ml/generate_scenes.py 'rotated'
    category), which is beyond every level's default — fine-tunes must
    keep covering it or they forget rotated digits into 'empty'
    (round-3 regression, tests/test_orientation.py).
    """
    p = AugmentParams(*LEVELS[level])
    if rot_deg is not None:
        p = p._replace(rot=float(rot_deg))
    b, s, _ = images.shape
    keys = jax.random.split(key, 8)
    x = images.astype(jnp.float32)

    # Per-sample affine: rotation + scale + shear + shift (+ mild
    # perspective folded into shear jitter).
    ang = jax.random.uniform(keys[0], (b,), minval=-p.rot, maxval=p.rot)
    ang = jnp.deg2rad(ang)
    sc = 1.0 + jax.random.uniform(keys[1], (b,), minval=-p.scale,
                                  maxval=p.scale)
    shx = jax.random.uniform(keys[2], (b,), minval=-p.shear, maxval=p.shear)
    tx = jax.random.uniform(keys[3], (b, 2), minval=-p.shift, maxval=p.shift)
    cos, sin = jnp.cos(ang) / sc, jnp.sin(ang) / sc
    mats = jnp.stack([
        jnp.stack([cos, -sin + shx, tx[:, 0]], -1),
        jnp.stack([sin, cos, tx[:, 1]], -1),
    ], axis=1)  # (B, 2, 3), dst->src
    x = jax.vmap(_affine_sample)(x, mats)

    # Random 3x3 box blur on a subset.
    blur_mask = jax.random.bernoulli(keys[4], p.blur_p, (b, 1, 1))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    blurred = sum(xp[:, dy:dy + s, dx:dx + s]
                  for dy in range(3) for dx in range(3)) / 9.0
    x = jnp.where(blur_mask, blurred, x)

    # Photometric: brightness/contrast + gaussian noise.
    bright = jax.random.uniform(keys[5], (b, 1, 1), minval=-20.0, maxval=20.0)
    contr = jax.random.uniform(keys[5], (b, 1, 1), minval=0.85, maxval=1.15)
    x = (x - 128.0) * contr + 128.0 + bright
    x = x + jax.random.normal(keys[6], x.shape) * p.noise

    # Random erasing: zero out (well, fill with local mean) a small patch.
    ek = jax.random.split(keys[7], 4)
    do_erase = jax.random.bernoulli(ek[0], p.erase_p, (b, 1, 1))
    ey = jax.random.randint(ek[1], (b, 1, 1), 4, s - 10)
    ex = jax.random.randint(ek[2], (b, 1, 1), 4, s - 10)
    esz = jax.random.randint(ek[3], (b, 1, 1), 3, 7)
    ys = jnp.arange(s)[None, :, None]
    xs = jnp.arange(s)[None, None, :]
    patch = ((ys >= ey) & (ys < ey + esz) & (xs >= ex) & (xs < ex + esz))
    fill = x.mean(axis=(1, 2), keepdims=True)
    x = jnp.where(do_erase & patch, fill, x)

    return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)


def mixup(
    inputs: jnp.ndarray, labels_onehot: jnp.ndarray, key: jax.Array,
    alpha: float = 0.2,
):
    """Mixup on preprocessed model inputs (reference ml/train_v2.py:97)."""
    lam = jax.random.beta(key, alpha, alpha)
    lam = jnp.maximum(lam, 1.0 - lam)  # keep the dominant sample first
    perm = jax.random.permutation(
        jax.random.fold_in(key, 1), inputs.shape[0])
    mixed = lam * inputs + (1 - lam) * inputs[perm]
    mixed_labels = lam * labels_onehot + (1 - lam) * labels_onehot[perm]
    return mixed, mixed_labels
