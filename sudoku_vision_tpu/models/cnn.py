"""Digit classifier CNNs in flax.linen, NHWC, bfloat16-ready.

Model family mirrors the reference's capabilities (NOT its torch code):
  * DigitCNN      — v1 baseline: 2 conv+pool blocks, FC head, dropout
                    (reference ml/model.py:19-44).
  * DigitCNNv3    — stem conv + 5 residual blocks with BatchNorm and
                    squeeze-excitation (reduction 4), spatial dropout,
                    global average pool, FC head; logits are divided by a
                    learned temperature at inference when provided
                    (reference ml/model_v3.py:95-230). MC-dropout
                    uncertainty via forward_with_uncertainty.
  * DigitCNNv3Light — 3 conv blocks (reference ml/model_v3.py:232).
  * EmptyClassifier — tiny binary empty-vs-digit gate (ml/model_v3.py:285).

TPU notes: inputs are (B, 28, 28, 1) NHWC so convs tile cleanly onto the
MXU; `dtype` selects the compute dtype (bfloat16 on TPU) while params stay
float32. 10 classes: 0=empty, 1..9=digit.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_CLASSES = 10


def count_parameters(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


class DigitCNN(nn.Module):
    """v1 baseline CNN (reference ml/model.py:19)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(NUM_CLASSES, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class SEBlock(nn.Module):
    """Squeeze-excitation channel attention (reference ml/model_v3.py:20)."""

    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # (B, C)
        s = nn.Dense(max(1, self.channels // self.reduction),
                     dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class ResidualBlock(nn.Module):
    """conv-BN-relu-conv-BN + SE + projected skip (ml/model_v3.py:40)."""

    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = SEBlock(self.channels, dtype=self.dtype)(y)
        if residual.shape[-1] != self.channels or self.stride != 1:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class SpatialDropout(nn.Module):
    """Channel-wise dropout (reference ml/model_v3.py:80)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0.0)


class DigitCNNv3(nn.Module):
    """v3: residual + SE CNN with calibrated confidence
    (reference ml/model_v3.py:95)."""

    dtype: Any = jnp.float32
    stem: int = 16
    blocks: Sequence[tuple[int, int]] = (
        (16, 1), (32, 2), (32, 1), (64, 2), (64, 1))  # (channels, stride)
    spatial_dropout: float = 0.1
    head_dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, train: bool = False, temperature=None,
                 mc_dropout: bool = False):
        # mc_dropout: stochastic dropout with FROZEN BatchNorm running
        # averages — the MC-dropout inference mode (reference
        # ml/model_v3.py:186 sets only the dropout layers to train).
        # Plain train=True would switch BN to batch statistics, which
        # corrupts predictions on small/padded inference batches.
        drop = train or mc_dropout
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        for ch, st in self.blocks:
            x = ResidualBlock(ch, st, dtype=self.dtype)(x, train=train)
        x = SpatialDropout(self.spatial_dropout)(x, deterministic=not drop)
        x = jnp.mean(x, axis=(1, 2))  # GAP
        x = nn.Dense(128, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.head_dropout, deterministic=not drop)(x)
        logits = nn.Dense(NUM_CLASSES, dtype=self.dtype)(x)
        logits = logits.astype(jnp.float32)
        if temperature is not None:
            logits = logits / temperature
        return logits


class DigitCNNv3Light(nn.Module):
    """Lighter 3-block variant (reference ml/model_v3.py:232)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, temperature=None,
                 mc_dropout: bool = False):
        drop = train or mc_dropout  # see DigitCNNv3.__call__
        x = x.astype(self.dtype)
        for ch, st in ((32, 1), (64, 2), (128, 2)):
            x = nn.Conv(ch, (3, 3), strides=(st, st), padding="SAME",
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(96, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not drop)(x)
        logits = nn.Dense(NUM_CLASSES, dtype=self.dtype)(x).astype(jnp.float32)
        if temperature is not None:
            logits = logits / temperature
        return logits


class EmptyClassifier(nn.Module):
    """Binary empty-vs-digit pre-filter (reference ml/model_v3.py:285)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        for ch in (8, 16):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(2, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def forward_with_uncertainty(
    model: nn.Module, variables, x, rng, n_samples: int = 10
):
    """MC-dropout mean/std of softmax probabilities
    (reference ml/model_v3.py:186)."""

    def one(key):
        # mc_dropout=True: stochastic dropout masks, BatchNorm on its
        # frozen running averages (round-3 fix — the earlier train=True
        # variant silently switched BN to batch statistics, which
        # wrecks accuracy on small or zero-padded inference batches).
        logits = model.apply(
            variables, x, mc_dropout=True, rngs={"dropout": key})
        return jax.nn.softmax(logits, axis=-1)

    probs = jax.vmap(one)(jax.random.split(rng, n_samples))
    return probs.mean(axis=0), probs.std(axis=0)
