"""Inception-ResNet-v2 video-frame encoder in flax (SURVEY.md C2, §3.5;
BASELINE.json configs[2] "on-device frame sampling + Inception-ResNet feature
extraction fused with attention decoder").

The reference uses the TF-slim IRv2 definition with an ImageNet checkpoint. This is
a from-scratch flax implementation of the published architecture (Szegedy et al.,
arXiv:1602.07261): stem → 10× block35 (Inception-A, residual) → reduction-A →
20× block17 (Inception-B) → reduction-B → 10× block8 (Inception-C) → 1×1 conv to
1536 → global average pool. Output: the 1536-d pooled feature the captioner
consumes (SURVEY.md C3).

TPU notes: all convs run in ``compute_dtype`` (bf16 → MXU); each residual block is
wrapped in ``jax.checkpoint`` (remat) so end-to-end fine-tuning fits one chip's HBM
(SURVEY.md §7 hard-part #4). ImageNet weights load from an .npz if present
(``load_backbone_params``); otherwise architecture runs with fresh init and the CLI
warns (offline image has no weights asset).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class ConvBN(nn.Module):
    """conv → batchnorm(inference-style scale/offset) → relu, the IRv2 unit."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_relu: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=self.padding, use_bias=False,
                    dtype=self.compute_dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        # frozen-statistics batchnorm (the reference fine-tunes with frozen BN
        # statistics; trainable scale/offset only) — avoids cross-replica stats
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        offset = self.param("bn_offset", nn.initializers.zeros,
                            (self.features,), jnp.float32)
        x = x.astype(jnp.float32) * scale + offset
        if self.use_relu:
            x = nn.relu(x)
        return x.astype(self.compute_dtype)


class Block35(nn.Module):
    """Inception-A residual block (35×35 grid)."""

    scale: float = 0.17
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cd = self.compute_dtype
        b0 = ConvBN(32, (1, 1), compute_dtype=cd, name="b0_1x1")(x)
        b1 = ConvBN(32, (1, 1), compute_dtype=cd, name="b1_1x1")(x)
        b1 = ConvBN(32, (3, 3), compute_dtype=cd, name="b1_3x3")(b1)
        b2 = ConvBN(32, (1, 1), compute_dtype=cd, name="b2_1x1")(x)
        b2 = ConvBN(48, (3, 3), compute_dtype=cd, name="b2_3x3a")(b2)
        b2 = ConvBN(64, (3, 3), compute_dtype=cd, name="b2_3x3b")(b2)
        mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        up = ConvBN(x.shape[-1], (1, 1), use_relu=False, compute_dtype=cd,
                    name="up")(mixed)
        return nn.relu(x + self.scale * up.astype(x.dtype))


class Block17(nn.Module):
    """Inception-B residual block (17×17 grid)."""

    scale: float = 0.10
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cd = self.compute_dtype
        b0 = ConvBN(192, (1, 1), compute_dtype=cd, name="b0_1x1")(x)
        b1 = ConvBN(128, (1, 1), compute_dtype=cd, name="b1_1x1")(x)
        b1 = ConvBN(160, (1, 7), compute_dtype=cd, name="b1_1x7")(b1)
        b1 = ConvBN(192, (7, 1), compute_dtype=cd, name="b1_7x1")(b1)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = ConvBN(x.shape[-1], (1, 1), use_relu=False, compute_dtype=cd,
                    name="up")(mixed)
        return nn.relu(x + self.scale * up.astype(x.dtype))


class Block8(nn.Module):
    """Inception-C residual block (8×8 grid)."""

    scale: float = 0.20
    use_relu: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cd = self.compute_dtype
        b0 = ConvBN(192, (1, 1), compute_dtype=cd, name="b0_1x1")(x)
        b1 = ConvBN(192, (1, 1), compute_dtype=cd, name="b1_1x1")(x)
        b1 = ConvBN(224, (1, 3), compute_dtype=cd, name="b1_1x3")(b1)
        b1 = ConvBN(256, (3, 1), compute_dtype=cd, name="b1_3x1")(b1)
        mixed = jnp.concatenate([b0, b1], axis=-1)
        up = ConvBN(x.shape[-1], (1, 1), use_relu=False, compute_dtype=cd,
                    name="up")(mixed)
        out = x + self.scale * up.astype(x.dtype)
        return nn.relu(out) if self.use_relu else out


def _maxpool(x, window=(3, 3), strides=(2, 2), padding="VALID"):
    return nn.max_pool(x, window, strides, padding)


class InceptionResNetV2(nn.Module):
    """Returns the 1536-d pooled per-frame feature (pre-logits)."""

    compute_dtype: Any = jnp.bfloat16
    width_mult: float = 1.0          # tiny variants for tests (e.g. 0.125)
    depth: Tuple[int, int, int] = (10, 20, 10)
    remat_every: int = 1             # checkpoint every Nth residual block:
    #   1 = every block (lowest memory), 2 = every second (trade HBM headroom
    #   for less recompute in the bwd pass), 0 = no remat (fastest, most HBM)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: f32[B, H, W, 3] in [-1, 1] → f32[B, 1536·width_mult]."""
        cd = self.compute_dtype
        w = lambda f: max(int(f * self.width_mult), 8)
        x = x.astype(cd)

        # ---- stem (299 → 35 grid)
        x = ConvBN(w(32), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                   name="stem_conv1")(x)
        x = ConvBN(w(32), (3, 3), padding="VALID", compute_dtype=cd,
                   name="stem_conv2")(x)
        x = ConvBN(w(64), (3, 3), compute_dtype=cd, name="stem_conv3")(x)
        x = _maxpool(x)
        x = ConvBN(w(80), (1, 1), padding="VALID", compute_dtype=cd,
                   name="stem_conv4")(x)
        x = ConvBN(w(192), (3, 3), padding="VALID", compute_dtype=cd,
                   name="stem_conv5")(x)
        x = _maxpool(x)

        # mixed_5b (Inception-A entry)
        b0 = ConvBN(w(96), (1, 1), compute_dtype=cd, name="m5b_b0")(x)
        b1 = ConvBN(w(48), (1, 1), compute_dtype=cd, name="m5b_b1a")(x)
        b1 = ConvBN(w(64), (5, 5), compute_dtype=cd, name="m5b_b1b")(b1)
        b2 = ConvBN(w(64), (1, 1), compute_dtype=cd, name="m5b_b2a")(x)
        b2 = ConvBN(w(96), (3, 3), compute_dtype=cd, name="m5b_b2b")(b2)
        b2 = ConvBN(w(96), (3, 3), compute_dtype=cd, name="m5b_b2c")(b2)
        b3 = nn.avg_pool(x, (3, 3), (1, 1), "SAME")
        b3 = ConvBN(w(64), (1, 1), compute_dtype=cd, name="m5b_b3")(b3)
        x = jnp.concatenate([b0, b1, b2, b3], axis=-1)

        # ---- 10× block35, rematerialized per remat_every (param trees are
        # identical with or without nn.checkpoint, so the stride is a pure
        # memory/speed knob — no converter/checkpoint impact)
        def block_cls(cls, i):
            if self.remat_every and i % self.remat_every == 0:
                return nn.checkpoint(cls)
            return cls

        for i in range(self.depth[0]):
            x = block_cls(Block35, i)(compute_dtype=cd,
                                      name=f"block35_{i}")(x)

        # reduction-A (35 → 17)
        r0 = ConvBN(w(384), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                    name="redA_b0")(x)
        r1 = ConvBN(w(256), (1, 1), compute_dtype=cd, name="redA_b1a")(x)
        r1 = ConvBN(w(256), (3, 3), compute_dtype=cd, name="redA_b1b")(r1)
        r1 = ConvBN(w(384), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                    name="redA_b1c")(r1)
        r2 = _maxpool(x)
        x = jnp.concatenate([r0, r1, r2], axis=-1)

        # ---- 20× block17
        for i in range(self.depth[1]):
            x = block_cls(Block17, i)(compute_dtype=cd,
                                      name=f"block17_{i}")(x)

        # reduction-B (17 → 8)
        r0 = ConvBN(w(256), (1, 1), compute_dtype=cd, name="redB_b0a")(x)
        r0 = ConvBN(w(384), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                    name="redB_b0b")(r0)
        r1 = ConvBN(w(256), (1, 1), compute_dtype=cd, name="redB_b1a")(x)
        r1 = ConvBN(w(288), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                    name="redB_b1b")(r1)
        r2 = ConvBN(w(256), (1, 1), compute_dtype=cd, name="redB_b2a")(x)
        r2 = ConvBN(w(288), (3, 3), compute_dtype=cd, name="redB_b2b")(r2)
        r2 = ConvBN(w(320), (3, 3), (2, 2), "VALID", compute_dtype=cd,
                    name="redB_b2c")(r2)
        r3 = _maxpool(x)
        x = jnp.concatenate([r0, r1, r2, r3], axis=-1)

        # ---- 10× block8 (last one unscaled-ish, per the paper: no relu)
        for i in range(self.depth[2] - 1):
            x = block_cls(Block8, i)(compute_dtype=cd, name=f"block8_{i}")(x)
        x = Block8(scale=1.0, use_relu=False, compute_dtype=cd,
                   name=f"block8_{self.depth[2] - 1}")(x)

        # pre-logits
        x = ConvBN(w(1536), (1, 1), compute_dtype=cd, name="conv7b")(x)
        x = x.astype(jnp.float32).mean(axis=(1, 2))          # global avg pool
        return x


def load_backbone_params(backbone: InceptionResNetV2, cfg,
                         weights_path: Optional[str] = None):
    """Load ImageNet weights from .npz if present, else fresh init with a warning
    (SURVEY.md §7.5: 'gate on asset presence')."""
    import sys
    weights_path = weights_path or os.environ.get(
        "VIDCAP_IRV2_WEIGHTS",
        os.path.join(cfg.data.data_dir, "irv2_imagenet.npz"))
    dummy = jnp.zeros((1, cfg.data.frame_size, cfg.data.frame_size, 3),
                      jnp.float32)
    params = backbone.init(jax.random.key(0), dummy)["params"]
    if os.path.exists(weights_path):
        import flax
        flat = dict(np.load(weights_path))
        restored = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
        params = restored
        print(f"[vidcap] loaded backbone weights from {weights_path}",
              file=sys.stderr)
    else:
        print(f"[vidcap] WARNING: no ImageNet weights at {weights_path}; "
              f"backbone is randomly initialized", file=sys.stderr)
    return params


def save_backbone_params(params, path: str) -> None:
    import flax
    flat = flax.traverse_util.flatten_dict(jax.tree_util.tree_map(np.asarray,
                                                                  params))
    np.savez(path, **{"/".join(k): v for k, v in flat.items()})
