"""Top-level model: (optional CNN backbone) → shared video encoder → caption decoder
+ multitask attribute head, one parameter tree (SURVEY.md L4).

In feature mode (BASELINE.json configs[0,1,3,4]) inputs are precomputed per-frame CNN
features f32[B, T, D]. In end-to-end mode (configs[2]) inputs are raw frame pixels
f32[B, T, 299, 299, 3] and the Inception-ResNet-v2 backbone (models/backbone.py) runs
inside the train graph.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vidcap_tpu.config import Config
from vidcap_tpu.models.decoder import CaptionDecoder, DecoderState
from vidcap_tpu.models.heads import AttributeHead

Array = jax.Array


class VidCapModel(nn.Module):
    cfg: Config
    vocab_size: int
    deterministic: bool = True   # False = training instance (dropout active)

    def setup(self):
        c = self.cfg
        self.compute_dtype = (jnp.bfloat16 if c.model.compute_dtype == "bfloat16"
                              else jnp.float32)
        if c.model.use_backbone:
            from vidcap_tpu.models.backbone import InceptionResNetV2
            self.backbone = InceptionResNetV2(
                compute_dtype=self.compute_dtype,
                remat_every=c.model.backbone_remat_every,
                name="backbone")
        self.decoder = CaptionDecoder(
            cfg=c.model,
            vocab_size=self.vocab_size,
            padded_vocab=max(self.cfg.data.padded_vocab,
                             ((self.vocab_size + 127) // 128) * 128),
            feature_dim=c.data.feature_dim,
            deterministic=self.deterministic,
            name="decoder",
        )
        self.attr_head = AttributeHead(
            num_attributes=c.data.num_attributes,
            hidden_dim=c.model.hidden_dim,
            compute_dtype=self.compute_dtype,
            name="attr_head",
        )

    # ---------------------------------------------------------------- features

    def encode_features(self, inputs: Array) -> Array:
        """pixels [B,T,H,W,3] (e2e mode) or features [B,T,D] → features f32[B,T,D]."""
        if self.cfg.model.use_backbone and inputs.ndim == 5:
            B, T = inputs.shape[:2]
            flat = inputs.reshape((B * T,) + inputs.shape[2:])
            feats = self.backbone(flat)                      # [B*T, D]
            return feats.reshape(B, T, -1)
        return inputs

    # ---------------------------------------------------------------- entry points

    def init_state(self, inputs: Array, frame_mask: Optional[Array] = None
                   ) -> DecoderState:
        return self.decoder.init_state(self.encode_features(inputs), frame_mask)

    def step(self, state: DecoderState, token: Array,
             keep_compute_dtype: bool = False
             ) -> Tuple[DecoderState, Array]:
        return self.decoder.step(state, token, keep_compute_dtype)

    def step_beam(self, state: DecoderState, token: Array, beam_width: int,
                  keep_compute_dtype: bool = False,
                  skip_vocab_mask: bool = False
                  ) -> Tuple[DecoderState, Array]:
        return self.decoder.step_beam(state, token, beam_width,
                                      keep_compute_dtype, skip_vocab_mask)

    def step_beam_hidden(self, state: DecoderState, token: Array,
                         beam_width: int) -> Tuple[DecoderState, Array]:
        return self.decoder.step_beam_hidden(state, token, beam_width)

    def xe_logits(self, inputs: Array, frame_mask: Optional[Array],
                  teacher_inputs: Array) -> Array:
        return self.decoder.xe_logits(self.encode_features(inputs), frame_mask,
                                      teacher_inputs)

    def attribute_logits(self, inputs: Array,
                         frame_mask: Optional[Array] = None) -> Array:
        feats = self.encode_features(inputs)
        if frame_mask is None:
            frame_mask = jnp.ones(feats.shape[:2], dtype=jnp.float32)
        return self.attr_head(self.decoder.encode_video(feats, frame_mask))

    def init_all(self, inputs: Array, frame_mask: Optional[Array],
                 token: Array) -> Tuple[Array, Array]:
        """Initialization entry: touches every parameter once, outside any scan."""
        feats = self.encode_features(inputs)
        logits = self.decoder.init_all(feats, frame_mask, token)
        attr = self.attribute_logits(inputs, frame_mask)
        return logits, attr


def create_model(cfg: Config, vocab_size: int,
                 deterministic: bool = True) -> VidCapModel:
    """deterministic=False builds the training-mode instance (dropout active);
    both instances share the same parameter tree. Dropout inside the decode
    scan reuses one mask across timesteps (variational/recurrent dropout)."""
    return VidCapModel(cfg=cfg, vocab_size=vocab_size,
                       deterministic=deterministic)


def init_params(model: VidCapModel, cfg: Config, rng: jax.Array):
    """Initialize the full parameter tree with tiny dummy shapes."""
    B, T = 2, cfg.data.num_frames
    if cfg.model.use_backbone:
        inputs = jnp.zeros((B, T, cfg.data.frame_size, cfg.data.frame_size, 3),
                           jnp.float32)
    else:
        inputs = jnp.zeros((B, T, cfg.data.feature_dim), jnp.float32)
    token = jnp.zeros((B,), jnp.int32)
    variables = model.init(rng, inputs, None, token, method=VidCapModel.init_all)
    return variables["params"]
