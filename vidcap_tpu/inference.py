"""Inference API (SURVEY.md C18, §3.3): restore checkpoint → decode a split on-device.

One jitted decode call per video batch (beams flattened into the batch dim) — the
reference pays a host↔device round-trip per token (SURVEY.md §3.3).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidcap_tpu.config import Config
from vidcap_tpu.data.loader import CaptionDataset
from vidcap_tpu.models.decoding import (beam_decode, greedy_decode,
                                        sample_decode)
from vidcap_tpu.models.model import VidCapModel, create_model, init_params


class Captioner:
    """Bound model + params with jit-compiled greedy/beam/sample batch decoders."""

    def __init__(self, cfg: Config, model: VidCapModel, params,
                 dataset: CaptionDataset, seed: Optional[int] = None,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.dataset = dataset
        self.max_len = cfg.decode.max_len
        self.seed = seed              # None → wall-clock-seeded sampling
        self.mesh = mesh              # jax.sharding.Mesh → multi-chip decode
        self._sample_calls = 0        # fold_in counter: distinct, reproducible
        self._compiled = {}
        self._mesh_params = None      # params replicated onto mesh, lazy
        self._mesh_params_src = None  # identity key: which params it mirrors

    # ------------------------------------------------------------ construction

    @classmethod
    def from_checkpoint(cls, cfg: Config, dataset: CaptionDataset,
                        checkpoint_dir: Optional[str] = None,
                        seed: Optional[int] = None, mesh=None) -> "Captioner":
        model = create_model(cfg, vocab_size=dataset.vocab.size)
        params = init_params(model, cfg, jax.random.key(cfg.train.seed))
        if checkpoint_dir:
            from vidcap_tpu.train.checkpoint import CheckpointManager
            from vidcap_tpu.train.state import create_train_state
            mgr = CheckpointManager(checkpoint_dir)
            if mgr.latest_step() is None:
                # a named dir with nothing in it must NOT silently fall back
                # to random-init weights — caption/serve/export would emit
                # garbage (or bake it into an AOT artifact) with no hint
                # (review r4). checkpoint_dir=None is the explicit
                # fresh-params path (tests, smoke runs).
                mgr.close()
                raise FileNotFoundError(
                    f"no checkpoint found in {checkpoint_dir!r} — train "
                    "first, point --checkpoint-dir at a trained run, or "
                    "pass checkpoint_dir=None for fresh params")
            state = create_train_state(cfg, params)
            try:
                params = mgr.restore(state).params
            except Exception as e:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir!r} does not match the "
                    f"model built from this preset/dataset (vocab size "
                    f"{dataset.vocab.size} — wrong split or synthetic "
                    f"fallback?): {e}") from e
            mgr.close()
        return cls(cfg, model, params, dataset, seed=seed, mesh=mesh)

    @classmethod
    def from_state(cls, cfg: Config, dataset: CaptionDataset, state
                   ) -> "Captioner":
        model = create_model(cfg, vocab_size=dataset.vocab.size)
        return cls(cfg, model, state.params, dataset)

    # ------------------------------------------------------------ jitted decoders

    def _step_fn(self, params, keep_compute_dtype: bool = False):
        def step(state, tok):
            return self.model.apply({"params": params}, state, tok,
                                    keep_compute_dtype,
                                    method=VidCapModel.step)
        return step

    def _get(self, key, builder):
        if key not in self._compiled:
            self._compiled[key] = builder()
        return self._compiled[key]

    def _params_on_mesh(self):
        """Params replicated onto ``self.mesh`` (cached). Checkpoint-restored
        params come back COMMITTED to one device (orbax restores concrete
        arrays), and a committed single-device tree fed to the GSPMD decode
        raises 'incompatible devices' — fresh init_params only worked by
        accident of being uncommitted. One explicit replicated device_put
        covers both. Keyed on the identity of ``self.params`` — the train
        loop reassigns ``captioner.params`` between evals, and a stale cache
        would silently decode with the first-ever weights."""
        if self._mesh_params is None or self._mesh_params_src is not self.params:
            from jax.sharding import NamedSharding, PartitionSpec
            self._mesh_params = jax.device_put(
                self.params, NamedSharding(self.mesh, PartitionSpec()))
            self._mesh_params_src = self.params
        return self._mesh_params

    def _next_sample_rng(self) -> jax.Array:
        """Sampling key: reproducible when self.seed is set (fold_in over a
        per-captioner call counter), wall-clock otherwise (VERDICT r1 weak #7)."""
        self._sample_calls += 1
        if self.seed is not None:
            return jax.random.fold_in(jax.random.key(self.seed),
                                      self._sample_calls)
        return jax.random.key(int(time.time_ns() % (1 << 31)))

    def build_decode_fn(self, method: str, batch_size: int,
                        beam_width: int = 5, temperature: float = 1.0,
                        nbest: int = 1):
        """Jitted XLA decode for a fixed batch shape, with params as an
        argument: ``fn(params, feats, mask)`` (greedy/beam) or
        ``fn(params, feats, mask, rng)`` (sample) → token ids i32[B, L].

        This is the single source of the decode graph — ``decode_batch``
        dispatches it and ``vidcap_tpu.export`` serializes it (jax.export);
        keeping one builder guarantees the exported artifact computes
        exactly what live serving computes. Pallas/sharded routes stay in
        ``decode_batch`` (not portable across backends).

        The batch dim is read off ``f.shape[0]`` inside the trace (identical
        under a concrete jit), so the same builder also lowers with a
        ``jax.export.symbolic_shape`` batch — batch-polymorphic artifacts
        (``export --batch 0``); ``batch_size`` is only the dispatch-cache
        key."""
        del batch_size
        if method == "greedy":
            ee = self.cfg.decode.early_exit
            # tokens-only serving: bf16 logits (argmax exact on the
            # bf16-rounded Dense output) and no log_softmax
            bf16 = self.cfg.model.compute_dtype == "bfloat16"
            return jax.jit(
                lambda p, f, m: greedy_decode(
                    self._step_fn(p, keep_compute_dtype=bf16),
                    self.model.apply({"params": p}, f, m,
                                     method=VidCapModel.init_state),
                    f.shape[0], self.max_len, early_exit=ee,
                    with_logp=False).tokens)

        if method == "sample":
            return jax.jit(
                lambda p, f, m, k: sample_decode(
                    self._step_fn(p),
                    self.model.apply({"params": p}, f, m,
                                     method=VidCapModel.init_state),
                    f.shape[0], self.max_len, k, temperature).tokens)

        if method == "beam":
            K = beam_width
            if not 1 <= nbest <= K:
                raise ValueError(
                    f"nbest={nbest} must be in [1, beam_width={K}] — the "
                    "beam only carries K hypotheses")

            def decode(p, f, m):
                from vidcap_tpu.models.decoding import tile_recurrent
                state = self.model.apply({"params": p}, f, m,
                                         method=VidCapModel.init_state)
                state = tile_recurrent(state, K)

                # bf16-stored logits: bit-identical beams (Dense output is
                # bf16-rounded either way), half the top-k sweep traffic
                bf16 = self.cfg.model.compute_dtype == "bfloat16"

                if self.cfg.decode.int8_vocab_projection:
                    # int8×int8 MXU vocab projection: +10.8% beam caps/s,
                    # quality-preserving on trained checkpoints but NOT
                    # bit-identical — opt-in (ops/int8_proj.py docstring)
                    from vidcap_tpu.ops.int8_proj import (int8_logits,
                                                          quantize_out_proj)
                    W8, wscale, bq = quantize_out_proj(p, self.model.vocab_size)

                    def beam_step(st, tok):
                        st2, h = self.model.apply(
                            {"params": p}, st, tok, K,
                            method=VidCapModel.step_beam_hidden)
                        return st2, int8_logits(h, W8, wscale, bq)
                else:
                    def beam_step(st, tok):
                        return self.model.apply(
                            {"params": p}, st, tok, K, bf16,
                            method=VidCapModel.step_beam)

                from vidcap_tpu.models.decoding import use_finished_pool
                lp = self.cfg.decode.length_penalty
                if use_finished_pool(self.cfg.decode):
                    from vidcap_tpu.models.decoding import beam_decode_pool
                    toks, _ = beam_decode_pool(
                        beam_step, state, batch=f.shape[0],
                        max_len=self.max_len, beam_width=K,
                        length_penalty=lp,
                        early_exit=self.cfg.decode.early_exit,
                        return_all=nbest > 1)
                else:
                    toks, _ = beam_decode(
                        beam_step, state, batch=f.shape[0],
                        max_len=self.max_len, beam_width=K,
                        length_penalty=lp,
                        early_exit=self.cfg.decode.early_exit,
                        return_all=nbest > 1)
                # n-best: the decoders return [B, K, L] sorted best-first
                return toks[:, :nbest] if nbest > 1 else toks
            return jax.jit(decode)

        raise ValueError(f"unknown decode method {method!r}")

    def decode_batch(self, feats: np.ndarray, method: str = "greedy",
                     beam_width: int = 5, temperature: float = 1.0,
                     rng: Optional[jax.Array] = None,
                     frame_mask: Optional[np.ndarray] = None,
                     nbest: int = 1) -> np.ndarray:
        """feats f32[B, T, D] → token ids i32[B, L].

        frame_mask f32[B, T] (1.0 = real frame) masks attention and the pooled
        init for inputs shorter than T (serving pads short feature files).

        nbest > 1 (beam only): the nbest highest-scoring hypotheses per video,
        i32[B, nbest, L] sorted best-first."""
        B = feats.shape[0]
        if nbest > 1 and method != "beam":
            raise ValueError(
                f"nbest={nbest} requires method='beam' (greedy/sample decode "
                "one hypothesis)")
        if nbest > 1 and self.mesh is not None:
            raise ValueError("nbest > 1 is single-device only — the sharded "
                             "decode returns the best hypothesis per video")
        if frame_mask is None:
            frame_mask = np.ones(feats.shape[:2], np.float32)
        mask = jnp.asarray(frame_mask, jnp.float32)

        # multi-chip serving: route greedy/beam through the GSPMD data-sharded
        # decode (parallel/sharding.make_sharded_decode); sampling keeps the
        # single-device path (rng stream semantics)
        if self.mesh is not None and method in ("greedy", "beam"):
            from vidcap_tpu.parallel.sharding import make_sharded_decode

            def build_sharded():
                with self.mesh:
                    return make_sharded_decode(
                        self.model, self.cfg, self.mesh, method=method,
                        beam_width=beam_width)
            fn = self._get(("sharded", method, B, beam_width), build_sharded)
            with self.mesh:
                return np.asarray(fn(self._params_on_mesh(),
                                     jnp.asarray(feats), mask))

        use_pallas = (self.cfg.model.use_pallas_decoder
                      and self.cfg.model.num_lstm_layers == 1
                      and self.cfg.model.use_attention
                      and B % 8 == 0)

        if method == "greedy":
            if use_pallas:
                from vidcap_tpu.ops.pallas_decoder import model_rollout
                fn = self._get(("pgreedy", B), lambda: jax.jit(
                    lambda p, f, m: model_rollout(
                        self.model, p, f, max_len=self.max_len,
                        frame_mask=m).tokens))
                return np.asarray(fn(self.params, feats, mask))
            fn = self._get(("greedy", B, self.cfg.decode.early_exit),
                           lambda: self.build_decode_fn("greedy", B))
            return np.asarray(fn(self.params, feats, mask))

        if method == "sample":
            if use_pallas:
                from vidcap_tpu.ops.pallas_decoder import model_rollout
                fn = self._get(("psample", B, temperature), lambda: jax.jit(
                    lambda p, f, m, s: model_rollout(
                        self.model, p, f, max_len=self.max_len, sample=True,
                        seed=s, temperature=temperature,
                        frame_mask=m).tokens))
                if rng is not None:
                    # maxval must fit int32: (1 << 31) overflows (review r2)
                    seed = jnp.int32(jax.random.randint(
                        rng, (), 0, (1 << 31) - 1))
                elif self.seed is not None:
                    self._sample_calls += 1
                    seed = jnp.int32((self.seed * 1000003
                                      + self._sample_calls) % (1 << 31))
                else:
                    seed = jnp.int32(time.time_ns() % (1 << 31))
                return np.asarray(fn(self.params, feats, mask, seed))
            fn = self._get(("sample", B, temperature),
                           lambda: self.build_decode_fn(
                               "sample", B, temperature=temperature))
            rng = rng if rng is not None else self._next_sample_rng()
            return np.asarray(fn(self.params, feats, mask, rng))

        if method == "beam":
            fn = self._get(("beam", B, beam_width, nbest),
                           lambda: self.build_decode_fn(
                               "beam", B, beam_width=beam_width, nbest=nbest))
            return np.asarray(fn(self.params, feats, mask))

        raise ValueError(f"unknown decode method {method!r}")

    # ------------------------------------------------------------ dataset decode

    def caption_dataset(self, method: str = "greedy", beam_width: int = 5,
                        temperature: float = 1.0, batch_size: int = 32,
                        device_bank: bool = False,
                        nbest: int = 1) -> Dict[str, List[str]]:
        """Decode every video in the dataset → {video_id: [caption string]}.

        nbest > 1 (beam only): each video's list holds its nbest beam
        hypotheses best-first instead of just the winner (the classic n-best
        dump of the sess.run-era caption scripts, SURVEY §3.3).

        device_bank: park the whole feature tensor in HBM once and gather each
        batch's rows on-device (mirrors train's ``device_feature_bank``) — the
        per-batch host→device payload drops from the feature rows to the index
        vector. Bit-exact; feature-mode single-device only (the sharded decode
        shards features over the mesh)."""
        results: Dict[str, List[str]] = {}
        vocab = self.dataset.vocab
        bank = None
        if (device_bank and self.mesh is None
                and self.dataset.features.ndim == 3):
            if getattr(self, "_feature_bank", None) is None:
                self._feature_bank = jax.device_put(
                    jnp.asarray(self.dataset.features))
            bank = self._feature_bank
            # cached like every other compiled fn — a fresh jit per periodic
            # eval would pay a compile-cache lookup over the tunnel each time
            gather = self._get(("bank_gather",),
                               lambda: jax.jit(
                                   lambda b, i: jnp.take(b, i, axis=0)))
        for batch in self.dataset.video_batches(batch_size):
            feats = (gather(bank, jnp.asarray(batch.video_idx))
                     if bank is not None else batch.features)
            toks = self.decode_batch(feats, method=method,
                                     beam_width=beam_width,
                                     temperature=temperature, nbest=nbest)
            for row, vidx in zip(toks, batch.video_idx):
                vid = self.dataset.video_ids[int(vidx)]
                if vid not in results:   # padded tail rows repeat the last video
                    results[vid] = ([vocab.decode_str(r) for r in row]
                                    if nbest > 1 else [vocab.decode_str(row)])
        return results
