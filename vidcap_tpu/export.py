"""AOT decoder export — a self-contained serving artifact (SURVEY.md C18/L7).

`export_decoder` serializes the SAME jitted decode graph live serving runs
(`Captioner.build_decode_fn`) via `jax.export` (StableHLO), with the trained
weights baked in as constants, plus the vocab and the decode configuration.
The resulting directory is a deployable unit: `ExportedCaptioner.load(dir)`
needs no checkpoint, no dataset, no config preset, and no tracing — only a
JAX runtime for one of the platforms the artifact was lowered for.

Why this is the TPU-native shape of "inference scripts": the reference family
ships a frozen TF GraphDef for deployment; the XLA-era equivalent is a
serialized StableHLO module whose compile-at-load is cached, is portable
across jax/jaxlib versions within the export compatibility window, and can be
lowered for several platforms at once (`platforms=("tpu", "cpu")`) so the
artifact produced on a TPU host also runs in a CPU canary.

Layout of an export directory:
    decoder.jaxexp   jax.export serialization (weights embedded as constants)
    vocab.json       Vocab.save payload (id_to_word)
    meta.json        schema version, decode method/shape, platforms, dims
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from vidcap_tpu.config import Config
from vidcap_tpu.data.vocab import Vocab

EXPORT_SCHEMA = 1
_BYTES_NAME = "decoder.jaxexp"
_VOCAB_NAME = "vocab.json"
_META_NAME = "meta.json"


def export_decoder(captioner, out_dir: str, *, batch_size: Optional[int] = 32,
                   method: str = "greedy", beam_width: int = 5,
                   platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize ``captioner``'s decode for one batch shape — or all of them.

    batch_size: a fixed batch baked into the graph, or ``None``/``0`` for a
    BATCH-POLYMORPHIC artifact (``jax.export.symbolic_shape``): the StableHLO
    carries a symbolic leading dim, each concrete batch compiles once at the
    load site (cached), and no padding is ever needed.
    platforms: lowering targets (default: the current backend only). Sampling
    is excluded — its rng-stream semantics live in the Captioner, not the
    graph; export greedy or beam.
    Returns the meta dict (also written to ``out_dir/meta.json``).
    """
    if method not in ("greedy", "beam"):
        raise ValueError(f"exportable methods are greedy/beam, got {method!r}")
    cfg: Config = captioner.cfg
    if cfg.model.use_backbone:
        # pixels-mode export would bake the IRv2 forward into the artifact —
        # supported by jax.export but huge; decode serving runs on features.
        raise ValueError("export serves feature-mode decode; run `extract` "
                         "first for pixel inputs")
    T, D = cfg.data.num_frames, cfg.data.feature_dim
    B: object = batch_size or None
    if B is None:
        B, = jax.export.symbolic_shape("b")

    inner = captioner.build_decode_fn(method, batch_size, beam_width=beam_width)
    params = captioner.params

    # Bake params in as constants: the artifact is self-contained (no
    # checkpoint restore at load time, no pytree-structure contract to keep).
    fn = jax.jit(lambda f, m: inner(params, f, m))
    plats = tuple(platforms) if platforms else None
    exp = jax.export.export(fn, platforms=plats)(
        jax.ShapeDtypeStruct((B, T, D), np.float32),
        jax.ShapeDtypeStruct((B, T), np.float32))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _BYTES_NAME), "wb") as f:
        f.write(exp.serialize())
    captioner.dataset.vocab.save(os.path.join(out_dir, _VOCAB_NAME))
    meta = {
        "schema": EXPORT_SCHEMA,
        "method": method,
        "beam_width": beam_width if method == "beam" else None,
        "batch_size": batch_size or None,   # None ⇒ batch-polymorphic
        "num_frames": T,
        "feature_dim": D,
        "max_len": cfg.decode.max_len,
        "vocab_size": captioner.dataset.vocab.size,
        "platforms": list(exp.platforms),
        "preset_hint": getattr(cfg, "name", None),
    }
    with open(os.path.join(out_dir, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class _VocabOnly:
    """Minimal stand-in for CaptionDataset: serving only reads ``.vocab``."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab


class ExportedCaptioner:
    """Run a `export_decoder` artifact: features → caption strings.

    No model construction, no checkpoint, no tracing — `jax.export.deserialize`
    + one cached compile at first call. Fixed-batch artifacts zero-pad
    (mask=0 rows) up to the exported batch size and chunk larger inputs;
    batch-polymorphic artifacts (batch_size None) run every N as-is.
    """

    def __init__(self, exported, vocab: Vocab, meta: dict):
        self._exported = exported
        self.vocab = vocab
        self.meta = meta
        bs = meta["batch_size"]
        self.batch_size = int(bs) if bs else None   # None ⇒ batch-polymorphic
        self.num_frames = int(meta["num_frames"])
        self.feature_dim = int(meta["feature_dim"])
        # Duck-types the one Dataset attribute the serving stack touches
        # (captioner.dataset.vocab) so CaptionServer / BatchingCaptioner can
        # run off an artifact with no checkpoint or dataset build.
        self.dataset = _VocabOnly(vocab)

    def check_config(self, cfg: Config) -> None:
        """Raise if ``cfg``'s feature shape disagrees with the artifact's —
        the serving pad/mask path sizes batches from the config."""
        want = (cfg.data.num_frames, cfg.data.feature_dim)
        have = (self.num_frames, self.feature_dim)
        if want != have:
            raise ValueError(f"preset expects features {want}, artifact was "
                             f"exported for {have}")

    @classmethod
    def load(cls, export_dir: str) -> "ExportedCaptioner":
        with open(os.path.join(export_dir, _META_NAME)) as f:
            meta = json.load(f)
        if meta.get("schema") != EXPORT_SCHEMA:
            raise ValueError(f"export schema {meta.get('schema')!r} not "
                             f"supported (expected {EXPORT_SCHEMA})")
        with open(os.path.join(export_dir, _BYTES_NAME), "rb") as f:
            exported = jax.export.deserialize(f.read())
        vocab = Vocab.load(os.path.join(export_dir, _VOCAB_NAME))
        return cls(exported, vocab, meta)

    # ------------------------------------------------------------ decoding

    def decode_batch(self, feats: np.ndarray, method: Optional[str] = None,
                     beam_width: Optional[int] = None,
                     frame_mask: Optional[np.ndarray] = None) -> np.ndarray:
        """feats f32[N, T, D] (N ≤ exported batch) → token ids i32[N, L].

        ``method``/``beam_width`` exist for serving-stack compatibility
        (CaptionServer passes them through): the graph is frozen at export
        time, so they are VALIDATED against the artifact, not honored —
        a mismatch is an error, not a silent wrong-method decode."""
        if method is not None and method != self.meta["method"]:
            raise ValueError(f"artifact was exported with method="
                             f"{self.meta['method']!r}, not {method!r}")
        if (self.meta["method"] == "beam" and beam_width is not None
                and beam_width != self.meta["beam_width"]):
            raise ValueError(f"artifact beam_width is "
                             f"{self.meta['beam_width']}, not {beam_width}")
        if feats.ndim != 3:
            # e.g. a pixel-mode (use_backbone) preset handing [N,T,S,S,3]
            # frames to a feature-mode artifact — fail with the remedy, not
            # an unpack error
            raise ValueError(
                f"exported decoders consume [N, T, D] FEATURES, got shape "
                f"{feats.shape}; pixel inputs must go through `extract` "
                "first (export serves feature-mode decode)")
        N, T, D = feats.shape
        if (T, D) != (self.num_frames, self.feature_dim):
            raise ValueError(f"features [{T},{D}] don't match exported "
                             f"[{self.num_frames},{self.feature_dim}]")
        B = self.batch_size
        if B is None:                    # polymorphic: exact shape, no padding
            mb = (np.ones((N, T), np.float32) if frame_mask is None
                  else np.asarray(frame_mask, np.float32))
            return np.asarray(self._exported.call(
                np.ascontiguousarray(feats, np.float32), mb))
        if N > B:
            raise ValueError(f"batch {N} exceeds exported size {B}; chunk "
                             f"inputs or use caption()")
        fb = np.zeros((B, T, D), np.float32)
        mb = np.zeros((B, T), np.float32)
        fb[:N] = feats
        mb[:N] = 1.0 if frame_mask is None else frame_mask
        toks = self._exported.call(fb, mb)
        return np.asarray(toks)[:N]

    def caption(self, feats: np.ndarray) -> List[str]:
        """feats f32[N, T, D] for any N → N caption strings (auto-chunked)."""
        out: List[str] = []
        step = self.batch_size or feats.shape[0] or 1
        for i in range(0, feats.shape[0], step):
            toks = self.decode_batch(feats[i:i + step])
            out.extend(self.vocab.decode_str(row) for row in toks)
        return out
