"""CLI entry points mirroring the reference's public API (SURVEY.md L7,
BASELINE.json: "Public API mirrors the reference's train/sample/caption entry points").

  python -m vidcap_tpu train   --preset msvd_greedy [--steps N] [--resume]
  python -m vidcap_tpu sample  --preset scst_cider  [--temperature T]
  python -m vidcap_tpu caption --preset msrvtt_attn_beam5 [--beam 5] [--out out.json]
  python -m vidcap_tpu eval    --preset msvd_greedy --captions out.json
  python -m vidcap_tpu extract --preset e2e_irv2 --videos dir/ (feature precompute, C3)

`train` runs the preset's stage (xe | scst | e2e); `caption` decodes the eval split
with the preset's decode method and writes {video_id: [caption]} json; `sample`
decodes with multinomial sampling (the reference's `sample` script).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Optional

from vidcap_tpu.config import Config, apply_overrides, get_preset


def _preset(args) -> Config:
    """Preset + generic ``--set section.field=value`` overrides (every
    subcommand accepts them — config.apply_overrides)."""
    return apply_overrides(get_preset(args.preset),
                           getattr(args, "set", None))


def _load_dataset(cfg: Config, split: str = "train"):
    from vidcap_tpu.data.loader import CaptionDataset
    # e2e presets (use_backbone) train on raw frames, so the synthetic
    # fixture must produce pixels [N, T, S, S, 3], not feature vectors
    pixels = cfg.model.use_backbone
    if cfg.data.dataset == "synthetic":
        return CaptionDataset.synthetic(cfg.data, pixels=pixels)
    load = (CaptionDataset.from_frame_files if pixels
            else CaptionDataset.from_files)
    # corpora with no test split (e.g. train/val only) evaluate on val —
    # silently dropping to the SYNTHETIC fixture here would build the model
    # at the wrong vocab and fail checkpoint restore with a confusing
    # structure error
    splits = [split] + (["val"] if split == "test" else [])
    for i, s in enumerate(splits):
        try:
            ds = load(cfg.data, split=s)
            if i > 0:
                print(f"[vidcap] no {split!r} split on disk — using {s!r}",
                      file=sys.stderr)
            return ds
        except FileNotFoundError as e:
            err = e
    print(f"[vidcap] dataset assets not found ({err}); "
          f"falling back to the synthetic fixture", file=sys.stderr)
    return CaptionDataset.synthetic(cfg.data, pixels=pixels)


def cmd_train(args) -> int:
    from vidcap_tpu.parallel.distributed import initialize_multihost
    initialize_multihost()
    cfg = _preset(args)
    # --steps accepts one count for every stage or a comma list matched to
    # --stages (e.g. --stages xe,scst --steps 2500,1000)
    per_stage_steps = None
    if args.steps:
        counts = [int(s) for s in str(args.steps).split(",")]
        if len(counts) > 1:
            per_stage_steps = counts
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, num_steps=counts[0]))
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))
    if args.eval_every is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           eval_every=args.eval_every))
    if args.log_every is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           log_every=args.log_every))
    if args.checkpoint_dir:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           checkpoint_dir=args.checkpoint_dir))
    if args.feature_bank:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           device_feature_bank=True))
    # --steps-per-dispatch mirrors --steps: one K for every stage or a comma
    # list matched to --stages (e.g. --stages xe,scst --steps-per-dispatch
    # 25,1 — measured: XE gains from K=25 while SCST is fastest at K=1)
    per_stage_k = None
    if args.steps_per_dispatch is not None:
        ks = [int(s) for s in str(args.steps_per_dispatch).split(",")]
        if len(ks) > 1:
            per_stage_k = ks
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, steps_per_dispatch=ks[0]))
    # --sharded: multi-chip training over all visible chips (SURVEY.md §2.3
    # "DP core"): batch shards over the mesh's data axis, grads psum over ICI,
    # the optional model axis carries the vocab-TP seam
    mesh = _serving_mesh(cfg, args.sharded)
    from vidcap_tpu.train.loop import train
    from vidcap_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(path=args.log_file)
    dataset = _load_dataset(cfg)
    val_dataset = None
    if cfg.data.dataset != "synthetic":
        from vidcap_tpu.data.loader import CaptionDataset
        try:
            val_dataset = CaptionDataset.from_files(cfg.data, split="val")
        except FileNotFoundError:
            pass   # periodic eval falls back to the train split

    stages = (args.stages.split(",") if args.stages else [cfg.train.stage])
    if per_stage_steps is not None and len(per_stage_steps) != len(stages):
        raise SystemExit(f"--steps lists {len(per_stage_steps)} counts for "
                         f"{len(stages)} stages")
    if per_stage_k is not None and len(per_stage_k) != len(stages):
        raise SystemExit(f"--steps-per-dispatch lists {len(per_stage_k)} "
                         f"values for {len(stages)} stages")
    # staged schedule (SURVEY.md §0.5): e.g. --stages xe,scst runs XE then
    # SCST fine-tuning, resuming each stage from the previous checkpoint.
    # num_steps is cumulative (the loop trains from the restored step).
    total = 0
    for i, stage in enumerate(stages):
        total += (per_stage_steps[i] if per_stage_steps is not None
                  else cfg.train.num_steps)
        scfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, stage=stage.strip(), num_steps=total,
                steps_per_dispatch=(per_stage_k[i]
                                    if per_stage_k is not None
                                    else cfg.train.steps_per_dispatch)))
        train(scfg, dataset=dataset, logger=logger,
              resume=args.resume or i > 0, val_dataset=val_dataset, mesh=mesh)
    return 0


def _decode_split(cfg: Config, method: str, beam: int, temperature: float,
                  checkpoint_dir: Optional[str], out_path: Optional[str],
                  seed: Optional[int] = None, nbest: int = 1,
                  split: str = "test") -> dict:
    from vidcap_tpu.inference import Captioner
    dataset = _load_dataset(cfg, split=split)
    cap = Captioner.from_checkpoint(cfg, dataset,
                                    checkpoint_dir or cfg.train.checkpoint_dir,
                                    seed=seed)
    # NOTE: no --feature-bank here by design — for a ONE-SHOT pass the bank
    # ships the same total bytes as per-batch transfer and adds gather
    # dispatches (measured slower: 96s vs 75s warm, 500 videos, greedy B=32).
    # Banking decode pays only on REPEATED decodes of one dataset → it's
    # wired into train-time periodic eval (run_validation) instead.
    results = cap.caption_dataset(method=method, beam_width=beam,
                                  temperature=temperature, nbest=nbest)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[vidcap] wrote {len(results)} captions → {out_path}",
              file=sys.stderr)
    else:
        for vid, caps in list(results.items())[:20]:
            print(f"{vid}\t{caps[0]}")
    return results


def _caption_inputs(cfg: Config, args) -> int:
    """caption --inputs FILE|DIR ... — one-shot captioning of arbitrary
    feature ``.npy`` files or raw videos (decoded host-side via cv2, encoded
    by the IRv2 backbone), no dataset layout required. The reference's
    caption script served the same need via hand-edited feature paths
    (SURVEY §3.3); `serve` offers it interactively, this is the batch form.
    Output keys are basenames (full path on collision)."""
    import os

    import numpy as np

    from vidcap_tpu.inference import Captioner
    from vidcap_tpu.serving import _VIDEO_EXTS, _FeatureLoader, _pad_batch

    method = args.method or cfg.decode.method
    nbest = getattr(args, "nbest", 1) or 1
    if nbest > 1 and method != "beam":
        raise SystemExit(f"--nbest {nbest} requires --method beam")
    from_export = getattr(args, "from_export", None)
    exts = ((".npy",) if from_export else _VIDEO_EXTS + (".npy",))
    paths = []
    for item in args.inputs:
        if os.path.isdir(item):
            found = sorted(os.path.join(item, f) for f in os.listdir(item)
                           if f.lower().endswith(exts))
            if not found:
                print(f"[vidcap] warning: no matching "
                      f"{'/'.join(exts)} files in {item!r}", file=sys.stderr)
            paths.extend(found)
        elif os.path.exists(item):
            # same filter as the directory scan (ADVICE r4): a .txt/.json here
            # would otherwise die later in np.load with a raw traceback
            if not item.lower().endswith(exts):
                raise SystemExit(
                    f"--inputs: {item!r} is not a supported input "
                    f"({', '.join(exts)})" + (
                        "; raw videos need the live model — drop "
                        "--from-export" if from_export
                        and item.lower().endswith(_VIDEO_EXTS) else ""))
            paths.append(item)
        else:
            raise SystemExit(f"--inputs: {item!r} does not exist")
    # de-dup repeated paths, then key by basename UNLESS two different files
    # share one — those all keep their full path (ADVICE r4: first-seen-wins
    # keying was order-dependent and silently dropped collisions)
    # normalize before dedup: 'dir/f.npy' from a scan and './dir/f.npy' from
    # an explicit arg are the same file (review r5)
    paths = list(dict.fromkeys(os.path.normpath(p) for p in paths))
    if not paths:
        # scripted pipelines must see a hard error, not an exit-0 empty json
        # (review r5 — this guard was lost in the r5 --inputs rework)
        raise SystemExit("--inputs matched no files")
    base_of = {p: os.path.splitext(os.path.basename(p))[0] for p in paths}
    from collections import Counter
    dup = {b for b, n in Counter(base_of.values()).items() if n > 1}

    if from_export:
        # AOT path (ADVICE r4): the artifact's graph DOES take a frame-mask
        # input, so arbitrary .npy features decode fine — only raw videos are
        # out (encoding them needs the live IRv2, which the artifact lacks).
        if nbest > 1:
            raise SystemExit("--nbest > 1 needs the live model; the export "
                             "artifact returns the single best hypothesis")
        from vidcap_tpu.export import ExportedCaptioner
        ec = ExportedCaptioner.load(from_export)
        ec.check_config(cfg)
        if args.method and args.method != ec.meta["method"]:
            raise SystemExit(f"--method {args.method} conflicts with the "
                             f"artifact (exported {ec.meta['method']}); the "
                             f"graph is frozen at export time")
        if (args.beam is not None and ec.meta["method"] == "beam"
                and args.beam != ec.meta["beam_width"]):
            # eager, CLI-clean version of the ValueError decode_batch would
            # raise mid-loop (review r5)
            raise SystemExit(f"--beam {args.beam} conflicts with the "
                             f"artifact (exported beam_width "
                             f"{ec.meta['beam_width']})")
        vocab = ec.vocab
        B = ec.batch_size or max(1, min(len(paths), cfg.train.batch_size))
        # pass --beam through so the artifact VALIDATES it (the graph is
        # frozen; a silent beam-width mismatch would mislabel the output —
        # review r5); None means "use whatever was exported"
        decode = lambda batch, mask: ec.decode_batch(
            batch, beam_width=args.beam, frame_mask=mask)
    else:
        # the dataset supplies the vocab the checkpoint was trained with
        # (same contract as `export`); features on disk are never touched here
        dataset = _load_dataset(cfg, split="train")
        cap = Captioner.from_checkpoint(
            cfg, dataset, args.checkpoint_dir or cfg.train.checkpoint_dir,
            seed=getattr(args, "seed", None))
        vocab = dataset.vocab
        B = max(1, min(len(paths), cfg.train.batch_size))
        decode = lambda batch, mask: np.asarray(cap.decode_batch(
            batch, method=method, beam_width=args.beam or cfg.decode.beam_width,
            temperature=args.temperature, frame_mask=mask, nbest=nbest))
    loader = _FeatureLoader(cfg)
    results = {}
    for i in range(0, len(paths), B):
        chunk = paths[i:i + B]
        rows = [loader(p) for p in chunk]
        batch, mask = _pad_batch(cfg, rows, B)
        toks = decode(batch, mask)[:len(chunk)]
        for p, row in zip(chunk, toks):
            key = p if base_of[p] in dup else base_of[p]
            results[key] = ([vocab.decode_str(r) for r in row]
                            if nbest > 1 else [vocab.decode_str(row)])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[vidcap] wrote {len(results)} captions → {args.out}",
              file=sys.stderr)
    else:
        for vid, caps in results.items():
            print(f"{vid}\t{caps[0]}")
    return 0


def cmd_caption(args) -> int:
    cfg = _preset(args)
    if getattr(args, "inputs", None):
        # --inputs composes with --from-export since r5 (ADVICE r4): the
        # artifact graph takes a frame-mask input, so arbitrary .npy feature
        # files decode AOT; raw videos still need the live model's IRv2.
        return _caption_inputs(cfg, args)
    if getattr(args, "from_export", None):
        # AOT path: no model build, no checkpoint restore — deserialize the
        # export artifact and decode the split with its baked-in weights
        import numpy as np
        from vidcap_tpu.export import ExportedCaptioner
        dataset = _load_dataset(cfg, split=getattr(args, "split", "test"))
        ec = ExportedCaptioner.load(args.from_export)
        ec.check_config(cfg)
        if args.method and args.method != ec.meta["method"]:
            raise SystemExit(f"--method {args.method} conflicts with the "
                             f"artifact (exported {ec.meta['method']}); the "
                             f"graph is frozen at export time")
        caps = ec.caption(np.asarray(dataset.features, np.float32))
        results = {vid: [c] for vid, c in zip(dataset.video_ids, caps)}
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
            print(f"[vidcap] wrote {len(results)} captions → {args.out}",
                  file=sys.stderr)
        else:
            for vid, c in list(results.items())[:20]:
                print(f"{vid}\t{c[0]}")
        return 0
    method = args.method or cfg.decode.method
    nbest = getattr(args, "nbest", 1) or 1
    if nbest > 1 and method != "beam":
        raise SystemExit(f"--nbest {nbest} requires --method beam")
    _decode_split(cfg, method, args.beam or cfg.decode.beam_width,
                  args.temperature, args.checkpoint_dir, args.out,
                  seed=getattr(args, "seed", None), nbest=nbest,
                  split=getattr(args, "split", "test"))
    return 0


def cmd_export(args) -> int:
    """Serialize the preset's decode (weights baked in) to a deployable AOT
    artifact directory — see vidcap_tpu/export.py."""
    cfg = _preset(args)
    from vidcap_tpu.export import export_decoder
    from vidcap_tpu.inference import Captioner
    dataset = _load_dataset(cfg, split="train")   # supplies the vocab
    cap = Captioner.from_checkpoint(
        cfg, dataset, args.checkpoint_dir or cfg.train.checkpoint_dir)
    meta = export_decoder(
        cap, args.out, batch_size=args.batch,
        method=args.method or cfg.decode.method,
        beam_width=args.beam or cfg.decode.beam_width,
        platforms=(args.platforms.split(",") if args.platforms else None))
    print(f"[vidcap] exported {meta['method']} decoder "
          f"(B={meta['batch_size'] or 'polymorphic'}, "
          f"platforms={meta['platforms']}) → {args.out}", file=sys.stderr)
    return 0


def cmd_sample(args) -> int:
    cfg = _preset(args)
    _decode_split(cfg, "sample", cfg.decode.beam_width, args.temperature,
                  args.checkpoint_dir, args.out, seed=args.seed,
                  split=getattr(args, "split", "test"))
    return 0


def cmd_eval(args) -> int:
    with open(args.captions) as f:
        results = json.load(f)
    if getattr(args, "refs", None):
        # standalone coco-caption-style scorer: candidates vs an explicit
        # {video_id: [reference, ...]} json — no dataset layout or preset
        # assets needed (the reference workflow piped captions.json straight
        # into pycocoevalcap the same way, SURVEY §3.4)
        with open(args.refs) as f:
            refs = json.load(f)
        # shape-check before scoring (ADVICE r4): a bare string iterates
        # per-CHARACTER, producing silent garbage instead of a clean error.
        # An EMPTY list is valid placeholder data (partially-captioned
        # corpora keep ref-less rows for feature alignment) and is skipped
        # below, consistent with the dataset branch (review r5).
        if not isinstance(refs, dict):
            raise SystemExit(f"--refs must be a json object "
                             f"{{video_id: [reference, ...]}}, got "
                             f"{type(refs).__name__}")
        for vid, r in refs.items():
            if (not isinstance(r, list)
                    or not all(isinstance(c, str) for c in r)):
                raise SystemExit(
                    f"--refs[{vid!r}] must be a list of reference "
                    f"strings, got {r!r:.80}")
    else:
        cfg = _preset(args)
        dataset = _load_dataset(cfg, split=getattr(args, "split", "test"))
        refs = dataset.video_captions
    # empty reference lists count as "no references" too (partially-
    # captioned corpora keep placeholder rows — review r5)
    gts = {v: refs[v] for v in results if refs.get(v)}
    skipped = len(results) - len(gts)
    if skipped:
        print(f"[vidcap] {skipped} candidate video(s) have no references — "
              f"skipped", file=sys.stderr)
    if not gts:
        raise SystemExit("no video ids in common between --captions and the "
                         "references")
    from vidcap_tpu.metrics.evaluate import evaluate_captions
    scores = evaluate_captions(gts, results)
    print(json.dumps(scores, indent=1))
    return 0


def cmd_extract(args) -> int:
    cfg = _preset(args)
    from vidcap_tpu.data.frames import extract_features_for_dir
    extract_features_for_dir(cfg, args.videos, args.split, fmt=args.format)
    return 0


def cmd_prepare(args) -> int:
    cfg = _preset(args)
    from vidcap_tpu.data.prepare import prepare
    prepare(cfg.data, args.annotations, mapping=args.mapping)
    return 0


def cmd_convert(args) -> int:
    from vidcap_tpu.convert import convert_irv2_checkpoint_to_npz
    cfg = _preset(args)
    out = convert_irv2_checkpoint_to_npz(args.tf_checkpoint, args.out,
                                         frame_size=cfg.data.frame_size)
    print(f"[vidcap] wrote converted backbone weights → {out}",
          file=sys.stderr)
    return 0


def _serving_mesh(cfg, sharded: bool):
    """--sharded: build a mesh over all visible chips (GSPMD data axis, plus
    the vocab-TP model axis when cfg.mesh.num_model > 1). Used by both
    `serve --sharded` (decode) and `train --sharded` (training)."""
    if not sharded:
        return None
    import jax
    if jax.device_count() < 2:
        print("[vidcap] --sharded requested but only one device visible; "
              "running single-device", file=sys.stderr)
        return None
    from vidcap_tpu.parallel.mesh import make_mesh
    return make_mesh(cfg.mesh)


def cmd_serve(args) -> int:
    cfg = _preset(args)
    from vidcap_tpu.serving import CaptionServer
    if getattr(args, "from_export", None):
        # AOT path: the artifact IS the model — decode method/beam/batch are
        # frozen in its graph, so they come from meta, not flags.
        if args.sharded:
            raise SystemExit("--from-export artifacts are single-device "
                             "graphs; --sharded requires a checkpoint")
        from vidcap_tpu.export import ExportedCaptioner
        cap = ExportedCaptioner.load(args.from_export)
        cap.check_config(cfg)
        # same contract as caption --from-export: a flag that CONFLICTS with
        # the frozen graph is an error, never a silent wrong-method decode
        if args.method and args.method != cap.meta["method"]:
            raise SystemExit(f"--method {args.method} conflicts with the "
                             f"artifact (exported {cap.meta['method']}); the "
                             f"graph is frozen at export time")
        if (args.beam and cap.meta["method"] == "beam"
                and args.beam != cap.meta["beam_width"]):
            raise SystemExit(f"--beam {args.beam} conflicts with the artifact "
                             f"(exported beam_width {cap.meta['beam_width']})")
        method, beam = cap.meta["method"], cap.meta["beam_width"] or 5
        # polymorphic artifact (batch_size None): keep the flag's flush size
        args.batch = cap.batch_size or args.batch
        print(f"[vidcap] serving from export artifact ({method}, "
              f"B={cap.batch_size})", file=sys.stderr)
    else:
        from vidcap_tpu.inference import Captioner
        dataset = _load_dataset(cfg, split="train")   # supplies the vocab
        cap = Captioner.from_checkpoint(
            cfg, dataset, args.checkpoint_dir or cfg.train.checkpoint_dir,
            seed=args.seed, mesh=_serving_mesh(cfg, args.sharded))
        method = args.method or cfg.decode.method
        beam = args.beam or cfg.decode.beam_width
    if args.http is not None:
        from vidcap_tpu.serving import make_http_server
        server, svc = make_http_server(
            cfg, cap, port=args.http, batch_size=args.batch, method=method,
            beam_width=beam,
            max_wait_ms=(args.max_wait_ms if args.max_wait_ms is not None
                         else 20.0),
            max_queue=args.max_queue, path_root=args.path_root)
        host, port = server.server_address[:2]
        print(f"[vidcap] serving HTTP on {host}:{port} "
              f"(POST /caption, GET /healthz)", file=sys.stderr)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            svc.close()
            print(f"[vidcap] {svc.stats()}", file=sys.stderr)
        return 0
    server = CaptionServer(cfg, cap, batch_size=args.batch,
                           method=method, beam_width=beam,
                           max_wait_ms=args.max_wait_ms,
                           pipeline_depth=args.pipeline_depth)
    server.run()
    return 0


def cmd_info(args) -> int:
    """Operator preflight: devices, preset dims, parameter census (via
    jax.eval_shape — instant, nothing allocated), rough step-memory estimate,
    decode buffer size, compile-cache state. The first stop before pointing a
    preset at a chip — catches "won't fit" before a long remote compile."""
    cfg = _preset(args)
    import jax

    from vidcap_tpu.utils.meminfo import (compile_cache_stats,
                                          decode_buffer_estimate,
                                          param_census,
                                          train_memory_estimate)
    census = param_census(cfg)
    mem = train_memory_estimate(cfg, census["_total"])
    dec = decode_buffer_estimate(cfg)
    cache = compile_cache_stats()
    info = {
        "jax": jax.__version__,
        "preset": args.preset,
        "mode": "pixels→CNN (end-to-end)" if cfg.model.use_backbone
                else "precomputed features",
        "stage": cfg.train.stage,
        "dims": {"T": cfg.data.num_frames, "D": cfg.data.feature_dim,
                 "H": cfg.model.hidden_dim, "A": cfg.model.attn_dim,
                 "E": cfg.model.embed_dim,
                 "vocab": cfg.data.vocab_size,
                 "padded_vocab": cfg.data.padded_vocab,
                 "max_caption_len": cfg.data.max_caption_len},
        "decode": {"method": cfg.decode.method,
                   "beam_width": cfg.decode.beam_width,
                   "max_len": cfg.decode.max_len},
        "params": census,
        "train_step_hbm_estimate_bytes": mem,
        "beam_logits_buffer": dec,
        "compile_cache": cache,
    }
    if not args.no_devices:
        # touching jax.devices() initializes the backend — skippable because
        # on a wedged backend even this blocks for minutes
        devs = jax.devices()
        info["backend"] = {"platform": devs[0].platform,
                           "device_kind": devs[0].device_kind,
                           "n_devices": len(devs)}
    if args.json:
        print(json.dumps(info, indent=1))
        return 0
    b = info.get("backend")
    if b:
        print(f"[info] jax {info['jax']}  backend={b['platform']} "
              f"{b['n_devices']}x {b['device_kind']}")
    else:
        print(f"[info] jax {info['jax']}  (backend not initialized)")
    d = info["dims"]
    print(f"[info] preset {args.preset}: {info['mode']}, stage={info['stage']}"
          f", T={d['T']} D={d['D']} H={d['H']} vocab={d['vocab']} "
          f"(padded {d['padded_vocab']})")
    groups = ", ".join(f"{k} {v/1e6:.2f}M" for k, v in census.items()
                       if k != "_total")
    print(f"[info] params: {groups} — total {census['_total']/1e6:.2f}M "
          f"({census['_total']*4/1e6:.0f} MB f32)")
    micro = max(1, cfg.train.batch_size // max(1, cfg.train.grad_accum))
    print(f"[info] train step (microbatch B={micro}): rough HBM "
          f"{mem['total']/1e9:.2f} GB  (params+opt+grads "
          f"{(mem['params']+mem['optimizer']+mem['grads'])/1e9:.2f}, "
          f"activations {mem['activations']/1e9:.2f}, inputs "
          f"{mem['inputs']/1e9:.2f}) — estimate, not an XLA accounting")
    print(f"[info] decode method={info['decode']['method']}; a "
          f"beam-{info['decode']['beam_width']} decode at B="
          f"{cfg.train.batch_size} sweeps a per-step logits buffer "
          f"[{int(dec['beam_logits_rows'])}, {int(dec['padded_vocab'])}] = "
          f"{dec['beam_logits_bytes']/1e6:.1f} MB (the VMEM-cliff knob)")
    print(f"[info] compile cache {cache['path']}: {cache['entries']} entries, "
          f"{cache['bytes']/1e6:.0f} MB")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vidcap_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--preset", default="msvd_greedy")
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--set", action="append", default=None,
                        metavar="SECTION.FIELD=VALUE",
                        help="override any config field, repeatable "
                             "(e.g. --set train.learning_rate=1e-4 "
                             "--set decode.beam_width=3)")

    t = sub.add_parser("train", help="run the preset's training stage(s)")
    common(t)
    t.add_argument("--steps", type=str, default=None,
                   help="steps per stage: one count for all stages, or a "
                        "comma list matched to --stages (e.g. 2500,1000)")
    t.add_argument("--batch-size", type=int, default=None,
                   help="override the preset batch size (must divide the "
                        "data-axis size under --sharded)")
    t.add_argument("--stages", default=None,
                   help="comma list overriding the preset stage, e.g. xe,scst")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--log-file", default=None)
    t.add_argument("--eval-every", type=int, default=None,
                   help="override the preset's periodic-eval cadence "
                        "(0 disables)")
    t.add_argument("--log-every", type=int, default=None,
                   help="cadence of train log rows (0 disables periodic "
                        "rows; the final step and evals still log)")
    t.add_argument("--feature-bank", action="store_true",
                   help="park the whole feature tensor in HBM once and gather "
                        "rows on-device per step (feature-mode; composes "
                        "with --sharded via replicated banks; cuts per-step "
                        "host->device payload ~300x)")
    t.add_argument("--steps-per-dispatch", type=str, default=None,
                   help="with --feature-bank: lax.scan K steps per jitted "
                        "call, amortizing per-dispatch latency (same batch "
                        "stream/numerics; ckpt+eval at chunk boundaries). "
                        "One K or a comma list matched to --stages "
                        "(e.g. 25,1)")
    t.add_argument("--sharded", action="store_true",
                   help="train over all visible chips (GSPMD: batch sharded "
                        "over the data axis, grads psum over ICI)")
    t.set_defaults(fn=cmd_train)

    c = sub.add_parser("caption", help="decode the eval split, write json")
    common(c)
    c.add_argument("--method", choices=["greedy", "beam", "sample"], default=None)
    c.add_argument("--beam", type=int, default=None)
    c.add_argument("--nbest", type=int, default=1,
                   help="beam only: write the N best hypotheses per video "
                        "(best first) instead of just the winner; N ≤ beam "
                        "width")
    c.add_argument("--temperature", type=float, default=1.0)
    c.add_argument("--out", default=None)
    c.add_argument("--seed", type=int, default=None,
                   help="reproducible sampling seed (method=sample)")
    c.add_argument("--from-export", default=None, metavar="DIR",
                   help="decode via an AOT export artifact (see `export`) "
                        "instead of building the model from a checkpoint")
    c.add_argument("--inputs", nargs="+", default=None, metavar="FILE|DIR",
                   help="caption these video/.npy files (or directories of "
                        "them) instead of the eval split — one-shot "
                        "captioning with no dataset layout; videos are "
                        "decoded host-side (cv2) and encoded by the IRv2 "
                        "backbone")
    c.add_argument("--split", default="test",
                   help="dataset split to decode (default test; falls back "
                        "to val)")
    c.set_defaults(fn=cmd_caption)

    ax = sub.add_parser(
        "export", help="serialize an AOT decode artifact (jax.export): "
                       "weights + vocab + StableHLO, no checkpoint at load")
    common(ax)
    ax.add_argument("--out", required=True, help="artifact directory")
    ax.add_argument("--batch", type=int, default=32,
                    help="fixed batch size baked into the graph; 0 = batch-"
                         "polymorphic (symbolic dim, compiles per shape at "
                         "the load site)")
    ax.add_argument("--method", choices=["greedy", "beam"], default=None)
    ax.add_argument("--beam", type=int, default=None)
    ax.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: the current backend)")
    ax.set_defaults(fn=cmd_export)

    s = sub.add_parser("sample", help="multinomial-sampling decode")
    common(s)
    s.add_argument("--temperature", type=float, default=1.0)
    s.add_argument("--out", default=None)
    s.add_argument("--seed", type=int, default=None,
                   help="reproducible sampling seed")
    s.set_defaults(fn=cmd_sample)

    e = sub.add_parser("eval", help="score a captions json (BLEU/ROUGE/CIDEr)")
    common(e)
    e.add_argument("--captions", required=True)
    e.add_argument("--refs", default=None, metavar="REFS.json",
                   help="score against this {video_id: [reference, ...]} "
                        "json instead of the preset dataset's captions — "
                        "standalone coco-caption-style scoring, no dataset "
                        "assets needed")
    e.add_argument("--split", default="test",
                   help="dataset split supplying references when --refs is "
                        "not given (default test; falls back to val)")
    e.set_defaults(fn=cmd_eval)

    inf = sub.add_parser("info", help="environment + preset preflight census "
                                      "(params, memory estimate, cache)")
    common(inf)
    inf.add_argument("--json", action="store_true",
                     help="machine-readable output")
    inf.add_argument("--no-devices", action="store_true",
                     help="skip backend init (a wedged backend blocks even "
                          "jax.devices() for minutes)")
    inf.set_defaults(fn=cmd_info)

    x = sub.add_parser("extract", help="precompute CNN features for a video dir")
    common(x)
    x.add_argument("--videos", required=True)
    x.add_argument("--split", default="train")
    x.add_argument("--format", choices=["npy", "h5", "tfrecord"], default="npy",
                   help="feature container format (the reference lineage's "
                        "three dump formats, SURVEY.md C3)")
    x.set_defaults(fn=cmd_extract)

    pr = sub.add_parser("prepare",
                        help="convert MSVD/MSR-VTT annotation files to the "
                             "canonical data layout")
    common(pr)
    pr.add_argument("annotations", nargs="+")
    pr.add_argument("--mapping", default=None,
                    help="MSVD youtube_mapping.txt fixing the canonical "
                         "vid1..vid1970 split ordering")
    pr.set_defaults(fn=cmd_prepare)

    cv = sub.add_parser("convert",
                        help="TF-slim IRv2 checkpoint → backbone .npz "
                             "(load via VIDCAP_IRV2_WEIGHTS)")
    common(cv)
    cv.add_argument("--tf-checkpoint", required=True,
                    help=".ckpt prefix or .npz of slim-named variables")
    cv.add_argument("--out", required=True, help="output .npz path")
    cv.set_defaults(fn=cmd_convert)

    sv = sub.add_parser("serve", help="caption feature/video paths from stdin")
    common(sv)
    sv.add_argument("--method", choices=["greedy", "beam", "sample"],
                    default=None)
    sv.add_argument("--beam", type=int, default=None)
    sv.add_argument("--batch", type=int, default=32)
    sv.add_argument("--seed", type=int, default=None,
                    help="reproducible sampling seed (method=sample)")
    sv.add_argument("--from-export", default=None, metavar="DIR",
                    help="serve an AOT export artifact (see `export`): no "
                         "checkpoint; method/beam/batch come from its meta")
    sv.add_argument("--sharded", action="store_true",
                    help="decode over all visible chips (GSPMD data sharding)")
    sv.add_argument("--max-wait-ms", type=float, default=None,
                    help="flush a partial batch once its oldest request has "
                         "waited this long (default: wait for a full batch)")
    sv.add_argument("--pipeline-depth", type=int, default=1,
                    help="decode-worker queue depth overlapping input loading "
                         "with decoding (0 = serial)")
    sv.add_argument("--http", type=int, default=None, metavar="PORT",
                    help="serve over HTTP instead of stdin: POST /caption "
                         "(.npy bytes or {\"path\": ...}), GET /healthz|/stats")
    sv.add_argument("--path-root", type=str, default=None,
                    help="enable HTTP JSON path mode, confined to this "
                         "directory (.npy features or video files); "
                         "disabled when unset")
    sv.add_argument("--max-queue", type=int, default=None,
                    help="bound on queued HTTP requests before 429 "
                         "(default 4×batch)")
    sv.set_defaults(fn=cmd_serve)
    return p


def main(argv=None) -> int:
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except KeyError as e:
        if "unknown preset" in str(e):
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
        raise
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
