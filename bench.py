"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): captions/sec/chip on MSR-VTT-sized inputs with beam=5,
fully on-device batched beam search. Target ≥ 2,000 captions/sec/chip
(vs_baseline = value / 2000).

Runs on whatever backend is active (real TPU chip under the driver). Uses
synthetic MSR-VTT-shaped data — the metric measures the decode engine, not disk IO.

Robustness (VERDICT r1 next #6): B=208 sits on a VMEM cliff (216→8,589,
224→6,509 caps/s); a compiler update or shape nudge could push it over. The
harness measures B=208 first and, only if the result looks degraded
(< CLIFF_THRESHOLD), re-measures at the fallback batch sizes and reports the
best — the healthy path still costs exactly one compile. Per-B results and an
XLA-cost-analysis MFU estimate land in BENCH_DETAILS.json (stdout stays one
line).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Batch sweeps (bf16 logits, caps/s):
#   r1: 128→8,741  160→9,899  176→9,552  192→10,017  208→10,497  216→8,589
#   r2: the 208 point dipped to 8,242 under that day's compiler (BENCH_r02) —
#       the fallback saved the round at 192→10,339 but cost 2 extra compiles
#   r3 re-sweep {160..216 step 8}: 160→9,282 168→9,987 176→8,756 184→10,357
#       192→10,131 200→9,367 208→10,390 216→8,536 (cliff unchanged at ≥216)
# 184 is the new PRIMARY: statistically tied with 208 (Δ0.3% ≪ run-to-run
# variance) but 4 batch-steps clear of the VMEM cliff edge that made 208 flap
# in r2. Cliff history is logged in BENCH_DETAILS.json per round.
BATCH_CANDIDATES = (184, 208, 192)
CLIFF_THRESHOLD = 9_500.0       # healthy candidates land ~9.6k–10.5k
PEAK_FLOPS = float(os.environ.get("VIDCAP_PEAK_FLOPS", 197e12))  # v5e bf16


def bench_beam_captions_per_sec(batch_size: int = 208, iters: int = 8,
                                trials: int = 3):
    """Returns (median captions/s over ``trials`` re-dispatches, aux).

    aux = (flops, median_dt, per-trial caps/s list). Each trial re-dispatches
    the SAME compiled program (zero extra compiles) with a per-trial feature
    perturbation applied in-jit, so no dispatch-caching layer can
    short-circuit identical calls (the 2.1M-caps/s footgun) — the median +
    recorded spread make the headline statistically honest instead of a
    single sample from a ±5% band (VERDICT r3 weak #5)."""
    from vidcap_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import beam_decode, tile_recurrent
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("msrvtt_attn_beam5")
    vocab_size = 16_000
    model = create_model(cfg, vocab_size=vocab_size)
    params = init_params(model, cfg, jax.random.key(0))

    B, T, D = batch_size, cfg.data.num_frames, cfg.data.feature_dim
    K = cfg.decode.beam_width
    max_len = cfg.decode.max_len
    rng = np.random.default_rng(0)

    def decode(p, f):
        state = model.apply({"params": p}, f, method=VidCapModel.init_state)
        state = tile_recurrent(state, K)

        def beam_step(st, tok):
            # keep_compute_dtype=True: logits stay bf16 (the Dense output
            # dtype) — bit-identical beams, half the top-k sweep traffic
            return model.apply({"params": p}, st, tok, K, True,
                               method=VidCapModel.step_beam)

        toks, _ = beam_decode(beam_step, state, batch=B,
                              max_len=max_len, beam_width=K)
        return toks

    # distinct inputs per iteration, all `iters` decodes chained INSIDE one jit
    # (lax.map serializes them on-chip): measures chip throughput, not the
    # per-dispatch overhead of this environment's remote-execution tunnel
    stacked = jnp.asarray(rng.normal(size=(iters, B, T, D)), jnp.float32)

    @jax.jit
    def decode_many(p, fs, eps):
        return jax.lax.map(lambda f: decode(p, f + eps), fs)

    # FLOP count: XLA cost_analysis does NOT multiply loop bodies by their
    # trip count (a whole 8×30-step program reported ~2 steps' worth), so
    # analyze ONE beam step and scale by max_len·iters. Best-effort.
    flops = None
    try:
        state_shape = jax.eval_shape(
            lambda p, f: tile_recurrent(
                model.apply({"params": p}, f, method=VidCapModel.init_state),
                K),
            params, jnp.zeros((B, T, D), jnp.float32))
        tok_shape = jax.ShapeDtypeStruct((B * K,), jnp.int32)

        def one_step(p, st, tok):
            return model.apply({"params": p}, st, tok, K, True,
                               method=VidCapModel.step_beam)

        ca = (jax.jit(one_step)
              .lower(params, state_shape, tok_shape).compile()
              .cost_analysis())
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0))
        if step_flops:
            flops = step_flops * max_len * iters
    except Exception:   # cost analysis is best-effort; never fail the bench
        pass

    np.asarray(decode_many(params, stacked, jnp.float32(0.0)))  # compile+warm
    dts = []
    for k in range(trials):
        eps = jnp.float32((k + 1) * 1e-6)   # distinct input per dispatch
        t0 = time.perf_counter()
        np.asarray(decode_many(params, stacked, eps))
        dts.append(time.perf_counter() - t0)
    per_trial = [B * iters / dt for dt in dts]
    med_dt = float(np.median(dts))
    return B * iters / med_dt, (flops, med_dt, per_trial)


def _wait_for_backend(max_wait_s: float = 3600.0) -> None:
    """Survive the post-compile-kill wedge: backend init can block ~25 min
    then raise UNAVAILABLE for a while before recovering (CLAUDE.md). Each
    retry re-attempts initialization; stdout stays clean for the JSON line."""
    t0 = time.time()
    while True:
        try:
            jax.devices()
            return
        except RuntimeError as e:
            if time.time() - t0 > max_wait_s:
                raise
            print(f"[bench] backend unavailable ({str(e)[:120]}); "
                  f"retrying in 60s", file=sys.stderr)
            time.sleep(60)


def main() -> int:
    _wait_for_backend()
    target = 2000.0
    per_b = {}
    spread = {}
    best_b, best, best_aux = None, 0.0, (None, None, None)
    for b in BATCH_CANDIDATES:
        # median of 3 re-dispatches of one compiled program: the cliff
        # fallback decision and the reported headline ride the median, not a
        # single sample from the ±5% run-to-run band (VERDICT r3 weak #5)
        cps, aux = bench_beam_captions_per_sec(batch_size=b)
        per_b[str(b)] = round(cps, 2)
        spread[str(b)] = [round(x, 1) for x in aux[2]]
        if cps > best:
            best_b, best, best_aux = b, cps, aux
        if cps >= CLIFF_THRESHOLD:
            break       # healthy — don't pay fallback compiles

    flops, dt, _ = best_aux
    mfu = (flops / dt / PEAK_FLOPS) if (flops and dt) else None
    details = {
        "per_batch_caps_per_sec": per_b,
        "per_batch_trial_spread": spread,
        "chosen_batch": best_b,
        # cliff tracking (VERDICT r2 weak #2): full r3 sweep on 2026-08-17;
        # the VMEM cliff sits at B>=216 (8,536), primary moved 208->184
        "cliff_history": {"r1": {"216": 8589, "224": 6509},
                          "r2": {"208": 8242},
                          "r3_sweep": {"160": 9282, "168": 9987, "176": 8756,
                                       "184": 10357, "192": 10131,
                                       "200": 9367, "208": 10390,
                                       "216": 8536}},
        "timed_program_flops": flops,
        "timed_seconds": dt,
        "mfu_vs_peak_bf16": round(mfu, 4) if mfu is not None else None,
        "peak_flops_assumed": PEAK_FLOPS,
        "backend": jax.devices()[0].platform,
    }
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAILS.json"), "w") as f:
            json.dump(details, f, indent=1)
    except OSError:
        pass

    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam5",
        "value": round(best, 2),
        "unit": "captions/s",
        "vs_baseline": round(best / target, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
