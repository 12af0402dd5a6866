"""TF-CPU reference-proxy SCST step (SURVEY.md §6 "interim proxy"; VERDICT r2 #1).

BASELINE.json's second headline — "XE+SCST training at ≥10x the reference's
CPU/GPU step throughput" — needs a measured denominator. The reference repo is
unavailable (the /root/reference mount has been empty every round), so this is
the SURVEY-prescribed proxy: a faithful TF1-style (graph mode + Session +
feed_dict) replica of the REFERENCE's RL loop structure (SURVEY.md §3.2), at
the exact dims of our measured SCST config (scripts/bench_scst.py /
PARITY.md §6: B=64, T=26 frames, D=1536, E=H=attn=512, padded vocab 16,128,
L=30 decode steps, 400-way attribute head):

  1. sess.run([sampled_ids, greedy_ids])   -- device->HOST boundary
  2. host CIDEr-D reward over the batch for sample AND greedy baseline
     (our metrics/cider.py host oracle, pycocoevalcap semantics)
  3. sess.run(rl_train_op, feed={advantage, ...})  -- HOST->device boundary
     with the attribute-BCE multitask term in the total loss

Decode loops are python-unrolled at graph-build time (SURVEY.md §3.1 [K]:
"per decode step t (unrolled python loop over L steps)").

Charitable-to-the-reference choices (so the measured ratio is a LOWER bound):
  * the CIDEr scorer + IDF tables are prebuilt ONCE outside the loop (the
    reference lineage rebuilds pycocoevalcap state per batch);
  * rollout sess.run fetches both rollouts in one call;
  * no PTBTokenizer/JVM subprocess on the reward path (ids->words directly).

Run on the host CPU (TF has no TPU support in this image):
    cd /root/repo && PYTHONPATH= python scripts/reference_proxy_scst.py
Writes one json line to stdout and REFERENCE_PROXY.json at the repo root.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# matched dims — keep in sync with scripts/bench_scst.py (PARITY.md §6 row)
B, T, D = 64, 26, 1536
E = H = A = 512
V = 16_128          # our model's MXU-padded vocab (config.padded_vocab(16k))
L = 30              # decode steps (DecodeConfig.max_len)
K = 400             # attribute vocab (DataConfig.num_attributes)
WARMUP, STEPS = 2, 10
BOS, EOS = 1, 2


def build_graph(tf1, tf):
    """The reference-shaped RL graph: shared attention-LSTM decoder, three
    python-unrolled 30-step rollouts (sample / greedy / teacher-forced PG)."""
    feats_ph = tf1.placeholder(tf.float32, [B, T, D], name="feats")
    sampled_ph = tf1.placeholder(tf.int32, [B, L], name="sampled_ids")
    mask_ph = tf1.placeholder(tf.float32, [B, L], name="mask")
    adv_ph = tf1.placeholder(tf.float32, [B], name="advantage")
    attr_ph = tf1.placeholder(tf.float32, [B, K], name="attr_targets")

    init = tf1.glorot_uniform_initializer(seed=0)

    def dec_step(tok, h, c, feats, feats_proj):
        """One decode step: embed -> attention ctx -> LSTM -> vocab logits."""
        with tf1.variable_scope("dec", reuse=tf1.AUTO_REUSE):
            emb = tf1.get_variable("emb", [V, E], initializer=init)
            Wh = tf1.get_variable("attn_Wh", [H, A], initializer=init)
            av = tf1.get_variable("attn_v", [A], initializer=init)
            Wl = tf1.get_variable("lstm_W", [E + D + H, 4 * H],
                                  initializer=init)
            bl = tf1.get_variable("lstm_b", [4 * H],
                                  initializer=tf1.zeros_initializer())
            Wo = tf1.get_variable("out_W", [H, V], initializer=init)
            bo = tf1.get_variable("out_b", [V],
                                  initializer=tf1.zeros_initializer())
        e = tf.nn.embedding_lookup(emb, tok)                      # [B, E]
        s = tf.tanh(feats_proj + tf.expand_dims(tf.matmul(h, Wh), 1))
        scores = tf.tensordot(s, av, [[2], [0]])                  # [B, T]
        alpha = tf.nn.softmax(scores)
        ctx = tf.reduce_sum(tf.expand_dims(alpha, 2) * feats, 1)  # [B, D]
        z = tf.matmul(tf.concat([e, ctx, h], 1), Wl) + bl
        i, f, g, o = tf.split(z, 4, axis=1)
        c2 = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(g)
        h2 = tf.sigmoid(o) * tf.tanh(c2)
        logits = tf.matmul(h2, Wo) + bo                           # [B, V]
        return h2, c2, logits

    with tf1.variable_scope("dec", reuse=tf1.AUTO_REUSE):
        Wf = tf1.get_variable("attn_Wf", [D, A], initializer=init)
    feats_proj = tf.tensordot(feats_ph, Wf, [[2], [0]])           # [B, T, A]

    zeros = tf.zeros([B, H])
    bos = tf.fill([B], BOS)

    # rollout 1: multinomial sampling (REINFORCE sample path, C10)
    h, c, tok, samp = zeros, zeros, bos, []
    for _ in range(L):
        h, c, logits = dec_step(tok, h, c, feats_ph, feats_proj)
        tok = tf.cast(tf.random.categorical(logits, 1, seed=0)[:, 0], tf.int32)
        samp.append(tok)
    sampled_ids = tf.stack(samp, axis=1)                          # [B, L]

    # rollout 2: greedy baseline (C9)
    h, c, tok, greedy = zeros, zeros, bos, []
    for _ in range(L):
        h, c, logits = dec_step(tok, h, c, feats_ph, feats_proj)
        tok = tf.cast(tf.argmax(logits, axis=1), tf.int32)
        greedy.append(tok)
    greedy_ids = tf.stack(greedy, axis=1)

    # rollout 3: teacher-forced over the FED sampled ids -> PG loss (C13)
    prev = tf.concat([tf.expand_dims(bos, 1), sampled_ph[:, :-1]], axis=1)
    h, c, logps = zeros, zeros, []
    for t in range(L):
        h, c, logits = dec_step(prev[:, t], h, c, feats_ph, feats_proj)
        lp = tf.nn.log_softmax(logits)
        idx = tf.stack([tf.range(B), sampled_ph[:, t]], axis=1)
        logps.append(tf.gather_nd(lp, idx))
    logp = tf.stack(logps, axis=1)                                # [B, L]
    pg_loss = -tf.reduce_mean(adv_ph * tf.reduce_sum(logp * mask_ph, 1))

    # multitask attribute BCE off the mean-pooled video features (C15)
    with tf1.variable_scope("dec", reuse=tf1.AUTO_REUSE):
        Wa = tf1.get_variable("attr_W", [D, K], initializer=init)
        ba = tf1.get_variable("attr_b", [K],
                              initializer=tf1.zeros_initializer())
    attr_logits = tf.matmul(tf.reduce_mean(feats_ph, 1), Wa) + ba
    bce = tf.reduce_mean(tf.nn.sigmoid_cross_entropy_with_logits(
        labels=attr_ph, logits=attr_logits))
    loss = pg_loss + 0.2 * bce

    opt = tf1.train.AdamOptimizer(5e-5)
    grads_vars = opt.compute_gradients(loss)
    grads, tvars = zip(*[(g, v) for g, v in grads_vars if g is not None])
    grads, _ = tf.clip_by_global_norm(list(grads), 5.0)
    train_op = opt.apply_gradients(zip(grads, tvars))

    return dict(feats=feats_ph, sampled=sampled_ph, mask=mask_ph, adv=adv_ph,
                attr=attr_ph, sampled_ids=sampled_ids, greedy_ids=greedy_ids,
                loss=loss, train_op=train_op)


def host_rewards(scorer, vocab, vids, s_ids, g_ids):
    """Step 2 of SURVEY.md §3.2: ids -> words -> per-sentence CIDEr-D on the
    host, for the sampled rollout and the greedy baseline."""
    adv = np.zeros(len(vids), np.float32)
    for i, vid in enumerate(vids):
        cand_s = vocab.decode(s_ids[i])
        cand_g = vocab.decode(g_ids[i])
        r_s = scorer.score(vid, cand_s) if cand_s else 0.0
        r_g = scorer.score(vid, cand_g) if cand_g else 0.0
        adv[i] = r_s - r_g
    return adv


def sample_mask(s_ids):
    """mask[i, t] = 1 while t is at or before the first EOS (built host-side
    and fed, as the reference's feed_dict masks are)."""
    mask = np.ones_like(s_ids, np.float32)
    for i in range(s_ids.shape[0]):
        eos = np.where(s_ids[i] == EOS)[0]
        if eos.size:
            mask[i, eos[0] + 1:] = 0.0
    return mask


def main() -> None:
    import dataclasses

    import tensorflow as tf
    tf1 = tf.compat.v1
    tf1.disable_eager_execution()

    from vidcap_tpu.config import get_preset
    from vidcap_tpu.data.loader import CaptionDataset
    from vidcap_tpu.metrics.cider import CiderScorer
    from vidcap_tpu.data.vocab import ptb_tokenize

    # the same synthetic corpus bench_scst.py measures against
    cfg = get_preset("msrvtt_attn_beam5")
    dcfg = dataclasses.replace(cfg.data, dataset="synthetic")
    ds = CaptionDataset.synthetic(dcfg, num_videos=256)
    refs = {v: [ptb_tokenize(c) for c in caps]
            for v, caps in ds.video_captions.items()}
    scorer = CiderScorer(refs)     # prebuilt ONCE (charitable to the ref)

    t_build0 = time.perf_counter()
    g = build_graph(tf1, tf)
    sess = tf1.Session()
    sess.run(tf1.global_variables_initializer())
    build_s = time.perf_counter() - t_build0

    it = ds.batches(B, seed=0)
    t_roll = t_host = t_train = 0.0
    times = []
    for step in range(WARMUP + STEPS):
        batch = next(it)
        t0 = time.perf_counter()
        s_ids, g_ids = sess.run(
            [g["sampled_ids"], g["greedy_ids"]],
            feed_dict={g["feats"]: batch.features})           # crossing 1
        t1 = time.perf_counter()
        vids = [ds.video_ids[j] for j in batch.video_idx]
        adv = host_rewards(scorer, ds.vocab, vids, s_ids, g_ids)
        mask = sample_mask(s_ids)
        t2 = time.perf_counter()
        _, loss = sess.run(
            [g["train_op"], g["loss"]],
            feed_dict={g["feats"]: batch.features, g["sampled"]: s_ids,
                       g["mask"]: mask, g["adv"]: adv,
                       g["attr"]: batch.attributes})          # crossing 2
        t3 = time.perf_counter()
        if step >= WARMUP:
            times.append(t3 - t0)
            t_roll += t1 - t0
            t_host += t2 - t1
            t_train += t3 - t2
    sess.close()

    sps = STEPS / sum(times)
    result = {
        "metric": "reference_proxy_scst_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "dims": {"B": B, "T": T, "D": D, "E": E, "H": H, "A": A, "V": V,
                 "L": L, "K": K},
        "ms_per_step": round(1e3 * sum(times) / STEPS, 1),
        "breakdown_ms": {
            "rollouts_sess_run": round(1e3 * t_roll / STEPS, 1),
            "host_reward": round(1e3 * t_host / STEPS, 1),
            "pg_train_sess_run": round(1e3 * t_train / STEPS, 1),
        },
        "graph_build_s": round(build_s, 1),
        "final_loss": float(loss),
        "hardware": "host CPU (TF graph mode, Session + feed_dict)",
        "notes": "SURVEY.md §3.2 structure; charitable choices documented in "
                 "the module docstring make the measured x-factor a lower "
                 "bound",
    }
    with open(os.path.join(REPO, "REFERENCE_PROXY.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
