"""Golden-parity gate (SURVEY.md §4.1, §7 hard-part #3).

BASELINE.json requires token-for-token greedy parity with the reference. The
reference mount (/root/reference) was EMPTY this round (SURVEY.md §0 provenance
warning), so true cross-implementation goldens cannot exist yet. This module:

  1. skips loudly while the mount is empty (the skip reason documents the gap);
  2. maintains SELF-golden fixtures: greedy decode of fixed weights on fixed
     inputs, frozen at the first green build — any refactor that silently changes
     decode semantics trips this even without the reference.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden_greedy.json")


def _reference_populated() -> bool:
    try:
        for _, _, files in os.walk(REFERENCE):
            if files:
                return True
    except OSError:
        pass
    return False


def _find_reference_checkpoints():
    """TF checkpoint prefixes and weight archives anywhere under the mount."""
    found = []
    for root, _, files in os.walk(REFERENCE):
        for f in files:
            if f.endswith(".npz"):
                found.append(os.path.join(root, f))
            elif f.endswith(".index"):            # ckpt V2: prefix.index
                found.append(os.path.join(root, f[:-len(".index")]))
            elif ".ckpt" in f and f.endswith(".meta"):  # ckpt V1
                found.append(os.path.join(root, f[:-len(".meta")]))
    return sorted(set(found))


@pytest.mark.skipif(not _reference_populated(),
                    reason="awaiting mount: /root/reference is empty — "
                           "cross-implementation golden parity blocked "
                           "(SURVEY.md §0); activates when populated")
def test_reference_greedy_parity():
    """Activation path (VERDICT r1 next #2): when the mount populates, locate
    reference TF checkpoints, convert with vidcap_tpu.convert, greedy-decode,
    and assert token-for-token equality against reference outputs."""
    from vidcap_tpu import convert

    ckpts = _find_reference_checkpoints()
    if not ckpts:
        pytest.skip("reference mount populated but contains no TF checkpoint "
                    "(.ckpt/.npz) — export reference weights first, then map "
                    "variable names via convert.DEFAULT_DECODER_MAP overrides")
    # Load every checkpoint; at minimum the converter must be able to READ
    # the reference's variables. Full decode parity additionally needs the
    # reference's vocab + feature fixtures — assert readability now and fail
    # loudly (not a booby-trap assert) if the name maps don't cover them.
    tf_vars = {}
    for c in ckpts:
        tf_vars.update(convert.read_tf_checkpoint(c))
    assert tf_vars, f"checkpoints unreadable: {ckpts}"
    irv2_names = [n for n in tf_vars if n.startswith(convert.SLIM_PREFIX)]
    decoder_names = [n for n in tf_vars
                     if n in set(convert.DEFAULT_DECODER_MAP.values())]
    assert irv2_names or decoder_names, (
        "reference checkpoint read OK but no variable matches the slim IRv2 "
        f"prefix or the decoder name map; first 20 names: "
        f"{sorted(tf_vars)[:20]} — extend convert.DEFAULT_DECODER_MAP and "
        "complete this test: convert → greedy decode → token equality")


def _decode_fixture():
    from vidcap_tpu.config import get_preset
    from vidcap_tpu.models.decoding import greedy_decode
    from vidcap_tpu.models.model import VidCapModel, create_model, init_params

    cfg = get_preset("synthetic_tiny")
    model = create_model(cfg, vocab_size=100)
    params = init_params(model, cfg, jax.random.key(1234))
    rng = np.random.default_rng(99)
    feats = jnp.asarray(
        rng.normal(size=(4, cfg.data.num_frames, cfg.data.feature_dim)),
        jnp.float32)

    def step_fn(state, tok):
        return model.apply({"params": params}, state, tok,
                           method=VidCapModel.step)

    state = model.apply({"params": params}, feats,
                        method=VidCapModel.init_state)
    return np.asarray(greedy_decode(step_fn, state, 4, 10).tokens)


def test_self_golden_greedy():
    toks = _decode_fixture()
    if not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as f:
            json.dump({"tokens": toks.tolist(),
                       "note": "self-golden frozen at first green build"}, f)
        pytest.skip("golden fixture created on first run")
    with open(GOLDEN) as f:
        golden = np.asarray(json.load(f)["tokens"])
    np.testing.assert_array_equal(toks, golden)
