"""AOT export (vidcap_tpu/export.py): the serialized StableHLO artifact must
compute EXACTLY what live serving computes (same builder — Captioner.
build_decode_fn), be self-contained (weights + vocab baked in), and survive a
full serialize → disk → deserialize round trip."""
import numpy as np
import pytest

from vidcap_tpu.export import ExportedCaptioner, export_decoder
from vidcap_tpu.inference import Captioner


@pytest.fixture()
def captioner(tiny_cfg, tiny_dataset):
    return Captioner.from_checkpoint(tiny_cfg, tiny_dataset,
                                     checkpoint_dir=None)


def _feats(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, cfg.data.num_frames, cfg.data.feature_dim)
                      ).astype(np.float32)


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_export_round_trip_token_parity(tiny_cfg, captioner, tmp_path, method):
    feats = _feats(tiny_cfg, 8)
    live = captioner.decode_batch(feats, method=method, beam_width=3)

    meta = export_decoder(captioner, str(tmp_path / "exp"), batch_size=8,
                          method=method, beam_width=3)
    assert meta["schema"] == 1 and meta["batch_size"] == 8
    ec = ExportedCaptioner.load(str(tmp_path / "exp"))
    np.testing.assert_array_equal(np.asarray(ec.decode_batch(feats)),
                                  np.asarray(live))
    # vocab shipped inside the artifact: strings decode without the dataset
    caps = ec.caption(feats)
    assert len(caps) == 8 and all(isinstance(c, str) for c in caps)


def test_export_partial_batch_and_chunking(tiny_cfg, captioner, tmp_path):
    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    ec = ExportedCaptioner.load(str(tmp_path / "exp"))

    feats = _feats(tiny_cfg, 3, seed=1)          # N < B: zero-pad + mask
    live = captioner.decode_batch(
        np.concatenate([feats, np.zeros_like(feats[:1])]), method="greedy",
        frame_mask=np.concatenate(
            [np.ones((3, tiny_cfg.data.num_frames), np.float32),
             np.zeros((1, tiny_cfg.data.num_frames), np.float32)]))[:3]
    np.testing.assert_array_equal(ec.decode_batch(feats), np.asarray(live))

    caps = ec.caption(_feats(tiny_cfg, 10, seed=2))   # N > B: chunked
    assert len(caps) == 10

    with pytest.raises(ValueError):
        ec.decode_batch(_feats(tiny_cfg, 5))     # > B without chunking
    with pytest.raises(ValueError):              # wrong feature dims
        ec.decode_batch(np.zeros((2, tiny_cfg.data.num_frames, 7), np.float32))


def test_export_rejects_sample_and_pixels(tiny_cfg, captioner, tmp_path):
    with pytest.raises(ValueError):
        export_decoder(captioner, str(tmp_path / "e1"), method="sample")


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_export_batch_polymorphic(tiny_cfg, captioner, tmp_path, method):
    """batch_size=None exports ONE artifact with a symbolic leading dim
    (jax.export.symbolic_shape): every concrete batch size decodes with no
    padding and exact token parity vs the live per-shape jit."""
    meta = export_decoder(captioner, str(tmp_path / "poly"), batch_size=None,
                          method=method, beam_width=3)
    assert meta["batch_size"] is None
    ec = ExportedCaptioner.load(str(tmp_path / "poly"))
    assert ec.batch_size is None
    for n in (1, 3, 8):
        feats = _feats(tiny_cfg, n, seed=n)
        live = captioner.decode_batch(feats, method=method, beam_width=3)
        np.testing.assert_array_equal(np.asarray(ec.decode_batch(feats)),
                                      np.asarray(live), err_msg=f"N={n}")
    caps = ec.caption(_feats(tiny_cfg, 5, seed=99))
    assert len(caps) == 5


def test_serve_from_export_artifact(tiny_cfg, captioner, tmp_path):
    """CaptionServer runs off an ExportedCaptioner (serve --from-export):
    same captions as serving the live checkpointed model, and a method
    mismatch is an error, not a silent wrong-method decode."""
    import io
    from vidcap_tpu.serving import CaptionServer

    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    ec = ExportedCaptioner.load(str(tmp_path / "exp"))
    ec.check_config(tiny_cfg)

    paths = []
    rng = np.random.default_rng(3)
    for i in range(5):                       # 1¼ batches: flush + partial
        p = tmp_path / f"f{i}.npy"
        np.save(p, rng.normal(size=(tiny_cfg.data.num_frames,
                                    tiny_cfg.data.feature_dim)
                              ).astype(np.float32))
        paths.append(str(p))
    inp = "\n".join(paths) + "\n"

    out_live, out_exp = io.StringIO(), io.StringIO()
    CaptionServer(tiny_cfg, captioner, batch_size=4).run(
        inp=io.StringIO(inp), out=out_live)
    CaptionServer(tiny_cfg, ec, batch_size=4, method="greedy").run(
        inp=io.StringIO(inp), out=out_exp)
    assert out_exp.getvalue() == out_live.getvalue()

    with pytest.raises(ValueError):
        ec.decode_batch(_feats(tiny_cfg, 2), method="beam")
    import dataclasses
    bad = dataclasses.replace(
        tiny_cfg, data=dataclasses.replace(tiny_cfg.data, feature_dim=7))
    with pytest.raises(ValueError):
        ec.check_config(bad)


def test_http_serve_from_export(tiny_cfg, captioner, tmp_path):
    """The HTTP front-end (make_http_server → BatchingCaptioner) runs off an
    export artifact: POST /caption returns a caption identical to the live
    model's for the same features."""
    import http.client
    import io as _io
    import json
    import threading
    from vidcap_tpu.serving import make_http_server

    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    ec = ExportedCaptioner.load(str(tmp_path / "exp"))
    server, svc = make_http_server(tiny_cfg, ec, port=0, batch_size=4,
                                   method="greedy", max_wait_ms=20.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        feats = _feats(tiny_cfg, 1, seed=9)[0]
        buf = _io.BytesIO()
        np.save(buf, feats)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/caption", body=buf.getvalue(),
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        status, body = r.status, json.loads(r.read())
        conn.close()
        assert status == 200
        live = captioner.dataset.vocab.decode_str(
            captioner.decode_batch(feats[None], method="greedy")[0])
        assert body["caption"] == live
    finally:
        server.shutdown()
        svc.close()


def test_caption_from_export_rejects_conflicting_method(tiny_cfg, captioner,
                                                        tmp_path):
    """`caption --from-export --method X` with X != the artifact's frozen
    method must exit with an error, not silently decode with the artifact."""
    from vidcap_tpu.cli.main import build_parser
    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    p = build_parser()
    a = p.parse_args(["caption", "--preset", "synthetic_tiny",
                      "--from-export", str(tmp_path / "exp"),
                      "--method", "beam"])
    with pytest.raises(SystemExit):
        a.fn(a)


def test_export_cli_round_trip(tmp_path, monkeypatch, capsys):
    """`vidcap_tpu export` then `caption --from-export`: the deployable unit
    works end-to-end through the public CLI (synthetic fixture, in-process)."""
    from vidcap_tpu.cli.main import build_parser, main
    ckpt = str(tmp_path / "ckpt")
    # a real checkpoint first: export now refuses to bake random-init params
    # into a deployable artifact (review r4)
    assert main(["train", "--preset", "synthetic_tiny", "--steps", "3",
                 "--checkpoint-dir", ckpt]) == 0
    p = build_parser()
    exp_dir = str(tmp_path / "artifact")
    a = p.parse_args(["export", "--preset", "synthetic_tiny",
                      "--out", exp_dir, "--batch", "8",
                      "--method", "greedy", "--checkpoint-dir", ckpt])
    assert a.fn(a) == 0
    out_json = str(tmp_path / "caps.json")
    a = p.parse_args(["caption", "--preset", "synthetic_tiny",
                      "--from-export", exp_dir, "--out", out_json])
    assert a.fn(a) == 0
    import json
    with open(out_json) as f:
        results = json.load(f)
    assert results and all(isinstance(v, list) for v in results.values())


def test_serve_from_export_rejects_conflicting_method(tiny_cfg, captioner,
                                                      tmp_path):
    """serve --from-export holds the SAME contract as caption --from-export:
    a flag conflicting with the frozen graph errors instead of silently
    serving the artifact's method (review r4)."""
    from vidcap_tpu.cli.main import build_parser
    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    p = build_parser()
    a = p.parse_args(["serve", "--preset", "synthetic_tiny",
                      "--from-export", str(tmp_path / "exp"),
                      "--method", "beam"])
    with pytest.raises(SystemExit):
        a.fn(a)


def test_exported_decode_rejects_pixel_inputs(tiny_cfg, captioner, tmp_path):
    """A pixel-mode [N,T,S,S,3] input must fail with the remedy (run
    `extract`), not an unpack error (review r4)."""
    export_decoder(captioner, str(tmp_path / "exp"), batch_size=4,
                   method="greedy")
    ec = ExportedCaptioner.load(str(tmp_path / "exp"))
    pixels = np.zeros((2, tiny_cfg.data.num_frames, 8, 8, 3), np.float32)
    with pytest.raises(ValueError, match="FEATURES"):
        ec.decode_batch(pixels)
