"""On-device frame pipeline ops (SURVEY.md C1): sampling indices, jitted
resize/normalize (BASELINE.json: frame sampling compiles to XLA)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vidcap_tpu.data.frames import (preprocess_frames, sample_frames_device,
                                    uniform_frame_indices)


def test_uniform_indices_cover_range():
    idx = uniform_frame_indices(100, 10)
    assert idx[0] == 0 and idx[-1] == 99
    assert (np.diff(idx) > 0).all()
    # fewer frames than requested: repeats allowed, bounds respected
    idx = uniform_frame_indices(3, 8)
    assert idx.min() >= 0 and idx.max() <= 2 and len(idx) == 8


def test_preprocess_frames_range_and_shape():
    frames = np.random.default_rng(0).integers(
        0, 256, size=(4, 64, 48, 3)).astype(np.uint8)
    out = np.asarray(preprocess_frames(jnp.asarray(frames), out_size=32))
    assert out.shape == (4, 32, 32, 3)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    # pure black maps to -1, pure white to +1
    black = np.asarray(preprocess_frames(jnp.zeros((1, 8, 8, 3), jnp.uint8),
                                         out_size=8))
    white = np.asarray(preprocess_frames(
        jnp.full((1, 8, 8, 3), 255, jnp.uint8), out_size=8))
    np.testing.assert_allclose(black, -1.0, atol=1e-5)
    np.testing.assert_allclose(white, 1.0, atol=1e-5)


def test_sample_frames_device_uniform():
    frames = jnp.arange(20.0)[:, None]
    out = np.asarray(sample_frames_device(frames, 5))[:, 0]
    np.testing.assert_array_equal(out, [0, 5, 10, 14, 19])


def test_decode_video_frames_real_file(tmp_path):
    """Decode an actual encoded video (cv2 round-trip) and uniformly sample."""
    cv2 = pytest.importorskip("cv2")
    from vidcap_tpu.data.frames import decode_video_frames

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for _ in range(20):
        w.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    w.release()

    frames = decode_video_frames(path, num_frames=6)
    assert frames.shape == (6, 48, 64, 3)
    assert frames.dtype == np.uint8


def test_decode_video_frames_bogus_count_fallback(monkeypatch, tmp_path):
    """ADVICE r1: when the container reports frame count <= 0 the decoder must
    fall back to decode-all + uniform sampling rather than keeping only frame
    0 repeated."""
    cv2 = pytest.importorskip("cv2")
    import vidcap_tpu.data.frames as frames_mod

    n_real = 12

    class FakeCap:
        def __init__(self, path):
            self.i = 0

        def get(self, prop):
            return 0.0          # bogus CAP_PROP_FRAME_COUNT

        def read(self):
            if self.i >= n_real:
                return False, None
            # frame content encodes its index so sampling is observable
            f = np.full((8, 8, 3), self.i, np.uint8)
            self.i += 1
            return True, f

        def release(self):
            pass

    # decode_video_frames imports cv2 lazily inside the function
    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    out = frames_mod.decode_video_frames("whatever.mp4", num_frames=4)
    assert out.shape == (4, 8, 8, 3)
    # cvtColor(BGR2RGB) keeps constant-valued frames constant; the 4 sampled
    # frames must span the 12 decoded ones, not repeat frame 0
    vals = sorted(int(f[0, 0, 0]) for f in out)
    assert vals == [0, 4, 7, 11], vals
