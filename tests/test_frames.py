"""On-device frame pipeline ops (SURVEY.md C1): sampling indices, jitted
resize/normalize (BASELINE.json: frame sampling compiles to XLA)."""
import jax.numpy as jnp
import numpy as np

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
