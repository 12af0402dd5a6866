"""Serving loop (serving.py): stdin paths → batched captions, partial batches,
bad-input resilience."""
import io

import numpy as np

from vidcap_tpu.inference import Captioner
from vidcap_tpu.serving import CaptionServer


def test_serve_features_roundtrip(tmp_path, tiny_cfg, tiny_dataset):
    cap = Captioner.from_checkpoint(tiny_cfg, tiny_dataset, checkpoint_dir=None)
    server = CaptionServer(tiny_cfg, cap, batch_size=4)

    paths = []
    rng = np.random.default_rng(0)
    for i in range(6):   # 1.5 batches → exercises flush + partial batch
        p = tmp_path / f"feat{i}.npy"
        np.save(p, rng.normal(size=(tiny_cfg.data.num_frames,
                                    tiny_cfg.data.feature_dim)
                              ).astype(np.float32))
        paths.append(str(p))
    paths.insert(3, str(tmp_path / "missing.npy"))   # bad row skipped

    out = io.StringIO()
    served = server.run(inp=io.StringIO("\n".join(paths) + "\n"), out=out)
    lines = [l for l in out.getvalue().splitlines() if l]
    assert served == 6 and len(lines) == 6
    for line in lines:
        path, caption = line.split("\t")
        assert path.endswith(".npy")
        assert isinstance(caption, str)
