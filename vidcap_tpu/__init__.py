"""vidcap_tpu — a TPU-native (JAX/XLA/Pallas) multitask end-to-end video-captioning framework.

Re-designed from scratch with the capabilities of the reference repo
``adwardlee/multitask-end-to-end-video-captioning`` (see SURVEY.md — the reference mount was
empty at survey time, so capability citations point at SURVEY.md sections / BASELINE.json
rather than reference file:line).

Public API mirrors the reference's ``train`` / ``sample`` / ``caption`` entry points
(BASELINE.json "north_star"), exposed via :mod:`vidcap_tpu.cli` and the top-level
functions re-exported here.
"""

__version__ = "0.1.0"

from vidcap_tpu.config import Config, PRESETS, get_preset  # noqa: F401


def __getattr__(name):  # lazy: keep bare `import vidcap_tpu` light
    if name == "Captioner":
        from vidcap_tpu.inference import Captioner
        return Captioner
    if name == "CaptionDataset":
        from vidcap_tpu.data.loader import CaptionDataset
        return CaptionDataset
    if name == "train":
        from vidcap_tpu.train.loop import train
        return train
    if name == "create_model":
        from vidcap_tpu.models.model import create_model
        return create_model
    raise AttributeError(name)
