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
