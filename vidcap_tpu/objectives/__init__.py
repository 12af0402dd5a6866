from vidcap_tpu.objectives.xe import masked_xe_loss, shift_right  # noqa: F401
from vidcap_tpu.objectives.multitask import attribute_bce_loss  # noqa: F401
