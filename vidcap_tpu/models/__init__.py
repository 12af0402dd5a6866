from vidcap_tpu.models.decoder import CaptionDecoder, DecoderState  # noqa: F401
from vidcap_tpu.models.heads import AttributeHead  # noqa: F401
