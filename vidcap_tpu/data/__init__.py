from vidcap_tpu.data.vocab import Vocab, ptb_tokenize, build_vocab  # noqa: F401
from vidcap_tpu.data.loader import CaptionDataset, Batch  # noqa: F401
from vidcap_tpu.data.attributes import mine_attributes  # noqa: F401
