from vidcap_tpu.ops.ngram_hash import (device_ngram_keys,  # noqa: F401
                                       host_ngram_key)
from vidcap_tpu.ops.pallas_decoder import (model_rollout,  # noqa: F401
                                           pallas_rollout)
from vidcap_tpu.ops.pallas_topk import topk_project  # noqa: F401
