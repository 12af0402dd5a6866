from vidcap_tpu.ops.ngram_hash import (device_ngram_keys,  # noqa: F401
                                       host_ngram_key)
