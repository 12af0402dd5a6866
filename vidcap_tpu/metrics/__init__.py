from vidcap_tpu.metrics.cider import CiderScorer, cider_d  # noqa: F401
from vidcap_tpu.metrics.bleu import corpus_bleu, sentence_bleu4  # noqa: F401
from vidcap_tpu.metrics.rouge import rouge_l  # noqa: F401
from vidcap_tpu.metrics.evaluate import evaluate_captions  # noqa: F401
