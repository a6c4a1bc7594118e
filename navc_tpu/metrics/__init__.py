"""Caption metrics: PTB-style tokenizer, BLEU, ROUGE-L, CIDEr, METEOR-equivalent.

Replaces the reference's vendored coco-caption stack (misc/cocoeval.py +
coco-caption/pycocoevalcap): BLEU/ROUGE/CIDEr are from-scratch ports of the
published algorithms; the Java PTB tokenizer and METEOR jar (absent from the
reference checkout, .MISSING_LARGE_BLOBS:1-4) are replaced by native
implementations (Python with an optional C++ fast path, navc_tpu/native).
"""

from .tokenizer import ptb_tokenize, tokenize_corpus  # noqa: F401
from .bleu import corpus_bleu  # noqa: F401
from .rouge import corpus_rouge_l  # noqa: F401
from .cider import corpus_cider  # noqa: F401
from .meteor import corpus_meteor  # noqa: F401
from .scorer import COCOScorer  # noqa: F401
