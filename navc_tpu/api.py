"""High-level inference API: checkpoint -> captions.

A serving-oriented façade over the decode stack — the piece a production
deployment embeds. Loads a self-describing checkpoint (plus the optional AR
teacher for NACF/NAB rescoring), builds the jitted pipeline once, and
captions batches of pre-extracted features.

Example:
    pipe = CaptionPipeline.from_checkpoints("best.ckpt", teacher="arb.ckpt",
                                            info_corpus="info_corpus.pkl")
    sentences = pipe.caption({"feats_i": fi, "feats_m": fm}, category=cats)
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional

import numpy as np

from .config import Config
from .runtime.checkpoint import load_model_and_config
from .runtime.evaluate import Evaluator
from .runtime.sentence import duplicate, to_sentence


class CaptionPipeline:
    def __init__(self, model, variables, cfg: Config, vocab: Dict[int, str],
                 teacher_model=None, teacher_variables=None,
                 teacher_cfg: Optional[Config] = None,
                 dict_mapping: Optional[np.ndarray] = None,
                 use_pallas: Optional[bool] = None,
                 dedup_ngrams: bool = True):
        if use_pallas is not None:
            cfg = cfg.replace(use_pallas=use_pallas)
        self.cfg = cfg
        self.vocab = vocab
        self.variables = variables
        self.teacher_variables = teacher_variables
        self.dedup_ngrams = dedup_ngrams
        self.evaluator = Evaluator(cfg, model, teacher_cfg, teacher_model,
                                   dict_mapping)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoints(cls, model_path: str, teacher: Optional[str] = None,
                         info_corpus: Optional[str] = None,
                         use_pallas: Optional[bool] = None,
                         **kw) -> "CaptionPipeline":
        model, variables, cfg, _ = load_model_and_config(model_path)
        tm = tv = tc = None
        dict_mapping = None
        student_corpus = None
        vocab: Dict[int, str] = {}
        corpus_path = info_corpus or cfg.info_corpus
        if corpus_path:
            with open(corpus_path, "rb") as f:
                student_corpus = pickle.load(f)
            vocab = student_corpus["info"]["itow"]
        if teacher:
            tm, tv, tc, _ = load_model_and_config(teacher)
            # teacher rescoring indexes teacher logits with student token
            # ids; a teacher trained on a different vocabulary needs the
            # id remap or every confidence read lands on the wrong word
            # (reference misc/utils.py:33-51) — same derivation as
            # cli/translate.py
            if student_corpus is not None and tc.info_corpus:
                from .runtime.sentence import get_dict_mapping
                with open(tc.info_corpus, "rb") as f:
                    teacher_corpus = pickle.load(f)
                dict_mapping = get_dict_mapping(
                    cfg, tc, student_corpus, teacher_corpus)
        return cls(model, variables, cfg, vocab, tm, tv, tc,
                   dict_mapping=dict_mapping, use_pallas=use_pallas, **kw)

    # ------------------------------------------------------------------
    def caption_ids(self, feats: Dict[str, np.ndarray],
                    category: Optional[np.ndarray] = None) -> np.ndarray:
        """(B,) batches of features -> (B, max_len) token ids."""
        b = next(iter(feats.values())).shape[0]
        batch: Dict[str, np.ndarray] = {
            k: np.asarray(v, np.float32) for k, v in feats.items()}
        batch["category"] = (np.asarray(category, np.int32).reshape(b, 1)
                             if category is not None
                             else np.zeros((b, 1), np.int32))
        hyp, _, _, _, _ = self.evaluator.decode_batch(
            self.variables, batch,
            teacher_variables=self.teacher_variables)
        hyp = np.asarray(hyp)
        if hyp.ndim == 3:
            # AR checkpoints saved with topk > 1 return (B, topk, L) n-best
            # sorted by descending score (decoding/beam.py); the pipeline
            # contract is one caption per item — take the best
            hyp = hyp[:, 0]
        return hyp

    def caption(self, feats: Dict[str, np.ndarray],
                category: Optional[np.ndarray] = None) -> List[str]:
        """(B,) batches of features -> list of caption strings."""
        assert self.vocab, "a vocabulary (info_corpus) is required for text"
        ids = self.caption_ids(feats, category)
        out = []
        for row in ids:
            sent = to_sentence(row, self.vocab)
            if self.cfg.decoding_type == "NARFormer" and self.dedup_ngrams:
                sent, _ = duplicate(sent)
            out.append(sent)
        return out
