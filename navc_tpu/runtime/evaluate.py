"""Evaluation loop: encode -> decode -> sentences -> metrics.

Capability parity with reference misc/run.py run_eval (run.py:99-246):
encode-only forward, optional teacher encode, batched decoding (AR beam or
NAR refinement), id->sentence conversion, optional 4-gram dedup, COCO metrics
+ weighted 'Sum', diversity diagnostics, latency protocol (batch_size=1 mean
wall-clock per translate call).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import Config
from ..decoding import make_ar_generator, make_nar_generator
from ..metrics import COCOScorer
from .crit import kl_length_loss
from .sentence import analyze_length_novel_unique, duplicate, to_sentence
from .train_step import make_encode_fn


class Evaluator:
    """Builds the jitted encode/decode pipeline once per config."""

    def __init__(self, cfg: Config, model, teacher_cfg: Optional[Config] = None,
                 teacher_model=None, dict_mapping: Optional[np.ndarray] = None,
                 collect: bool = False):
        self.cfg = cfg
        self.model = model
        self.teacher_model = teacher_model
        self.collect = collect
        self.dict_mapping = None if dict_mapping is None else jnp.asarray(dict_mapping)
        self.encode = make_encode_fn(cfg, model)
        self.teacher_encode = (
            make_encode_fn(teacher_cfg or cfg, teacher_model)
            if teacher_model is not None else None)
        if cfg.decoding_type == "NARFormer":
            self.generate = make_nar_generator(cfg, model, teacher_model,
                                               collect=collect)
        else:
            self.generate = make_ar_generator(cfg, model)

    def decode_batch(self, variables, batch, teacher_variables=None):
        """Returns (hyp, scores, enc, collected, gen_time).

        ``gen_time`` times ONLY the generate call plus its host sync — the
        reference latency protocol times translate_batch with both the model
        and teacher encode forwards outside the timed region
        (misc/run.py:130-143); ``hyp`` comes back as a host numpy array.
        """
        feats = [jnp.asarray(batch["feats_%s" % ch]) for ch in self.cfg.modality.lower()]
        category = jnp.asarray(batch["category"]) if self.cfg.with_category else None
        enc = self.encode(variables["params"], variables.get("batch_stats", {}), feats)
        collected = None
        if self.cfg.decoding_type == "NARFormer":
            tenc = None
            if self.teacher_encode is not None and teacher_variables is not None:
                tenc = self.teacher_encode(
                    teacher_variables["params"],
                    teacher_variables.get("batch_stats", {}), feats)
            t0 = time.perf_counter()
            out = self.generate(variables, enc, category,
                                teacher_variables, tenc, self.dict_mapping)
            if self.collect:
                hyp, collected = out
            else:
                hyp = out
            scores = None
        else:
            t0 = time.perf_counter()
            hyp, scores = self.generate(variables, enc, category)
        # np.asarray forces execution + transfer (block_until_ready is not
        # reliable on the tunnel transport) — the sync must sit inside the
        # timed region or async dispatch would make gen_time meaningless
        hyp = np.asarray(jax.device_get(hyp))
        gen_time = time.perf_counter() - t0
        return hyp, scores, enc, collected, gen_time


def run_eval(cfg: Config, evaluator: Evaluator, variables, loader, vocab,
             teacher_variables=None, scorer: Optional[COCOScorer] = None,
             no_score: bool = False, analyze: bool = False,
             print_sent: bool = False,
             collect_path: Optional[str] = None) -> Dict[str, Any]:
    scorer = scorer or COCOScorer()
    gt_captions = loader.dataset.get_references()
    pred_captions: Dict[str, list] = defaultdict(list)
    best_candidate_sents: Dict[str, list] = defaultdict(list)
    best_candidate_score: Dict[str, list] = defaultdict(list)
    # the reference collects AR candidates whenever collect+ARFormer,
    # independent of topk (run.py:126) — a topk==1 collect run must still
    # produce caption/score pairs, not an empty pickle
    collect_ar = (cfg.decoding_type == "ARFormer" and evaluator.collect is False
                  and collect_path is not None)

    all_time = 0.0
    n_batches = 0
    length_loss_sum, length_loss_n = 0.0, 0

    for batch in loader:
        if n_batches == 0 and cfg.batch_size == 1:
            # warm the jit cache outside the timed region: the reference's
            # eager torch protocol has no compile cost to exclude, ours does
            # (scripts/latency.py warms up for the same reason)
            evaluator.decode_batch(variables, batch, teacher_variables)
        hyp, hyp_scores, enc, collected, gen_time = evaluator.decode_batch(
            variables, batch, teacher_variables)
        all_time += gen_time
        n_batches += 1

        if collected is not None:
            iter_toks = np.asarray(collected[0])
            iter_probs = np.asarray(collected[1])
            for k in range(batch["num_valid"]):
                vid = batch["video_ids"][k]
                for t in range(iter_toks.shape[1]):
                    best_candidate_sents[vid].append(
                        to_sentence(iter_toks[k, t], vocab))
                    best_candidate_score[vid].append(iter_probs[k, t].tolist())
        # unify (B, L) single-hypothesis and (B, topk, L) n-best shapes the
        # way the reference unsqueezes 2-D outputs (run.py:145-148)
        hyp3 = hyp[:, None, :] if hyp.ndim == 2 else hyp
        scores3 = None
        if hyp_scores is not None:
            scores3 = np.asarray(hyp_scores)
            if scores3.ndim == 1:
                scores3 = scores3[:, None]

        if collect_ar and scores3 is not None:
            for k in range(batch["num_valid"]):
                vid = batch["video_ids"][k]
                for j in range(hyp3.shape[1]):
                    pred_captions[vid].append({
                        "caption": to_sentence(hyp3[k, j], vocab),
                        "score": float(scores3[k, j])})

        if cfg.decoding_type == "NARFormer" and "length_target" in batch:
            ll = kl_length_loss(
                enc["pred_length"], jnp.asarray(batch["length_target"]),
                jnp.asarray(batch["valid_mask"]))
            length_loss_sum += float(ll) * batch["num_valid"]
            length_loss_n += batch["num_valid"]

        if not collect_ar:
            if not no_score and hyp3.shape[1] != 1:
                # the reference asserts one hypothesis per video when
                # scoring (run.py:158); scoring n-best lists would corrupt
                # the metrics silently
                raise ValueError(
                    "scoring requires topk == 1 (got %d hypotheses/video); "
                    "use no_score or collect mode" % hyp3.shape[1])
            for k in range(batch["num_valid"]):
                vid = batch["video_ids"][k]
                for j in range(hyp3.shape[1]):
                    sent = to_sentence(hyp3[k, j], vocab)
                    # 4-gram dedup only when requested — the reference's
                    # flag is unset by default (run.py:163:
                    # opt.get('duplicate', False))
                    if cfg.duplicate and cfg.decoding_type == "NARFormer":
                        sent, _ = duplicate(sent)
                    if print_sent:
                        print("%s: %s" % (vid, sent))
                    pred_captions[vid].append(
                        {"image_id": vid, "caption": sent})

    if collect_path is not None:
        import pickle
        with open(collect_path, "wb") as f:
            if collect_ar:
                pickle.dump(dict(pred_captions), f)
            else:
                pickle.dump([dict(best_candidate_sents),
                             dict(best_candidate_score)], f)
        if collect_ar:
            return {"collected": len(pred_captions)}

    res: Dict[str, Any] = {}
    if cfg.batch_size == 1 and n_batches:
        # mean wall-clock of the generate call only, encode forwards outside
        # the timed region — the exact reference -latency protocol
        # (misc/run.py:130 vs 139-143); scripts/latency.py agrees
        res["latency"] = all_time / n_batches

    if analyze:
        ave_length, novel, unique, usage, _, gram4 = analyze_length_novel_unique(
            loader.dataset.captions, pred_captions, vocab,
            splits=loader.dataset.splits, n=1)
        res.update({"ave_length": ave_length, "novel": novel, "unique": unique,
                    "usage": usage, "gram4": gram4})

    if not no_score:
        valid_score, _ = scorer.score(gt_captions, pred_captions, pred_captions.keys())
        res.update(valid_score)
        metric_sum = cfg.metric_sum
        candidate = [res["Bleu_4"], res["METEOR"], res["ROUGE_L"], res["CIDEr"]]
        res["Sum"] = sum(v for i, v in enumerate(candidate) if metric_sum[i])
        if length_loss_n:
            res["Length Loss"] = length_loss_sum / length_loss_n

    return res
