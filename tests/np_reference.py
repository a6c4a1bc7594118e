"""NumPy re-implementations of the reference decoding semantics.

Hand-written from the behavior documented in SURVEY.md §3.2/§3.3 (reference
decoding/algorithms.py, decoding/na_generate.py, models/Beam.py,
models/Translator.py) — used as ground truth by the parity tests for the
on-device lax.scan implementations. Host-loop style on purpose: this mirrors
the reference control flow as directly as possible.
"""

import numpy as np

PAD, UNK, BOS, EOS, MASK, VIS = 0, 1, 2, 3, 4, 5
NEG_BIG = -1e20


def select_worst_np(token_probs, num_mask):
    """Per-row k smallest (algorithms.py:206-215) with stable tie order."""
    masks = np.zeros(token_probs.shape, bool)
    for i in range(token_probs.shape[0]):
        kk = max(1, int(num_mask[i]))
        ind = np.argsort(token_probs[i], kind="stable")[:kk]
        masks[i, ind] = True
    return masks


def np_mask_predict(predict, teacher_score, tokens, pad_mask, lengths,
                    iterations, use_ct, masking_decision=False,
                    no_candidate_decision=False):
    """MaskPredict.generate (algorithms.py:231-273)."""
    tokens = tokens.copy()
    T = iterations + 1 if use_ct else iterations
    seq_lens = lengths.astype(np.float64)

    if use_ct:
        t = np.where(tokens == MASK, VIS, tokens)
        ids, probs = predict(t)
        ids = ids.copy(); probs = probs.copy()
        ids[pad_mask] = PAD
        probs[pad_mask] = 1.0
        probs[ids == MASK] = 0.0
        tokens, token_probs = ids, probs
    else:
        ids, probs = predict(tokens)
        ids = ids.copy(); probs = probs.copy()
        ids[pad_mask] = PAD
        probs[pad_mask] = 1.0
        tokens, token_probs = ids, probs

    for counter in range(1, T):
        if teacher_score is not None and masking_decision:
            corresponding = teacher_score(tokens, pad_mask)
        else:
            corresponding = np.ones_like(token_probs)

        if use_ct and counter == 1:
            mask_ind = tokens == MASK
        else:
            # torch promotes the python-float ratio to f32 before multiplying
            # with the f32 seq_lens tensor (algorithms.py:255-256)
            ratio = np.float32(1.0 - counter / T)
            num_mask = (seq_lens.astype(np.float32) * ratio).astype(np.int64)
            sel = token_probs.astype(np.float32) * corresponding.astype(np.float32)
            mask_ind = select_worst_np(sel, num_mask)

        tokens[mask_ind] = MASK
        new_ids, new_probs = predict(tokens)
        new_ids = new_ids.copy(); new_probs = new_probs.copy()
        new_ids[pad_mask] = PAD
        new_probs[pad_mask] = 1.0
        tokens[mask_ind] = new_ids[mask_ind]
        token_probs[mask_ind] = new_probs[mask_ind]

    if teacher_score is not None and not no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = np.ones_like(token_probs)
    with np.errstate(divide="ignore"):
        lprobs = np.log(token_probs * corresponding)
    return tokens, lprobs


def np_select_best_length_beam(hyp, lprobs, lengths, bsz, lbs, alpha):
    """na_generate.py:66-77."""
    L = hyp.shape[-1]
    hyp = hyp.reshape(bsz, lbs, L)
    lp = lprobs.reshape(bsz, lbs, L)
    lens = lengths.reshape(bsz, lbs).astype(np.float64)
    avg = lp.sum(-1) / lens ** alpha
    best = avg.argmax(-1)
    return np.stack([hyp[b, best[b]] for b in range(bsz)], axis=0)


class NpBeam:
    """models/Beam.py with torch->numpy translation."""

    def __init__(self, size, max_len, specific_nums_of_sents=1):
        self.size = size
        self.specific = max(size, specific_nums_of_sents)
        self.done = False
        self.max_len = max_len
        self.scores = np.zeros(size)
        self.prev_ks = []
        ys0 = np.full(size, PAD, np.int64)
        ys0[0] = BOS
        self.next_ys = [ys0]
        self.finished = []

    def advance(self, word_prob):
        num_words = word_prob.shape[1]
        if len(self.prev_ks) > 0:
            beam_lk = word_prob + self.scores[:, None]
            for i in range(len(self.next_ys[-1])):
                if self.next_ys[-1][i] == EOS:
                    beam_lk[i] = NEG_BIG
        else:
            beam_lk = word_prob[0]
        flat = beam_lk.reshape(-1)
        best_ids = np.argsort(-flat, kind="stable")[: self.size]
        best_scores = flat[best_ids]
        self.scores = best_scores
        prev_k = best_ids // num_words
        self.prev_ks.append(prev_k)
        self.next_ys.append(best_ids - prev_k * num_words)

        for i in range(len(self.next_ys[-1])):
            if self.next_ys[-1][i] == EOS:
                self.finished.append([self.scores[i], len(self.next_ys) - 1, i])
                if len(self.finished) >= self.specific:
                    self.done = True
            if self.done:
                return True

        if len(self.next_ys) == self.max_len:
            self.done = True
            if not len(self.finished):
                for i in range(len(self.next_ys[-1])):
                    self.finished.append([self.scores[i], len(self.next_ys) - 1, i])
        return self.done

    def get_current_state(self):
        """Tentative hypotheses sorted by score, BOS-prefixed (Beam.py:146-158)."""
        if len(self.next_ys) == 1:
            return self.next_ys[0][:, None].copy()
        keys = np.argsort(-self.scores, kind="stable")
        hyps = [[BOS] + self.get_hypothesis(k) for k in keys]
        return np.asarray(hyps, np.int64)

    def get_hypothesis(self, k):
        hyp = []
        for j in range(len(self.prev_ks) - 1, -1, -1):
            hyp.append(int(self.next_ys[j + 1][k]))
            k = int(self.prev_ks[j][k])
        return hyp[::-1]

    def sort_finished(self, alpha=1.0):
        fin = [[sc / (t ** alpha), t, k] for sc, t, k in self.finished]
        fin.sort(key=lambda a: -a[0])
        return fin

    def get_hypothesis_from_tk(self, timestep, k):
        hyp = []
        for j in range(len(self.prev_ks[:timestep]) - 1, -1, -1):
            hyp.append(int(self.next_ys[j + 1][k]))
            k = int(self.prev_ks[j][k])
        return hyp[::-1]


def np_beam_search(decode_step, bsz, beam_size, max_len, alpha, topk=1):
    """Translator.translate_batch_ARFormer without batch shrinking.

    decode_step(prefix (N, t) int) -> (N, V) log-probs of the next token.
    """
    beams = [NpBeam(beam_size, max_len, topk) for _ in range(bsz)]
    for t in range(1, max_len):
        if all(bm.done for bm in beams):
            break
        # NOTE: the reference shrinks the batch to live instances
        # (Translator.collate_active_info) purely as a perf optimization; we
        # keep static rows and simply skip advancing finished beams — outputs
        # are identical and row i always aligns with encoder row i.
        prefixes = [bm.get_current_state() for bm in beams]
        stacked = np.concatenate(prefixes, axis=0)  # (bsz*beam, t)
        wp = decode_step(stacked).reshape(bsz, beam_size, -1)
        for i, bm in enumerate(beams):
            if not bm.done:
                bm.advance(wp[i])

    hyps, scores = [], []
    for bm in beams:
        fin = bm.sort_finished(alpha)
        sc, t, kk = fin[0]
        hyps.append(bm.get_hypothesis_from_tk(t, kk))
        scores.append(sc)
    return hyps, scores


def _np_ct_or_blank(predict, tokens, pad_mask, use_ct):
    """algorithms.py:288-293 / 360-365."""
    if use_ct:
        t = np.where(tokens == MASK, VIS, tokens)
        ids, probs = predict(t)
        ids = ids.copy(); probs = probs.copy()
        ids[pad_mask] = PAD
        probs[pad_mask] = 1.0
        probs[ids == MASK] = 0.0
        visual_mask = (ids != MASK) & (ids != PAD)
        return ids, probs, visual_mask
    token_probs = np.where(pad_mask, 1.0, 0.0)
    return tokens.copy(), token_probs, None


def _np_refinement_tail(predict, tokens, token_probs, pad_mask, seq_lens,
                        q_iterations, use_ct, visual_mask):
    """algorithms.py:326-339 / 400-413."""
    T = q_iterations
    for i in range(T):
        if i == 0 and use_ct:
            mask_ind = visual_mask
        else:
            ratio = np.float32(0.4 * (1.0 - i / T))
            num_mask = (seq_lens.astype(np.float32) * ratio).astype(np.int64)
            mask_ind = select_worst_np(token_probs.astype(np.float32), num_mask)
        tokens[mask_ind] = MASK
        new_ids, new_probs = predict(tokens)
        new_ids = new_ids.copy(); new_probs = new_probs.copy()
        new_ids[pad_mask] = PAD
        new_probs[pad_mask] = 1.0
        token_probs[mask_ind] = new_probs[mask_ind]
        tokens[mask_ind] = new_ids[mask_ind]
    return tokens, token_probs


def np_left2right(predict, teacher_score, tokens, pad_mask, lengths,
                  q, q_iterations, use_ct, no_candidate_decision=False):
    """Left2Right.generate (algorithms.py:275-344)."""
    bsz, seq_len = tokens.shape
    seq_lens = lengths.astype(np.float64)
    tokens, token_probs, visual_mask = _np_ct_or_blank(predict, tokens, pad_mask, use_ct)

    all_mask_ind = []
    for i in range(bsz):
        all_mask_ind.append(
            [j for j in range(int(lengths[i])) if tokens[i, j] == MASK])

    for counter in range(0, seq_len, q):
        masks = np.zeros(tokens.shape, bool)
        for i in range(bsz):
            ind = all_mask_ind[i][counter:min(counter + q, len(all_mask_ind[i]))] \
                if counter < len(all_mask_ind[i]) else []
            masks[i, ind] = True
        if masks.sum() == 0:
            break
        tokens[masks] = MASK
        new_ids, new_probs = predict(tokens)
        new_ids = new_ids.copy(); new_probs = new_probs.copy()
        new_ids[pad_mask] = PAD
        new_probs[pad_mask] = 1.0
        token_probs[masks] = new_probs[masks]
        tokens[masks] = new_ids[masks]

    tokens, token_probs = _np_refinement_tail(
        predict, tokens, token_probs, pad_mask, seq_lens, q_iterations,
        use_ct, visual_mask)

    if teacher_score is not None and not no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = np.ones_like(token_probs)
    with np.errstate(divide="ignore"):
        lprobs = np.log(token_probs * corresponding)
    return tokens, lprobs


def np_easy_first(predict, teacher_score, tokens, pad_mask, lengths,
                  q, q_iterations, use_ct, no_candidate_decision=False):
    """EasyFirst.generate (algorithms.py:347-417)."""
    bsz, seq_len = tokens.shape
    seq_lens = lengths.astype(np.float64)
    tokens, token_probs, visual_mask = _np_ct_or_blank(predict, tokens, pad_mask, use_ct)

    pre = 0
    while True:
        mask_ind = tokens == MASK
        remain = mask_ind.sum()
        if remain == 0 or pre == remain:
            break
        pre = remain
        new_ids, new_probs = predict(tokens)
        new_ids = new_ids.copy(); new_probs = new_probs.copy()
        new_ids[pad_mask] = PAD
        new_probs[pad_mask] = 1.0

        conf = new_probs.copy()
        conf[~mask_ind] = 0
        remain_len = mask_ind.sum(-1)
        masks = np.zeros(tokens.shape, bool)
        for i in range(bsz):
            if remain_len[i] == 0:
                continue
            kk = min(q, int(remain_len[i]))
            ind = np.argsort(-conf[i], kind="stable")[:kk]
            masks[i, ind] = True
        token_probs[masks] = new_probs[masks]
        tokens[masks] = new_ids[masks]

    tokens, token_probs = _np_refinement_tail(
        predict, tokens, token_probs, pad_mask, seq_lens, q_iterations,
        use_ct, visual_mask)

    if teacher_score is not None and not no_candidate_decision:
        corresponding = teacher_score(tokens, pad_mask)
    else:
        corresponding = np.ones_like(token_probs)
    with np.errstate(divide="ignore"):
        lprobs = np.log(token_probs * corresponding)
    return tokens, lprobs
