"""Coverage for the remaining reference knobs: k-best queue, dict mapping,
category-specific eval, norm_type, watch, n_caps_per_video, dataset details,
sentence utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navc_tpu import constants as C
from navc_tpu.config import default_config, Config
from navc_tpu.data.dataset import VideoDataset, get_frame_ids, resampling_ids
from navc_tpu.data.loader import BatchLoader
from navc_tpu.data.synthetic import make_synthetic_corpus, make_synthetic_feats
from navc_tpu.models import build_model, init_params
from navc_tpu.runtime.logger import KBestQueue
from navc_tpu.runtime.sentence import duplicate, to_sentence


def small_cfg(method="NAB", **kw):
    over = dict(
        vocab_size=40, dim_hidden=16, num_attention_heads=2,
        intermediate_size=32, n_frames=4, n_total_frames=10,
        dim_i=12, dim_m=10, modality="mi", max_len=8, batch_size=4,
        compute_dtype="float32",
    )
    over.update(kw)
    return default_config(method, dataset="MSVD", **over)


# ---------------------------------------------------------------------------
# k-best queue (reference misc/logger.py:81-211)
# ---------------------------------------------------------------------------


def test_kbest_relative_sum_scoring(tmp_path):
    q = KBestQueue(k_best_model=1, standard=["Bleu_4", "METEOR", "CIDEr"])
    saves = []
    res1 = {"Bleu_4": 0.2, "METEOR": 0.1, "ROUGE_L": 0.3, "CIDEr": 0.4, "epoch": 0}
    keep, _ = q.check(res1, str(tmp_path), tolerence=2, save_fn=saves.append)
    assert keep and len(saves) == 1
    # every metric is its own best -> Sum == 1.0
    assert abs(res1["Sum"] - 1.0) < 1e-9

    res2 = {"Bleu_4": 0.1, "METEOR": 0.05, "ROUGE_L": 0.2, "CIDEr": 0.2, "epoch": 1}
    keep, _ = q.check(res2, str(tmp_path), tolerence=2, save_fn=saves.append)
    assert keep and len(saves) == 1  # worse: no save
    assert q.continuous_failed_count == 1

    keep, _ = q.check(dict(res2, epoch=2), str(tmp_path), tolerence=2,
                      save_fn=saves.append)
    assert not keep  # tolerance reached -> early stop


def test_kbest_multiple_models(tmp_path):
    folder = os.path.join(str(tmp_path), "tmp_models")
    q = KBestQueue(k_best_model=2, folder_path=folder,
                   standard=["Bleu_4", "CIDEr"])
    saves = []
    for i, cider in enumerate([0.3, 0.2, 0.5]):
        res = {"Bleu_4": 0.2, "METEOR": 0.1, "ROUGE_L": 0.2, "CIDEr": cider,
               "epoch": i}
        q.check(res, str(tmp_path), tolerence=10,
                save_fn=lambda dst: (saves.append(dst), open(dst, "w").close()))
    # third model displaced the second
    assert len(saves) == 3
    kept = {r[2]["epoch"] for r in q.heap}
    assert kept == {0, 2}


# ---------------------------------------------------------------------------
# dict mapping (KD vocab remap, reference misc/utils.py:33-51 + algorithms.py:169-173)
# ---------------------------------------------------------------------------


def test_dict_mapping_remaps_teacher_tokens():
    from navc_tpu.decoding.mask_predict import NARContext, _teacher_score_fn
    cfg = small_cfg("NAB")
    tcfg = small_cfg("ARB", vocab_size=40)
    teacher = build_model(tcfg)
    tvars = init_params(teacher, jax.random.PRNGKey(7), tcfg)
    rng = np.random.RandomState(0)
    tenc = jnp.asarray(rng.randn(4, 8, tcfg.dim_hidden).astype(np.float32))

    # identity mapping vs a swap of two ids must change the scores
    ident = jnp.arange(40, dtype=jnp.int32)
    swap = ident.at[10].set(11).at[11].set(10)
    tokens = jnp.full((4, cfg.max_len), 10, jnp.int32)
    pad = jnp.zeros_like(tokens, bool)

    s_ident = _teacher_score_fn(
        teacher, tvars, NARContext(None, None, tenc, None, ident), cfg)(tokens, pad)
    s_swap = _teacher_score_fn(
        teacher, tvars, NARContext(None, None, tenc, None, swap), cfg)(tokens, pad)
    assert not np.allclose(np.asarray(s_ident), np.asarray(s_swap))


# ---------------------------------------------------------------------------
# dataset knobs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus_and_feats():
    cfg = small_cfg()
    corpus, refs = make_synthetic_corpus(cfg, n_videos=10, n_caps=3, vocab_size=40)
    feats = make_synthetic_feats(cfg, n_videos=10, n_total_frames=10)
    return corpus, refs, feats


def test_specific_category_eval(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg()
    cat = 0
    ds = VideoDataset(cfg, "train", info_corpus=corpus,
                      in_memory_feats=feats, specific=cat)
    itoc = corpus["info"]["itoc"]
    assert len(ds) > 0
    for item in ds.infoset:
        vid_ix = int(item["vid"][5:])
        assert itoc[vid_ix] == cat


def test_n_caps_per_video_resampling(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg(n_caps_per_video=1)
    ds = VideoDataset(cfg, "train", info_corpus=corpus, in_memory_feats=feats)
    n_train_videos = len(corpus["info"]["split"]["train"])
    assert len(ds) == n_train_videos
    first = [it["cap_id"] for it in ds.infoset]
    ds.shuffle()
    second = [it["cap_id"] for it in ds.infoset]
    assert len(second) == n_train_videos
    assert first != second  # reseeded selection differs with 3 caps/video


def test_eval_masks_everything(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg()
    ds = VideoDataset(cfg, "validate", info_corpus=corpus, in_memory_feats=feats)
    item = ds[0]
    toks = item["tokens"]
    labels = item["labels"]
    nonpad = toks != C.PAD
    assert (toks[nonpad] == C.MASK).all()
    assert (labels[nonpad] != C.PAD).all()


def test_train_masking_beta_range(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg(beta=[0.5, 0.9])
    ds = VideoDataset(cfg, "train", info_corpus=corpus, in_memory_feats=feats)
    for i in range(min(20, len(ds))):
        item = ds[i]
        toks = item["tokens"]
        labels = item["labels"]
        n_mask = int((toks == C.MASK).sum())
        # targets exist exactly at masked slots
        assert int((labels != C.PAD).sum()) == n_mask
        assert n_mask >= 1


def test_frame_sampling_strategies():
    rng = np.random.RandomState(0)
    ids = get_frame_ids(60, 8, "equally_sampling", rng)
    assert ids == sorted(ids) and len(ids) == 8
    assert ids[0] == 3  # center of [0, 7.5)
    ids2 = get_frame_ids(60, 8, "segment_random", rng)
    assert len(set(ids2)) == 8
    ids3 = get_frame_ids(60, 8, "all_random", rng)
    assert len(set(ids3)) == 8
    assert resampling_ids(3, 6) == [0, 0, 1, 1, 2, 2]


def test_watch_flag_masks_far_past():
    from navc_tpu.ops.masking import subsequent_mask
    m = np.asarray(subsequent_mask(1, 6, watch=2)[0])
    # position 4 can see positions 3,4 only
    assert not m[4, 3] and not m[4, 4]
    assert m[4, 2] and m[4, 5]


def test_norm_type_ln():
    cfg = small_cfg(norm_type="ln")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    assert "batch_stats" not in variables or not variables["batch_stats"]
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    out = model.apply(variables, feats, method=lambda m, f: m.encode(f))
    assert out["enc_output"].shape == (2, 2 * cfg.n_frames, cfg.dim_hidden)


def test_sentence_utils():
    vocab = {0: "<pad>", 3: "<eos>", 6: "a", 7: "dog", 8: "runs"}
    assert to_sentence([6, 7, 8, 3, 7], vocab) == "a dog runs"
    sent, stats = duplicate("a dog a dog runs")
    assert sent == "a dog runs"


def test_prefetch_loader_matches_sync(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg()
    ds = VideoDataset(cfg, "validate", info_corpus=corpus, in_memory_feats=feats)
    sync = list(BatchLoader(ds, 4, shuffle=False, prefetch=0))
    pre = list(BatchLoader(ds, 4, shuffle=False, prefetch=2))
    assert len(sync) == len(pre)
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a["tokens"], b["tokens"])


def test_pos_attention_decoder():
    cfg = small_cfg(pos_attention=True)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    out = model.apply(variables, feats, tokens, None, deterministic=True)
    (lp,) = out["tgt_word_logprobs"]
    assert lp.shape == (2, cfg.max_len, cfg.vocab_size)
    assert np.isfinite(np.asarray(lp)).all()
    # the pos-attention block adds parameters
    assert "pos_attention" in variables["params"]["decoder"]["layer_0"]


def test_multi_layer_decoder():
    cfg = small_cfg(num_hidden_layers_decoder=2)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    assert "layer_1" in variables["params"]["decoder"]
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    out = model.apply(variables, feats, tokens, None, deterministic=True)
    assert np.isfinite(np.asarray(out["tgt_word_logprobs"][0])).all()


def test_load_feats_type_0_shared_frame_ids(corpus_and_feats):
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg(load_feats_type=0)
    ds = VideoDataset(cfg, "validate", info_corpus=corpus, in_memory_feats=feats)
    item = ds[0]
    assert item["feats_i"].shape == (cfg.n_frames, cfg.dim_i)
    assert item["feats_m"].shape == (cfg.n_frames, cfg.dim_m)


def test_tie_weights_forward():
    cfg = small_cfg(tie_weights=True)
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    assert "tgt_word_prj" not in variables["params"]
    assert "tgt_word_prj_bias" in variables["params"]
    feats = [jnp.ones((2, cfg.n_frames, d)) for d in cfg.modality_dims]
    tokens = jnp.full((2, cfg.max_len), C.MASK, jnp.int32)
    out = model.apply(variables, feats, tokens, None, deterministic=True)
    assert np.isfinite(np.asarray(out["tgt_word_logprobs"][0])).all()


def test_remat_training_matches_plain():
    from navc_tpu.runtime.train_step import create_train_state, make_train_step
    cfg = small_cfg("NAB")
    model = build_model(cfg)
    variables = init_params(model, jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b = 4
    batch = {
        "tokens": jnp.asarray(rng.randint(4, 40, (b, cfg.max_len)), jnp.int32),
        "labels": jnp.asarray(rng.randint(4, 40, (b, cfg.max_len)), jnp.int32),
        "length_target": jnp.asarray(
            rng.dirichlet(np.ones(cfg.max_len), b).astype(np.float32)),
        "category": jnp.zeros((b, 1), jnp.int32),
        "valid_mask": jnp.ones(b, jnp.float32),
    }
    for ch in cfg.modality.lower():
        batch["feats_%s" % ch] = jnp.asarray(
            rng.randn(b, cfg.n_frames, getattr(cfg, "dim_%s" % ch)).astype(np.float32))
    key = jax.random.PRNGKey(5)

    losses = {}
    for remat in (False, True):
        c = cfg.replace(remat=remat)
        state, tx = create_train_state(c, model, variables)
        step = make_train_step(c, model, tx)
        new_state, m = step(state, batch, key)
        losses[remat] = float(m["total_loss"])
    assert abs(losses[False] - losses[True]) < 1e-5


def test_training_is_deterministic_per_seed(corpus_and_feats):
    from navc_tpu.runtime.loop import train_network_all
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg("NAB").replace(
        epochs=1, no_test=True, hidden_dropout_prob=0.1, encoder_dropout=0.1,
        length_beam_size=2, iterations=2,
        # a configured-but-missing teacher_path is now fatal (reference
        # opts.py:208 asserts it exists); this test trains teacher-free
        teacher_path="", load_teacher_weights=False, with_teacher=False)
    import tempfile
    losses = []
    for trial in range(2):
        with tempfile.TemporaryDirectory() as d:
            out = train_network_all(cfg, workdir=d, info_corpus=corpus,
                                    references=refs, in_memory_feats=feats,
                                    verbose=False)
            losses.append(out["history"][0]["train_loss"])
    assert losses[0] == losses[1], losses


def test_nar_dedup_gated_by_duplicate_flag():
    """run_eval must only 4-gram-dedup NAR captions when cfg.duplicate is set
    (reference misc/run.py:163: opt.get('duplicate', False) — unset by
    default). Forced dedup corrupts captions with legitimate repeats."""
    import inspect

    from navc_tpu.config import default_config
    from navc_tpu.runtime import evaluate as ev

    cfg = default_config("NAB", dataset="MSVD", vocab_size=40)
    assert cfg.duplicate is False
    src = inspect.getsource(ev.run_eval)
    assert "cfg.duplicate and" in src


def test_compute_losses_from_logits_is_float_identical():
    """The train path hands raw logits to compute_losses (seq2seq
    return_logits=True); every loss/metric must equal the materialized
    log_softmax path bit-for-bit ((x-max)-lse is the same op order)."""
    import jax
    import jax.numpy as jnp

    from navc_tpu.config import default_config
    from navc_tpu.runtime.crit import compute_losses

    rng = np.random.RandomState(0)
    b, l, v = 6, 9, 37
    cfg = default_config("NACF", dataset="MSVD", vocab_size=v, use_ct=True)
    cfg = cfg.replace(teacher_path="", load_teacher_weights=False,
                      with_teacher=False)
    logits = [jnp.asarray(rng.randn(b, l, v).astype(np.float32) * 3)
              for _ in range(2)]
    labels = [jnp.asarray(rng.randint(0, v, (b, l)), jnp.int32)
              for _ in range(2)]
    lt = jnp.asarray(np.abs(rng.rand(b, cfg.max_len)).astype(np.float32))
    lt = lt / lt.sum(-1, keepdims=True)
    pl = jax.nn.log_softmax(jnp.asarray(rng.randn(b, cfg.max_len),
                                        jnp.float32))
    vm = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)

    base = {"tgt_word_labels": labels, "pred_length": pl, "tgt_length": lt}
    t_probs, m_probs = compute_losses(
        cfg, dict(base, tgt_word_logprobs=[jax.nn.log_softmax(x, axis=-1)
                                           for x in logits]), vm)
    t_logit, m_logit = compute_losses(
        cfg, dict(base, tgt_word_logits=logits), vm)
    assert float(t_probs) == float(t_logit)
    for k in m_probs:
        np.testing.assert_array_equal(np.asarray(m_probs[k]),
                                      np.asarray(m_logit[k]), err_msg=k)


def test_flagship_synthetic_schema():
    """make_flagship_synthetic emits the reference info_corpus schema at
    vocab-10k scale with every latent class covered by the train split."""
    from navc_tpu.config import default_config
    from navc_tpu.data.synthetic import make_flagship_synthetic

    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=10048,
                         n_frames=8, n_total_frames=16)
    corpus, refs, feats = make_flagship_synthetic(
        cfg, n_videos=64, n_classes=8, vocab_size=10048, n_total_frames=16)
    info = corpus["info"]
    assert len(info["itow"]) == 10048
    assert set(info["split"]) == {"train", "validate", "test"}
    train_classes = {v % 8 for v in info["split"]["train"]}
    assert train_classes == set(range(8))  # every class is learnable
    # category table covers MSRVTT's 20 categories domain
    assert all(0 <= c < 20 for c in info["itoc"].values())
    vid = "video0"
    cap = corpus["captions"][vid][0]
    assert cap[0] == 2 and cap[-1] == 3  # BOS/EOS framing
    assert 8 <= len(cap) - 2 <= 18
    assert refs[vid][0]["caption"].count(" ") == len(cap) - 3
    for ch in cfg.modality.lower():
        arr = feats["feats_%s" % ch][vid]
        assert arr.shape == (16, getattr(cfg, "dim_%s" % ch))


def test_hard_synthetic_v3_roles_and_distractors():
    """Corpus v3 (VERDICT r4 #1): role-keyed modality features must make the
    motion stream a function of the VERB latent only, and modifier-level
    distractors must never corrupt the (s,v,o) content words that supervise
    the visual-word pass (reference dataloader.py:383-425)."""
    import numpy as np

    from navc_tpu.config import default_config
    from navc_tpu.data.synthetic import make_hard_synthetic

    cfg = default_config("NACF", dataset="MSRVTT", vocab_size=800,
                         n_frames=4, n_total_frames=6)
    n_videos, n_classes = 48, 12
    corpus, refs, feats, meta = make_hard_synthetic(
        cfg, n_videos=n_videos, n_classes=n_classes, vocab_size=800,
        n_caps=4, n_total_frames=6, adj_pool=60, adv_pool=30,
        distractor_p=0.5,  # high rate so corruption WOULD show
        role_features=True, modifier_distractors=True, return_meta=True)

    # every caption keeps one surface form of each of its class's s/v/o
    for v in range(n_videos):
        s, vb, o = meta["classes"][meta["video_class"][v]]
        for cap in corpus["captions"]["video%d" % v]:
            words = set(cap[1:-1])
            assert words & set(meta["subj_forms"][s])
            assert words & set(meta["verb_forms"][vb])
            assert words & set(meta["obj_forms"][o])

    # motion ('m') centers depend on the verb latent only: same-verb videos
    # sit far closer than different-verb videos regardless of s/o
    fm = feats["feats_m"]
    centers = {v: fm["video%d" % v].mean(0) for v in range(n_videos)}
    same, diff = [], []
    for a in range(n_videos):
        for b in range(a + 1, n_videos):
            ca = meta["classes"][meta["video_class"][a]]
            cb = meta["classes"][meta["video_class"][b]]
            d = float(np.linalg.norm(centers[a] - centers[b]))
            (same if ca[1] == cb[1] else diff).append(d)
    assert same and diff
    assert np.mean(same) < 0.5 * np.mean(diff)

    # image ('i') centers depend on subject+object: same-(s,o) pairs closer
    fi = feats["feats_i"]
    centers_i = {v: fi["video%d" % v].mean(0) for v in range(n_videos)}
    same_i, diff_i = [], []
    for a in range(n_videos):
        for b in range(a + 1, n_videos):
            ca = meta["classes"][meta["video_class"][a]]
            cb = meta["classes"][meta["video_class"][b]]
            d = float(np.linalg.norm(centers_i[a] - centers_i[b]))
            if (ca[0], ca[2]) == (cb[0], cb[2]):
                same_i.append(d)
            elif ca[0] != cb[0] and ca[2] != cb[2]:
                diff_i.append(d)
    if same_i:  # only when two classes share (s, o)
        assert np.mean(same_i) < 0.5 * np.mean(diff_i)

    # v2 default path is untouched: no meta, slot-swap distractors intact
    c2, r2, f2 = make_hard_synthetic(
        cfg, n_videos=12, n_classes=4, vocab_size=800, n_caps=2,
        n_total_frames=6, adj_pool=60, adv_pool=30)
    assert set(c2["info"]) == set(corpus["info"])


def test_kbest_state_roundtrip(tmp_path):
    """Resume must not reset the relative-Sum normalizers / early-stop
    counter: a reset queue scores the first post-resume epoch Sum=1.0 and
    clobbers best.ckpt with a possibly-worse model."""
    q1 = KBestQueue(k_best_model=1, standard=["Bleu_4", "CIDEr"])
    saves = []
    good = {"Bleu_4": 0.4, "METEOR": 0.2, "ROUGE_L": 0.5, "CIDEr": 0.8, "epoch": 0}
    q1.check(good, str(tmp_path), tolerence=3, save_fn=saves.append)
    assert len(saves) == 1

    # fresh queue restored from the serialized state
    q2 = KBestQueue(k_best_model=1, standard=["Bleu_4", "CIDEr"])
    q2.load_state_dict(q1.state_dict())
    worse = {"Bleu_4": 0.1, "METEOR": 0.1, "ROUGE_L": 0.2, "CIDEr": 0.2, "epoch": 1}
    keep, _ = q2.check(worse, str(tmp_path), tolerence=3, save_fn=saves.append)
    assert keep and len(saves) == 1, "worse post-resume epoch must not save"
    assert q2.continuous_failed_count == 1
    assert worse["Sum"] < 1.0  # normalizers survived the roundtrip
    # an UNrestored queue would have scored it Sum=1.0 and saved
    q3 = KBestQueue(k_best_model=1, standard=["Bleu_4", "CIDEr"])
    fresh = dict(worse)
    q3.check(fresh, str(tmp_path), tolerence=3, save_fn=saves.append)
    assert fresh["Sum"] == 1.0 and len(saves) == 2


def test_loader_shards_equal_with_tiny_dataset(corpus_and_feats):
    """Fewer items than shards: every shard must still get the same number
    of batches (np.resize wrap), or the SPMD cluster hangs at the first
    collective of the odd step."""
    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg()
    ds = VideoDataset(cfg, "validate", info_corpus=corpus, in_memory_feats=feats)
    n = len(ds)
    num_shards = n + 5  # more shards than items
    counts = []
    for shard in range(num_shards):
        loader = BatchLoader(ds, batch_size=2, num_shards=num_shards,
                             shard_id=shard)
        counts.append(sum(1 for _ in loader))
    assert len(set(counts)) == 1 and counts[0] >= 1, counts


def test_loader_prefetch_early_break_reaps_producer(corpus_and_feats):
    """Abandoning a prefetching epoch (break) must not leave the producer
    thread blocked on a full queue forever."""
    import threading
    import time

    corpus, refs, feats = corpus_and_feats
    cfg = small_cfg()
    ds = VideoDataset(cfg, "train", info_corpus=corpus, in_memory_feats=feats)
    baseline = threading.active_count()
    for _ in range(3):
        loader = BatchLoader(ds, batch_size=2, prefetch=1)
        for batch in loader:
            break  # abandon immediately with the queue full
    deadline = time.time() + 10
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline, "producer thread leaked"
