"""Cross-implementation parity against the ACTUAL reference torch code.

Loads identical weights into both stacks via the torch->flax converter
(navc_tpu/runtime/torch_convert.py) and asserts:

  (a) logit/log-prob closeness of the training forward for all four methods
      (reference models/seq2seq.py:86-140),
  (b) token-identical captions for ARB beam search
      (reference models/Translator.py:94-161, models/Beam.py),
  (c) token-identical captions for NAR decoding - mask-predict / left2right /
      easy-first, with and without coarse-grained templates and teacher
      rescoring (reference decoding/na_generate.py:14-113,
      decoding/algorithms.py:224-417).

The reference implementation at /root/reference is imported directly and used
as the oracle; no NumPy re-implementation is involved.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

# reference modules (torch)
from models import get_model as ref_get_model  # noqa: E402
from models.Translator import Translator as RefTranslator  # noqa: E402
from decoding import generate as ref_generate  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from navc_tpu import constants as C  # noqa: E402
from navc_tpu.config import Config, resolve  # noqa: E402
from navc_tpu.decoding import make_ar_generator, make_nar_generator  # noqa: E402
from navc_tpu.models import build_model, init_params  # noqa: E402
from navc_tpu.runtime.torch_convert import convert_state_dict, validate_against  # noqa: E402

# ---------------------------------------------------------------------------
# tiny-but-real scale: 2 modalities, category on, 1 decoder layer
# ---------------------------------------------------------------------------

DIMS = dict(
    dim_hidden=32, num_hidden_layers_decoder=1, num_attention_heads=4,
    intermediate_size=48, hidden_act="gelu_new", max_len=10,
    layer_norm_eps=1e-5, vocab_size=120, num_category=20, n_frames=4,
    dim_i=24, dim_m=20, modality="mi",
)


def ref_opt(method, **kw):
    """Reference-style resolved opt dict (mirrors opts.py + methods.yaml)."""
    opt = {
        "modality": DIMS["modality"], "dim_i": DIMS["dim_i"], "dim_m": DIMS["dim_m"],
        "dim_a": 1, "dim_o": 1,
        "encoder": "Encoder_HighWay",
        "fusion": "temporal_concat",
        "dim_hidden": DIMS["dim_hidden"],
        "num_hidden_layers_decoder": DIMS["num_hidden_layers_decoder"],
        "num_attention_heads": DIMS["num_attention_heads"],
        "intermediate_size": DIMS["intermediate_size"],
        "hidden_act": DIMS["hidden_act"],
        "hidden_dropout_prob": 0.5, "attention_probs_dropout_prob": 0.0,
        "max_len": DIMS["max_len"], "layer_norm_eps": DIMS["layer_norm_eps"],
        "watch": 0, "pos_attention": False, "enhance_input": 2,
        "with_layernorm": False, "with_category": True,
        "num_category": DIMS["num_category"], "encoder_dropout": 0.5,
        "no_encoder_bn": False, "norm_type": "bn",
        "vocab_size": DIMS["vocab_size"], "tie_weights": False,
        "n_frames": DIMS["n_frames"], "batch_size": 4,
        "beam_size": 5, "beam_alpha": 1.0, "topk": 1,
        "paradigm": "mp", "length_beam_size": 3, "iterations": 3,
        "q": 1, "q_iterations": 1, "use_ct": False, "length_bias": 0,
        "masking_decision": False, "no_candidate_decision": False,
        "algorithm_print_sent": False,
        "collect_best_candidate_iterative_results": False,
        "method": method,
    }
    if method == "ARB":
        opt.update(decoder="BertDecoder", decoding_type="ARFormer",
                   crit=["lang"], visual_word_generation=False)
    elif method == "ARB2":
        opt.update(decoder="BertDecoderDisentangled", decoding_type="ARFormer",
                   crit=["lang"], visual_word_generation=True,
                   demand=["VERB", "NOUN"])
    elif method == "NAB":
        opt.update(decoder="BertDecoder", decoding_type="NARFormer",
                   crit=["lang", "length"], visual_word_generation=False)
    elif method == "NACF":
        opt.update(decoder="BertDecoderDisentangled", decoding_type="NARFormer",
                   crit=["lang", "length"], visual_word_generation=True,
                   demand=["VERB", "NOUN"], use_ct=True)
    opt.update(kw)
    return opt


def my_cfg(opt) -> Config:
    """Build the navc_tpu Config carrying exactly the reference opt values."""
    cfg = Config(
        dataset="MSRVTT", method=opt["method"], scope="xparity",
        modality=opt["modality"], dim_i=opt["dim_i"], dim_m=opt["dim_m"],
        encoder=opt["encoder"], decoder=opt["decoder"],
        decoding_type=opt["decoding_type"], fusion=opt["fusion"],
        dim_hidden=opt["dim_hidden"],
        num_hidden_layers_decoder=opt["num_hidden_layers_decoder"],
        num_attention_heads=opt["num_attention_heads"],
        intermediate_size=opt["intermediate_size"],
        hidden_act=opt["hidden_act"],
        hidden_dropout_prob=opt["hidden_dropout_prob"],
        attention_probs_dropout_prob=opt["attention_probs_dropout_prob"],
        max_len=opt["max_len"], layer_norm_eps=opt["layer_norm_eps"],
        watch=opt["watch"], pos_attention=opt["pos_attention"],
        enhance_input=opt["enhance_input"],
        with_layernorm=opt["with_layernorm"],
        with_category=opt["with_category"], num_category=opt["num_category"],
        encoder_dropout=opt["encoder_dropout"],
        no_encoder_bn=opt["no_encoder_bn"], norm_type=opt["norm_type"],
        vocab_size=opt["vocab_size"], tie_weights=opt["tie_weights"],
        n_frames=opt["n_frames"], batch_size=opt["batch_size"],
        crit=list(opt["crit"]),
        visual_word_generation=opt["visual_word_generation"],
        beam_size=opt["beam_size"], beam_alpha=opt["beam_alpha"],
        topk=opt["topk"], paradigm=opt["paradigm"],
        length_beam_size=opt["length_beam_size"],
        iterations=opt["iterations"], q=opt["q"],
        q_iterations=opt["q_iterations"], use_ct=opt["use_ct"],
        length_bias=opt["length_bias"],
        masking_decision=opt["masking_decision"],
        no_candidate_decision=opt["no_candidate_decision"],
        parallel_mlm=opt.get("parallel_mlm", False),
        compute_dtype="float32", use_pallas=False,
    )
    return cfg


def build_pair(method, seed=0, **kw):
    """(torch model+opt, flax model+converted variables+cfg)."""
    opt = ref_opt(method, **kw)
    torch.manual_seed(seed)
    tmodel = ref_get_model(opt).eval()
    cfg = my_cfg(opt)
    jmodel = build_model(cfg)
    template = init_params(jmodel, jax.random.PRNGKey(0), cfg)
    aux = tuple(c for c in opt["crit"] if c != "lang")
    variables = convert_state_dict(tmodel.state_dict(), aux_crits=aux,
                                   tie_weights=opt["tie_weights"])
    validate_against(variables, {k: template[k] for k in variables})
    return opt, tmodel, cfg, jmodel, variables


def make_inputs(opt, b=4, seed=1):
    rng = np.random.RandomState(seed)
    feats = [rng.randn(b, opt["n_frames"], opt["dim_" + ch]).astype(np.float32)
             for ch in opt["modality"]]
    category = rng.randint(0, opt["num_category"], size=(b, 1))
    return feats, category


def encode_both(opt, tmodel, jmodel, variables, feats):
    with torch.no_grad():
        tenc = tmodel.encode([torch.from_numpy(f) for f in feats])
    jenc = jmodel.apply(variables, [jnp.asarray(f) for f in feats],
                        method=lambda m, f: m.encode(f, deterministic=True))
    return tenc, jenc


# ---------------------------------------------------------------------------
# (a) training-forward log-prob parity, all four methods
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", ["ARB", "ARB2", "NAB", "NACF"])
def test_forward_logprob_parity(method):
    opt, tmodel, cfg, jmodel, variables = build_pair(method)
    b = 4
    feats, category = make_inputs(opt, b=b)
    rng = np.random.RandomState(7)

    # token batch with PAD tails (and MASK slots for NAR)
    tokens = rng.randint(6, opt["vocab_size"], size=(b, opt["max_len"]))
    lens = rng.randint(4, opt["max_len"], size=(b,))
    for i in range(b):
        tokens[i, lens[i]:] = C.PAD
        if opt["decoding_type"] == "NARFormer":
            m = rng.rand(lens[i]) < 0.4
            tokens[i, :lens[i]][m] = C.MASK
    tokens = tokens.astype(np.int64)

    if opt["visual_word_generation"]:
        tokens_1 = np.where(tokens != C.PAD, C.VIS, C.PAD).astype(np.int64)
        t_tgt = [torch.from_numpy(tokens_1), torch.from_numpy(tokens)]
        j_tgt = (jnp.asarray(tokens_1, jnp.int32), jnp.asarray(tokens, jnp.int32))
    else:
        t_tgt = torch.from_numpy(tokens)
        j_tgt = jnp.asarray(tokens, jnp.int32)

    with torch.no_grad():
        tres = tmodel(feats=[torch.from_numpy(f) for f in feats],
                      tgt_tokens=t_tgt, category=torch.from_numpy(category))
    jres = jmodel.apply(variables, [jnp.asarray(f) for f in feats], j_tgt,
                        jnp.asarray(category, jnp.int32), deterministic=True)

    t_lp = tres["tgt_word_logprobs"]
    j_lp = jres["tgt_word_logprobs"]
    assert len(t_lp) == len(j_lp)
    for t, j in zip(t_lp, j_lp):
        np.testing.assert_allclose(np.asarray(j), t.numpy(), atol=2e-4, rtol=2e-4)

    if "length" in opt["crit"]:
        np.testing.assert_allclose(np.asarray(jres["pred_length"]),
                                   tres["pred_length"].numpy(),
                                   atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jres["enc_output"]),
                               tres["enc_output"].numpy(), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# (b) AR beam-search token parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,alpha,beam", [(0, 1.0, 5), (3, 1.35, 3)])
def test_beam_search_cross_parity(seed, alpha, beam):
    opt, tmodel, cfg, jmodel, variables = build_pair(
        "ARB", seed=seed, beam_size=beam, beam_alpha=alpha)
    b = 5
    feats, category = make_inputs(opt, b=b, seed=seed + 10)
    tenc, jenc = encode_both(opt, tmodel, jmodel, variables, feats)

    translator = RefTranslator(tmodel, opt, device=torch.device("cpu"))
    vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}
    batch_hyp, batch_scores = translator.translate_batch(
        tenc, torch.from_numpy(category), tgt_tokens=None, tgt_vocab=vocab)

    gen = make_ar_generator(cfg, jmodel, jit=True)
    seqs, scores = gen(variables, jenc, jnp.asarray(category, jnp.int32))
    seqs = np.asarray(seqs)
    scores = np.asarray(scores)

    for i in range(b):
        hyp = batch_hyp[i][0]
        assert list(seqs[i][:len(hyp)]) == hyp, (
            "instance %d: ref %s vs tpu %s" % (i, hyp, seqs[i].tolist()))
        assert (seqs[i][len(hyp):] == C.PAD).all()
        np.testing.assert_allclose(scores[i], batch_scores[i][0], atol=1e-4)


# ---------------------------------------------------------------------------
# (c) NAR decode token parity
# ---------------------------------------------------------------------------


def run_nar_both(opt, tmodel, cfg, jmodel, variables, b=4, seed=2,
                 teacher=None, dict_mapping=None):
    feats, category = make_inputs(opt, b=b, seed=seed)
    tenc, jenc = encode_both(opt, tmodel, jmodel, variables, feats)
    vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}

    t_teacher = j_teacher = None
    t_tenc = j_tenc = None
    tvars = None
    if teacher is not None:
        _, t_teacher, _, j_teacher, tvars = teacher
        t_tenc, j_tenc = encode_both(opt, t_teacher, j_teacher, tvars, feats)

    t_map = {} if dict_mapping is None else dict_mapping
    with torch.no_grad():
        ref_hyp, _ = ref_generate(
            opt=opt, model=tmodel, teacher_model=t_teacher,
            encoder_outputs=tenc, teacher_encoder_outputs=t_tenc,
            category=torch.from_numpy(category),
            tgt_tokens=torch.zeros(b, opt["max_len"], dtype=torch.long),
            tgt_vocab=vocab, dict_mapping=t_map, length_bias=0)
    ref_hyp = ref_hyp.numpy()

    gen = make_nar_generator(cfg, jmodel, j_teacher)
    j_map = None
    if dict_mapping is not None:
        j_map = jnp.asarray([dict_mapping[i] for i in range(opt["vocab_size"])],
                            jnp.int32)
    mine = np.asarray(gen(variables, jenc, jnp.asarray(category, jnp.int32),
                          tvars, j_tenc, j_map))

    dyn = ref_hyp.shape[1]
    np.testing.assert_array_equal(mine[:, :dyn], ref_hyp)
    assert (mine[:, dyn:] == C.PAD).all()


def test_nacf_mask_predict_cross_parity():
    teacher = build_pair("ARB", seed=5)
    pair = build_pair("NACF", seed=1)
    run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4], teacher=teacher)


def test_nacf_masking_decision_cross_parity():
    teacher = build_pair("ARB", seed=6)
    pair = build_pair("NACF", seed=2, masking_decision=True)
    run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4], teacher=teacher)


def test_nab_mask_predict_cross_parity():
    pair = build_pair("NAB", seed=3)
    run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4], teacher=None)


def test_nacf_dict_mapping_kd_cross_parity():
    """Teacher with vocab remap (reference algorithms.py:169-173)."""
    teacher = build_pair("ARB", seed=8)
    pair = build_pair("NACF", seed=4)
    rng = np.random.RandomState(0)
    v = pair[0]["vocab_size"]
    perm = np.arange(v)
    tail = perm[6:].copy()
    rng.shuffle(tail)
    perm[6:] = tail  # keep special tokens fixed like a real dict_mapping
    mapping = {i: int(perm[i]) for i in range(v)}
    run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4], teacher=teacher,
                 dict_mapping=mapping)


@pytest.mark.parametrize("paradigm,use_ct", [("l2r", False), ("l2r", True),
                                             ("ef", False), ("ef", True)])
def test_l2r_ef_cross_parity(paradigm, use_ct):
    method = "NACF" if use_ct else "NAB"
    teacher = build_pair("ARB", seed=9)
    pair = build_pair(method, seed=7, paradigm=paradigm, use_ct=use_ct,
                      q=1, q_iterations=1)
    run_nar_both(pair[0], pair[1], pair[2], pair[3], pair[4], teacher=teacher)


# ---------------------------------------------------------------------------
# (d) hidden sigmoid-attention knob (reference bert.py:136,163-165)
# ---------------------------------------------------------------------------


def test_sigmoid_attention_forward_parity():
    opt, tmodel, cfg, jmodel, variables = build_pair(
        "NAB", seed=11, use_sigmoid_to_get_attprob=True)
    cfg = cfg.replace(use_sigmoid_to_get_attprob=True)
    jmodel = build_model(cfg)
    b = 3
    feats, category = make_inputs(opt, b=b, seed=12)
    rng = np.random.RandomState(13)
    tokens = rng.randint(6, opt["vocab_size"], size=(b, opt["max_len"]))
    tokens[:, -2:] = C.PAD
    with torch.no_grad():
        tres = tmodel(feats=[torch.from_numpy(f) for f in feats],
                      tgt_tokens=torch.from_numpy(tokens.astype(np.int64)),
                      category=torch.from_numpy(category))
    jres = jmodel.apply(variables, [jnp.asarray(f) for f in feats],
                        jnp.asarray(tokens, jnp.int32),
                        jnp.asarray(category, jnp.int32), deterministic=True)
    np.testing.assert_allclose(np.asarray(jres["tgt_word_logprobs"][0]),
                               tres["tgt_word_logprobs"][0].numpy(),
                               atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# (e) NAR attention-map collection (reference na_generate.py:92-106)
# ---------------------------------------------------------------------------


def test_attention_collection_cross_parity():
    opt, tmodel, cfg, jmodel, variables = build_pair(
        "NACF", seed=14,
        collect_best_candidate_iterative_results=True, example="probe")
    b = 3
    # reference 'example' mode skips the [4, max_len-1] clamp
    # (na_generate.py:125-132), so pick a feature seed whose top-lbs length
    # indices all land inside the clamp range — then both stacks agree.
    seed = None
    for s in range(40):
        feats, category = make_inputs(opt, b=b, seed=100 + s)
        with torch.no_grad():
            tenc = tmodel.encode([torch.from_numpy(f) for f in feats])
            beam = tenc["pred_length"].topk(opt["length_beam_size"], dim=1)[1]
        if int(beam.min()) >= 4 and int(beam.max()) <= opt["max_len"] - 1:
            seed = 100 + s
            break
    assert seed is not None, "no feature seed with in-range length beams"

    feats, category = make_inputs(opt, b=b, seed=seed)
    tenc, jenc = encode_both(opt, tmodel, jmodel, variables, feats)
    vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}
    with torch.no_grad():
        ref_hyp, ref_collect, ref_attns = ref_generate(
            opt=opt, model=tmodel, teacher_model=None,
            encoder_outputs=tenc, teacher_encoder_outputs=None,
            category=torch.from_numpy(category),
            tgt_tokens=torch.zeros(b, opt["max_len"], dtype=torch.long),
            tgt_vocab=vocab, dict_mapping={}, length_bias=0,
            output_attentions=True)

    gen = make_nar_generator(cfg, jmodel, None, collect_attentions=True)
    best, (toks, probs), attns = gen(variables, jenc,
                                     jnp.asarray(category, jnp.int32))
    dyn = ref_hyp.shape[1]
    np.testing.assert_array_equal(np.asarray(best)[:, :dyn], ref_hyp.numpy())

    # candidate stacks (B, T, L)
    ref_toks, ref_scores = ref_collect
    np.testing.assert_array_equal(np.asarray(toks)[:, :, :dyn],
                                  ref_toks.numpy())
    np.testing.assert_allclose(np.asarray(probs)[:, :, :dyn],
                               ref_scores.numpy(), atol=1e-4)

    # attention stacks: [self, cross], (B, T, n_head, L, Lk)
    assert len(ref_attns) == 2 and len(attns) == 2
    for mine, ref in zip(attns, ref_attns):
        r = ref.numpy()
        m = np.asarray(mine)[:, :, :, :dyn, :r.shape[-1]]
        np.testing.assert_allclose(m, r, atol=1e-4, rtol=1e-3)


def test_convert_cli_roundtrip(tmp_path):
    """navc-convert turns a reference .pth.tar into a loadable navc .ckpt
    whose beam decode is token-identical to the torch original."""
    from navc_tpu.cli.convert import main as convert_main
    from navc_tpu.runtime.checkpoint import load_model_and_config

    opt, tmodel, cfg, jmodel, variables = build_pair("ARB", seed=9)
    src = str(tmp_path / "best.pth.tar")
    torch.save({"state_dict": tmodel.state_dict(), "settings": opt,
                "epoch": 7}, src)
    dst = str(tmp_path / "best.ckpt")
    convert_main([src, dst])

    model2, vars2, cfg2, other = load_model_and_config(dst)
    assert other.get("epoch") == 7
    assert cfg2.vocab_size == opt["vocab_size"]

    feats, category = make_inputs(opt, b=3, seed=4)
    enc_t, enc_j = encode_both(opt, tmodel, model2, vars2, feats)
    translator = RefTranslator(tmodel, opt, device=torch.device("cpu"))
    vocab = {i: "w%d" % i for i in range(opt["vocab_size"])}
    batch_hyp, _ = translator.translate_batch(
        enc_t, torch.from_numpy(category), tgt_tokens=None, tgt_vocab=vocab)
    seqs, _ = make_ar_generator(cfg2, model2, jit=False)(
        vars2, enc_j, jnp.asarray(category, jnp.int32))
    seqs = np.asarray(seqs)
    for i in range(3):
        hyp = batch_hyp[i][0]
        assert list(seqs[i][:len(hyp)]) == hyp
        assert (seqs[i][len(hyp):] == C.PAD).all()


def test_parallel_mlm_residual_knob_parity():
    """Hidden knob (reference bert.py:253-254): parallel_mlm drops the
    self-attention residual. Forward log-probs must track the reference
    with it on, and differ from the knob-off forward."""
    opt, tmodel, cfg, jmodel, variables = build_pair("NAB", parallel_mlm=True)
    assert cfg.parallel_mlm
    b = 3
    feats, category = make_inputs(opt, b=b)
    rng = np.random.RandomState(11)
    tokens = rng.randint(6, opt["vocab_size"], size=(b, opt["max_len"]))
    tokens[:, -2:] = C.PAD
    tokens = tokens.astype(np.int64)

    with torch.no_grad():
        tres = tmodel(feats=[torch.from_numpy(f) for f in feats],
                      tgt_tokens=torch.from_numpy(tokens),
                      category=torch.from_numpy(category))
    jres = jmodel.apply(variables, [jnp.asarray(f) for f in feats],
                        jnp.asarray(tokens, jnp.int32),
                        jnp.asarray(category, jnp.int32), deterministic=True)
    np.testing.assert_allclose(np.asarray(jres["tgt_word_logprobs"][0]),
                               tres["tgt_word_logprobs"][0].numpy(),
                               atol=2e-4, rtol=2e-4)

    # knob off (same weights): the residual changes the output
    cfg_off = cfg.replace(parallel_mlm=False)
    jmodel_off = build_model(cfg_off)
    jres_off = jmodel_off.apply(variables, [jnp.asarray(f) for f in feats],
                                jnp.asarray(tokens, jnp.int32),
                                jnp.asarray(category, jnp.int32),
                                deterministic=True)
    assert not np.allclose(np.asarray(jres["tgt_word_logprobs"][0]),
                           np.asarray(jres_off["tgt_word_logprobs"][0]))
