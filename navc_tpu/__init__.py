"""navc_tpu — TPU-native non-autoregressive video captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
yangbang18/Non-Autoregressive-Video-Captioning (AAAI 2021 "Non-Autoregressive
Coarse-to-Fine Video Captioning"): four methods (ARB, ARB2, NAB, NACF) over
pre-extracted 2D/3D CNN video features, with autoregressive beam-search and
non-autoregressive mask-predict decoding compiled as single on-device XLA
programs.

Package layout:
    constants   token ids / loss-key mapping (reference: config/Constants.py)
    config      dataclass config tree + method registry (reference: opts.py,
                config/methods.yaml)
    models      flax.linen model stack (reference: models/*.py)
    ops         masking / selection / attention primitives (incl. Pallas)
    decoding    AR beam search + NAR refinement algorithms as lax.scan
    data        host-side NumPy data pipeline (reference: dataloader.py)
    runtime     train/eval loops, losses, optimizer, checkpointing, logging
    metrics     caption metrics: BLEU, ROUGE-L, CIDEr, METEOR-equivalent,
                PTB-style tokenizer (Python + native C++ backends)
    parallel    jax.sharding mesh utilities (data/tensor parallel)
    cli         train / translate / prepare_corpora entry points
"""

__version__ = "0.1.0"
