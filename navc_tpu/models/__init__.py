"""Model stack: flax.linen modules mirroring the reference capability surface.

Reference layer map (SURVEY.md L3):
    models/bert.py                 -> navc_tpu.models.layers
    models/Encoder.py              -> navc_tpu.models.encoder
    models/joint_representation.py -> navc_tpu.models.fusion
    models/Predictor.py            -> navc_tpu.models.predictor
    models/Decoder.py              -> navc_tpu.models.decoder
    models/seq2seq.py              -> navc_tpu.models.seq2seq
    models/__init__.py get_model   -> navc_tpu.models.build_model
"""

from .seq2seq import Seq2Seq, build_model, init_params  # noqa: F401
