"""Decoding: AR beam search and NAR refinement algorithms, fully on-device."""

from .length_beam import predict_length_beam, build_canvas  # noqa: F401
from .mask_predict import make_nar_generator  # noqa: F401
from .beam import make_ar_generator  # noqa: F401
