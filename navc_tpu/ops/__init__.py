"""Low-level ops: masking, selection, and (optionally Pallas-fused) attention."""

from .masking import (  # noqa: F401
    non_pad_mask,
    key_pad_mask,
    subsequent_mask,
    self_mask_diag,
    resample_enc_output,
)
from .select import rank_mask_smallest, rank_mask_largest  # noqa: F401
from .eligibility import fused_layer_eligible, fused_vocab_eligible  # noqa: F401
