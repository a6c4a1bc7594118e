"""Host-side data pipeline: corpus prep, dataset, static-shape batch loader."""

from .dataset import VideoDataset, get_frame_ids, resampling_ids  # noqa: F401
from .loader import BatchLoader  # noqa: F401
