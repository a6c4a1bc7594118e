"""Offline pretreatment: frame extraction and CNN feature extraction.

Capability parity with reference pretreatment/:
  * frame extraction shells out to ffmpeg per video with the same two
    strategies — all frames, or fps-capped with a max frame count
    (extract_frames_from_videos.py:10-31),
  * image-feature extraction samples k frames uniformly (or takes all) and
    writes one ``(frames, dim)`` dataset per video id to HDF5
    (extract_image_feats_from_frames.py:20-59).

The CNN backbone is pluggable: any callable ``images (N, H, W, 3) float32 ->
features (N, dim)``. The reference hard-codes torchvision/pretrainedmodels
CUDA models; in this zero-egress environment pretrained weights cannot be
downloaded, so deployments provide a backbone — e.g. a flax ResNet with
locally converted weights — and tests use a stub. Motion (3D-CNN) features
remain an external-tool step in the reference too (README.md:115-124).
"""

from __future__ import annotations

import glob
import os
import subprocess
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def extract_frames(video_path: str, out_dir: str, strategy: int = 1,
                   fps: int = 5, vframes: int = 60, prefix: str = "image_",
                   ffmpeg: str = "ffmpeg") -> List[str]:
    """Extract frames for one video (reference extract_frames_from_videos.py).

    strategy 0: every frame; strategy 1: ``fps`` frames/sec capped at
    ``vframes`` total (the README's fps 5 / max 60 protocol).
    """
    os.makedirs(out_dir, exist_ok=True)
    out_pattern = os.path.join(out_dir, prefix + "%05d.jpg")
    cmd = [ffmpeg, "-y", "-loglevel", "error", "-i", video_path]
    if strategy == 1:
        cmd += ["-vf", "fps=%d" % fps, "-vframes", str(vframes)]
    elif strategy != 0:
        raise ValueError("strategy must be 0 or 1")
    cmd += ["-q:v", "2", out_pattern]
    subprocess.run(cmd, check=True)
    return sorted(glob.glob(os.path.join(out_dir, prefix + "*.jpg")))


def uniform_sample(n_total: int, k: int) -> List[int]:
    """k uniformly spaced indices (reference extract_image_feats:38-49)."""
    if k <= 0 or n_total <= k:
        return list(range(n_total))
    bound = np.linspace(0, n_total, k + 1).astype(int)
    return [int((bound[i] + bound[i + 1]) // 2) for i in range(k)]


def load_frames(frame_paths: Sequence[str], size: int = 224) -> np.ndarray:
    """Decode + resize frames to (N, size, size, 3) float32 in [0, 1]."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL required for frame loading") from e
    out = []
    for p in frame_paths:
        img = Image.open(p).convert("RGB").resize((size, size))
        out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out) if out else np.zeros((0, size, size, 3), np.float32)


def extract_video_features(
        frame_dirs: Dict[str, str],
        backbone: Callable[[np.ndarray], np.ndarray],
        out_hdf5: str,
        k_frames: int = 0,
        batch_size: int = 32,
        image_size: int = 224) -> None:
    """Run the backbone over (sampled) frames of each video, write HDF5.

    frame_dirs: {video_id: directory of extracted frames}.
    """
    import h5py

    with h5py.File(out_hdf5, "w") as f:
        for vid, d in frame_dirs.items():
            paths = sorted(glob.glob(os.path.join(d, "*.jpg")))
            idx = uniform_sample(len(paths), k_frames)
            paths = [paths[i] for i in idx]
            feats = []
            for start in range(0, len(paths), batch_size):
                imgs = load_frames(paths[start:start + batch_size], image_size)
                feats.append(np.asarray(backbone(imgs)))
            if feats:
                f.create_dataset(vid, data=np.concatenate(feats, axis=0))


def random_projection_backbone(dim: int = 2048, seed: int = 0
                               ) -> Callable[[np.ndarray], np.ndarray]:
    """Deterministic stub backbone for tests/fixtures: mean-pooled random
    projection of pixels. NOT a trained model."""
    rng = np.random.RandomState(seed)
    w = rng.randn(3, dim).astype(np.float32) / np.sqrt(3)

    def backbone(images: np.ndarray) -> np.ndarray:
        pooled = images.mean(axis=(1, 2))  # (N, 3)
        return pooled @ w

    return backbone
