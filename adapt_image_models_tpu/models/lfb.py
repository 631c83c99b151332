"""Long-Term Feature Bank (reference ``mmaction/models/common/lfb.py:17``).

TPU-native shape contract: the bank lives on the HOST (a dict of numpy
arrays, stored as ``.npz``), and ``sample_long_term_features`` always
returns a FIXED-shape (window_size * max_num_sampled_feat, C) array —
zero-padded — so the jitted model consumes it as a plain batch input
instead of the reference's in-graph dict lookup. Randomness flows through
an explicit ``np.random.Generator``.

Storage: one ``lfb_<mode>.npz`` per dataset mode with keys
``"<video_id>,<sec>"`` -> (num_rois, C) float16 arrays (the reference
pickles torch tensors; npz keeps it torch-free and memory-mappable).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional, Sequence

import numpy as np


def save_lfb(path: str, bank: Dict[str, Dict[int, np.ndarray]],
             half_precision: bool = True) -> None:
    """bank: {video_id: {sec: (n, C)}} -> one npz file."""
    flat = {}
    for video_id, secs in bank.items():
        for sec, feats in secs.items():
            flat[f"{video_id},{int(sec)}"] = np.asarray(
                feats, np.float16 if half_precision else np.float32)
    np.savez_compressed(path, **flat)


def save_lfb_mmap(path_prefix: str, bank: Dict[str, Dict[int, np.ndarray]],
                  half_precision: bool = True) -> None:
    """Memory-mapped storage for AVA-scale banks (tens of GB — the
    reference's lmdb device, ``common/lfb.py:60-90``): one flat
    ``<prefix>.rows.npy`` (N_total, C) + ``<prefix>.index.npz`` with
    ``"<video_id>,<sec>"`` -> (offset, count). Readers touch only the rows
    they sample."""
    keys, offsets, counts, rows = [], [], [], []
    off = 0
    for video_id, secs in bank.items():
        for sec, feats in secs.items():
            feats = np.asarray(feats)
            keys.append(f"{video_id},{int(sec)}")
            offsets.append(off)
            counts.append(len(feats))
            rows.append(feats)
            off += len(feats)
    flat = np.concatenate(rows, axis=0).astype(
        np.float16 if half_precision else np.float32)
    np.save(path_prefix + ".rows.npy", flat)
    np.savez(path_prefix + ".index.npz", keys=np.asarray(keys),
             offsets=np.asarray(offsets, np.int64),
             counts=np.asarray(counts, np.int64))


class _MmapMode:
    """One dataset mode backed by a row memmap + key index."""

    def __init__(self, path_prefix: str):
        self.rows = np.load(path_prefix + ".rows.npy", mmap_mode="r")
        with np.load(path_prefix + ".index.npz") as z:
            self.index = {str(k): (int(o), int(c)) for k, o, c in
                          zip(z["keys"], z["offsets"], z["counts"])}

    def get(self, key: str) -> Optional[np.ndarray]:
        oc = self.index.get(key)
        if oc is None:
            return None
        off, cnt = oc
        return self.rows[off:off + cnt]


class LFB:
    """``backend='ram'`` loads the whole bank (reference device='gpu'/'cpu');
    ``backend='mmap'`` memory-maps the row file and reads only sampled rows
    (reference device='lmdb' for banks too big for RAM);
    ``backend='auto'`` uses mmap files when present, npz otherwise."""

    def __init__(self,
                 lfb_prefix_path: str,
                 max_num_sampled_feat: int = 5,
                 window_size: int = 60,
                 lfb_channels: int = 2048,
                 dataset_modes: Sequence[str] = ("train", "val"),
                 seed: int = 0,
                 backend: str = "auto"):
        if not osp.exists(lfb_prefix_path):
            raise ValueError(
                f"lfb prefix path {lfb_prefix_path} does not exist!")
        self.lfb_prefix_path = lfb_prefix_path
        self.max_num_sampled_feat = max_num_sampled_feat
        self.window_size = window_size
        self.lfb_channels = lfb_channels
        if isinstance(dataset_modes, str):
            dataset_modes = (dataset_modes,)
        self.rng = np.random.default_rng(seed)

        self.lfb: Dict[str, Dict[int, np.ndarray]] = {}  # ram backend
        self._mmap_modes = []
        for mode in dataset_modes:
            prefix = osp.normpath(osp.join(lfb_prefix_path, f"lfb_{mode}"))
            use_mmap = backend == "mmap" or (
                backend == "auto" and osp.exists(prefix + ".rows.npy"))
            if use_mmap:
                self._mmap_modes.append(_MmapMode(prefix))
                continue
            with np.load(prefix + ".npz") as z:
                for key in z.files:
                    video_id, sec = key.rsplit(",", 1)
                    self.lfb.setdefault(video_id, {})[int(sec)] = z[key]

    def sample_long_term_features(
            self, video_id: str, timestamp: int,
            rng: Optional[np.random.Generator] = None) -> np.ndarray:
        """-> (window_size * max_num_sampled_feat, C) float32, zero-padded
        (reference ``lfb.py:152-178``)."""
        rng = rng or self.rng
        video_features = self.lfb.get(video_id, {})
        w, k = self.window_size, self.max_num_sampled_feat
        start = timestamp - (w // 2)
        out = np.zeros((w * k, self.lfb_channels), np.float32)
        for idx, sec in enumerate(range(start, start + w)):
            feats = video_features.get(sec)
            if feats is None:
                for mode in self._mmap_modes:
                    feats = mode.get(f"{video_id},{sec}")
                    if feats is not None:
                        break
            if feats is None or len(feats) == 0:
                continue
            n = min(len(feats), k)
            chosen = rng.choice(len(feats), n, replace=False)
            out[idx * k:idx * k + n] = feats[chosen].astype(np.float32)
        return out

    def __getitem__(self, img_key: str) -> np.ndarray:
        video_id, timestamp = img_key.split(",")
        return self.sample_long_term_features(video_id, int(timestamp))

    def __len__(self) -> int:
        vids = set(self.lfb)
        for mode in self._mmap_modes:
            vids.update(k.rsplit(",", 1)[0] for k in mode.index)
        return len(vids)
