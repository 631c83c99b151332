"""Async host->device data loader.

Replaces torch ``DataLoader`` + ``DistributedSampler`` + ``collate``
(reference ``mmaction/datasets/builder.py:46-132``,
``datasets/samplers/distributed_sampler.py:8-44``) with:

* seeded per-epoch shuffling with per-process (host) sharding — same
  determinism contract as the reference's epoch-seeded DistributedSampler
* a thread pool decoding/transforming samples into fixed-shape uint8 arrays
* double-buffered prefetch: batches are ``jax.device_put`` with the mesh's
  batch sharding while the previous step computes

Per-sample rng is derived from (seed, epoch, index) so any sample is
reproducible in isolation regardless of worker scheduling.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np

from adapt_image_models_tpu.data.pipeline import SampleProcessor, build_sample_processor


class RoundRobinLoader:
    """OmniSource-style alternation over multiple loaders (reference
    ``mmaction/core/runner/omnisource_runner.py``: the main loader drives the
    epoch; auxiliary loaders cycle). ``ratios`` mirrors the recipes'
    ``data.train_ratio`` — batches drawn per source per cycle (e.g.
    ``[2, 1, 1, 1]``, tsn omnisource recipe)."""

    def __init__(self, loaders, ratios=None):
        if not loaders:
            raise ValueError("need at least one loader")
        self.loaders = list(loaders)
        self.ratios = [int(r) for r in ratios] if ratios else [1] * len(loaders)
        if len(self.ratios) != len(self.loaders) or min(self.ratios) < 1:
            raise ValueError(f"train_ratio {ratios} does not match "
                             f"{len(self.loaders)} sources")

    def set_epoch(self, epoch: int):
        for l in self.loaders:
            l.set_epoch(epoch)

    def __len__(self):
        # main-loader batches drive the epoch; each main batch group of
        # ratios[0] is followed by ratios[1:] aux batches
        n_main = len(self.loaders[0])
        cycles = n_main // self.ratios[0]
        return n_main + cycles * sum(self.ratios[1:])

    def __iter__(self):
        import itertools
        main = iter(self.loaders[0])
        aux = [itertools.cycle(l) for l in self.loaders[1:]]
        while True:
            for _ in range(self.ratios[0]):
                try:
                    yield next(main)
                except StopIteration:
                    return
            for a, r in zip(aux, self.ratios[1:]):
                for _ in range(r):
                    yield next(a)


class VideoLoader:
    def __init__(self, dataset, pipeline, batch_size: int,
                 *, shuffle: bool = False, seed: int = 0,
                 num_workers: int = 8, prefetch: int = 2,
                 drop_last: Optional[bool] = None,
                 num_shards: int = 1, shard_index: int = 0,
                 device_put_fn: Optional[Callable] = None):
        self.dataset = dataset
        if hasattr(dataset, "prepare_sample"):
            # dataset owns its sample preparation (e.g. AVA detection:
            # box-aware transforms + host-side proposal assignment)
            self.processor = None
        elif isinstance(pipeline, SampleProcessor):
            self.processor = pipeline
        else:
            self.processor = build_sample_processor(pipeline)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.device_put_fn = device_put_fn
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle and getattr(self.dataset, "sample_by_class", False):
            # class-balanced draw (reference base.py:89-100): per-epoch
            # resample with per-sample weights w_class^power
            rng = np.random.default_rng((self.seed, self.epoch))
            p = self.dataset.class_weights(
                power=getattr(self.dataset, "power", 0.0)).astype(np.float64)
            order = rng.choice(n, size=n, replace=True, p=p / p.sum())
        elif self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # pad so every shard sees the same number of samples (reference
        # DistributedSampler pads by wrapping)
        per_shard = -(-n // self.num_shards)
        padded = np.concatenate([order, order[:per_shard * self.num_shards - n]])
        return padded[self.shard_index::self.num_shards]

    def _load_one(self, idx: int) -> Dict[str, Any]:
        rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
        if self.processor is None:
            return self.dataset.prepare_sample(int(idx), rng)
        info = self.dataset[int(idx)]
        if "filename" in info:
            clips, label = self.processor(
                info["filename"], info["label"], rng=rng,
                start_index=info.get("start_index", 0))
        else:  # rawframes
            from adapt_image_models_tpu.data.video_reader import (
                FlowFrameReader, RawFrameReader,
            )
            reader_cls = (FlowFrameReader
                          if info.get("modality") == "Flow"
                          else RawFrameReader)
            reader = reader_cls(
                info["frame_dir"], info["total_frames"],
                filename_tmpl=info.get(
                    "filename_tmpl",
                    "{}_{:05d}.jpg" if info.get("modality") == "Flow"
                    else "img_{:05}.jpg"),
                start_index=info.get("start_index", 1),
                offset=info.get("offset", 0))
            clips, label = self.processor(
                reader, info["label"], rng=rng,
                total_frames=info["total_frames"],
                start_index=info.get("start_index", 1))
        return {"imgs": clips, "label": label}

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self._load_one, batch_idx))
                        batch = {}
                        for k, v0 in samples[0].items():
                            if isinstance(v0, str):
                                batch[k] = [s[k] for s in samples]
                            else:
                                batch[k] = np.stack(
                                    [np.asarray(s[k]) for s in samples])
                        if self.device_put_fn is not None:
                            batch = self.device_put_fn(batch)
                        out_q.put(batch)
                out_q.put(None)
            except BaseException as e:  # forward errors to the consumer
                out_q.put(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
