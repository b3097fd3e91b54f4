"""Kaldi data-dir dataset + async host-side batch pipeline.

File contract and crop semantics match the reference dataset
(reference: vae_npvc/dataset/utt2mel_spk.py — Dataset): a data dir holds
``feats.scp`` (utt → ark rxspecifier), ``utt2num_frames`` and ``utt2spk_id``;
each item is a ``crop_length``-frame window of the utterance's mel matrix —
random start for training, start-0 for validation, zero-padded when the
utterance is shorter (utt2mel_spk.py:54-70). Range reads go straight to the ark
file (seek-based, via data/kaldi_io.py), so only the cropped window ever leaves
disk.

TPU-first differences from the reference's torch DataLoader stack:

- layout is channels-last ``(B, T, D)`` (the reference transposes to (D, T));
- a thread pool (file I/O releases the GIL) assembles whole batches, and
  :func:`prefetch_to_device` keeps ``prefetch_factor`` batches ahead of the
  device so the H2D copy overlaps the train step — the analog of
  ``DataLoader(num_workers=8, pin_memory=True, prefetch_factor=2)``
  (reference: vae_npvc/bin/train.py:69-76);
- batches are optionally sharded over a mesh's data axis by the caller
  (``jax.device_put(batch, sharding)``).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from . import kaldi_io


class UttMelSpkDataset:
    """Map-style dataset over a Kaldi data dir: item = (mel[T, D], spk_id)."""

    def __init__(self, data_dir, config, valid=False):
        crop_length = config.get("crop_length", 256)
        if valid:
            self.crop_length = config.get("valid_crop_length", crop_length)
        else:
            self.crop_length = config.get("train_crop_length", crop_length)
        self.valid = valid

        data_dir = Path(data_dir)
        self.feats_scp = kaldi_io.load_dict_data(data_dir / "feats.scp")
        self.utt2num_frames = {
            k: int(v) for k, v in
            kaldi_io.load_dict_data(data_dir / "utt2num_frames").items()}
        self.utt2spks = kaldi_io.load_list_data(data_dir / "utt2spk_id")
        self.num_data = len(self.utt2spks)

        # native C++ batch loader fast path (FM + Kaldi-compressed CM/CM2/CM3
        # arks); indices in the shared library follow feats.scp line order
        self.native = None
        self._native_row = None
        if config.get("use_native_loader", True):
            from .native_loader import NativeArkLoader
            self.native = NativeArkLoader.open(data_dir / "feats.scp")
            if self.native is not None:
                scp_row = {u: i for i, u in enumerate(self.feats_scp)}
                self._native_row = np.asarray(
                    [scp_row[u] for u, _ in self.utt2spks], np.int64)
        self.spk_ids = np.asarray([int(s) for _, s in self.utt2spks],
                                  np.int32)

    def crop_start(self, index, rng):
        """Crop start for one item (reference utt2mel_spk.py:54-60)."""
        feat_length = self.utt2num_frames[self.utt2spks[index][0]]
        if feat_length <= self.crop_length or self.valid:
            return 0
        return int(rng.integers(0, feat_length - self.crop_length + 1))

    def __len__(self):
        return self.num_data

    def feat_dim(self):
        """Feature dim from the first scp entry's ark header (no full read)."""
        first = next(iter(self.feats_scp.values()))
        return kaldi_io.matrix_header(first)[1]

    def _padded_max_frames(self):
        """Shared M for padded_nbytes/padded_arrays: only utterances actually
        in utt2spk_id count (utt2num_frames may retain filtered entries)."""
        return max(max(self.utt2num_frames[u] for u, _ in self.utt2spks),
                   self.crop_length)

    def padded_nbytes(self):
        """Size of the :meth:`padded_arrays` feature tensor, without loading."""
        return self.num_data * self._padded_max_frames() * self.feat_dim() * 4

    def padded_arrays(self, num_workers=8):
        """Whole corpus as one zero-padded tensor (device-resident staging).

        Returns ``(feats[N, M, D] float32, n_frames[N] int32,
        spk_ids[N] int32)`` with ``M = max(longest utterance, crop_length)``
        — padding with zeros reproduces the host path's zero-pad-if-short
        crop semantics (reference utt2mel_spk.py:68-70) when a crop window
        runs past an utterance's true length.
        """
        utts = [u for u, _ in self.utt2spks]
        M = self._padded_max_frames()
        D = self.feat_dim()
        feats = np.zeros((self.num_data, M, D), np.float32)
        n_frames = np.asarray([self.utt2num_frames[u] for u in utts],
                              np.int32)

        def _load(i):
            m = kaldi_io.load_mat(self.feats_scp[utts[i]]).astype(np.float32)
            feats[i, :m.shape[0]] = m

        if num_workers > 0:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                list(pool.map(_load, range(self.num_data)))
        else:
            for i in range(self.num_data):
                _load(i)
        return feats, n_frames, self.spk_ids

    def get(self, index, rng: np.random.Generator):
        """Read one cropped item. ``rng`` drives the random crop start."""
        # crop_start() is the single crop-semantics definition shared with
        # the native fast path (same per-item seeds -> identical crops)
        return self.get_at(index, self.crop_start(index, rng))

    def get_at(self, index, start):
        """Read one item at a given crop start (see :func:`index_iterator`)."""
        utt, spk = self.utt2spks[index][0], self.utt2spks[index][1]
        feat_length = self.utt2num_frames[utt]
        crop = self.crop_length
        start = int(start)
        end = min(start + crop, feat_length)

        rx = f"{self.feats_scp[utt]}[{start}:{end - 1}]"
        feat = kaldi_io.load_mat(rx).astype(np.float32)  # (t, D)
        if feat.shape[0] < crop:
            feat = np.pad(feat, ((0, crop - feat.shape[0]), (0, 0)))
        return feat, np.int32(spk)


def index_iterator(dataset, batch_size, *, shuffle, drop_last, seed=0,
                   epochs=None):
    """Yield ``(indices[B] int64, crop_starts[B] int64)`` per batch.

    The single source of the epoch-permutation + per-item crop-seed order:
    :func:`batch_iterator` loads these windows from disk, and the
    device-resident trainer path gathers the SAME windows from the
    HBM-staged corpus (Trainer.train_steps_indices) — identical data order
    by construction, not by parallel reimplementation.
    """
    if drop_last and batch_size > len(dataset):
        raise ValueError(
            f"batch_size {batch_size} > dataset size {len(dataset)} with "
            f"drop_last=True would yield no batches ever")
    order_rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        idx = np.arange(len(dataset))
        if shuffle:
            order_rng.shuffle(idx)
        for lo in range(0, len(idx), batch_size):
            chunk = idx[lo:lo + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            # independent crop rng per item, reproducible across workers
            seeds = order_rng.integers(0, 2 ** 63, size=len(chunk))
            starts = np.asarray(
                [dataset.crop_start(i, np.random.default_rng(sd))
                 for i, sd in zip(chunk, seeds)], np.int64)
            yield chunk, starts
        epoch += 1


def batch_iterator(dataset, batch_size, *, shuffle, drop_last, seed=0,
                   num_workers=8, epochs=None):
    """Yield ``(feats[B, T, D] float32, spks[B] int32)`` numpy batches.

    Runs forever when ``epochs`` is None (training); one pass when given
    (validation). Worker threads parallelize the per-item ark range reads.
    The batch_size-vs-corpus guard lives in :func:`index_iterator` (both are
    generators, so the check is equally deferred either way).
    """
    pool = ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
    try:
        for chunk, starts in index_iterator(dataset, batch_size,
                                            shuffle=shuffle,
                                            drop_last=drop_last, seed=seed,
                                            epochs=epochs):
            if dataset.native is not None:
                feats = dataset.native.load_batch(
                    dataset._native_row[chunk], starts,
                    dataset.crop_length,
                    nthreads=max(num_workers, 1))
                yield feats, dataset.spk_ids[chunk]
                continue
            if pool is not None:
                items = list(pool.map(
                    lambda a: dataset.get_at(a[0], a[1]),
                    zip(chunk, starts)))
            else:
                items = [dataset.get_at(i, s)
                         for i, s in zip(chunk, starts)]
            feats = np.stack([it[0] for it in items])
            spks = np.asarray([it[1] for it in items], np.int32)
            yield feats, spks
    finally:
        if pool is not None:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass  # generator finalized during interpreter teardown


def prefetch_to_device(iterator, size=2, sharding=None, put=None):
    """Asynchronously device_put ``size`` batches ahead of the consumer.

    With a ``jax.sharding.Sharding`` the batch lands already sharded over the
    mesh's data axis (H2D goes straight to each chip's HBM slice). ``put`` is
    an alternative callable ``batch -> device batch`` (e.g.
    ``Trainer.shard_batch``, which handles indivisible batch sizes).
    """
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                if put is not None:
                    batch = put(batch)
                elif sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
            q.put(_END)
        except BaseException as e:  # surface loader errors in the consumer
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
