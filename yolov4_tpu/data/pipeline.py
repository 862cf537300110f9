"""Host-side input pipeline.

TPU-native replacement for torch DataLoader + DistributedSampler
(reference yolo/data/build.py:19-56): each JAX process loads only its shard
of every global batch (single-controller model), batches are collated into
NHWC numpy arrays ready for device put, and augmentation runs in forked
worker processes with deterministic per-(epoch, batch) seeding — seeds are
derived from content position, not worker identity, so runs reproduce
regardless of worker count.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_WORKER_DATASET = None


def _init_worker(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _sample_seed(batch_seed: Optional[int], j: int) -> Optional[int]:
    """Per-sample seed from (batch seed, position): identical streams for
    any worker count, and samples of one batch can build in parallel."""
    if batch_seed is None:
        return None
    return hash((batch_seed, j)) & 0x7FFFFFFF


def _fetch_sample(args):
    idx, seed, img_size = args
    ds = _WORKER_DATASET
    if seed is not None and hasattr(ds, "seed"):
        ds.seed(seed)
    if img_size is not None and hasattr(ds, "set_img_size"):
        # multi-scale: the size rides WITH the task — worker processes
        # hold frozen dataset copies, so a parent-side set_img_size can
        # never reach them (reference hook: cocodataset.py:152-156)
        ds.set_img_size(int(img_size))
    img, target = ds[int(idx)]
    return np.asarray(img), target


def _collate(dataset, indices, seed: Optional[int],
             img_size: Optional[int] = None):
    imgs, targets = [], []
    if img_size is not None:
        dataset.set_img_size(int(img_size))
    for j, idx in enumerate(indices):
        s = _sample_seed(seed, j)
        if s is not None and hasattr(dataset, "seed"):
            dataset.seed(s)
        img, target = dataset[int(idx)]
        imgs.append(np.asarray(img))
        targets.append(target)
    collated = {
        key: np.stack([np.asarray(t[key]) for t in targets])
        for key in targets[0]
    }
    return np.stack(imgs), collated


class DataLoader:
    """Sharded, batched, optionally multiprocess loader.

    Yields (images [B, S, S, 3] float32 NHWC, target dict). B is the
    PER-PROCESS batch size. With ``pad_last`` the final short batch is
    padded by repeating the first element and a 'batch_mask' is added to
    the target (static batch shapes for XLA).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 0, seed: int = 0, drop_last: bool = False,
                 pad_last: bool = True, process_index: int = 0,
                 process_count: int = 1, start_method: str = "spawn",
                 prefetch_batches: int = 3):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch_batches = max(1, prefetch_batches)
        self.epoch = 0
        # 'spawn' by default: forking after JAX initializes (multithreaded)
        # risks deadlocks. Workers touch only numpy/cv2/PIL, so a clean
        # interpreter is safe; the pool persists across epochs to amortize
        # the startup.
        self.start_method = start_method
        self._pool = None
        # one-shot batch offset for mid-epoch resume: the NEXT iteration
        # starts at this batch index (indices, per-batch seeds and batch
        # numbering stay aligned with an uninterrupted epoch), then later
        # epochs start at 0 again
        self.start_batch = 0
        # optional multi-scale schedule: (epoch, batch_index) -> img_size.
        # Evaluated per batch in _batches() and shipped WITH each sample
        # task (prefetch-safe, worker-copy-safe); None = fixed dataset size
        self.size_schedule = None

    def _get_pool(self):
        if self._pool is None:
            ctx = mp.get_context(self.start_method)
            self._pool = ctx.Pool(self.num_workers, initializer=_init_worker,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle per epoch (DistributedSampler.set_epoch equivalent)."""
        self.epoch = epoch

    def _local_indices(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        if self.process_count > 1:
            # pad to a multiple of process_count (wrap), then stride-shard
            total = -(-n // self.process_count) * self.process_count
            order = np.concatenate([order, order[: total - n]])
            order = order[self.process_index::self.process_count]
        return order

    def __len__(self) -> int:
        n = len(self._local_indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self):
        order = self._local_indices()
        nb = len(self)
        start, self.start_batch = self.start_batch, 0  # consume one-shot
        for i in range(start, nb):
            chunk = order[i * self.batch_size:(i + 1) * self.batch_size]
            seed = hash((self.seed, self.epoch, i, self.process_index)) & 0x7FFFFFFF
            if self.size_schedule is not None:
                size = self.size_schedule(self.epoch, i)
            else:
                # no schedule: still ship the dataset's CURRENT size so
                # worker copies track parent-side set_img_size calls (and
                # a schedule that turned off doesn't leave workers stuck
                # at whatever size their last task set)
                size = (self.dataset.get_img_size()
                        if hasattr(self.dataset, "get_img_size") else None)
            yield chunk, seed, size

    def _finalize(self, imgs, target, n_real: int):
        if n_real < self.batch_size and self.pad_last:
            pad = self.batch_size - n_real
            imgs = np.concatenate([imgs, np.repeat(imgs[:1], pad, axis=0)])
            target = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                      for k, v in target.items()}
        mask = np.zeros(len(imgs), bool)
        mask[:n_real] = True
        target["batch_mask"] = mask
        return imgs, target

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
        if self.num_workers <= 0:
            for chunk, seed, size in self._batches():
                imgs, target = _collate(self.dataset, chunk, seed, size)
                yield self._finalize(imgs, target, len(chunk))
            return

        # per-SAMPLE tasks (one batch builds on many workers at once, not
        # one worker per batch) with a bounded run-ahead window of
        # prefetch_batches batches — round 1's batch-granularity imap left
        # a batch's latency serial on a single worker and buffered results
        # without bound when the consumer stalled
        from collections import deque

        pool = self._get_pool()
        batches = list(self._batches())
        flat = [(int(idx), _sample_seed(seed, j), size)
                for chunk, seed, size in batches
                for j, idx in enumerate(chunk)]
        cap = max(self.prefetch_batches * self.batch_size,
                  2 * self.num_workers)
        pending: deque = deque()
        ti = 0

        def pump():
            nonlocal ti
            while ti < len(flat) and len(pending) < cap:
                pending.append(pool.apply_async(_fetch_sample, (flat[ti],)))
                ti += 1

        pump()
        for chunk, seed, _size in batches:
            samples = []
            for _ in chunk:
                samples.append(pending.popleft().get())
                pump()
            imgs = np.stack([s[0] for s in samples])
            target = {
                key: np.stack([np.asarray(s[1][key]) for s in samples])
                for key in samples[0][1]
            }
            yield self._finalize(imgs, target, len(chunk))


def build_data(cfg: Dict, data_root: str, process_index: int = 0,
               process_count: int = 1, seed: int = 0):
    """Train + val loaders (reference data/build.py:19 equivalent).

    Val batches (static shapes let us batch, unlike the reference's
    batch=1 eval — SURVEY discrepancy #10)."""
    from yolov4_tpu.data.coco import COCODataset
    from yolov4_tpu.data.transforms import Transform

    if cfg["AUGMENTATION"].get("DEVICE", False):
        # host does decode+resize only; crop/flip/HSV/mosaic run on device
        # inside the train step (data/device_aug.py)
        from yolov4_tpu.data.device_aug import CanvasTransform
        train_transform = CanvasTransform(cfg)
    else:
        train_transform = Transform(cfg, is_train=True)
    train_dataset = COCODataset(
        root=data_root, name="train2017", img_size=cfg["TRAIN"]["IMGSIZE"],
        is_train=True, transform=train_transform,
        num_classes=cfg["MODEL"]["N_CLASSES"])
    val_dataset = COCODataset(
        root=data_root, name="val2017", img_size=cfg["TEST"]["IMGSIZE"],
        is_train=False,
        transform=Transform(cfg, is_train=False, keep_uint8=True),
        num_classes=cfg["MODEL"]["N_CLASSES"])

    train_loader = DataLoader(
        train_dataset, batch_size=cfg["DATA"]["BATCH_SIZE"], shuffle=True,
        num_workers=cfg["DATA"]["WORKERS"], seed=seed, drop_last=True,
        process_index=process_index, process_count=process_count)
    # val is process-sharded too: every process evaluates its slice and the
    # evaluator allgathers rows (round 1 idled all non-primary processes)
    val_loader = DataLoader(
        val_dataset, batch_size=cfg["TEST"].get("BATCH_SIZE", 8), shuffle=False,
        num_workers=cfg["DATA"]["WORKERS"], seed=seed,
        process_index=process_index, process_count=process_count)
    return train_loader, val_loader
