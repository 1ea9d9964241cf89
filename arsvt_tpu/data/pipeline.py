"""Host input pipeline: decode → letterbox → batch → prefetch.

Replaces the reference's 16 fork'd DataLoader workers
(/root/reference/train.py:15-17,1528-1545). Division of labour on TPU
(SURVEY.md §7 "input pipeline"): the host only decodes JPEGs and letterboxes
to a fixed canvas (static shapes for jit); everything per-pixel and random
(shadow/affine/jitter/dropout/normalize) runs on device inside the jitted
train step (`data/augment.py`), so host work is minimal and overlapped with
the device step via a background prefetch thread.

Letterboxing = LongestMaxSize + center PadIfNeeded(reflect)
(train.py:389-398), with the matching normalized-bbox remap.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np
from PIL import Image

from arsvt_tpu.data.coco import CocoDataset


def _open_upright(path: str):
    """Open + apply EXIF orientation — sorter cameras write rotated
    frames with only the tag to say so; the native C++ decoder applies
    the same transform (arsvt_loader.cpp parse_exif_orientation)."""
    from PIL import ImageOps

    with Image.open(path) as im:
        return ImageOps.exif_transpose(im).convert("RGB")


def load_image(path: str) -> np.ndarray:
    """JPEG/PNG -> float32 HWC RGB in [0,1] (cv2 BGR dance not needed)."""
    return np.asarray(_open_upright(path), np.float32) / 255.0


def load_image_u8(path: str) -> np.ndarray:
    """JPEG/PNG -> uint8 HWC RGB (raw bytes; device rescales to [0,1])."""
    return np.asarray(_open_upright(path), np.uint8)


def _pad_and_box_transform(image: np.ndarray, canvas: int):
    """Center-pad an (nh, nw, 3) image to the square canvas; returns the
    padded image and the normalized-box remap. The ONE copy of the pad
    arithmetic + box transform shared by the uint8 and float letterbox
    paths (the native C++ path mirrors it via
    native_loader.box_transform_from_meta)."""
    nh, nw = image.shape[:2]
    pad_y, pad_x = (canvas - nh) // 2, (canvas - nw) // 2
    out = np.pad(
        image,
        ((pad_y, canvas - nh - pad_y), (pad_x, canvas - nw - pad_x), (0, 0)),
        mode="reflect" if min(nh, nw) > 1 else "edge",
    )

    def box_transform(boxes: np.ndarray) -> np.ndarray:
        if boxes.size == 0:
            return boxes
        px = boxes * np.array([nw, nh, nw, nh], np.float32)
        px += np.array([pad_x, pad_y, pad_x, pad_y], np.float32)
        return px / canvas

    return out, box_transform


def letterbox_u8(image: np.ndarray, canvas: int):
    """uint8 resize-longest-side + center reflect-pad to square.

    Returns (uint8 canvas image, box_transform mapping normalized
    x1y1x2y2 boxes of the original image to the canvas)."""
    h, w = image.shape[:2]
    scale = canvas / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    if (nh, nw) != (h, w):
        im = Image.fromarray(image)
        image = np.asarray(im.resize((nw, nh), Image.BILINEAR), np.uint8)
    return _pad_and_box_transform(image, canvas)


def letterbox(image: np.ndarray, canvas: int):
    """fp32 [0,1] variant of `letterbox_u8` (same resize rounding).

    Float input that already matches the canvas size is only padded, never
    quantized through uint8 — off-grid fp32 pixels survive exactly."""
    if (np.issubdtype(image.dtype, np.floating)
            and max(image.shape[:2]) == canvas):
        return _pad_and_box_transform(image.astype(np.float32), canvas)
    u8, box_transform = letterbox_u8(
        np.rint(image * 255).astype(np.uint8)
        if np.issubdtype(image.dtype, np.floating) else image,
        canvas,
    )
    return u8.astype(np.float32) / 255.0, box_transform


def load_letterboxed(paths, canvas: int, records=None, dtype=np.uint8):
    """Batch decode+letterbox: C++ core when built, PIL fallback.

    Returns (images (B,canvas,canvas,3) in `dtype`, transforms: list of
    boxes->boxes callables in normalized coords). The default uint8 ships
    4x fewer bytes to the device than fp32 (VERDICT round-1 weak #5); the
    jitted steps rescale to [0,1] on device (`core.dtypes.to_unit_float`).
    """
    from arsvt_tpu.data import native_loader

    if native_loader.available():
        images, meta = native_loader.load_letterboxed_batch(
            paths, canvas, dtype=dtype
        )
        transforms = []
        for i, p in enumerate(paths):
            if records is not None:
                w, h = records[i].width, records[i].height
            else:
                w = h = canvas  # unused when no boxes follow
            tf = native_loader.box_transform_from_meta(meta[i], canvas)
            transforms.append(
                lambda boxes, tf=tf, w=w, h=h: tf(boxes, w, h)
            )
        return images, transforms
    images, transforms = [], []
    u8 = np.dtype(dtype) == np.uint8
    for p in paths:
        # decode is 8-bit either way (JPEG/PNG); letterbox in uint8 and
        # rescale once at the end for float callers — no fp32 decode pass,
        # no quantization round-trip
        img, tf = letterbox_u8(load_image_u8(p), canvas)
        if not u8:
            img = img.astype(np.float32) / 255.0
        images.append(img)
        transforms.append(tf)
    return np.stack(images), transforms


class Prefetcher:
    """Background-thread prefetch with a bounded queue (host↔device overlap).

    Stoppable: `close()` (also wired to GC) makes the worker exit instead of
    blocking forever in `put` — abandoned infinite iterators otherwise leave
    daemon threads decoding for the rest of the process.
    """

    def __init__(self, it: Iterator, depth: int = 2):
        # the worker closure must capture only these LOCALS, never `self`:
        # a worker referencing self keeps the Prefetcher reachable for as
        # long as the thread lives, so __del__ could never fire and an
        # abandoned iterator (e.g. a caller breaking out of its loop
        # without close()) would leak the thread plus `depth` decoded
        # batches for the rest of the process
        q: queue.Queue = queue.Queue(maxsize=depth)
        done = object()
        err: list[BaseException] = []
        stop = threading.Event()
        self._q, self._done, self._err, self._stop = q, done, err, stop
        self._exhausted = False

        def worker():
            try:
                for item in it:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(done, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self, *, wait: bool = False):
        """Stop the worker. `wait=True` joins it — an in-flight batch
        decode otherwise keeps consuming host CPU briefly after close(),
        which can contaminate a timing section that starts right after."""
        self._stop.set()
        if wait:
            self._t.join(timeout=30)

    def __del__(self):
        self._stop.set()

    def __iter__(self):
        return self

    def __next__(self):
        # the _done sentinel is enqueued exactly once — remember it, or a
        # second next() after exhaustion would block forever in q.get()
        if self._exhausted or (self._stop.is_set() and self._q.empty()):
            raise StopIteration
        while True:
            try:
                item = self._q.get(timeout=0.5)
                break
            except queue.Empty:
                if self._stop.is_set():  # close() racing a blocked consumer
                    raise StopIteration from None
        if item is self._done:
            self._exhausted = True
            if self._err:
                raise self._err[0]
            raise StopIteration
        return item


def _raise_empty_shard(shard_len: int, batch_size: int,
                       process_index: int, process_count: int):
    """A repeating shard that fills no batch would otherwise busy-spin the
    generator forever — training blocks in next() with a pegged core and no
    error (worse on pods: one starved host deadlocks the first collective
    while the others proceed)."""
    raise RuntimeError(
        f"data shard {process_index}/{process_count} has {shard_len} usable"
        f" records — no batch of {batch_size} can ever fill with "
        f"drop_remainder; lower batch_size or add data"
    )


def detection_batches(
    ds: CocoDataset,
    *,
    batch_size: int,
    canvas: int,
    max_objects: int,
    seed: int = 0,
    shuffle: bool = True,
    repeat: bool = True,
    drop_remainder: bool = True,
    prefetch: int = 2,
    process_index: int = 0,
    process_count: int = 1,
    image_dtype=np.uint8,
    skip_batches: int = 0,
) -> Iterator[dict]:
    """Yields {"image": (B,canvas,canvas,3) uint8 raw bytes (default; the
    jitted step rescales on device) or f32 [0,1] with image_dtype=float32,
    "boxes": (B,M,4), "labels": (B,M), "mask": (B,M), "area": (B,M),
    "iscrowd": (B,M), "image_id": (B,)} — area/iscrowd ride along for the
    reference's full target contract (train.py:151-157); losses ignore
    them, COCO eval reads iscrowd as ignore regions.

    `skip_batches` fast-forwards past already-consumed batches (resume):
    index-level only — the seeded shuffle replays identically, nothing is
    decoded for skipped batches."""
    overflow = sum(
        1 for r in ds.records if len(r.boxes) > max_objects
    )
    if overflow:
        import warnings

        warnings.warn(
            f"{overflow} image(s) carry more than max_objects="
            f"{max_objects} boxes — the excess ground truth is TRUNCATED "
            "(never matched in training, counted absent in eval); raise "
            "--max-objects to cover the dataset",
            stacklevel=2,
        )

    def gen():
        # per-host sharding: every host shuffles with the same seed and
        # takes a disjoint stride of the order (multi-host input pipeline,
        # SURVEY.md §2 host-parallelism row)
        rng = np.random.default_rng(seed)
        epoch = 0
        to_skip = skip_batches
        while True:
            order = np.arange(len(ds))
            if shuffle:
                rng.shuffle(order)
            order = order[process_index::process_count]
            yielded = False
            for start in range(0, len(order), batch_size):
                idxs = order[start : start + batch_size]
                if drop_remainder and len(idxs) < batch_size:
                    continue
                if to_skip > 0:  # resume fast-forward: no decode
                    to_skip -= 1
                    yielded = True  # the shard does fill batches
                    continue
                recs = [ds.records[i] for i in idxs]
                images, tfs = load_letterboxed(
                    [r.path for r in recs], canvas, records=recs,
                    dtype=image_dtype,
                )
                boxes, labels, masks, areas, crowds, ids = (
                    [], [], [], [], [], []
                )
                for i, rec, tf in zip(idxs, recs, tfs):
                    t = ds.padded_target(int(i), max_objects)
                    n = min(len(rec.boxes), max_objects)
                    if n:
                        t["boxes"][:n] = tf(rec.boxes[:n])
                    boxes.append(t["boxes"])
                    labels.append(t["labels"])
                    masks.append(t["mask"])
                    areas.append(t["area"])
                    crowds.append(t["iscrowd"])
                    ids.append(t["image_id"])
                yield {
                    "image": images,
                    "boxes": np.stack(boxes),
                    "labels": np.stack(labels),
                    "mask": np.stack(masks),
                    "area": np.stack(areas),
                    "iscrowd": np.stack(crowds),
                    "image_id": np.asarray(ids, np.int32),
                }
                yielded = True
            epoch += 1
            if not repeat:
                return
            if not yielded:
                _raise_empty_shard(len(order), batch_size,
                                   process_index, process_count)

    return Prefetcher(gen(), depth=prefetch)


def classification_batches(
    ds: CocoDataset,
    *,
    batch_size: int,
    canvas: int,
    seed: int = 0,
    shuffle: bool = True,
    repeat: bool = True,
    drop_remainder: bool = True,
    prefetch: int = 2,
    process_index: int = 0,
    process_count: int = 1,
    image_dtype=np.uint8,
    skip_batches: int = 0,
) -> Iterator[dict]:
    """Dominant-class labels; images with no boxes are skipped.

    Yields {"image": (B,canvas,canvas,3) uint8 (default, see
    detection_batches) or f32 [0,1], "label": (B,) i32}.
    `skip_batches`: see detection_batches (resume fast-forward).
    """
    labels_all = ds.classification_labels()
    keep = np.nonzero(labels_all >= 0)[0]

    def gen():
        rng = np.random.default_rng(seed)
        to_skip = skip_batches
        while True:
            order = keep.copy()
            if shuffle:
                rng.shuffle(order)
            order = order[process_index::process_count]
            yielded = False
            for start in range(0, len(order), batch_size):
                idxs = order[start : start + batch_size]
                if drop_remainder and len(idxs) < batch_size:
                    continue
                if to_skip > 0:  # resume fast-forward: no decode
                    to_skip -= 1
                    yielded = True  # the shard does fill batches
                    continue
                images, _ = load_letterboxed(
                    [ds.records[i].path for i in idxs], canvas,
                    dtype=image_dtype,
                )
                yield {
                    "image": images,
                    "label": labels_all[idxs].astype(np.int32),
                }
                yielded = True
            if not repeat:
                return
            if not yielded:
                _raise_empty_shard(len(order), batch_size,
                                   process_index, process_count)

    return Prefetcher(gen(), depth=prefetch)
