"""Host input pipeline: decode -> resize -> augment -> normalise -> batch -> device.

Replaces the reference's ``torch.utils.data`` Datasets + 4-worker DataLoader
(dataset/cityscapes_dataset.py, dataset/gta5_dataset.py; wired up at
tools/trainV2_simt.py:287-292) with a thread-pool loader that double-buffers batches and
overlaps host preprocessing with device compute via an async ``jax.device_put`` prefetch.

Semantics preserved exactly:
  - PIL bicubic resize for images / nearest for labels (cityscapes_dataset.py:105-106);
  - optional horizontal mirror with p=0.5 (:111-114) — here driven by a *seeded* generator
    (the reference's per-worker ``np.random`` is unseeded, so parity is distribution-level;
    SURVEY.md §5 race-detection row);
  - RGB->BGR flip + mean subtraction (:117-118);
  - GTA5 id->trainid remap with 255 fill (gta5_dataset.py:60-63);
  - epoch-free iteration: the index list is reshuffled each epoch and repeated
    indefinitely (the reference repeats the list ceil(max_iters/len) times, :77-78).

Layout: images are produced NHWC (TPU-native), not the reference's CHW.

Wire format: the loader ships **uint8 BGR** images (decode/resize/mirror/BGR on the
host) and the float32 cast + mean subtraction happen ON DEVICE (``normalize_image``,
called at the top of every jitted train/eval function). This is numerically identical
to the reference's order — PIL's resize returns uint8 *before* the float conversion at
cityscapes_dataset.py:100,117-118 — and cuts host->device transfer 4x (2 MB vs 8 MB per
512x1024 batch), which matters both on PCIe hosts and acutely on this environment's
~20 MB/s tunnel (see bench.py --pipeline).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from . import lists

def _native():
    """The C++ preprocessing library, or None (PIL fallback).

    Bicubic is bit-identical to Pillow at every size; nearest is bit-identical at all
    production label geometries (2048x1024 -> 1024x512, GTA5 1914x1052 -> crop) and all
    tested downscales — Pillow's mixed fixed/float internals can differ on integer-tie
    columns at other ratios (tests pin the production sizes).
    """
    global _NATIVE
    if _NATIVE is _UNSET:
        try:
            from . import _native_preproc

            _native_preproc.load()
            _NATIVE = _native_preproc
        except Exception:  # pragma: no cover - toolchain missing
            _NATIVE = None
    return _NATIVE


_UNSET = object()
_NATIVE = _UNSET
USE_NATIVE = True  # module-level switch (DataConfig.use_native_preproc sets this)


def _open_image(path: str, mode: str = "RGB"):
    from PIL import Image

    img = Image.open(path)
    return img.convert(mode) if mode else img


def load_image_bgr(
    path: str,
    crop_wh: Tuple[int, int],
    mean_bgr: Sequence[float],
    mirror: bool = False,
) -> np.ndarray:
    """Decode + bicubic resize to (w,h) + [mirror] + BGR + mean-sub, HWC float32
    (cityscapes_dataset.py:100,105,108,111-118)."""
    from PIL import Image

    native = _native() if USE_NATIVE else None
    if native is not None:
        rgb = np.asarray(_open_image(path), np.uint8)
        return native.preprocess_image(rgb, crop_wh[1], crop_wh[0], mean_bgr, mirror)
    img = _open_image(path).resize(crop_wh, Image.BICUBIC)
    arr = np.asarray(img, np.float32)
    if mirror:
        arr = arr[:, ::-1]
    arr = arr[:, :, ::-1] - np.asarray(mean_bgr, np.float32)
    return np.ascontiguousarray(arr)


def load_image_bgr_u8(
    path: str, crop_wh: Tuple[int, int], mirror: bool = False
) -> np.ndarray:
    """Decode + bicubic resize to (w,h) + [mirror] + BGR, HWC **uint8** — the wire
    format (see module docstring). Mean subtraction happens on device
    (``normalize_image``); the uint8 values here are exactly PIL's resize output
    (cityscapes_dataset.py:100,105), so host+device compose to the reference's math."""
    from PIL import Image

    native = _native() if USE_NATIVE else None
    if native is not None:
        rgb = np.asarray(_open_image(path), np.uint8)
        # The native resampler is Pillow-bit-exact, so its pre-mean values are exact
        # uint8 integers; a zero mean recovers them. rint (not truncation) so a value
        # a float-ulp below an integer cannot silently go off-by-one.
        f = native.preprocess_image(rgb, crop_wh[1], crop_wh[0], (0.0, 0.0, 0.0),
                                    mirror)
        return np.rint(f).astype(np.uint8)
    img = _open_image(path).resize(crop_wh, Image.BICUBIC)
    arr = np.asarray(img, np.uint8)
    if mirror:
        arr = arr[:, ::-1]
    return np.ascontiguousarray(arr[:, :, ::-1])


def normalize_image(image, mean_bgr: Sequence[float]):
    """Device-side half of the input pipeline: uint8 BGR -> float32 mean-subtracted
    (cityscapes_dataset.py:117-118). float32 inputs (synthetic batches, tests) pass
    through unchanged — jit specialises on the input dtype."""
    import jax.numpy as jnp

    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) - jnp.asarray(mean_bgr, jnp.float32)
    return image


def normalize_label(label):
    """uint8 wire labels -> int32 (ids are <= 255, incl. the 255 ignore id)."""
    import jax.numpy as jnp

    return label.astype(jnp.int32) if label.dtype == jnp.uint8 else label


def load_label(path: str, crop_wh: Tuple[int, int]) -> np.ndarray:
    """Decode + nearest resize, HW int32 (cityscapes_dataset.py:101,106)."""
    from PIL import Image

    native = _native() if USE_NATIVE else None
    if native is not None:
        lab = np.asarray(_open_image(path, mode=None), np.uint8)
        if lab.ndim == 2:
            return native.resize_nearest(lab, crop_wh[1], crop_wh[0]).astype(np.int32)
    lab = _open_image(path, mode=None).resize(crop_wh, Image.NEAREST)
    return np.asarray(lab, np.int32)


def remap_gta5_ids(label: np.ndarray, ignore_label: int = 255) -> np.ndarray:
    """GTA5 label ids -> Cityscapes train ids, others -> ignore (gta5_dataset.py:60-63)."""
    out = np.full(label.shape, ignore_label, np.int32)
    for k, v in lists.GTA5_ID_TO_TRAINID.items():
        out[label == k] = v
    return out


@dataclass
class Sample:
    image_path: str
    label_path: Optional[str]
    name: str
    gta5_remap: bool = False


class CropCache:
    """On-disk cache of decoded+resized UN-MIRRORED uint8 crops.

    Training revisits each of the 2,975 Cityscapes images ~13x over a 40k-iter run
    (the reference re-decodes the PNG every epoch, cityscapes_dataset.py:97-120);
    PNG decode + bicubic resize dominates host cost (~135 ms/image on a 1-core
    host). The cache stores the post-resize wire tensors — image: HWC uint8 BGR
    (~1.6 MB at 1024x512), label: HW uint8 trainids (GTA5 remap applied) — so every
    epoch after the first is decode-free. The horizontal mirror happens AFTER the
    resize in the reference (:105,111-114), so flipping the cached crop is exactly
    equal to decoding with mirror; cached and uncached paths are bit-identical
    (tests/test_data.py).

    Files are written atomically (tmp + os.replace), so concurrent loader workers
    (threads or processes) race benignly: last write wins with identical content.
    """

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _key(self, path: str, crop_wh: Tuple[int, int], kind: str) -> str:
        import hashlib

        # mtime+size in the key: regenerating a source file at the same path (the
        # normal workflow for pseudo-label PNGs between warmup rounds) must MISS
        # rather than silently serve the stale pre-regeneration crop.
        st = os.stat(path)
        h = hashlib.sha1(
            f"{os.path.abspath(path)}|{crop_wh[0]}x{crop_wh[1]}|{kind}"
            f"|{st.st_mtime_ns}|{st.st_size}".encode()
        ).hexdigest()[:24]
        return os.path.join(self.cache_dir, f"{h}_{kind}.npy")

    def get_or_put(self, path: str, crop_wh: Tuple[int, int], kind: str,
                   compute) -> np.ndarray:
        fname = self._key(path, crop_wh, kind)
        if os.path.exists(fname):
            try:
                return np.load(fname)
            except Exception:
                pass  # truncated by a crashed writer: recompute + rewrite
        arr = compute()
        tmp = f"{fname}.{os.getpid()}.tmp.npy"  # .npy suffix: np.save appends none
        try:
            np.save(tmp, arr)
            os.replace(tmp, fname)
        except OSError:
            if os.path.exists(tmp):
                os.remove(tmp)
        return arr


class SegDataset:
    """Unified dataset over the three reference loader flavours.

    - ``cityscapes_pseudo(root, lst)``: image+pseudo-label pairs (cityscapesPseudo,
      cityscapes_dataset.py:66-120) — the main SimT training input;
    - ``cityscapes_eval(root, txt, split)``: image-only val list (cityscapesDataSet, :21-63);
    - ``gta5(root, txt)``: source images+labels with id remap (GTA5DataSet).
    """

    def __init__(self, samples: List[Sample], crop_wh: Tuple[int, int],
                 mean_bgr: Sequence[float], mirror: bool = False,
                 cache_dir: str = ""):
        self.samples = samples
        self.crop_wh = crop_wh
        self.mean_bgr = tuple(mean_bgr)
        self.mirror = mirror
        # Opt-in decoded-crop cache (DataConfig.crop_cache_dir); "" disables.
        self.cache_dir = cache_dir
        self._cache = CropCache(cache_dir) if cache_dir else None

    def __getstate__(self):
        # CropCache holds no open handles, but rebuild it worker-side so spawned
        # process workers (re)create the directory in their own context.
        st = dict(self.__dict__)
        st["_cache"] = None
        return st

    def __setstate__(self, st):
        self.__dict__.update(st)
        if self.cache_dir:
            self._cache = CropCache(self.cache_dir)

    @classmethod
    def cityscapes_pseudo(cls, root: str, list_path: str, crop_wh, mean_bgr,
                          mirror=False, cache_dir=""):
        samples = [
            Sample(
                image_path=os.path.join(root, img),
                label_path=os.path.join(root, lab),
                name=os.path.splitext(os.path.basename(lab))[0],
            )
            for img, lab in lists.read_pair_list(list_path)
        ]
        return cls(samples, crop_wh, mean_bgr, mirror, cache_dir=cache_dir)

    @classmethod
    def cityscapes_eval(cls, root: str, list_path: str, crop_wh, mean_bgr, split="val"):
        samples = [
            Sample(image_path=os.path.join(root, split, name), label_path=None, name=name)
            for name in lists.read_name_list(list_path)
        ]
        return cls(samples, crop_wh, mean_bgr, mirror=False)

    @classmethod
    def gta5(cls, root: str, list_path: str, crop_wh, mean_bgr, mirror=False,
             cache_dir=""):
        samples = [
            Sample(
                image_path=os.path.join(root, "images", name),
                label_path=os.path.join(root, "labels", name),
                name=name,
                gta5_remap=True,
            )
            for name in lists.read_name_list(list_path)
        ]
        return cls(samples, crop_wh, mean_bgr, mirror, cache_dir=cache_dir)

    def __len__(self) -> int:
        return len(self.samples)

    def get(self, index: int, rng: Optional[np.random.Generator] = None) -> Dict:
        s = self.samples[index]
        mirror = bool(self.mirror and rng is not None and rng.integers(2) == 1)
        if self._cache is not None:
            # Cache the UN-mirrored resized crop; the mirror is a post-resize width
            # flip in the reference (cityscapes_dataset.py:105,111-114), so flipping
            # the cached array is bit-identical to decoding with mirror=True.
            image = self._cache.get_or_put(
                s.image_path, self.crop_wh, "img",
                lambda: load_image_bgr_u8(s.image_path, self.crop_wh, mirror=False),
            )
            if mirror:
                image = image[:, ::-1]
        else:
            image = load_image_bgr_u8(s.image_path, self.crop_wh, mirror=mirror)
        label = None
        if s.label_path is not None:
            if self._cache is not None:
                label = self._cache.get_or_put(
                    s.label_path, self.crop_wh, "lab", lambda: self._load_label(s)
                )
            else:
                label = self._load_label(s)
            if mirror:
                label = label[:, ::-1]
        out = {"image": np.ascontiguousarray(image), "name": s.name, "mirror": mirror}
        if label is not None:
            out["label"] = np.ascontiguousarray(label)
        return out

    def _load_label(self, s: Sample) -> np.ndarray:
        """Nearest-resized label as uint8 wire format (ids <= 255, incl. 255
        ignore); GTA5 id remap applied pre-cache."""
        label = load_label(s.label_path, self.crop_wh)
        if s.gta5_remap:
            label = remap_gta5_ids(label)
        return label.astype(np.uint8)


_WORKER_DS = None


def _worker_init(ds_bytes: bytes, use_native: bool = True) -> None:
    """Process-pool initializer: unpickle the dataset once per worker and propagate
    the module-level USE_NATIVE switch (spawned workers re-import this module, which
    would otherwise silently reset a parent-side override to the default)."""
    global _WORKER_DS, USE_NATIVE
    import pickle

    _WORKER_DS = pickle.loads(ds_bytes)
    USE_NATIVE = use_native


def _worker_get(args):
    idx, seed = args
    rng = None if seed is None else np.random.default_rng(seed)
    return _WORKER_DS.get(idx, rng)


class Loader:
    """Epoch-free shuffled batch iterator with parallel decode + device prefetch.

    ``process_workers=True`` decodes in spawned worker PROCESSES (the reference's
    torch DataLoader model, trainV2_simt.py:287-292). This matters: Pillow holds the
    GIL during PNG decode, so thread workers scale NEGATIVELY (measured 129 ms/item
    serial -> 189 ms/item with 4 threads); four processes decode four images
    concurrently. Thread mode remains the default for tiny fixtures/tests where the
    ~1 s spawn cost dominates; ``build_loader`` (train/loop.py) enables processes
    for real runs via ``DataConfig.process_workers``.

    Note: the decode queue holds ``max(prefetch, num_workers + 2)`` batches — a
    smaller ``prefetch`` is raised to keep the worker pool saturated at bs=1, which
    also raises peak host memory by up to ``num_workers + 2`` batches (relevant for
    eval-resolution images on small hosts).
    """

    def __init__(
        self,
        dataset: SegDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 1234,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        loop: bool = True,
        process_workers: bool = False,
        process_shard: Optional[Tuple[int, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.loop = loop
        self.process_workers = process_workers
        # Multi-process data parallelism: ``(index, count)`` makes this loader draw
        # the SAME global index+augmentation-seed stream as every peer (identical
        # seed => identical shuffle) but decode only block ``index`` of each
        # ``count * batch_size`` global batch — the per-process slice of the global
        # array assembled by jax.make_array_from_process_local_data downstream.
        self.process_shard = process_shard

    def _index_stream(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        epoch = 0
        while True:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(idx)
            yield from idx.tolist()
            epoch += 1
            if not self.loop:
                return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + 1)
        stream = self._index_stream()
        stop = threading.Event()
        # Keep at least num_workers+2 batches of decodes in flight so bs=1 batches
        # don't starve the worker pool (the queue gates batches, not items).
        q: "queue.Queue" = queue.Queue(
            maxsize=max(self.prefetch, self.num_workers + 2)
        )
        if self.process_workers:
            import multiprocessing as mp
            import pickle
            from concurrent.futures import ProcessPoolExecutor

            pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=mp.get_context("spawn"),  # fork-after-jax is unsafe
                initializer=_worker_init,
                initargs=(pickle.dumps(self.dataset), USE_NATIVE),
            )
            get = _worker_get
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            ds = self.dataset

            def get(args):
                i, seed = args
                return ds.get(i, None if seed is None else np.random.default_rng(seed))

        shard_idx, shard_cnt = self.process_shard or (0, 1)

        def submit_batch():
            pairs = []
            for _ in range(self.batch_size * shard_cnt):
                try:
                    i = next(stream)
                except StopIteration:
                    break
                # Pre-draw augmentation seeds on the main thread for determinism
                # (an int seed, identical stream for thread and process pools —
                # and, with process_shard, identical across peer processes).
                pairs.append((i, int(rng.integers(2**63))))
            if len(pairs) < self.batch_size * shard_cnt:
                # Partial global groups are dropped in sharded mode (peers must
                # agree on the global batch layout); otherwise honour drop_last.
                if shard_cnt > 1 or self.drop_last or not pairs:
                    return None
            pairs = pairs[shard_idx * self.batch_size:(shard_idx + 1) * self.batch_size]
            return [pool.submit(get, pair) for pair in pairs]

        def producer():
            try:
                while not stop.is_set():
                    futures = submit_batch()
                    if futures is None:
                        break
                    q.put(futures)
            finally:
                q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                futures = q.get()
                if futures is None:
                    break
                items = [f.result() for f in futures]
                batch = {"image": np.stack([it["image"] for it in items])}
                if "label" in items[0]:
                    batch["label"] = np.stack([it["label"] for it in items])
                batch["name"] = [it["name"] for it in items]
                batch["mirror"] = [it.get("mirror", False) for it in items]
                yield batch
        finally:
            stop.set()
            while not q.empty():  # unblock producer
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            pool.shutdown(wait=False, cancel_futures=True)


def device_prefetch(iterator: Iterator[Dict], size: int = 2, sharding=None) -> Iterator[Dict]:
    """Overlap host->device transfer with compute: keep ``size`` batches in flight.

    With ``sharding`` (a jax.sharding.Sharding), batches land directly in their
    data-parallel placement — the multi-host input path the reference never had.
    On a multi-process mesh (non-fully-addressable sharding) the iterator must
    yield this process's local block of the global batch; the global array is
    assembled via ``jax.make_array_from_process_local_data``.
    """
    import collections

    import jax

    buf = collections.deque()
    cross_process = sharding is not None and not sharding.is_fully_addressable

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if cross_process:
            placed = {
                k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in arrays.items()
            }
        elif sharding is not None:
            placed = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            placed = {k: jax.device_put(v) for k, v in arrays.items()}
        placed.update(rest)
        return placed

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
