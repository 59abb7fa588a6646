"""Host-side data loading with threaded decode and device prefetch.

TPU-native replacement for the reference's tf.data pipeline
(matryodshka/loader.py + data_loader.py): a thread pool decodes/resizes
JPEGs (PIL releases the GIL), batches are assembled as numpy dicts, and a
small prefetch queue keeps the next batch transferred to device while the
current step runs — the equivalent of tf.data's map(num_parallel_calls)
+ prefetch.

Batch dict contract (ODS; data_loader.py:124-185):
  ref_image/src_image/tgt_image: [B, H, W, 3] float32 in [0, 1]
  (+ hres_* when hres supervision is on)
  ref_pose/src_pose: [B, 4, 4] identity
  ref_pose_inv:      [B, 4, 4] identity (explicit, no graph side-channel)
  tgt_pose:          [B, 3] target offset vector
  tgt_pose_rt:       [B, 4, 4] [I | tgt_pose]
  intrinsics:        [B, 3, 3] with [0, 0] = baseline
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from matryodshka_tpu.config import MatryConfig
from matryodshka_tpu.data import images as img_lib
from matryodshka_tpu.data import parsers
from matryodshka_tpu.data.records import OdsSequence, RealEstateSequence

Array = np.ndarray


class OdsLoader:
    """Replica ODS loader (training or evaluation order)."""

    def __init__(self, cfg: MatryConfig, cameras_glob: Optional[str] = None,
                 image_dir: Optional[str] = None,
                 hres_image_dir: Optional[str] = None,
                 training: bool = True, num_workers: int = 8,
                 repeat_sample: Optional[int] = None):
        self.cfg = cfg
        self.training = training
        self.image_dir = image_dir or cfg.image_dir
        self.hres_image_dir = hres_image_dir or cfg.hres_image_dir
        self.load_hres = cfg.supervise_hrestgt
        self.repeat_sample = repeat_sample
        self.sequences = parsers.load_ods_sequences(
            cameras_glob or cfg.cameras_glob, cfg.shuffle_seq_length)
        if not self.sequences:
            raise FileNotFoundError(
                f"no camera lines matched {cameras_glob or cfg.cameras_glob}")
        self.rng = np.random.RandomState(cfg.random_seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)

    def __len__(self):
        return len(self.sequences)

    def _load_example(self, seq: OdsSequence) -> Dict[str, Array]:
        cfg = self.cfg
        paths = [img_lib.ods_image_path(self.image_dir, seq.scene_id, iid)
                 for iid in seq.image_ids]
        imgs = list(self.pool.map(
            lambda p: img_lib.load_and_resize(p, cfg.height, cfg.width),
            paths))
        ex = {
            "ref_image": imgs[0], "src_image": imgs[1], "tgt_image": imgs[2],
            "tgt_pose": seq.tgt_pos.astype(np.float32),
            "baseline": np.float32(seq.baseline),
            "scene_id": seq.scene_id,
            "image_ids": list(seq.image_ids),
        }
        if self.load_hres:
            hres = list(self.pool.map(
                lambda p: img_lib.load_and_resize(p, cfg.hres_height,
                                                  cfg.hres_width), paths))
            ex["hres_ref_image"], ex["hres_src_image"], \
                ex["hres_tgt_image"] = hres
        return ex

    def _format_batch(self, examples: List[Dict[str, Array]]
                      ) -> Dict[str, Array]:
        b = len(examples)
        eye = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        batch: Dict[str, Array] = {
            "ref_pose": eye, "src_pose": eye.copy(),
            "ref_pose_inv": eye.copy(),
        }
        for k in ("ref_image", "src_image", "tgt_image", "hres_ref_image",
                  "hres_src_image", "hres_tgt_image", "tgt_pose"):
            if k in examples[0]:
                batch[k] = np.stack([e[k] for e in examples])
        intr = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
        intr[:, 0, 0] = [e["baseline"] for e in examples]
        batch["intrinsics"] = intr
        rt = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        rt[:, :3, 3] = batch["tgt_pose"]
        batch["tgt_pose_rt"] = rt
        batch["scene_id"] = [e["scene_id"] for e in examples]
        batch["image_ids"] = [e["image_ids"] for e in examples]
        return batch

    def _sequence_iter(self) -> Iterator[OdsSequence]:
        if self.training:
            while True:
                order = self.rng.permutation(len(self.sequences))
                for i in order:
                    yield self.sequences[i]
        else:
            for seq in self.sequences:
                if self.repeat_sample:
                    for _ in range(self.repeat_sample):
                        yield seq
                else:
                    yield seq

    def batches(self) -> Iterator[Dict[str, Array]]:
        it = self._sequence_iter()
        while True:
            seqs = list(itertools.islice(it, self.cfg.batch_size))
            if len(seqs) < self.cfg.batch_size:
                return
            yield self._format_batch([self._load_example(s) for s in seqs])


class ReplicaPerspectiveLoader:
    """Replica perspective (PP) loader (data_loader.py:187-241).

    Camera line: scene_id img1 img2 img3 input_offset tgt_offset.
    Poses: ref = I; src = [I | (-input_offset, 0, 0)];
    tgt = [I | (-tgt_offset, 0, 0)]. Intrinsics: fx=cx=W/2, fy=cy=H/2.

    The PP pipeline's sweep/render reference frame is the slerp midpoint
    of ref/src (train.py:119-120); its inverse is published as
    'ref_pose_inv' so downstream code needs no graph side-channels.
    """

    def __init__(self, cfg: MatryConfig, cameras_glob: Optional[str] = None,
                 image_dir: Optional[str] = None, training: bool = True,
                 num_workers: int = 8):
        self.cfg = cfg
        self.training = training
        self.image_dir = image_dir or cfg.image_dir
        self.sequences = parsers.load_perspective_sequences(
            cameras_glob or cfg.cameras_glob)
        if not self.sequences:
            raise FileNotFoundError(
                f"no camera lines matched {cameras_glob or cfg.cameras_glob}")
        self.rng = np.random.RandomState(cfg.random_seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)

    def _load_example(self, seq) -> Dict[str, Array]:
        cfg = self.cfg
        paths = [img_lib.ods_image_path(self.image_dir, seq.scene_id, iid)
                 for iid in seq.image_ids]
        imgs = list(self.pool.map(
            lambda p: img_lib.load_and_resize(p, cfg.height, cfg.width),
            paths))
        return {"ref_image": imgs[0], "src_image": imgs[1],
                "tgt_image": imgs[2],
                "input_offset": np.float32(seq.input_offset),
                "tgt_offset": np.float32(seq.tgt_offset),
                "scene_id": seq.scene_id,
                "image_ids": list(seq.image_ids)}

    def _format_batch(self, examples) -> Dict[str, Array]:
        b = len(examples)
        h, w = self.cfg.height, self.cfg.width
        batch: Dict[str, Array] = {}
        for k in ("ref_image", "src_image", "tgt_image"):
            batch[k] = np.stack([e[k] for e in examples])
        ref = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
        src = ref.copy()
        tgt = ref.copy()
        src[:, 0, 3] = [-e["input_offset"] for e in examples]
        tgt[:, 0, 3] = [-e["tgt_offset"] for e in examples]
        batch["ref_pose"], batch["src_pose"], batch["tgt_pose"] = \
            ref, src, tgt
        K = np.zeros((b, 3, 3), np.float32)
        K[:, 0, 0] = 0.5 * w
        K[:, 1, 1] = 0.5 * h
        K[:, 0, 2] = 0.5 * w
        K[:, 1, 2] = 0.5 * h
        K[:, 2, 2] = 1.0
        batch["intrinsics"] = K
        # interp (slerp midpoint) reference frame
        import jax.numpy as jnp
        from matryodshka_tpu.geometry.cameras import interpolate_pose
        interp = np.stack([
            np.asarray(interpolate_pose(jnp.asarray(r), jnp.asarray(s)))
            for r, s in zip(ref, src)])
        batch["interp_pose"] = interp
        batch["ref_pose_inv"] = np.linalg.inv(interp)
        batch["scene_id"] = [e["scene_id"] for e in examples]
        batch["image_ids"] = [e["image_ids"] for e in examples]
        return batch

    def batches(self) -> Iterator[Dict[str, Array]]:
        if self.training:
            def it():
                while True:
                    for i in self.rng.permutation(len(self.sequences)):
                        yield self.sequences[i]
            seq_iter = it()
        else:
            seq_iter = iter(self.sequences)
        while True:
            seqs = list(itertools.islice(seq_iter, self.cfg.batch_size))
            if len(seqs) < self.cfg.batch_size:
                return
            yield self._format_batch([self._load_example(s) for s in seqs])


class RealEstateLoader:
    """RealEstate10K loader with the reference's augmentations
    (loader.py:47-183, data_loader.py:245-381): random subsequence of
    length shuffle_seq_length with stride 3-10, random reversal, random
    scale (1.0-1.15) + crop with intrinsics adjustment, then random
    tgt/ref/src index sampling."""

    def __init__(self, cfg: MatryConfig, cameras_glob: Optional[str] = None,
                 image_dir: Optional[str] = None, training: bool = True,
                 shuffle_seq_length: int = 10, num_workers: int = 8,
                 min_stride: int = 3, max_stride: int = 10):
        self.cfg = cfg
        self.training = training
        self.image_dir = image_dir or cfg.image_dir
        self.shuffle_seq_length = shuffle_seq_length
        self.min_stride = min_stride
        self.max_stride = max_stride
        self.sequences = parsers.load_realestate_sequences(
            cameras_glob or cfg.cameras_glob)
        if not self.sequences:
            raise FileNotFoundError(
                f"no camera files matched {cameras_glob or cfg.cameras_glob}")
        # Admission rule (reference loader.py:118): training sequences must
        # fit a subsequence at MAX stride — (n-1)*max_stride + 1 frames —
        # so the stride sampling distribution is never clamped. Eval only
        # needs n frames at stride 1.
        n = shuffle_seq_length
        required = (n - 1) * max_stride + 1 if training else n
        self.sequences = [s for s in self.sequences if len(s) >= required]
        if not self.sequences:
            raise ValueError(
                f"all sequences shorter than the admission rule "
                f"(need {required} frames for length {n} at max stride "
                f"{max_stride})")
        self.rng = np.random.RandomState(cfg.random_seed)
        self.pool = ThreadPoolExecutor(max_workers=num_workers)

    def _load_images(self, seq: RealEstateSequence, height, width):
        paths = [img_lib.realestate_image_path(self.image_dir, seq.seq_id, t)
                 for t in seq.timestamps]
        return np.stack(list(self.pool.map(
            lambda p: img_lib.load_and_resize(p, height, width), paths)))

    def _example(self, seq: RealEstateSequence) -> Dict[str, Array]:
        cfg = self.cfg
        n = self.shuffle_seq_length
        if self.training:
            sub = seq.random_subsequence(self.rng, n,
                                         min_stride=self.min_stride,
                                         max_stride=self.max_stride)
            if self.rng.rand() < 0.5:
                sub = sub.reverse()
        else:
            total = (n - 1) * 1 + 1
            start = max(0, (len(seq) - total) // 2)
            sub = seq.subsequence(start, start + total)

        # random scale & crop (datasets.py:280-312): scale 1.0-1.15 then
        # crop back to (height, width), adjusting normalized intrinsics.
        h, w = cfg.height, cfg.width
        if self.training:
            sy, sx = self.rng.uniform(1.0, 1.15, size=2)
            sh, sw = int(round(h * sy)), int(round(w * sx))
            imgs = self._load_images(sub, sh, sw)
            oy = self.rng.randint(0, sh - h + 1)
            ox = self.rng.randint(0, sw - w + 1)
            imgs = imgs[:, oy:oy + h, ox:ox + w]
            intr_px = sub.intrinsics * np.asarray([sw, sh, sw, sh],
                                                  np.float32)
            intr_px = intr_px - np.asarray([0, 0, ox, oy], np.float32)
            intr = intr_px / np.asarray([w, h, w, h], np.float32)
        else:
            imgs = self._load_images(sub, h, w)
            intr = sub.intrinsics

        # random tgt / (ref, src) index choice (data_loader.py:319-329)
        tgt_idx = self.rng.randint(0, n)
        perm = self.rng.permutation(n)
        ref_idx, src_idx = int(perm[0]), int(perm[1])

        def pose4(i):
            p = np.eye(4, dtype=np.float32)
            p[:3, :4] = sub.poses[i]
            return p

        fx, fy, cx, cy = intr[ref_idx]
        K = np.asarray([[fx * w, 0, cx * w], [0, fy * h, cy * h],
                        [0, 0, 1]], np.float32)
        return {
            "tgt_image": imgs[tgt_idx], "ref_image": imgs[ref_idx],
            "src_image": imgs[src_idx],
            "tgt_pose": pose4(tgt_idx), "ref_pose": pose4(ref_idx),
            "src_pose": pose4(src_idx), "intrinsics": K,
            "scene_id": sub.seq_id,
            "image_ids": [str(sub.timestamps[i])
                          for i in (ref_idx, src_idx, tgt_idx)],
        }

    def batches(self) -> Iterator[Dict[str, Array]]:
        order = itertools.cycle(range(len(self.sequences))) \
            if self.training else iter(range(len(self.sequences)))
        while True:
            exs = []
            for _ in range(self.cfg.batch_size):
                try:
                    idx = next(order)
                except StopIteration:
                    return
                exs.append(self._example(self.sequences[idx]))
            batch = {k: np.stack([e[k] for e in exs])
                     for k in ("tgt_image", "ref_image", "src_image",
                               "tgt_pose", "ref_pose", "src_pose",
                               "intrinsics")}
            batch["ref_pose_inv"] = np.linalg.inv(batch["ref_pose"])
            batch["scene_id"] = [e["scene_id"] for e in exs]
            batch["image_ids"] = [e["image_ids"] for e in exs]
            yield batch


def make_loader(cfg: MatryConfig, training: bool = True, **kwargs):
    """Loader factory keyed on cfg.input_type (the reference's per-type
    data_loader dispatch, test.py:51 / train.py:104-115)."""
    if cfg.input_type == "REALESTATE_PP":
        # RealEstate clips use length-10 shuffle windows (reference
        # loader.py:361), independent of the ODS group length flag.
        kwargs.setdefault("shuffle_seq_length", 10)
        return RealEstateLoader(cfg, training=training, **kwargs)
    if cfg.input_type == "PP":
        return ReplicaPerspectiveLoader(cfg, training=training, **kwargs)
    return OdsLoader(cfg, training=training, **kwargs)


def device_prefetch(batch_iter: Iterator[Dict[str, Array]], size: int = 2,
                    sharding=None) -> Iterator[Dict]:
    """Double-buffered host->device prefetch: transfers the next batch(es)
    while the current step computes (replaces tf.data prefetch)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = object()

    def put(batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        meta = {k: v for k, v in batch.items()
                if not isinstance(v, np.ndarray)}
        dev = jax.device_put(arrays, sharding) if sharding is not None \
            else jax.device_put(arrays)
        dev.update(meta)
        return dev

    def worker():
        try:
            for batch in batch_iter:
                q.put(put(batch))
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
