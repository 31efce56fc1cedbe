"""Training/eval input pipeline: host IO + one fused device-side program for
augmentation and target assembly.

Reference counterpart: the Keras Generator
(/root/reference/keras_retinanet_3D/preprocessing/generator.py) — per-image
python threads doing TF-session photometric aug, cv2 warps, and a numpy
anchor-assignment hot loop. TPU-native restructuring:

  host (numpy/PIL): read image -> resize to the static bucket scale -> pad to
    ONE static (H, W) -> pad annotations/ignore boxes to static G/M;
  device (one jit program per static shape): photometric + affine warp
    augmentation -> caffe-mean subtraction -> vectorized anchor target
    assignment for the whole batch.

A single static padded shape per dataset keeps XLA from retracing (the
reference's aspect-ratio grouping exists to limit pad waste across varying
shapes; KITTI is single-resolution, so one bucket loses nothing).
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import anchors as anchor_ops
from ..ops.targets import anchor_targets
from .augment import AugmentConfig, augment_example
from .kitti import BGR_MEAN, KittiDataset, resize_scale

__all__ = ["KittiLoader"]


def _resize_image_pil(image: np.ndarray, scale: float) -> np.ndarray:
    from PIL import Image

    h, w = image.shape[:2]
    out = Image.fromarray(image.astype(np.uint8)).resize(
        (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR)
    return np.asarray(out, dtype=np.float32)


def _resize_image(image: np.ndarray, scale: float) -> np.ndarray:
    """Bilinear resize by a uniform scale factor.

    Prefers cv2 — the REFERENCE's resize kernel (utils/image.py:196-199
    uses cv2.resize with the default INTER_LINEAR), so imported reference
    checkpoints see bit-identical inference inputs — and falls back to PIL
    bilinear (bounded deviation, ~2/255 mean on photographic content at
    the KITTI scale; tests/test_data.py pins both)."""
    try:
        import cv2
    except ImportError:
        return _resize_image_pil(image, scale)
    return cv2.resize(image.astype(np.uint8), None, fx=scale,
                      fy=scale).astype(np.float32)


def _resize_image_uint8(image: np.ndarray, scale: float) -> np.ndarray:
    """`_resize_image` without the float32 round trips: uint8 in, uint8 out.

    cv2.resize (and the PIL fallback) already compute on the uint8 input
    and return uint8; `_resize_image` merely casts that result to float32,
    and `uint8_canvas` casts it straight back (rint∘clip is the identity
    on exact uint8 counts). Skipping both full-frame casts is bit-identical
    and saves ~3 image-sized host allocations per frame — measurable on
    the serving path, where host prep is the bottleneck on a 1-CPU box."""
    image = image.astype(np.uint8, copy=False)
    try:
        import cv2
    except ImportError:
        from PIL import Image

        h, w = image.shape[:2]
        out = Image.fromarray(image).resize(
            (int(round(w * scale)), int(round(h * scale))), Image.BILINEAR)
        return np.asarray(out)
    return cv2.resize(image, None, fx=scale, fy=scale)


def uint8_canvas(resized: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a resized image into a (ph, pw, 3) uint8 canvas.

    The uint8 payload is lossless (the resize output is uint8-valued —
    PIL bilinear on uint8 input; the native loader's float bilinear rounds
    to the nearest count within its PIL-parity tolerance) and 4x smaller
    on the host->device link than f32; pair with a detect function built
    with device_preprocess=True (cast + mean subtraction on device)."""
    canvas = np.zeros((ph, pw, 3), np.uint8)
    if resized.dtype == np.uint8:
        # already quantized (e.g. _resize_image_uint8): rint/clip is the
        # identity on uint8, so skip the two full-frame temporaries
        canvas[: resized.shape[0], : resized.shape[1]] = resized
    else:
        # clip before the cast: uint8 wraps on out-of-range values, which
        # would turn an upstream resize bug into silent 255-off pixels
        canvas[: resized.shape[0], : resized.shape[1]] = \
            np.rint(np.clip(resized, 0.0, 255.0)).astype(np.uint8)
    return canvas


def prepare_network_frame(image_path: str, calib_path: str,
                          min_side: int, max_side: int,
                          pad_multiple: int = 32) -> dict:
    """The host-side per-frame contract shared by the serving and offline
    inference CLIs (bin/run_network, bin/serve): read BGR, resize to
    min/max side, pad to the `pad_multiple` bucket as a uint8 canvas
    (the 32 bucket measured 24-31% faster e2e than 128 at KITTI
    resolution), and scale + invert the calibration. One implementation
    so serving and offline inference can never disagree about
    preprocessing.
    """
    from .kitti import read_calibration, read_image_bgr

    raw = read_image_bgr(image_path)
    scale = resize_scale(raw.shape[:2], min_side, max_side)
    # uint8 end-to-end: bit-identical to the old float path (see
    # _resize_image_uint8) with none of its full-frame casts
    resized = _resize_image_uint8(raw, scale)
    ph = int(np.ceil(resized.shape[0] / pad_multiple)) * pad_multiple
    pw = int(np.ceil(resized.shape[1] / pad_multiple)) * pad_multiple
    image = uint8_canvas(resized, ph, pw)
    P = read_calibration(calib_path)
    P_inv = np.linalg.pinv(np.diag([scale, scale, 1.0]) @ P)
    return {"raw": raw, "scale": scale, "image": image,
            "shape": (ph, pw), "P": P,
            "P_inv": P_inv.astype(np.float32)}


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "do_augment", "config", "image_shape"))
def _device_prepare(key, images, anns, ann_mask, ignores, ig_mask, valid,
                    sizes, num_classes: int, do_augment: bool,
                    config: AugmentConfig, image_shape):
    """Augment + normalize + assign targets for a whole batch on device.

    `valid` (B,) flags filler rows padding a short final batch: their anchor
    states are forced to -1 (ignore) so they contribute nothing to any loss
    term — the static batch shape is preserved (no retrace) while the
    gradient matches the reference's smaller final group
    (generator.py:245-270 yields short groups; Keras just runs them).

    `images` may arrive uint8: the host resize already quantizes to uint8
    values (PIL bilinear on uint8 input), so shipping uint8 over the
    host->device link is lossless and cuts the per-step transfer 4x —
    on a relay-attached chip the image upload is a real cost. The cast
    to f32 happens here, before augmentation/mean subtraction.
    """
    images = images.astype(jnp.float32)
    if do_augment:
        # `sizes` (B, 2) = each example's true resized (h, w) on its padded
        # canvas: augmentation must see the real image frame (transform
        # origin, contrast mean, warp border) and keep the padding zero —
        # the reference augments BEFORE padding (generator.py:178,245-270)
        keys = jax.random.split(key, images.shape[0])
        images, anns, ignores = jax.vmap(
            lambda k, i, a, g, s: augment_example(k, i, a, g,
                                                  config=config, image_hw=s)
        )(keys, images, anns, ignores, sizes)

    net_images = images - jnp.asarray(BGR_MEAN)

    anchors = jnp.asarray(anchor_ops.anchors_for_shape(image_shape))
    targets = jax.vmap(
        lambda a, am, g, gm: anchor_targets(
            anchors, a, am, g, gm, num_classes=num_classes)
    )(anns, ann_mask, ignores, ig_mask)

    labels = jnp.where(valid[:, None, None], targets["labels"], -1.0)
    regression = targets["regression"].at[..., 12].set(
        jnp.where(valid[:, None], targets["regression"][..., 12], -1.0))
    regression_dim = targets["regression_dim"].at[..., 3].set(
        jnp.where(valid[:, None], targets["regression_dim"][..., 3], -1.0))
    return {
        "image": net_images,
        "labels": labels,
        "regression": regression,
        "regression_dim": regression_dim,
    }


class KittiLoader:
    """Batched loader over a KittiDataset.

    Train mode yields target batches; eval mode yields
    (images, P_inv, planes, scales, indices) inference inputs.
    """

    def __init__(self, dataset: KittiDataset, batch_size: int = 1,
                 image_min_side: int = 800, image_max_side: int = 1333,
                 pad_multiple: int = 32, max_annotations: int = 32,
                 max_ignore: int = 8, augment: bool = False,
                 augment_config: AugmentConfig = AugmentConfig(),
                 seed: int = 0, shuffle: bool = True,
                 use_native_loader: bool = True,
                 raw_batches: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.min_side = image_min_side
        self.max_side = image_max_side
        self.max_annotations = max_annotations
        self.max_ignore = max_ignore
        self.augment = augment
        self.augment_config = augment_config
        self.shuffle = shuffle
        self.raw_batches = raw_batches
        self._rng = np.random.RandomState(seed)
        self._key = jax.random.PRNGKey(seed)

        # native C++ decode/resize/pad (off-GIL thread pool); PIL fallback
        self._native = None
        if use_native_loader:
            from . import native_loader

            if native_loader.available():
                self._native = native_loader.NativeImageLoader()

        # resolution bucketing: one static padded shape per distinct
        # (post-resize, pad-rounded) image shape; KITTI collapses to a
        # single bucket, mixed-resolution datasets get one XLA trace per
        # bucket (subsumes the reference's aspect-ratio grouping,
        # generator.py:245-256, which only bounded pad waste)
        self._bucket_shape = {}
        self._hw_cache = {}
        buckets = {}
        for i in range(len(dataset)):
            hw = self._image_hw(i)
            self._hw_cache[i] = hw
            scale = resize_scale(hw, image_min_side, image_max_side)
            sh = int(np.ceil(hw[0] * scale / pad_multiple)) * pad_multiple
            sw = int(np.ceil(hw[1] * scale / pad_multiple)) * pad_multiple
            self._bucket_shape[i] = (sh, sw)
            buckets.setdefault((sh, sw), []).append(i)

        # dominant bucket shape, kept as the loader's nominal image_shape
        self.image_shape = max(buckets, key=lambda k: len(buckets[k]))

        # groups are (indices, n_valid): a short final group is padded by
        # repeating its last index, and the filler rows are loss-masked in
        # _device_prepare (the reference yields a smaller final group;
        # padding + masking keeps our batch shape static for XLA)
        self._groups = []
        for shape, idxs in sorted(buckets.items()):
            # sizes were just probed for bucketing — reuse them instead of
            # re-opening every file (dataset.aspect_ratio does a PIL open)
            idxs = sorted(
                idxs, key=lambda j: (self._hw_cache[j][1]
                                     / self._hw_cache[j][0]))
            for st in range(0, len(idxs), batch_size):
                chunk = idxs[st:st + batch_size]
                n_valid = len(chunk)
                chunk = chunk + [chunk[-1]] * (batch_size - n_valid)
                self._groups.append((chunk, n_valid))

    def _image_hw(self, i):
        cached = self._hw_cache.get(i)
        if cached is not None:
            return cached
        if self._native is not None:
            return self._native.image_size(self.ds.image_paths[i])
        from PIL import Image

        with Image.open(self.ds.image_paths[i]) as im:
            return (im.height, im.width)

    def __len__(self):
        return len(self._groups)

    def _load_padded(self, idx: int):
        anns, ignores = self.ds.load_annotations(idx)
        shape = self._bucket_shape[idx]
        if self._native is not None:
            src_hw = self._image_hw(idx)   # cached at __init__ bucketing
            scale = resize_scale(src_hw, self.min_side, self.max_side)
            padded = self._native.load_image(
                self.ds.image_paths[idx], shape, scale)
            # int(x + 0.5), NOT round(): must match the native
            # resize_into's dst size math (banker's rounding differs on
            # exact halves, which would mask one real row/column)
            true_hw = (min(int(src_hw[0] * scale + 0.5), shape[0]),
                       min(int(src_hw[1] * scale + 0.5), shape[1]))
        else:
            image = self.ds.load_image(idx).astype(np.float32)
            scale = resize_scale(image.shape[:2], self.min_side,
                                 self.max_side)
            image = _resize_image(image, scale)
            h, w = shape
            padded = np.zeros((h, w, 3), np.float32)
            padded[: image.shape[0], : image.shape[1]] = image[:h, :w]
            true_hw = (min(image.shape[0], h), min(image.shape[1], w))

        ga = np.zeros((self.max_annotations, 17), np.float32)
        gm = np.zeros(self.max_annotations, bool)
        n = min(len(anns), self.max_annotations)
        if n:
            scaled = anns[:n].copy()
            scaled[:, :12] *= scale
            ga[:n] = scaled
            gm[:n] = True

        ia = np.zeros((self.max_ignore, 4), np.float32)
        im_ = np.zeros(self.max_ignore, bool)
        m = min(len(ignores), self.max_ignore)
        if m:
            ia[:m] = ignores[:m] * scale
            im_[:m] = True
        # uint8 image payload: the PIL resize path is already uint8-valued
        # (lossless); the native loader's float bilinear rounds to the
        # nearest count (<=0.5/255 deviation, within its PIL-parity
        # tolerance). Cuts the host->device upload 4x per batch. Clip
        # first: uint8 wraps on out-of-range values, and bilinear output
        # can only leave [0, 255] through upstream bugs — wrap would turn
        # such a bug into silent 255-off pixels.
        np.clip(padded, 0.0, 255.0, out=padded)
        padded = np.rint(padded, out=padded).astype(np.uint8)
        return padded, ga, gm, ia, im_, scale, np.asarray(true_hw,
                                                          np.float32)

    def _make_batch(self, group, sub):
        indices, n_valid = group
        items = [self._load_padded(i) for i in indices]
        images, ga, gm, ia, im_, _, sizes = map(np.stack, zip(*items))
        valid = np.arange(len(indices)) < n_valid
        if self.raw_batches:
            # fused-prepare mode: ship the raw host arrays; the consumer's
            # train step (training.train.make_fused_train_step) runs
            # _device_prepare inside its own jitted program, so the whole
            # step is ONE device dispatch instead of two
            return {"key": sub, "images": images, "annotations": ga,
                    "ann_mask": gm, "ignores": ia, "ignore_mask": im_,
                    "valid": valid, "sizes": sizes}
        return _device_prepare(
            sub, images, ga, gm, ia, im_, valid, sizes,
            num_classes=self.ds.num_classes,
            do_augment=self.augment,
            config=self.augment_config,
            image_shape=tuple(images.shape[1:3]),
        )

    def epoch(self, prefetch: int = 2) -> Iterator[dict]:
        """Yield training batches for one epoch.

        Host IO (decode/resize in the native loader) for the next `prefetch`
        batches overlaps the device step on a background thread — the TPU
        never waits on disk (the reference used Keras' multi-worker
        fit_generator threading for the same purpose).
        """
        groups = list(self._groups)
        if self.shuffle:
            self._rng.shuffle(groups)
        if not groups:
            return

        # ONE key derivation per epoch, pulled to host: a per-batch
        # jax.random.split in the producer is an eager op on the default
        # device — on a relay-attached chip that is an extra RPC racing
        # the train step every batch (it defeated fused-prepare's
        # one-dispatch-per-step goal)
        self._key, epoch_key = jax.random.split(self._key)
        subs = np.asarray(jax.device_get(
            jax.random.split(epoch_key, len(groups))))

        if prefetch <= 0:
            for group, sub in zip(groups, subs):
                yield self._make_batch(group, sub)
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()
        cancelled = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer abandoned us
            while not cancelled.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        error: list = []

        def producer():
            try:
                for group, sub in zip(groups, subs):
                    if cancelled.is_set():
                        return
                    if not _put(self._make_batch(group, sub)):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # a swallowed producer error would silently truncate the
                # epoch (the consumer just sees `stop`); carry it across
                # the thread boundary and re-raise in the training loop
                error.append(e)
            finally:
                _put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            # consumer done or abandoned mid-epoch (e.g. steps_per_epoch <
            # batches): release the producer instead of leaking it blocked
            # on a full queue
            cancelled.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30)

    def eval_inputs(self) -> Iterator[dict]:
        """Yield per-image inference inputs (batch 1, like the reference's
        evaluation sweep, utils/eval.py:82-91).

        `image` is raw uint8 BGR — consumers run the detect function with
        device_preprocess=True (uint8 upload is 4x smaller and the
        on-device cast + mean subtraction is bit-identical, since the
        host resize output is uint8-valued)."""
        planes = self.ds.planes
        for i in range(len(self.ds)):
            padded, ga, gm, _, _, scale, _ = self._load_padded(i)
            P = self.ds.load_calibration(i)
            P_scaled = np.diag([scale, scale, 1.0]) @ P
            yield {
                "index": i,
                "scale": scale,
                "image": padded[None],
                "P_inv": np.linalg.pinv(P_scaled)[None].astype(np.float32),
                "planes": planes[None].astype(np.float32),
                "annotations": ga[gm],
            }
