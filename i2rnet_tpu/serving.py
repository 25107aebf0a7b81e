"""Production serving: AOT-exported StableHLO inference artifacts.

The TPU-native deployment path. ONE exported program runs, on device:
affine crop-warp + position-mask render (``ops/preprocess.py``) -> model
forward (+ flip-test averaging) -> DARK decode + inverse-affine back to
source-image coordinates (``ops/decode.py``). Model weights are baked into
the artifact as StableHLO constants, so a serving process needs no
checkpoint, no model code and no config — just this module's
:func:`load_predictor` and a jax installed for the target platform.

The host side of a request is tiny: pad uint8 images into the static
``[B, rawH, rawW, 3]`` canvas and turn each person box into the
center/scale/affine triple (the same math as ``tools/demo.py`` — factored
here as :func:`boxes_to_person_meta` so both stay in sync).

The reference has no serving story (deployment would mean torchscript or
ONNX on top of ``tools/test.py``); this subsystem exists because the
framework targets production inference. Reference-parity evaluation
surfaces remain ``tools/test.py`` / ``tools/demo.py``.

Artifact format (``.i2rx``): ``I2RX`` magic + uint32 header length + JSON
header + the ``jax.export`` payload bytes. The header pins geometry
(batch/person buckets, raw canvas, image/heatmap sizes), joint count,
platforms, and the producing jax version.
"""

from __future__ import annotations

import json
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"I2RX"
_FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# host-side request math (shared with tools/demo.py)

def boxes_to_person_meta(boxes: Sequence[Sequence[float]],
                         image_size: Tuple[int, int],
                         scale_factor: float = 1.25):
    """Person boxes (x, y, w, h) -> (centers [n,2], scales [n,2],
    crop_affines [n,2,3], rects [n,4] x1y1x2y2).

    Mirrors the reference's box->center/scale convention
    (``lib/dataset/coco.py:175-196``: aspect-ratio clamp to the model input,
    pixel_std 200, 1.25 test-time enlargement) and the crop affine used by
    the on-device warp.
    """
    from i2rnet_tpu.ops.transforms import np_get_affine_transform

    iw, ih = int(image_size[0]), int(image_size[1])
    aspect = iw / ih
    centers, scales, affines, rects = [], [], [], []
    for x, y, w, h in boxes:
        c = np.array([x + (w - 1) / 2, y + (h - 1) / 2], np.float32)
        # ramp bounds of the ORIGINAL box for the soft-edge position mask
        # (same convention as data/dataset.py; border saturation is applied
        # by the caller, which knows the source image dims)
        x1i, y1i = np.trunc(x), np.trunc(y)
        x2i, y2i = np.trunc(x + w), np.trunc(y + h)
        rects.append([x1i - 1, y1i - 1, x2i + 1, y2i + 1])
        if w > aspect * h:
            h = w / aspect
        else:
            w = h * aspect
        s = np.array([w / 200.0, h / 200.0], np.float32) * scale_factor
        centers.append(c)
        scales.append(s)
        affines.append(np_get_affine_transform(c, s, 0.0, (iw, ih)))
    return (np.asarray(centers, np.float32), np.asarray(scales, np.float32),
            np.asarray(affines, np.float32), np.asarray(rects, np.float32))


# ---------------------------------------------------------------------------
# the device program

def make_serve_fn(cfg, model, flip_pairs):
    """Returns ``serve(variables, images_u8, crop_affines, boxes,
    mask_affines, person_valid, centers, scales) -> (coords [B*N,K,2],
    maxvals [B*N,K,1])`` — the full on-device inference program.

    Composition of ``ops.preprocess.preprocess_inputs`` (warp + mask) with
    the eval-protocol forward + decode of ``core.train.make_eval_step``
    (flip-test averaging per reference ``lib/core/function.py:142-162``,
    DARK decode per ``lib/core/inference.py``).

    Invalid person slots must carry NON-SINGULAR (e.g. identity) affines —
    a zero matrix inverts to nan and the nan crop contaminates the whole
    image through attention. ``Predictor`` and the data pipeline both
    guarantee this; direct ``call_raw`` users must too.
    """
    import jax.numpy as jnp

    from i2rnet_tpu.ops.decode import get_final_preds
    from i2rnet_tpu.ops.flip import flip_back
    from i2rnet_tpu.ops.preprocess import preprocess_inputs

    image_size = (int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1]))
    heatmap_size = (int(cfg.MODEL.HEATMAP_SIZE[0]),
                    int(cfg.MODEL.HEATMAP_SIZE[1]))
    flip_test = bool(cfg.TEST.FLIP_TEST)
    # the reference's validate() never applies the HRNet SHIFT_HEATMAP 1px
    # shift (lib/core/function.py:142-162), so serving matches validate()
    shift_heatmap = False
    blur_kernel = int(cfg.TEST.BLUR_KERNEL)
    post_process = bool(cfg.TEST.POST_PROCESS)

    def serve(variables, images_u8, crop_affines, boxes, mask_affines,
              person_valid, centers, scales):
        # serving never rotates (inference affines come from boxes), so the
        # separable axis-aligned MXU warp applies — see ops/preprocess
        crops, pos_masks = preprocess_inputs(images_u8, crop_affines, boxes,
                                             mask_affines, image_size,
                                             axis_aligned=True)
        heat = model.apply(variables, crops, pos_masks, person_valid,
                           train=False)["multi"]
        if flip_test:
            heat_f = model.apply(variables, crops[..., ::-1, :],
                                 pos_masks[..., ::-1, :], person_valid,
                                 train=False)["multi"]
            heat_f = flip_back(heat_f, flip_pairs or [])
            if shift_heatmap:
                heat_f = heat_f.at[..., :, 1:].set(heat_f[..., :, :-1])
            heat = (heat + heat_f) * 0.5
        b, n, k = heat.shape[0], heat.shape[1], heat.shape[2]
        flat = heat.reshape(b * n, k, heat.shape[3], heat.shape[4])
        coords, maxvals = get_final_preds(
            flat, centers, scales, blur_kernel=blur_kernel,
            heatmap_size=heatmap_size, post_process=post_process)
        # zero out padded persons so downstream consumers can't mistake
        # garbage decodes for detections
        vmask = person_valid.reshape(b * n).astype(jnp.float32)
        return coords * vmask[:, None, None], maxvals * vmask[:, None, None]

    return serve


def export_predictor(cfg, variables, batch_images: int, n_bucket,
                     raw_hw: Tuple[int, int],
                     platforms: Sequence[str] = ("tpu",),
                     use_pallas: Optional[bool] = None) -> Tuple[bytes, dict]:
    """Trace + lower the serving program(s) and serialize them.

    Returns ``(payload_bytes, header_dict)``. ``variables`` are closed over
    and become artifact constants. ``raw_hw = (rawH, rawW)`` is the static
    uint8 input canvas (requests are zero-padded into it, like the dataset
    batcher's ``TPU.MAX_IMAGE_HW``).

    ``n_bucket`` may be one person bucket or a sequence (e.g. ``(2, 4, 7)``,
    mirroring the data pipeline's ``PERSON_BUCKETS``): one program per
    bucket goes into the artifact, and ``Predictor.predict`` routes each
    request row to the smallest bucket that fits — the standard mitigation
    for static-shape padding waste under variable crowd sizes.

    Pallas (Mosaic) kernels serialize as ``tpu_custom_call``s, which
    ``jax.export`` only admits with an explicit stability waiver — applied
    automatically when the model uses them. Exports that must be portable
    across libtpu generations can pass ``use_pallas=False`` to get a pure
    XLA program.
    """
    import jax
    from jax import export as jax_export

    from i2rnet_tpu.registry import get_dataset_class, get_model_builder

    if use_pallas is None:
        # The Pallas kernels trace differently per *current* backend
        # (interpret-mode emulation on CPU, ops/attention.py:93) and their
        # Mosaic lowerings are TPU-only. Default them off unless this host's
        # backend matches a single-platform TPU export — otherwise the
        # artifact would bake in emulated kernels (CPU host) or fail to
        # lower (multi-platform). Pass use_pallas=True to override.
        import jax as _jax
        single_tpu = list(platforms) == ["tpu"]
        if not (single_tpu and _jax.default_backend() == "tpu"):
            use_pallas = False

    k = int(cfg.MODEL.NUM_JOINTS)
    try:
        ds_cls = get_dataset_class(cfg.DATASET.DATASET)
        flip_pairs = [p for p in ds_cls.flip_pairs if p[0] < k and p[1] < k]
    except KeyError:
        if cfg.TEST.FLIP_TEST:
            raise  # flip-test averaging needs the dataset's joint pairing
        flip_pairs = []

    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=use_pallas)
    serve = make_serve_fn(cfg, model, flip_pairs)

    b = int(batch_images)
    ns = sorted({int(x) for x in (n_bucket if hasattr(n_bucket, "__iter__")
                                  else [n_bucket])})
    rh, rw = int(raw_hw[0]), int(raw_hw[1])
    fn = jax.jit(lambda *args: serve(variables, *args))
    disabled = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                jax_export.DisabledSafetyCheck.custom_call("Sharding")]

    payloads, buckets = [], []
    offset = 0
    for n in ns:
        specs = (
            jax.ShapeDtypeStruct((b, rh, rw, 3), np.uint8),   # images
            jax.ShapeDtypeStruct((b, n, 2, 3), np.float32),   # crop_affines
            jax.ShapeDtypeStruct((b, n, 4), np.float32),      # boxes
            jax.ShapeDtypeStruct((b, n, 2, 3), np.float32),   # mask_affines
            jax.ShapeDtypeStruct((b, n), np.bool_),           # person_valid
            jax.ShapeDtypeStruct((b * n, 2), np.float32),     # centers
            jax.ShapeDtypeStruct((b * n, 2), np.float32),     # scales
        )
        exported = jax_export.export(fn, platforms=list(platforms),
                                     disabled_checks=disabled)(*specs)
        p = exported.serialize()
        payloads.append(p)
        buckets.append({"n_bucket": n, "offset": offset, "length": len(p)})
        offset += len(p)

    header = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "model_name": cfg.MODEL.NAME,
        "dataset": cfg.DATASET.DATASET,
        "num_joints": k,
        "batch_images": b,
        "n_bucket": ns[-1],     # the largest bucket (call_raw's shapes)
        "buckets": buckets,
        "raw_hw": [rh, rw],
        "image_size": [int(cfg.MODEL.IMAGE_SIZE[0]),
                       int(cfg.MODEL.IMAGE_SIZE[1])],
        "heatmap_size": [int(cfg.MODEL.HEATMAP_SIZE[0]),
                         int(cfg.MODEL.HEATMAP_SIZE[1])],
        "flip_test": bool(cfg.TEST.FLIP_TEST),
        "platforms": list(platforms),
    }
    return b"".join(payloads), header


def save_artifact(path: str, payload: bytes, header: dict) -> None:
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(payload)


def _read_artifact(path: str) -> Tuple[dict, bytes]:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an i2rx artifact (magic {magic!r})")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode("utf-8"))
        payload = f.read()
    if header.get("format_version") != _FORMAT_VERSION:
        raise ValueError(f"{path}: unsupported artifact format "
                         f"{header.get('format_version')!r} "
                         f"(this build reads {_FORMAT_VERSION})")
    return header, payload


class Predictor:
    """A loaded serving artifact.

    ``predict(images, boxes_per_image)`` takes raw uint8 RGB images of any
    size up to the artifact's canvas plus per-image person-box lists, and
    returns one ``[n_i, K, 3]`` keypoint array (x, y, confidence in source
    pixels) per image. Requests larger than the largest compiled ``(B, N)``
    bucket are chunked; smaller ones go to the smallest person bucket that
    fits, padded with invalid rows — static shapes end to end, so every
    call hits a compiled program.
    """

    def __init__(self, header: dict, exported):
        """``exported`` is one deserialized program (single-bucket) or a
        list ordered as ``header['buckets']`` (ascending n_bucket)."""
        self.header = header
        progs = exported if isinstance(exported, (list, tuple)) else [exported]
        ns = [bk["n_bucket"] for bk in header.get(
            "buckets", [{"n_bucket": header["n_bucket"]}])]
        self._progs = sorted(zip(ns, progs),
                             key=lambda t: t[0])  # ascending person bucket
        self._b = int(header["batch_images"])
        self._n = int(self._progs[-1][0])     # largest bucket

    # -- low level -----------------------------------------------------
    def call_raw(self, images_u8, crop_affines, boxes, mask_affines,
                 person_valid, centers, scales):
        """Direct call at the LARGEST bucket's static shapes."""
        return self._progs[-1][1].call(images_u8, crop_affines, boxes,
                                       mask_affines, person_valid, centers,
                                       scales)

    def call_sharded(self, mesh, *args, axis: str = "data"):
        """Data-parallel serving: run the artifact with every array's batch
        dimension sharded over ``mesh``'s ``axis``. The deserialized
        StableHLO has no sharding annotations, so GSPMD propagates the
        input shardings straight through — each chip serves its rows, no
        collectives. ``batch_images`` must divide by the axis size.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._b % int(mesh.shape[axis]) != 0:
            raise ValueError(
                f"batch_images={self._b} not divisible by mesh axis "
                f"{axis!r} of size {mesh.shape[axis]}")
        shard = NamedSharding(mesh, P(axis))
        key = (mesh, axis)  # Mesh is hashable; id() could be recycled
        if getattr(self, "_sharded_key", None) != key:
            self._sharded_key = key
            self._sharded_call = jax.jit(
                self._progs[-1][1].call,
                in_shardings=(shard,) * 7, out_shardings=(shard, shard))
        return self._sharded_call(*args)

    def warmup(self) -> None:
        """Compile every bucket's program now (one dummy call each) so the
        first real request doesn't pay XLA compile latency."""
        rh, rw = self.header["raw_hw"]
        b = self._b
        for n, prog in self._progs:
            affs = np.zeros((b, n, 2, 3), np.float32)
            affs[..., 0, 0] = affs[..., 1, 1] = 1.0
            import jax
            jax.block_until_ready(prog.call(
                np.zeros((b, rh, rw, 3), np.uint8), affs,
                np.zeros((b, n, 4), np.float32), affs,
                np.zeros((b, n), bool), np.zeros((b * n, 2), np.float32),
                np.ones((b * n, 2), np.float32)))

    # -- request API ----------------------------------------------------
    def predict(self, images: Sequence[np.ndarray],
                boxes_per_image: Sequence[Sequence[Sequence[float]]]
                ) -> List[np.ndarray]:
        from i2rnet_tpu.ops.preprocess import np_rotate_bound_resize_affine
        if len(images) != len(boxes_per_image):
            raise ValueError("images and boxes_per_image length mismatch")
        b, n_max = self._b, self._n
        rh, rw = self.header["raw_hw"]
        k = self.header["num_joints"]
        image_size = tuple(self.header["image_size"])

        def fit_bucket(m: int) -> int:
            for n, _ in self._progs:
                if m <= n:
                    return n
            return n_max

        # split each image's boxes into rows of <= n_max persons, routing
        # every row to the smallest person bucket that fits it
        rows_by_n = {n: [] for n, _ in self._progs}
        out_chunks = {}  # (image_index, start) -> [m, K, 3] after the calls
        for i, (img, bxs) in enumerate(zip(images, boxes_per_image)):
            img = np.asarray(img)
            if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
                raise ValueError(f"image {i}: expected uint8 HxWx3, got "
                                 f"{img.dtype} {img.shape}")
            if img.shape[0] > rh or img.shape[1] > rw:
                raise ValueError(f"image {i}: {img.shape[:2]} exceeds the "
                                 f"artifact canvas {(rh, rw)}")
            bxs = list(bxs) or [[0, 0, img.shape[1], img.shape[0]]]
            for j in range(0, len(bxs), n_max):
                part = bxs[j:j + n_max]
                rows_by_n[fit_bucket(len(part))].append((i, j, img, part))

        for n, prog in self._progs:
            rows = rows_by_n[n]
            for j0 in range(0, len(rows), b):
                chunk = rows[j0:j0 + b]
                imgs = np.zeros((b, rh, rw, 3), np.uint8)
                # padded slots get IDENTITY affines (like the data
                # pipeline, dataset.py:240-242): a zero affine is singular,
                # its inverse is nan, and the nan crop would leak through
                # attention into valid persons of the same image
                affs = np.zeros((b, n, 2, 3), np.float32)
                affs[..., 0, 0] = 1.0
                affs[..., 1, 1] = 1.0
                mask_affs = affs.copy()
                rects = np.zeros((b, n, 4), np.float32)
                valid = np.zeros((b, n), bool)
                cent = np.zeros((b * n, 2), np.float32)
                scal = np.ones((b * n, 2), np.float32)
                for r, (_, _, img, bxs) in enumerate(chunk):
                    imgs[r, :img.shape[0], :img.shape[1]] = img
                    c, s, a, rect = boxes_to_person_meta(bxs, image_size)
                    m = len(bxs)
                    affs[r, :m] = a
                    # position mask = the full image squeezed to the model
                    # input (data-pipeline semantics, JointsDataset.py:
                    # 323-325), with border-saturated ramp bounds
                    ih_img, iw_img = img.shape[:2]
                    mask_affs[r, :] = np_rotate_bound_resize_affine(
                        iw_img, ih_img, 0.0, image_size[0], image_size[1])
                    rect = np.asarray(rect, np.float32)
                    rect[:, 0] = np.where(rect[:, 0] <= -1, -1e9, rect[:, 0])
                    rect[:, 1] = np.where(rect[:, 1] <= -1, -1e9, rect[:, 1])
                    rect[:, 2] = np.where(rect[:, 2] >= iw_img, 1e9, rect[:, 2])
                    rect[:, 3] = np.where(rect[:, 3] >= ih_img, 1e9, rect[:, 3])
                    rects[r, :m] = rect
                    valid[r, :m] = True
                    cent[r * n:r * n + m] = c
                    scal[r * n:r * n + m] = s
                coords, maxvals = prog.call(imgs, affs, rects, mask_affs,
                                            valid, cent, scal)
                coords = np.asarray(coords).reshape(b, n, k, 2)
                maxvals = np.asarray(maxvals).reshape(b, n, k, 1)
                for r, (i, start, _, bxs) in enumerate(chunk):
                    m = len(bxs)
                    out_chunks[(i, start)] = np.concatenate(
                        [coords[r, :m], maxvals[r, :m]], axis=2)

        by_image: dict = {}
        for (i, start), kp in out_chunks.items():
            by_image.setdefault(i, []).append((start, kp))
        results = []
        for i in range(len(boxes_per_image)):
            parts = [kp for _, kp in
                     sorted(by_image.get(i, []), key=lambda t: t[0])]
            results.append(np.concatenate(parts, axis=0) if parts
                           else np.zeros((0, k, 3), np.float32))
        return results


class MicroBatcher:
    """Coalesce concurrent single-image requests into full device batches.

    TPU throughput comes from full static ``(B, N)`` batches, but serving
    traffic arrives one image at a time. ``submit(image, boxes)`` returns a
    ``concurrent.futures.Future``; a background thread drains the queue,
    waiting up to ``max_delay_ms`` after the first pending request to
    gather ``predictor.header['batch_images']`` rows before dispatching one
    ``predict`` call. Latency cost is bounded by the deadline; throughput
    approaches the full-batch rate under load.
    """

    def __init__(self, predictor: Predictor, max_delay_ms: float = 5.0):
        import queue
        import threading

        self._pred = predictor
        self._delay = max_delay_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, boxes: Sequence[Sequence[float]]):
        from concurrent.futures import Future

        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        fut: Future = Future()
        self._q.put((image, boxes, fut))
        return fut

    def close(self) -> None:
        self._closed = True
        self._q.put(None)  # wake the worker
        self._thread.join()

    # -- worker ----------------------------------------------------------
    def _run(self) -> None:
        import queue
        import time as _time

        b = int(self._pred.header["batch_images"])
        while True:
            item = self._q.get()
            if item is None:
                return
            group = [item]
            deadline = _time.monotonic() + self._delay
            while len(group) < b:
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(group)
                    return
                group.append(nxt)
            self._dispatch(group)

    def _dispatch(self, group) -> None:
        images = [g[0] for g in group]
        boxes = [g[1] for g in group]
        try:
            results = self._pred.predict(images, boxes)
        except Exception as e:  # propagate to every waiter
            for _, _, fut in group:
                fut.set_exception(e)
            return
        for (_, _, fut), res in zip(group, results):
            fut.set_result(res)


def load_predictor(path: str) -> Predictor:
    from jax import export as jax_export

    header, payload = _read_artifact(path)
    buckets = header.get("buckets")
    if buckets:
        progs = [jax_export.deserialize(
            payload[bk["offset"]:bk["offset"] + bk["length"]])
            for bk in buckets]
    else:  # single-program artifact (no bucket table)
        progs = [jax_export.deserialize(payload)]
    return Predictor(header, progs)
