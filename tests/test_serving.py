"""Serving/export subsystem: AOT StableHLO artifacts (i2rnet_tpu/serving.py).

The artifact must reproduce the in-process eval program bit-for-bit (same
jitted composition, weights baked in), survive a save -> load roundtrip,
and the Predictor's padding/chunking must be invisible in the results.
"""

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.slow  # two CPU XLA compiles of the full program

from i2rnet_tpu.presets import tiny_test_config
from i2rnet_tpu.serving import (Predictor, boxes_to_person_meta,
                                export_predictor, load_predictor,
                                make_serve_fn, save_artifact)

B, N, RAW_H, RAW_W = 2, 2, 96, 128


@pytest.fixture(scope="module")
def cfg():
    c = tiny_test_config(5).clone()
    c.DATASET.DATASET = "coco"       # real flip pairs (filtered to K=5)
    c.DATASET.MAX_PATCH = N
    c.TEST.FLIP_TEST = True
    c.TEST.BLUR_KERNEL = 5
    c.TPU.MAX_IMAGE_HW = [RAW_H, RAW_W]
    c.freeze()
    return c


@pytest.fixture(scope="module")
def variables(cfg):
    from i2rnet_tpu.registry import get_model_builder
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    iw, ih = cfg.MODEL.IMAGE_SIZE
    return model.init(jax.random.PRNGKey(0),
                      np.zeros((B, N, ih, iw, 3), np.float32),
                      np.zeros((B, N, ih, iw, 1), np.float32),
                      np.ones((B, N), bool), train=False)


@pytest.fixture(scope="module")
def artifact_path(cfg, variables, tmp_path_factory):
    payload, header = export_predictor(cfg, variables, B, N, (RAW_H, RAW_W),
                                       platforms=["cpu"], use_pallas=False)
    path = str(tmp_path_factory.mktemp("serve") / "tiny.i2rx")
    save_artifact(path, payload, header)
    return path


def _request(rng, n_boxes):
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    boxes = [[4.0 + 3 * i, 2.0 + 2 * i, 40.0, 56.0] for i in range(n_boxes)]
    return img, boxes


def test_export_roundtrip_matches_direct(cfg, variables, artifact_path):
    """Deserialized artifact == the in-process serve fn (allclose: baking
    the weights in as StableHLO constants changes XLA's fusion choices by
    ~1e-4 px relative — not bit-exactness)."""
    from i2rnet_tpu.registry import get_model_builder
    rng = np.random.default_rng(0)
    img, boxes = _request(rng, N)

    pred = load_predictor(artifact_path)
    assert pred.header["num_joints"] == 5
    assert pred.header["flip_test"] is True

    imgs = np.zeros((B, RAW_H, RAW_W, 3), np.uint8)
    imgs[0, :64, :96] = img
    centers, scales, affines, rects = boxes_to_person_meta(
        boxes, tuple(cfg.MODEL.IMAGE_SIZE))
    affs = np.zeros((B, N, 2, 3), np.float32)
    affs[..., 0, 0] = affs[..., 1, 1] = 1.0  # identity for padded slots
    rcts = np.zeros((B, N, 4), np.float32)
    affs[0], rcts[0] = affines, rects
    valid = np.zeros((B, N), bool)
    valid[0] = True
    cent = np.zeros((B * N, 2), np.float32)
    scal = np.ones((B * N, 2), np.float32)
    cent[:N], scal[:N] = centers, scales

    got = pred.call_raw(imgs, affs, rcts, affs, valid, cent, scal)

    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)
    flip_pairs = [[1, 2], [3, 4]]
    serve = make_serve_fn(cfg, model, flip_pairs)
    want = jax.jit(serve)(variables, imgs, affs, rcts, affs, valid, cent,
                          scal)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)
    # padded rows are zeroed, real rows are not
    assert np.all(np.asarray(got[0])[N:] == 0)
    assert np.any(np.asarray(got[0])[:N] != 0)


def test_predictor_padding_and_chunking(artifact_path):
    """3 boxes on one image + 1 on another -> N=2 rows split + B=2 chunking;
    per-person results must not depend on which slot a person landed in."""
    rng = np.random.default_rng(1)
    img_a, boxes_a = _request(rng, 3)
    img_b, boxes_b = _request(rng, 1)

    pred = load_predictor(artifact_path)
    out = pred.predict([img_a, img_b], [boxes_a, boxes_b])
    assert out[0].shape == (3, 5, 3)
    assert out[1].shape == (1, 5, 3)

    # the same (image, box) alone must decode identically to its batched slot
    solo = pred.predict([img_a], [boxes_a[2:3]])
    np.testing.assert_allclose(solo[0][0], out[0][2], rtol=1e-5, atol=1e-5)

    # empty box list defaults to the whole-image box
    whole = pred.predict([img_b], [[]])
    assert whole[0].shape == (1, 5, 3)


def test_data_parallel_serving(artifact_path):
    """call_sharded on a 2-device data mesh == single-device call_raw —
    multi-chip serving is just batch sharding over the artifact."""
    import jax
    from jax.sharding import Mesh

    pred = load_predictor(artifact_path)
    rng = np.random.default_rng(3)
    rh, rw = pred.header["raw_hw"]
    imgs = rng.integers(0, 255, (B, rh, rw, 3), dtype=np.uint8)
    affs = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
                   (B, N, 1, 1))
    rects = np.tile(np.array([4, 4, 44, 60], np.float32), (B, N, 1))
    valid = np.ones((B, N), bool)
    cent = np.tile(np.array([24.0, 32.0], np.float32), (B * N, 1))
    scal = np.full((B * N, 2), 0.3, np.float32)
    args = (imgs, affs, rects, affs, valid, cent, scal)

    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))
    got = pred.call_sharded(mesh, *args)
    want = pred.call_raw(*args)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError, match="not divisible"):
        bad = Mesh(np.array(jax.devices("cpu")[:3]), ("data",))
        pred.call_sharded(bad, *args)


def test_multiplatform_export_lowers(cfg, variables):
    """platforms=["tpu","cpu"] from a CPU host must lower (the pallas
    default is forced off for multi-platform / cross-backend exports —
    Mosaic kernels are TPU-only and interpret-mode ones must not be baked
    into a TPU artifact)."""
    payload, header = export_predictor(cfg, variables, 1, N, (RAW_H, RAW_W),
                                       platforms=["tpu", "cpu"])
    assert header["platforms"] == ["tpu", "cpu"]
    assert len(payload) > 1000


def test_multi_bucket_routing(cfg, variables, tmp_path):
    """An artifact with person buckets (1, 2) routes each request row to
    the smallest bucket that fits, and padding invariance makes the
    answers agree with the largest-bucket program."""
    import jax as _jax

    # bias the final layer so heatmaps are positive: the DARK blur renorm
    # (decode.py:75) is singular on all-negative random-weight heatmaps,
    # which would amplify per-program fusion noise into chaos here
    variables = dict(variables)
    params = _jax.tree_util.tree_map(lambda x: x, variables["params"])
    params["final_layer"]["bias"] = params["final_layer"]["bias"] + 2.0
    variables["params"] = params

    payload, header = export_predictor(cfg, variables, B, (1, 2),
                                       (RAW_H, RAW_W), platforms=["cpu"],
                                       use_pallas=False)
    assert [bk["n_bucket"] for bk in header["buckets"]] == [1, 2]
    assert header["n_bucket"] == 2
    path = str(tmp_path / "multi.i2rx")
    save_artifact(path, payload, header)
    pred = load_predictor(path)

    class Spy:
        def __init__(self, prog):
            self.prog, self.calls = prog, 0

        def call(self, *a):
            self.calls += 1
            return self.prog.call(*a)

    spies = [Spy(p) for _, p in pred._progs]
    pred._progs = [(n, s) for (n, _), s in zip(pred._progs, spies)]

    rng = np.random.default_rng(5)
    img_a, boxes_a = _request(rng, 1)   # fits the n=1 bucket
    img_b, boxes_b = _request(rng, 2)   # needs the n=2 bucket
    out = pred.predict([img_a, img_b], [boxes_a, boxes_b])
    assert spies[0].calls == 1 and spies[1].calls == 1
    assert out[0].shape == (1, 5, 3) and out[1].shape == (2, 5, 3)

    # the n=1-bucket answer equals the same request through the n=2 program
    pred2 = load_predictor(path)
    pred2._progs = pred2._progs[-1:]    # force everything to the big bucket
    big = pred2.predict([img_a], [boxes_a])
    np.testing.assert_allclose(out[0], big[0], rtol=1e-3, atol=1e-3)


def test_micro_batcher_coalesces_and_matches(artifact_path):
    """Concurrent submits are coalesced into one predict call (full batch)
    and every future gets the same answer as a sequential predict."""
    from i2rnet_tpu.serving import MicroBatcher

    pred = load_predictor(artifact_path)
    rng = np.random.default_rng(7)
    reqs = [_request(rng, 1) for _ in range(B)]

    calls = []
    real_predict = pred.predict

    def spy_predict(images, boxes):
        calls.append(len(images))
        return real_predict(images, boxes)

    pred.predict = spy_predict
    pred.warmup()

    mb = MicroBatcher(pred, max_delay_ms=200.0)
    try:
        futs = [mb.submit(img, bxs) for img, bxs in reqs]
        got = [f.result(timeout=120) for f in futs]
    finally:
        mb.close()
    # both requests coalesced into ONE full-batch dispatch
    assert calls == [B]

    want = real_predict([r[0] for r in reqs], [r[1] for r in reqs])
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # errors propagate to every waiter; closed batcher rejects submits
    mb2 = MicroBatcher(pred, max_delay_ms=1.0)
    try:
        bad = mb2.submit(np.zeros((4, 4, 3), np.float32), [])  # wrong dtype
        with pytest.raises(ValueError, match="uint8"):
            bad.result(timeout=60)
    finally:
        mb2.close()
    with pytest.raises(RuntimeError, match="closed"):
        mb2.submit(*reqs[0])


def test_artifact_validation(tmp_path, artifact_path):
    bad = tmp_path / "bad.i2rx"
    bad.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not an i2rx artifact"):
        load_predictor(str(bad))

    import json
    import struct
    data = open(artifact_path, "rb").read()
    (hlen,) = struct.unpack("<I", data[4:8])
    header = json.loads(data[8:8 + hlen])
    header["format_version"] = 99
    hdr = json.dumps(header).encode()
    futur = tmp_path / "future.i2rx"
    futur.write_bytes(b"I2RX" + struct.pack("<I", len(hdr)) + hdr +
                      data[8 + hlen:])
    with pytest.raises(ValueError, match="unsupported artifact format"):
        load_predictor(str(futur))


def test_artifact_matches_validate_pipeline(cfg, variables, tmp_path):
    """The exported artifact reproduces the in-repo eval pipeline: the
    SAME raw batch the dataset feeds validate() gives the SAME keypoints
    through the artifact (serve = preprocess_inputs + make_eval_step)."""
    from jax import export as jax_export

    from i2rnet_tpu.core.train import make_eval_step
    from i2rnet_tpu.data.synthetic import make_synthetic_coco
    from i2rnet_tpu.registry import get_dataset_class, get_model_builder

    root = make_synthetic_coco(str(tmp_path / "data"), num_images=2,
                               image_hw=(RAW_H, RAW_W), num_joints=5,
                               max_persons=N, image_set="val2017")
    c = cfg.clone()
    c.defrost()
    c.DATASET.ROOT = root
    c.DATASET.TEST_SET = "val2017"
    c.freeze()
    dataset = get_dataset_class("coco")(c, root, "val2017", False)
    items, n_bucket = next(iter(dataset.eval_batches(B)))
    assert len(items) == B
    raw, meta = dataset.make_raw_batch(items, n_bucket)
    assert n_bucket <= N

    b, n = raw["person_valid"].shape
    centers = meta["center"].reshape(b * n, 2)
    scales = meta["scale"].reshape(b * n, 2)

    model = get_model_builder(c.MODEL.NAME)(c, use_pallas=False)
    eval_step = make_eval_step(
        model, flip_pairs=dataset.flip_pairs, flip_test=c.TEST.FLIP_TEST,
        shift_heatmap=False, decode=True,
        blur_kernel=c.TEST.BLUR_KERNEL,
        heatmap_size=(dataset.heatmap_width, dataset.heatmap_height),
        post_process=c.TEST.POST_PROCESS)
    want = eval_step(variables, dataset.device_batch(raw), centers, scales)

    payload, header = export_predictor(c, variables, b, n, (RAW_H, RAW_W),
                                       platforms=["cpu"], use_pallas=False)
    pred = Predictor(header, jax_export.deserialize(payload))
    got = pred.call_raw(raw["images"], raw["crop_affines"], raw["boxes"],
                        raw["mask_affines"], raw["person_valid"],
                        centers, scales)

    valid = raw["person_valid"].reshape(b * n)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g)[valid], np.asarray(w)[valid],
                                   rtol=1e-3, atol=1e-3)


def test_serve_fn_flagship_geometry_shapes():
    """Shape-flow of the serving program at the released HRFormer-B
    interformer geometry (192x256, N=4, 17 joints) via eval_shape — no
    compile, catches full-size wiring bugs the tiny tests hide."""
    from i2rnet_tpu.presets import hrt_interformer
    from i2rnet_tpu.registry import get_model_builder

    c = hrt_interformer("coco", max_patch=4)
    c.freeze()
    model = get_model_builder(c.MODEL.NAME)(c, use_pallas=False)
    serve = make_serve_fn(c, model, [[1, 2], [3, 4]])

    b, n, rh, rw = 2, 4, 320, 256
    iw, ih = c.MODEL.IMAGE_SIZE
    variables = jax.eval_shape(
        lambda r, x, p, v: model.init(r, x, p, v, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((b, n, ih, iw, 3), np.float32),
        jax.ShapeDtypeStruct((b, n, ih, iw, 1), np.float32),
        jax.ShapeDtypeStruct((b, n), np.bool_))
    coords, maxvals = jax.eval_shape(
        serve, variables,
        jax.ShapeDtypeStruct((b, rh, rw, 3), np.uint8),
        jax.ShapeDtypeStruct((b, n, 2, 3), np.float32),
        jax.ShapeDtypeStruct((b, n, 4), np.float32),
        jax.ShapeDtypeStruct((b, n, 2, 3), np.float32),
        jax.ShapeDtypeStruct((b, n), np.bool_),
        jax.ShapeDtypeStruct((b * n, 2), np.float32),
        jax.ShapeDtypeStruct((b * n, 2), np.float32))
    assert coords.shape == (b * n, 17, 2)
    assert maxvals.shape == (b * n, 17, 1)


def test_boxes_to_person_meta_convention():
    """Box -> center/scale matches the reference convention
    (lib/dataset/coco.py:175-196): half-pixel center, aspect clamp to the
    model input ratio, pixel_std 200, 1.25 enlargement."""
    centers, scales, affines, rects = boxes_to_person_meta(
        [[10, 20, 40, 80], [10, 20, 90, 30]], (48, 64))  # aspect 0.75
    np.testing.assert_allclose(centers[0], [10 + 39 / 2, 20 + 79 / 2])
    # tall box: width grows to h * aspect = 60
    np.testing.assert_allclose(scales[0], [60 / 200 * 1.25, 80 / 200 * 1.25])
    # wide box: height grows to w / aspect = 120
    np.testing.assert_allclose(scales[1], [90 / 200 * 1.25, 120 / 200 * 1.25])
    assert affines.shape == (2, 2, 3) and rects.shape == (2, 4)
    # the pos-mask rect carries bilinear ramp bounds of the ORIGINAL
    # rasterized box: [trunc(x)-1, trunc(y)-1, trunc(x+w)+1, trunc(y+h)+1]
    np.testing.assert_allclose(rects[0], [9, 19, 51, 101])


def test_latency_bench_machinery(artifact_path):
    """tools/bench_serving.py --latency: the Poisson-mix MicroBatcher loop
    yields sane percentiles and sustains the offered load on the tiny CPU
    artifact (logic gate; the TPU numbers live in docs/SERVING.md)."""
    import sys as _sys
    from pathlib import Path as _Path
    _sys.path.insert(0, str(_Path(__file__).resolve().parents[1] / "tools"))
    from bench_serving import _latency_bench

    pred = load_predictor(artifact_path)
    pred.warmup()
    res = _latency_bench(pred, rates=[50.0], duration_s=0.5,
                         max_delay_ms=2.0)
    row = res["rate_50.0"]
    assert row["requests"] >= 8
    assert row["p99_ms"] >= row["p50_ms"] > 0.0
    assert row["achieved_req_per_s"] > 0.0
    assert row["achieved_persons_per_s"] >= row["achieved_req_per_s"]
