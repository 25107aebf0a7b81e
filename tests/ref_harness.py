"""Harness for driving the ACTUAL reference implementation end to end on CPU.

Extends the module-level stubs of ``tests/test_torch_parity.py`` (timm /
torchvision.models / mmcv) with everything the reference *pipeline* needs
beyond bare model forwards:

- ``torchvision.transforms`` (Compose/ToTensor/Normalize — the val transform
  built in reference ``tools/test.py:126-135``),
- ``json_tricks`` -> stdlib json,
- ``pycocotools`` / ``crowdposetools`` with a minimal pure-python ``COCO``
  and a ``COCOeval`` backed by our from-scratch ``ops/cocoeval.KeypointEval``
  (the same evaluator both sides use, so AP comparisons are apples to
  apples),
- ``nms.cpu_nms`` / ``nms.gpu_nms`` module stubs so ``lib/nms/nms.py``
  imports (its ``oks_nms`` / ``soft_oks_nms`` are pure python and run real),
- ``pylsy.pylsytable`` (result-table printer in ``lib/core/function.py:474``),
- a ``.cuda()`` no-op patch (device placement only; the reference eval loop
  calls ``.cuda()`` unconditionally, ``lib/core/function.py:147-166``).

With these installed, ``reference_validate`` runs the reference's own
``core.function.validate`` -> ``dataset.coco.COCODataset.evaluate`` chain —
the real patch grouping, host warps, flip test, DARK decode, rescoring,
OKS-NMS and result-JSON writing — against a directory of images, exactly as
``tools/test.py`` would.
"""

from __future__ import annotations

import json as _stdjson
import sys
import types

import numpy as np

REF_LIB = "/root/reference/lib"


# --------------------------------------------------------------- COCO stub
class _MiniCOCO:
    """The slice of the pycocotools COCO API that reference
    ``lib/dataset/coco.py`` touches (lines 77-180, 496)."""

    def __init__(self, ann_file_or_dataset):
        if isinstance(ann_file_or_dataset, str):
            with open(ann_file_or_dataset) as f:
                self.dataset = _stdjson.load(f)
        else:
            self.dataset = ann_file_or_dataset
        self.anns = {a["id"]: a for a in self.dataset.get("annotations", [])}
        self.imgs = {i["id"]: i for i in self.dataset.get("images", [])}
        self.cats = {c["id"]: c for c in self.dataset.get("categories", [])}
        self._img_anns = {}
        for a in self.dataset.get("annotations", []):
            self._img_anns.setdefault(a["image_id"], []).append(a)

    def getCatIds(self, **kw):
        return sorted(self.cats.keys())

    def loadCats(self, ids):
        return [self.cats[i] for i in np.atleast_1d(ids)]

    def getImgIds(self, **kw):
        return sorted(self.imgs.keys())

    def loadImgs(self, ids):
        return [self.imgs[i] for i in np.atleast_1d(ids)]

    def getAnnIds(self, imgIds=None, iscrowd=None, **kw):
        ids = []
        for i in np.atleast_1d(imgIds):
            for a in self._img_anns.get(int(i), []):
                if iscrowd is not None and bool(a.get("iscrowd", 0)) != bool(iscrowd):
                    continue
                ids.append(a["id"])
        return ids

    def loadAnns(self, ids):
        return [self.anns[i] for i in np.atleast_1d(ids)]

    def loadRes(self, res_file):
        with open(res_file) as f:
            anns = _stdjson.load(f)
        res = _MiniCOCO({"images": list(self.imgs.values()),
                         "categories": list(self.cats.values()),
                         "annotations": []})
        for k, a in enumerate(anns):
            a = dict(a)
            a.setdefault("id", k + 1)
            res.anns[a["id"]] = a
            res._img_anns.setdefault(a["image_id"], []).append(a)
        res.dataset["annotations"] = list(res.anns.values())
        return res


class _MiniCOCOeval:
    """pycocotools.COCOeval facade over our ``ops/cocoeval.KeypointEval`` —
    produces the 10-entry ``.stats`` in the order the reference unpacks at
    ``lib/dataset/coco.py:499-505``."""

    def __init__(self, cocoGt, cocoDt, iouType="keypoints"):
        assert iouType == "keypoints"
        self.cocoGt, self.cocoDt = cocoGt, cocoDt
        self.params = types.SimpleNamespace(useSegm=None)
        self.stats = None

    def evaluate(self):
        pass

    def accumulate(self):
        pass

    def _gt_dt(self, num_joints):
        gt, dt = {}, {}
        for i in self.cocoGt.getImgIds():
            gl = []
            for a in self.cocoGt._img_anns.get(i, []):
                kp = a.get("keypoints", [0] * (num_joints * 3))
                gl.append({
                    "id": a["id"], "keypoints": kp,
                    "area": a.get("area", 0), "bbox": a.get("bbox", [0, 0, 0, 0]),
                    "iscrowd": a.get("iscrowd", 0),
                    "num_keypoints": a.get(
                        "num_keypoints",
                        int(np.count_nonzero(np.asarray(kp)[2::3]))),
                })
            gt[i] = gl
            dt[i] = [{"keypoints": a["keypoints"], "score": a["score"]}
                     for a in self.cocoDt._img_anns.get(i, [])]
        return gt, dt

    def _num_joints(self, default):
        cat = next(iter(self.cocoGt.cats.values()))
        return len(cat.get("keypoints", [])) or default

    def summarize(self):
        from i2rnet_tpu.ops.cocoeval import KeypointEval
        num_joints = self._num_joints(17)
        gt, dt = self._gt_dt(num_joints)
        stats = KeypointEval(gt, dt, num_joints=num_joints).summarize_coco()
        self.stats = np.array([v for _, v in stats], np.float64)


class _MiniCrowdposeEval(_MiniCOCOeval):
    """crowdposetools.COCOeval facade. The crowdpose api's ``.stats`` is an
    11-vector [AP, AP.5, AP.75, AP(M), AP(L), AR, AR.5, AR.75, AP(easy),
    AP(medium), AP(hard)] of which the reference keeps ``[0:3] + [5:]``
    (``lib/dataset/crowdpose.py:480-489``); indices 3-4 are dead slots here.
    crowdIndex comes from the GT images, exactly like the crowdpose api."""

    def summarize(self):
        from i2rnet_tpu.ops.cocoeval import KeypointEval
        num_joints = self._num_joints(14)
        gt, dt = self._gt_dt(num_joints)
        crowd_index = {i["id"]: float(i.get("crowdIndex", 0.0))
                       for i in self.cocoGt.imgs.values()}
        stats = KeypointEval(gt, dt, num_joints=num_joints,
                             crowd_index=crowd_index).summarize_crowdpose()
        vals = [v for _, v in stats]  # AP,.5,.75, AR,.5,.75, easy,med,hard
        self.stats = np.array(vals[:3] + [np.nan, np.nan] + vals[3:],
                              np.float64)


def install_reference_stubs():
    """Install every stub the reference pipeline needs; idempotent."""
    from tests.test_torch_parity import _install_stubs
    _install_stubs()  # timm / torchvision.models / mmcv + sys.path

    # the reference predates numpy 1.24 (`np.float` at lib/dataset/coco.py:465)
    for alias, builtin in (("float", float), ("int", int), ("bool", bool),
                           ("object", object)):
        if not hasattr(np, alias):
            setattr(np, alias, builtin)

    import torch

    tv = sys.modules["torchvision"]
    if not hasattr(tv, "transforms"):
        tvt = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class ToTensor:
            """HWC [0,255] (uint8 or float) -> CHW float32 in [0,1];
            an HW mask gains a leading channel axis (torchvision semantics
            for 2-D arrays)."""

            def __call__(self, x):
                x = np.asarray(x)
                if x.ndim == 2:
                    x = x[:, :, None]
                t = torch.from_numpy(np.ascontiguousarray(
                    x.transpose(2, 0, 1))).float()
                if x.dtype == np.uint8:
                    t = t / 255.0
                return t

        class Normalize:
            def __init__(self, mean, std):
                self.mean = torch.tensor(mean).view(-1, 1, 1)
                self.std = torch.tensor(std).view(-1, 1, 1)

            def __call__(self, t):
                return (t - self.mean) / self.std

        tvt.Compose, tvt.ToTensor, tvt.Normalize = Compose, ToTensor, Normalize
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt

    if "json_tricks" not in sys.modules:
        jt = types.ModuleType("json_tricks")
        jt.load, jt.loads = _stdjson.load, _stdjson.loads
        jt.dump, jt.dumps = _stdjson.dump, _stdjson.dumps
        sys.modules["json_tricks"] = jt

    for pkg, eval_cls in (("pycocotools", _MiniCOCOeval),
                          ("crowdposetools", _MiniCrowdposeEval)):
        if pkg not in sys.modules:
            root = types.ModuleType(pkg)
            coco_mod = types.ModuleType(f"{pkg}.coco")
            coco_mod.COCO = _MiniCOCO
            eval_mod = types.ModuleType(f"{pkg}.cocoeval")
            eval_mod.COCOeval = eval_cls
            root.coco, root.cocoeval = coco_mod, eval_mod
            sys.modules.update({pkg: root, f"{pkg}.coco": coco_mod,
                                f"{pkg}.cocoeval": eval_mod})

    # lib/nms/nms.py imports the Cython bitmask NMS at module level
    # (nms.py:13-14) but the keypoint eval chain only calls the pure-python
    # oks_nms / soft_oks_nms; a greedy IoU fallback keeps the import honest.
    if "nms.cpu_nms" not in sys.modules:
        def _greedy_nms(dets, thresh):
            dets = np.asarray(dets, np.float64)
            x1, y1, x2, y2, sc = dets.T[:5]
            areas = (x2 - x1 + 1) * (y2 - y1 + 1)
            order = sc.argsort()[::-1]
            keep = []
            while order.size:
                i = order[0]
                keep.append(int(i))
                xx1 = np.maximum(x1[i], x1[order[1:]])
                yy1 = np.maximum(y1[i], y1[order[1:]])
                xx2 = np.minimum(x2[i], x2[order[1:]])
                yy2 = np.minimum(y2[i], y2[order[1:]])
                inter = (np.maximum(0.0, xx2 - xx1 + 1)
                         * np.maximum(0.0, yy2 - yy1 + 1))
                iou = inter / (areas[i] + areas[order[1:]] - inter)
                order = order[np.where(iou <= thresh)[0] + 1]
            return keep

        cpu = types.ModuleType("nms.cpu_nms")
        cpu.cpu_nms = _greedy_nms
        gpu = types.ModuleType("nms.gpu_nms")
        gpu.gpu_nms = lambda dets, thresh, device_id=0: _greedy_nms(dets, thresh)
        sys.modules["nms.cpu_nms"] = cpu
        sys.modules["nms.gpu_nms"] = gpu

    if "pylsy" not in sys.modules:
        pylsy = types.ModuleType("pylsy")

        class pylsytable:
            def __init__(self, names):
                self.names, self.rows = list(names), {}

            def add_data(self, name, value):
                self.rows.setdefault(name, []).append(value)

            def __str__(self):
                return " | ".join(f"{n}: {self.rows.get(n, '')}"
                                  for n in self.names)

        pylsy.pylsytable = pylsytable
        sys.modules["pylsy"] = pylsy


def patch_cuda_noop(monkeypatch=None):
    """Make ``.cuda()`` / ``.cuda(non_blocking=...)`` identity on CPU-only
    hosts — pure device placement, no numerics."""
    import torch
    if monkeypatch is not None:
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **kw: self, raising=False)
        monkeypatch.setattr(torch.nn.Module, "cuda",
                            lambda self, *a, **kw: self, raising=False)
    else:
        torch.Tensor.cuda = lambda self, *a, **kw: self
        torch.nn.Module.cuda = lambda self, *a, **kw: self


def build_reference_loader(cfg, data_root, batch_size=2, is_train=False,
                           image_set=None, dataset_name="coco",
                           collater_max_patch=0):
    """The reference data stack exactly as ``tools/test.py:126-159`` builds
    it: dataset class + val transform + collater(0, PATCH_MODE).

    ``dataset_name`` picks the reference dataset module ('coco' /
    'crowdpose'), mirroring test.py's ``eval('dataset.'+cfg.DATASET.DATASET)``.

    ``collater_max_patch``: test.py ships ``collater(0, PATCH_MODE)``
    (test.py:139) — max_patch=0 means get_max_patch never runs, so for
    PATCH_MODE='main_target' the shipped eval path never splits per-person
    and ``validate_main_target`` shape-crashes on any multi-person image
    (meta['center'] is [sum(lengths), 2] but it assigns into
    [len(lengths), 6] at function.py:400-404). The commented-out line right
    above (test.py:138) passes ``cfg.DATASET.MAX_PATCH`` — the working
    configuration the collater's main_target branch (collater.py:35-46) was
    written for; pass it here to drive that path.
    """
    import torch
    import torchvision.transforms as transforms  # the stub

    from dataset.collater import collater
    if dataset_name == "crowdpose":
        from dataset.crowdpose import CROWDPOSEDataset as DS
    elif dataset_name == "OCHuman":
        from dataset.ochuman import OCHumanDataset as DS
    else:
        from dataset.coco import COCODataset as DS

    normalize = transforms.Normalize(mean=[0.485, 0.456, 0.406],
                                     std=[0.229, 0.224, 0.225])
    ds = DS(
        cfg, data_root, image_set or cfg.DATASET.TEST_SET, is_train,
        transforms.Compose([transforms.ToTensor(), normalize]))
    if is_train or cfg.TEST.USE_GT_BBOX:
        collate_fn = collater(collater_max_patch, cfg.DATASET.PATCH_MODE)
    else:
        # the detector branch uses torch's DEFAULT collate (test.py:149-156
        # builds that loader without a collate_fn): items are 1-person
        # lists, so validate's `input[0]` / `meta['center'][0]` unwrap the
        # default-collated singleton lists (function.py:127-130,181-188).
        # Routing the custom collater here pre-concatenates and crashes the
        # reference model on 3-D inputs.
        collate_fn = None
    loader = torch.utils.data.DataLoader(
        ds, batch_size=batch_size, shuffle=False, num_workers=0,
        pin_memory=False, collate_fn=collate_fn)
    return ds, loader


def overfit_reference_model(cfg, model, loader, steps=150, lr=2e-3, seed=0,
                            flip_pairs=None, lr_schedule=None):
    """Fit the reference torch model to the fixture so its heatmaps carry
    real peaks (a random net's argmax is noise — unusable for a
    decode-pipeline diff). Deterministic: eval-path loader (no
    augmentation), fixed seed, plain Adam on the reference's own
    JointsMSELoss.

    ``flip_pairs``: when given, every other step trains on the
    width-flipped inputs with channel-swapped width-flipped targets —
    teaching the flip equivariance the released training recipe learns from
    its random-flip augmentation. Without it, the flip-test average has
    twin peaks (direct and flipped forwards disagree by ~1px) and argmax
    sits on a knife edge, making the decode diff noise-dominated.

    ``lr_schedule``: optional list of (lr, steps) phases overriding
    (lr, steps)."""
    import torch

    from core.loss import JointsMSELoss

    torch.manual_seed(seed)
    crit = JointsMSELoss(use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
    batches = [(inp, pm, tg, tw, meta["length"].numpy().tolist())
               for inp, pm, tg, tw, meta in loader]
    if flip_pairs is not None:
        flipped = []
        for inp, pm, tg, tw, length in batches:
            fi = torch.from_numpy(np.flip(inp.numpy(), 3).copy())
            fp = torch.from_numpy(np.flip(pm.numpy(), 3).copy())
            ft = tg.numpy()[:, :, :, ::-1].copy()
            for a, b in flip_pairs:
                ft[:, [a, b]] = ft[:, [b, a]]
            ftw = tw.numpy().copy()
            for a, b in flip_pairs:
                ftw[:, [a, b]] = ftw[:, [b, a]]
            flipped.append((fi, fp, torch.from_numpy(ft),
                            torch.from_numpy(ftw), length))
        train_set = [x for pair in zip(batches, flipped) for x in pair]
    else:
        train_set = batches

    model.train()
    for phase_lr, phase_steps in (lr_schedule or [(lr, steps)]):
        opt = torch.optim.Adam(model.parameters(), lr=phase_lr)
        step = 0
        while step < phase_steps:
            for inp, pm, tg, tw, length in train_set:
                out = model(inp, pm, length)
                out = out["multi"] if isinstance(out, dict) else out
                loss = crit(out, tg, tw, length)
                opt.zero_grad()
                loss.backward()
                opt.step()
                step += 1
                if step >= phase_steps:
                    break
    model.eval()
    return float(loss.item())


def reference_validate(cfg, data_root, model, output_dir, batch_size=2,
                       dataset_name="coco", main_target=False,
                       collater_max_patch=0):
    """Run the reference's own eval chain (``tools/test.py:126-165`` ->
    ``core/function.py:105-287`` -> ``dataset/coco.py:345-509``) on CPU.

    ``cfg`` is our config object (schema-compatible with the reference yacs
    tree); ``model`` a reference torch module in eval mode. Returns
    (perf_indicator AP, res_file path).

    ``main_target=True`` dispatches ``validate_main_target``
    (function.py:289-468) as test.py:159-164 does for
    PATCH_MODE='main_target'; pass ``collater_max_patch=cfg.DATASET.
    MAX_PATCH`` with it (see build_reference_loader on why the shipped 0 is
    broken for that mode).
    """
    import os

    install_reference_stubs()

    from core.function import validate, validate_main_target
    from core.loss import JointsMSELoss

    valid_dataset, valid_loader = build_reference_loader(
        cfg, data_root, batch_size, dataset_name=dataset_name,
        collater_max_patch=collater_max_patch)
    criterion = JointsMSELoss(use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
    os.makedirs(output_dir, exist_ok=True)
    fn = validate_main_target if main_target else validate

    # capture the reference's own name_value table (AP/AR + the crowdpose
    # easy/medium/hard bands) on its way to _print_name_value
    import core.function as _ref_fn
    captured = []
    orig_print = _ref_fn._print_name_value
    _ref_fn._print_name_value = (
        lambda nv, name: (captured.append(dict(nv)), orig_print(nv, name)))
    try:
        perf = fn(cfg, valid_loader, valid_dataset, model, criterion,
                  output_dir, 0)
    finally:
        _ref_fn._print_name_value = orig_print
    res_file = os.path.join(
        output_dir, "results",
        f"keypoints_{cfg.DATASET.TEST_SET}_results_{cfg.RANK}.json")
    return perf, res_file, (captured[0] if captured else {})
