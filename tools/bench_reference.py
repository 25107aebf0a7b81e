#!/usr/bin/env python
"""Measure the PyTorch reference model's throughput on this host.

Anchors bench.py's ``vs_baseline`` to a MEASURED number instead of an
estimate. The reference stack is CUDA-only in spirit but runs on CPU here
(no NVIDIA GPU in this environment) — the measured configuration is recorded
honestly in the output and in BASELINE.md.

Protocol mirrors the reference's own timing harness
(``/root/reference/tools/compute_flops.py:21-33``): warmup forwards, then a
timed loop, vanilla I²R-Net (interformer_pureMulti, HRNet-W48-S) at 256x192.

Usage: python tools/bench_reference.py [--batch 8] [--persons 4] [--iters 5]
"""

import argparse
import json
import sys
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
# drop the auto-added tools/ dir: our tools/profile.py shadows stdlib
# 'profile', which torch._dynamo pulls in via cProfile at optimizer build
sys.path[:] = [p for p in sys.path
               if Path(p or ".").resolve() != Path(__file__).resolve().parent]

REF_LIB = "/root/reference/lib"


def _install_stubs():
    """Stub the reference's absent deps (timm/torchvision/mmcv) — benchmark
    harness only, mirrors tests/test_torch_parity.py."""
    import torch.nn as nn
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet18 = lambda pretrained=False: (_ for _ in ()).throw(NotImplementedError)
        tv.models = tvm
        sys.modules.update({"torchvision": tv, "torchvision.models": tvm})
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tml = types.ModuleType("timm.models.layers")
        tml.to_2tuple = lambda x: x if isinstance(x, (tuple, list)) else (x, x)
        tml.trunc_normal_ = nn.init.trunc_normal_
        timm.models, tm.layers = tm, tml
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tml})
    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        cnn = types.ModuleType("mmcv.cnn")
        cnn.build_conv_layer = lambda cfg, *a, **kw: nn.Conv2d(*a, **kw)
        cnn.build_norm_layer = lambda cfg, ch, postfix="": (f"bn{postfix}",
                                                            nn.BatchNorm2d(ch))
        cnn.constant_init = cnn.kaiming_init = cnn.normal_init = \
            lambda m, **kw: None
        cnn.build_upsample_layer = lambda cfg, **kw: nn.Upsample(**kw)
        runner = types.ModuleType("mmcv.runner")
        rck = types.ModuleType("mmcv.runner.checkpoint")
        rck.load_state_dict = lambda module, sd, strict=False, logger=None: \
            module.load_state_dict(sd, strict=strict)
        utils = types.ModuleType("mmcv.utils")
        utils.get_logger = lambda name, *a, **k: __import__("logging").getLogger(name)
        pw = types.ModuleType("mmcv.utils.parrots_wrapper")
        pw._BatchNorm = nn.modules.batchnorm._BatchNorm
        utils.parrots_wrapper = pw
        mmcv.cnn, mmcv.runner, mmcv.utils = cnn, runner, utils
        sys.modules.update({
            "mmcv": mmcv, "mmcv.cnn": cnn, "mmcv.runner": runner,
            "mmcv.runner.checkpoint": rck, "mmcv.utils": utils,
            "mmcv.utils.parrots_wrapper": pw,
        })
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)


COCO_FLIP_PAIRS = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12],
                   [13, 14], [15, 16]]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--persons", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--protocol", choices=["forward", "eval", "train"],
                   default="forward",
                   help="'forward': plain forward (compute_flops.py timing "
                        "protocol). 'eval': the tools/test.py inner loop — "
                        "flip-test (2 forwards + flip_back + "
                        "average) + DARK get_final_preds decode, using the "
                        "reference's own lib functions. 'train': the "
                        "train() inner loop (function.py:42-102) — forward "
                        "+ JointsMSELoss + backward + Adam step + the "
                        "per-step PCK accuracy() on host numpy.")
    args = p.parse_args()

    import numpy as np
    import torch
    _install_stubs()
    from models import interformer_pureMulti as ref

    from i2rnet_tpu.presets import w48_pure_en6
    cfg = w48_pure_en6("coco").clone()
    cfg.MODEL.INIT_WEIGHTS = False
    cfg = cfg.freeze()

    torch.manual_seed(0)
    model = ref.get_pose_net(cfg, is_train=False)
    model.eval()

    b, n = args.batch, args.persons
    w, h = cfg.MODEL.IMAGE_SIZE
    x = torch.randn(b * n, 3, h, w)
    pos = (torch.rand(b * n, 1, h, w) > 0.5).float()
    lengths = [n] * b

    def fwd(inp, pmask):
        out = model(inp, pmask, lengths)
        return out["multi"] if isinstance(out, dict) else out

    if args.protocol == "forward":
        with torch.no_grad():
            for _ in range(args.warmup):
                fwd(x, pos)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                fwd(x, pos)
            dt = time.perf_counter() - t0
    elif args.protocol == "train":
        # reference train() loop body (lib/core/function.py:42-102):
        # forward, JointsMSELoss (dict-output weighted path when the first
        # stage is trainable), zero_grad/backward/Adam step (optimizer per
        # lib/utils/utils.py:97-101: Adam(lr) without weight decay), then
        # the per-step PCK accuracy() on host numpy (function.py:74-76 —
        # a D2H copy the reference pays every step).
        from core.evaluate import accuracy
        from core.loss import JointsMSELoss

        model.train()
        crit = JointsMSELoss(use_target_weight=cfg.LOSS.USE_TARGET_WEIGHT)
        opt = torch.optim.Adam(model.parameters(), lr=cfg.TRAIN.LR)
        hw, hh = cfg.MODEL.HEATMAP_SIZE
        k = cfg.MODEL.NUM_JOINTS
        target = torch.rand(b * n, k, hh, hw)
        tw = torch.ones(b * n, k, 1)
        lw = cfg.MODEL.LOSS_WEIGHTS

        def train_iter():
            outputs = model(x, pos, lengths)
            if isinstance(outputs, dict):
                output = outputs["multi"]
                loss = (lw[0] * crit(outputs["single"], target, tw, lengths)
                        + lw[1] * crit(output, target, tw, lengths))
            else:
                output = outputs
                loss = crit(output, target, tw, lengths)
            opt.zero_grad()
            loss.backward()
            opt.step()
            accuracy(output.detach().cpu().numpy(), target.cpu().numpy())

        for _ in range(args.warmup):
            train_iter()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            train_iter()
        dt = time.perf_counter() - t0
    else:
        # reference validate() loop body (lib/core/function.py:127-191)
        from core.inference import get_final_preds
        from utils.transforms import flip_back

        c = np.tile(np.array([[128.0, 96.0]], np.float32), (b * n, 1))
        s = np.tile(np.array([[1.2, 1.6]], np.float32), (b * n, 1))

        def eval_iter():
            with torch.no_grad():
                out = fwd(x, pos).cpu().numpy()
                xf = torch.from_numpy(np.flip(x.numpy(), 3).copy())
                pf = torch.from_numpy(np.flip(pos.numpy(), 3).copy())
                of = fwd(xf, pf).cpu().numpy()
            of = flip_back(of, COCO_FLIP_PAIRS)
            # no SHIFT_HEATMAP: reference function.py:158-162 averages
            # the flipped heatmaps unshifted
            avg = (out + of) * 0.5
            get_final_preds(cfg, avg, c, s)

        for _ in range(args.warmup):
            eval_iter()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            eval_iter()
        dt = time.perf_counter() - t0

    pps = b * n * args.iters / dt
    print(json.dumps({
        "metric": "reference_persons_per_sec",
        "value": round(pps, 2),
        "unit": "persons/s",
        "protocol": args.protocol,
        "device": "cpu" if not torch.cuda.is_available() else "cuda",
        "torch": torch.__version__,
        "model": "interformer_pureMulti (vanilla I2R-Net, HRNet-W48-S)",
        "input": f"{w}x{h}, batch {b} images x {n} persons",
    }))


if __name__ == "__main__":
    main()
