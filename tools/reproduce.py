#!/usr/bin/env python
"""One-command AP-reproduction harness (VERDICT r2 item 6).

The moment real datasets + released checkpoints are available, the parity
run against the published tables (reference ``README.md:14-39``,
BASELINE.md) is a single command:

    python tools/reproduce.py --cfg experiments/crowdpose/interformer_crowdpose_hrt_192_p4_b4.yaml \
        --checkpoint models/interformer/crowdpose/interformer_crowdpose_hrt_192_p4_b4.pth \
        --root /data/crowdpose/

It evaluates the checkpoint (torch .pth via the weight converter, or an
Orbax dir from this framework), prints the metric row in BASELINE.md
format, and diffs each metric against the published expectation for that
config (±--tol, default 0.001 = the "AP parity ±0.1pt" target expressed
in absolute AP). Exit code 0 iff all expected metrics are within
tolerance.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

# Published tables (reference README.md:14-39; mirrored in BASELINE.md),
# keyed by experiment-config basename.
EXPECTED = {
    "interformer_crowdpose_w48_pure_en6": {
        "AP": 0.723, "Ap .5": 0.924, "AP .75": 0.779,
        "AR": 0.765, "AR .5": 0.932, "AR .75": 0.819,
        "AP (easy)": 0.799, "AP (medium)": 0.732, "AP (hard)": 0.628},
    "interformer_crowdpose_tph_192_p6_b4": {
        "AP": 0.763, "Ap .5": 0.935, "AP .75": 0.822,
        "AR": 0.791, "AR .5": 0.940, "AR .75": 0.844,
        "AP (easy)": 0.832, "AP (medium)": 0.770, "AP (hard)": 0.674},
    "interformer_crowdpose_hrt_192_p4_b4": {
        "AP": 0.774, "Ap .5": 0.936, "AP .75": 0.833,
        "AR": 0.803, "AR .5": 0.945, "AR .75": 0.855,
        "AP (easy)": 0.838, "AP (medium)": 0.781, "AP (hard)": 0.693},
    "interformer_ochuman_w48_pure_en6": {
        "AP": 0.643, "Ap .5": 0.850, "AP .75": 0.692},
    "interformer_ochuman_tph_192_p3_b8": {
        "AP": 0.665, "Ap .5": 0.838, "AP .75": 0.714},
    "interformer_ochuman_hrt_192_p3_b8": {
        "AP": 0.678, "Ap .5": 0.850, "AP .75": 0.728},
    "interformer_coco_w48_pure_en6": {
        "AP": 0.753, "Ap .5": 0.902, "AP .75": 0.819, "AP (M)": 0.717,
        "AP (L)": 0.824, "AR": 0.805, "AR (M)": 0.761, "AR (L)": 0.868},
    "interformer_coco_tph_192_p4_b4": {
        "AP": 0.758, "Ap .5": 0.904, "AP .75": 0.821, "AP (M)": 0.720,
        "AP (L)": 0.829, "AR": 0.809, "AR (M)": 0.766, "AR (L)": 0.873},
    "interformer_coco_hrt_192_p2_b12": {
        "AP": 0.764, "Ap .5": 0.908, "AP .75": 0.832, "AP (M)": 0.723,
        "AP (L)": 0.837, "AR": 0.814, "AR (M)": 0.769, "AR (L)": 0.881},
    "interformer_coco_hrt_288_p2_b4": {
        "AP": 0.773, "Ap .5": 0.910, "AP .75": 0.836, "AP (M)": 0.730,
        "AP (L)": 0.845, "AR": 0.821, "AR (M)": 0.777, "AR (L)": 0.886},
}


def parse_args():
    p = argparse.ArgumentParser(
        description="Reproduce a published AP row and diff against it")
    p.add_argument("--cfg", required=True)
    p.add_argument("--checkpoint", default="",
                   help=".pth (converted) or Orbax dir; default TEST.MODEL_FILE")
    p.add_argument("--root", default="", help="override DATASET.ROOT")
    p.add_argument("--tol", default=0.001, type=float,
                   help="absolute AP tolerance (0.001 = 0.1 AP points)")
    p.add_argument("--expected", default="",
                   help="override expectations, e.g. 'AP=0.774,AR=0.803'; "
                        "default looks up the config basename in the "
                        "published tables")
    p.add_argument("--max-batches", default=None, type=int)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def run(args) -> int:
    import jax

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.core.validate import validate
    from i2rnet_tpu.registry import get_dataset_class, get_model_builder
    from i2rnet_tpu.utils.checkpoint import load_variables
    from i2rnet_tpu.utils.logging import create_logger

    opts = list(args.opts or [])
    if args.root:
        opts += ["DATASET.ROOT", args.root]
    if args.checkpoint:
        opts += ["TEST.MODEL_FILE", args.checkpoint]
    cfg = load_config(args.cfg, opts=opts)
    logger, output_dir, _ = create_logger(cfg, args.cfg, "valid")

    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    model_file = cfg.TEST.MODEL_FILE
    if not model_file:
        print("ERROR: no checkpoint (pass --checkpoint or TEST.MODEL_FILE)")
        return 2
    if model_file.endswith(".pth"):
        from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
        variables = convert_torch_checkpoint(model_file, cfg)
    else:
        variables = load_variables(model_file)
    logger.info("=> loaded %s", model_file)

    ds_cls = get_dataset_class(cfg.DATASET.DATASET)
    dataset = ds_cls(cfg, cfg.DATASET.ROOT, cfg.DATASET.TEST_SET,
                     is_train=False)

    mesh = None
    if len(jax.devices()) > 1:
        from i2rnet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()

    name_value, perf = validate(cfg, dataset, model, variables, output_dir,
                                max_batches=args.max_batches, mesh=mesh)
    got = dict(name_value)

    stem = Path(args.cfg).stem
    if args.expected:
        expected = {}
        for pair in args.expected.split(","):
            k, v = pair.split("=")
            expected[k.strip()] = float(v)
    else:
        expected = EXPECTED.get(stem)
    if expected is None:
        print(f"(no published expectation for {stem!r}; measured row only)")
        expected = {}

    # BASELINE.md row format
    cols = [k for k in expected if k in got] or [
        k for k in ("AP", "Ap .5", "AP .75", "AR") if k in got]
    header = " | ".join(cols)
    row = " | ".join(f"{got[k]:.3f}" for k in cols)
    print(f"\n{stem}\n{header}\n{row}\n")

    ok = True
    for k, want in expected.items():
        if k not in got:
            print(f"MISSING metric {k!r} (expected {want:.3f})")
            ok = False
            continue
        delta = got[k] - want
        status = "ok" if abs(delta) <= args.tol else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"{k:12s} got {got[k]:.4f}  expected {want:.3f}  "
              f"delta {delta:+.4f}  [{status}]")
    print("\nRESULT:", "PASS" if ok else "FAIL",
          f"(tol ±{args.tol:g})" if expected else "(nothing to compare)")
    return 0 if ok else 1


def main():
    sys.exit(run(parse_args()))


if __name__ == "__main__":
    main()
