"""Pin the exact-FLOPs derivation behind BASELINE.md's GPU anchor.

The ">=5x the reference" comparison rests on a derived GPU anchor
(BASELINE.md "GPU anchor"): per-person forward cost = **19.3 GFLOPs**,
taken from the compiled-HLO cost analysis of the released W48 pure-multi
model (tools/compute_flops.py, TPU HLO, B=8 N=7). VERDICT r3 asked for
this number to be pinned by a test so the anchor cannot silently drift if
the model architecture changes.

This pins the same derivation on the CPU backend at a reduced geometry
(B=2 N=2; CPU-measured 19.143 GF/person on 2026-08-19 — within 1% of the
TPU number; per-person FLOPs are nearly geometry-independent because the
backbone dominates and runs once per person either way). If this fails,
either the model changed (update BASELINE.md's anchor + this pin, and say
so in the perf docs) or XLA's cost model shifted materially (re-measure).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # one full-size W48 CPU compile (cache-warm ok)

ANCHOR_GFLOPS_PER_PERSON = 19.143  # CPU HLO, B=2 N=2, 256x192
TOLERANCE = 0.05                   # fractional; catches real arch drift


def test_w48_per_person_flops_anchor():
    from i2rnet_tpu.presets import w48_pure_en6
    from i2rnet_tpu.registry import get_model_builder

    cfg = w48_pure_en6("coco")
    model = get_model_builder(cfg.MODEL.NAME)(cfg)
    b, n = 2, 2
    w, h = cfg.MODEL.IMAGE_SIZE
    rng = np.random.RandomState(0)
    images = rng.rand(b, n, h, w, 3).astype(np.float32)
    pos = (rng.rand(b, n, h, w, 1) > 0.5).astype(np.float32)
    valid = np.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), images[:1, :2],
                           pos[:1, :2], valid[:1, :2], train=False)

    def forward(im, pm, v):
        return model.apply(variables, im, pm, v, train=False)["multi"]

    compiled = jax.jit(forward).lower(images, pos, valid).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    gf_per_person = float(cost.get("flops", 0.0)) / (b * n) / 1e9

    assert gf_per_person == pytest.approx(
        ANCHOR_GFLOPS_PER_PERSON, rel=TOLERANCE), (
        f"W48 per-person forward FLOPs drifted: {gf_per_person:.3f} GF vs "
        f"pinned {ANCHOR_GFLOPS_PER_PERSON} GF. If the model change is "
        "intentional, re-derive BASELINE.md's GPU anchor and update this "
        "pin in the same commit.")
