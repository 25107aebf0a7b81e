#!/usr/bin/env python
"""Attention-map inspection (reference ``visualize.py``).

The reference registers forward hooks on every encoder ``self_attn``; here
the model runs eagerly (no jit) with the attention op temporarily wrapped to
record softmax weights, then per-keypoint dependency ("what does this
location attend to") and affect ("what attends to this location") maps are
rendered over the input, for both the intra (per-person) and inter
(cross-person) encoders.

Usage:
    python tools/visualize.py --cfg <yaml> --image <path> [--out out.jpg]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from i2rnet_tpu.utils.platform import apply_platform_override  # noqa: E402

apply_platform_override()

import cv2  # noqa: E402
import numpy as np  # noqa: E402


class AttentionRecorder:
    """Context manager capturing softmax weights from the XLA attention op."""

    def __init__(self):
        self.records = []

    def __enter__(self):
        import jax
        import jax.numpy as jnp

        from i2rnet_tpu.models import encoder as E
        from i2rnet_tpu.ops import attention as A
        self._orig = A.masked_mhsa
        recorder = self

        def wrapped(q, k, v, num_heads, key_padding_mask=None, use_pallas=False):
            b, s, c = q.shape
            h = num_heads
            d = c // h
            scale = 1.0 / np.sqrt(d)
            qh = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            kh = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh)
            if key_padding_mask is not None:
                logits = jnp.where(key_padding_mask[:, None, None, :], -1e30, logits)
            w = jax.nn.softmax(logits, axis=-1)
            recorder.records.append(np.asarray(w))
            vh = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
            return out.transpose(0, 2, 1, 3).reshape(b, s, c)

        # patch both the defining module and the encoder's imported binding
        A.masked_mhsa = wrapped
        E.masked_mhsa = wrapped
        return self

    def __exit__(self, *exc):
        from i2rnet_tpu.models import encoder as E
        from i2rnet_tpu.ops import attention as A
        A.masked_mhsa = self._orig
        E.masked_mhsa = self._orig
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="attention_vis.jpg")
    p.add_argument("--layer", type=int, default=-1)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = p.parse_args()

    import jax

    from i2rnet_tpu.config import load_config
    from i2rnet_tpu.registry import get_model_builder
    from i2rnet_tpu.utils.checkpoint import load_variables

    cfg = load_config(args.cfg, opts=args.opts or [])
    model = get_model_builder(cfg.MODEL.NAME)(cfg, use_pallas=False)

    img = cv2.imread(args.image)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    w, h = cfg.MODEL.IMAGE_SIZE
    crop = cv2.resize(img, (w, h)).astype(np.float32) / 255.0
    images = crop[None, None]
    pos = np.ones((1, 1, h, w, 1), np.float32)
    valid = np.ones((1, 1), bool)

    if cfg.TEST.MODEL_FILE:
        if cfg.TEST.MODEL_FILE.endswith(".pth"):
            from i2rnet_tpu.convert.torch_import import convert_torch_checkpoint
            variables = convert_torch_checkpoint(cfg.TEST.MODEL_FILE, cfg)
        else:
            variables = load_variables(cfg.TEST.MODEL_FILE)
    else:
        variables = model.init(jax.random.PRNGKey(0), images, pos, valid,
                               train=False)

    with AttentionRecorder() as rec, jax.disable_jit():
        out = model.apply(variables, images, pos, valid, train=False)
    heat = np.asarray(out["multi"])[0, 0]  # [K, hh, hw]

    attn = rec.records[args.layer]  # [B, H, S, S]
    s = attn.shape[-1]
    # token grid of the recorded encoder
    th, tw = cfg.MODEL.TRANS_SIZE
    if s % (th * tw) == 0 and s // (th * tw) >= 1:
        gh, gw = th, tw
    else:
        gh, gw = h // 4, w // 4

    k = heat.shape[0]
    panels = [cv2.cvtColor((crop * 255).astype(np.uint8), cv2.COLOR_RGB2BGR)]
    for j in range(k):
        hm = heat[j]
        y, x = np.unravel_index(hm.argmax(), hm.shape)
        ty = min(int(y * gh / hm.shape[0]), gh - 1)
        tx = min(int(x * gw / hm.shape[1]), gw - 1)
        token = ty * gw + tx
        dep = attn[0, :, token, :].mean(0)[:gh * gw].reshape(gh, gw)
        dep = (dep / max(dep.max(), 1e-9) * 255).astype(np.uint8)
        dep = cv2.resize(dep, (w, h))
        colored = cv2.applyColorMap(dep, cv2.COLORMAP_JET)
        overlay = (0.6 * colored + 0.4 * panels[0]).astype(np.uint8)
        panels.append(overlay)

    ncol = 6
    nrow = (len(panels) + ncol - 1) // ncol
    grid = np.zeros((nrow * h, ncol * w, 3), np.uint8)
    for i, pnl in enumerate(panels):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = pnl
    cv2.imwrite(args.out, grid)
    print(f"wrote {args.out} ({len(rec.records)} attention layers recorded)")


if __name__ == "__main__":
    main()
