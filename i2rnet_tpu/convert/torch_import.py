"""PyTorch checkpoint -> Flax variables converter.

Loads a reference ``.pth`` state dict (released I²R-Net checkpoints) and
rewrites it into this framework's parameter tree, unlocking inference parity
without retraining (SURVEY.md §7 step 5). Handles:

* layout: conv [O,I,kh,kw] -> HWIO; linear [O,I] -> [I,O]; transposed conv
  [I,O,kh,kw] -> spatially flipped HWIO (see layers.DeconvBlock); BN
  weight/bias/running_mean/var -> scale/bias + batch_stats.
* naming: reference module paths -> this framework's module names, via the
  per-model rewrite rules below.

The mapping is mechanical; any unmatched source/target names are reported so
gaps are loud, not silent.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "best_state_dict" in obj:
        obj = obj["best_state_dict"]
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        k = re.sub(r"^module\.", "", k)
        out[k] = _to_np(v)
    return out


# ---------------------------------------------------------------------------
# name rewriting
# ---------------------------------------------------------------------------

def _rewrite_hrnet_trunk(name: str, prefix: str = "trunk") -> str | None:
    """Reference HRNet-trunk names -> i2rnet_tpu.models.hrnet names."""
    m = re.match(r"conv([12])\.(.*)", name)
    if m:
        return f"{prefix}/stem/conv{m.group(1)}/conv/{m.group(2)}"
    m = re.match(r"bn([12])\.(.*)", name)
    if m:
        return f"{prefix}/stem/conv{m.group(1)}/bn/{m.group(2)}"
    m = re.match(r"layer1\.(\d+)\.(conv|bn)([123])\.(.*)", name)
    if m:
        i, kind, j, rest = m.groups()
        sub = "conv" if kind == "conv" else "bn"
        return f"{prefix}/stem/layer1_{i}/conv{j}/{sub}/{rest}"
    m = re.match(r"layer1\.(\d+)\.downsample\.([01])\.(.*)", name)
    if m:
        i, j, rest = m.groups()
        sub = "conv" if j == "0" else "bn"
        return f"{prefix}/stem/layer1_{i}/downsample/{sub}/{rest}"

    # transitions: transition1.{i}.<0|1>... (conv,bn[,relu]) possibly nested
    m = re.match(r"transition([123])\.(\d+)\.(.*)", name)
    if m:
        t, i, rest = m.groups()
        stage = int(t) + 1
        # nested chains for new branches: "<j>.<0|1>.param"; single: "<0|1>.param"
        parts = rest.split(".")
        if len(parts) == 2:  # "0.weight" style (Sequential conv/bn)
            j, p = parts
            sub = "conv" if j == "0" else "bn"
            return f"{prefix}/stage{stage}/transition/t{i}/{sub}/{p}"
        if len(parts) == 3:  # "k.0.weight" nested chain
            k, j, p = parts
            sub = "conv" if j == "0" else "bn"
            return f"{prefix}/stage{stage}/transition/t{i}_{k}/{sub}/{p}"
        return None

    # stages: stage2.{m}.branches.{b}.{k}.(conv|bn)(1|2)....
    m = re.match(r"stage([234])\.(\d+)\.branches\.(\d+)\.(\d+)\.(conv|bn)([123])\.(.*)", name)
    if m:
        s, mod, b, k, kind, j, rest = m.groups()
        sub = "conv" if kind == "conv" else "bn"
        return (f"{prefix}/stage{s}/module{mod}/branch{b}_block{k}/conv{j}/{sub}/{rest}")
    m = re.match(r"stage([234])\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.([01])\.(.*)", name)
    if m:
        s, mod, b, k, j, rest = m.groups()
        sub = "conv" if j == "0" else "bn"
        return f"{prefix}/stage{s}/module{mod}/branch{b}_block{k}/downsample/{sub}/{rest}"

    # downsample chains first (deeper nesting): fuse_layers.{i}.{j}.{k}.(0|1).w
    m = re.match(r"stage([234])\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.([01])\.(\w+)$", name)
    if m:
        s, mod, i, j, k, idx, rest = m.groups()
        sub = "conv" if idx == "0" else "bn"
        return f"{prefix}/stage{s}/module{mod}/fuse{i}_{j}_{k}/{sub}/{rest}"
    # upsample path: stage2.{m}.fuse_layers.{i}.{j}.(0|1).w
    m = re.match(r"stage([234])\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.([01])\.(\w+)$", name)
    if m:
        s, mod, i, j, idx, rest = m.groups()
        sub = "conv" if idx == "0" else "bn"
        return f"{prefix}/stage{s}/module{mod}/fuse{i}_{j}/{sub}/{rest}"
    return None


def _rewrite_encoder(name: str, prefix: str) -> str | None:
    """DETR encoder names (layers.{i}.self_attn...) -> encoder module names."""
    m = re.match(r"layers\.(\d+)\.(.*)", name)
    if not m:
        return None
    i, rest = m.groups()
    base = f"{prefix}/layer{i}"
    # keep torch leaf names ('weight'); _convert_value transposes/renames
    table = {
        "self_attn.out_proj.weight": f"{base}/self_attn/out_proj/weight",
        "self_attn.out_proj.bias": f"{base}/self_attn/out_proj/bias",
        "linear1.weight": f"{base}/linear1/weight",
        "linear1.bias": f"{base}/linear1/bias",
        "linear2.weight": f"{base}/linear2/weight",
        "linear2.bias": f"{base}/linear2/bias",
        "norm1.weight": f"{base}/norm1/weight",
        "norm1.bias": f"{base}/norm1/bias",
        "norm2.weight": f"{base}/norm2/weight",
        "norm2.bias": f"{base}/norm2/bias",
    }
    if rest in table:
        return table[rest]
    if rest in ("self_attn.in_proj_weight", "self_attn.in_proj_bias"):
        return f"{base}/self_attn/IN_PROJ/{rest.split('_')[-1]}"  # split later
    # custom MHA variant with separate projections
    m2 = re.match(r"self_attn\.(q|k|v)_proj\.(weight|bias)", rest)
    if m2:
        which, p = m2.groups()
        return f"{base}/self_attn/{which}_proj/{p}"
    return None


def _rewrite_pos_embedding(name: str, prefix: str = "multi_pos") -> str | None:
    m = re.match(r"position_embedding\.(conv|bn)([12])\.(.*)", name)
    if m:
        kind, j, rest = m.groups()
        sub = "conv" if kind == "conv" else "bn"
        return f"{prefix}/conv{j}/{sub}/{rest}"
    m = re.match(r"position_embedding\.fc\.(.*)", name)
    if m:
        return f"{prefix}/fc/{m.group(1)}"
    m = re.match(r"position_embedding\.conv_(pre|end)\.(.*)", name)
    if m:
        return f"{prefix}/conv_{m.group(1)}/{m.group(2)}"
    # 'res' mode: nn.Sequential(*resnet18.children()[:5]) ->
    # indices 0=conv1, 1=bn1, 2=relu, 3=maxpool, 4=layer1 (2 BasicBlocks)
    # (reference position_embedding.py:14-18)
    m = re.match(r"position_embedding\.res\.0\.(.*)", name)
    if m:
        return f"{prefix}/res_conv1/{m.group(1)}"
    m = re.match(r"position_embedding\.res\.1\.(.*)", name)
    if m:
        return f"{prefix}/res_bn1/{m.group(1)}"
    m = re.match(r"position_embedding\.res\.4\.([01])\.conv([12])\.(.*)", name)
    if m:
        k, j, rest = m.groups()
        return f"{prefix}/res_layer1_{k}/conv{j}/conv/{rest}"
    m = re.match(r"position_embedding\.res\.4\.([01])\.bn([12])\.(.*)", name)
    if m:
        k, j, rest = m.groups()
        return f"{prefix}/res_layer1_{k}/conv{j}/bn/{rest}"
    return None


def rewrite_pure_multi(name: str) -> str | None:
    """interformer_pureMulti state dict -> PureMultiInterFormer tree."""
    r = _rewrite_hrnet_trunk(name, "trunk")
    if r:
        return r
    if name.startswith("reduce."):
        return "reduce/" + name.split(".", 1)[1]
    r = _rewrite_pos_embedding(name, "multi_pos")
    if r:
        return r
    if name.startswith("global_encoder."):
        return _rewrite_encoder(name[len("global_encoder."):], "encoder")
    m = re.match(r"deconv_layers\.0\.(.*)", name)
    if m:
        return f"deconv/{'kernel' if m.group(1) == 'weight' else m.group(1)}"
    m = re.match(r"deconv_layers\.1\.(.*)", name)
    if m:
        return f"deconv/bn/{m.group(1)}"
    if name.startswith("final_layer."):
        return "final_layer/" + name.split(".", 1)[1]
    if name == "pos_embedding":
        return None  # fixed sine buffer, regenerated
    return None


def rewrite_transpose_h(name: str, prefix: str = "") -> str | None:
    r = _rewrite_hrnet_trunk(name, f"{prefix}trunk")
    if r:
        return r
    if name.startswith("reduce."):
        return f"{prefix}reduce/" + name.split(".", 1)[1]
    if name.startswith("global_encoder."):
        return _rewrite_encoder(name[len("global_encoder."):], f"{prefix}global_encoder")
    if name.startswith("final_layer."):
        return f"{prefix}final_layer/" + name.split(".", 1)[1]
    if name == "pos_embedding":
        return f"{prefix}pos_embedding"  # learnable PE
    if name.startswith("deconv_layers."):
        return None  # present in intra checkpoints, unused by the model
    return None


def rewrite_interformer(name: str) -> str | None:
    """interformer (two-stage) state dict -> InterFormer tree."""
    if name.startswith("singleformer."):
        sub = name[len("singleformer."):]
        # SINGLEFORMER='hrformer' wraps the HRT backbone + keypoint head
        # (reference hrformer.py:2470-2480); its names all carry the
        # backbone./keypoint_head. prefixes, which TransPose-H names never
        # do, so the two first-stage families route unambiguously.
        if sub.startswith(("backbone.", "keypoint_head.")):
            return rewrite_hrformer(sub, "singleformer/")
        return rewrite_transpose_h(sub, "singleformer/")
    if name.startswith("backbone."):
        return _rewrite_hrnet_trunk(name[len("backbone."):], "backbone")
    if name.startswith("multi_position_embedding."):
        return _rewrite_pos_embedding(
            "position_embedding." + name.split(".", 1)[1], "multi_pos")
    # ATTENTION_TYPE 'window': GeneralTransformerBlock inter encoder
    # (reference attention.py:991-1062): one MHA_ at .attn.attn, an unused
    # norm1, and an unused relative-position table (carried for parity).
    if name.startswith("multi_global_encoder.attn.attn."):
        a = name[len("multi_global_encoder.attn.attn."):]
        if a == "relative_position_bias_table":
            return "multi_encoder/rpe_table"
        m2 = re.match(r"(q|k|v|out)_proj\.(weight|bias)", a)
        if m2:
            return f"multi_encoder/attn/{m2.group(1)}_proj/{m2.group(2)}"
        if a in ("in_proj_weight", "in_proj_bias"):
            return f"multi_encoder/attn/IN_PROJ/{a.split('_')[-1]}"
        return None
    if name.startswith("multi_global_encoder.norm1."):
        return ""  # constructed but never called (attention.py:1015-1030)
    if name.startswith("multi_global_encoder."):
        return _rewrite_encoder(name[len("multi_global_encoder."):], "multi_encoder")
    if name.startswith("fc."):
        return "fc/" + name.split(".", 1)[1]
    # DeConv wrapper: upsample_layer.deconv_layers.{i}.0 (ConvT) .1 (BN)
    m = re.match(r"upsample_layer\.deconv_layers\.(\d+)\.0\.(.*)", name)
    if m:
        i, rest = m.groups()
        return f"deconv{i}/{'kernel' if rest == 'weight' else rest}"
    m = re.match(r"upsample_layer\.deconv_layers\.(\d+)\.1\.(.*)", name)
    if m:
        return f"deconv{m.group(1)}/bn/{m.group(2)}"
    m = re.match(r"deconv_layers\.0\.(.*)", name)  # multiplex
    if m:
        return f"deconv/{'kernel' if m.group(1) == 'weight' else m.group(1)}"
    m = re.match(r"deconv_layers\.1\.(.*)", name)
    if m:
        return f"deconv/bn/{m.group(1)}"
    if name.startswith("final_layer."):
        return "final_layer/" + name.split(".", 1)[1]
    return None


def rewrite_interformer_2stage(name: str) -> str | None:
    """Legacy interformer_2stage state dict (reference
    ``interformer_2stage.py:208-433``) -> InterFormer tree.

    Differences from the main interformer's naming: THREE separate deconvs
    ``deconv_layers{1,2,3}`` of which the 256x192 released config's rate-2
    upsample calls only 1 and 2 (``pool_or_deconv``, reference ``:367-381``;
    ``deconv_layers3`` is constructed-but-dead weight — dropped);
    ``upsample_conv`` instead of ``upsample_layer`` for the 'upconv' type;
    ``domain_trans_1/2`` constructed only when DOMAIN_TRANS.
    """
    m = re.match(r"deconv_layers([123])\.0\.(.*)", name)
    if m:
        i, rest = int(m.group(1)) - 1, m.group(2)
        if i >= 2:
            return ""  # deconv_layers3: never called at rate 2 (dead)
        return f"deconv{i}/{'kernel' if rest == 'weight' else rest}"
    m = re.match(r"deconv_layers([123])\.1\.(.*)", name)
    if m:
        i = int(m.group(1)) - 1
        if i >= 2:
            return ""
        return f"deconv{i}/bn/{m.group(2)}"
    m = re.match(r"domain_trans_([12])\.(.*)", name)
    if m:
        return f"domain_trans_{m.group(1)}/{m.group(2)}"
    if name.startswith("upsample_conv."):
        return rewrite_interformer("upsample_layer." + name.split(".", 1)[1])
    return rewrite_interformer(name)


def rewrite_hrformer(name: str, prefix: str = "") -> str | None:
    """HRFormer wrapper state dict (backbone.* + keypoint_head.*) ->
    i2rnet_tpu.models.hrformer tree."""
    if name.startswith("keypoint_head.final_layer."):
        return f"{prefix}final_layer/" + name.rsplit(".", 1)[1]
    if not name.startswith("backbone."):
        return None
    name = name[len("backbone."):]

    m = re.match(r"conv([12])\.(.*)", name)
    if m:
        return f"{prefix}conv{m.group(1)}/conv/{m.group(2)}"
    m = re.match(r"bn([12])\.(.*)", name)
    if m:
        return f"{prefix}conv{m.group(1)}/bn/{m.group(2)}"
    m = re.match(r"layer1\.(\d+)\.(conv|bn)([123])\.(.*)", name)
    if m:
        i, kind, j, rest = m.groups()
        return f"{prefix}layer1_{i}/conv{j}/{'conv' if kind == 'conv' else 'bn'}/{rest}"
    m = re.match(r"layer1\.(\d+)\.downsample\.([01])\.(.*)", name)
    if m:
        i, j, rest = m.groups()
        return f"{prefix}layer1_{i}/downsample/{'conv' if j == '0' else 'bn'}/{rest}"

    # transitions live inside the NEXT stage module in this framework
    m = re.match(r"transition([123])\.(\d+)\.(.*)", name)
    if m:
        t, i, rest = m.groups()
        stage = int(t) + 1
        parts = rest.split(".")
        if len(parts) == 2:  # Sequential(conv, bn, relu)
            j, p = parts
            sub = "conv" if j == "0" else "bn"
            return f"{prefix}stage{stage}/transition{i}/{sub}/{p}"
        if len(parts) == 3:  # nested downsample chains
            k, j, p = parts
            sub = "conv" if j == "0" else "bn"
            return f"{prefix}stage{stage}/transition{i}_{k}/{sub}/{p}"
        return None

    # transformer blocks
    m = re.match(r"stage([234])\.(\d+)\.branches\.(\d+)\.(\d+)\.(.*)", name)
    if m:
        s, mod, b, k, rest = m.groups()
        base = f"{prefix}stage{s}/m{mod}_b{b}_blk{k}"
        if rest.startswith("attn.attn."):
            a = rest[len("attn.attn."):]
            if a in ("in_proj_weight", "in_proj_bias"):
                return f"{base}/attn/IN_PROJ/{a.split('_')[-1]}"
            if a == "relative_position_bias_table":
                return f"{base}/attn/rpe_table"
            m2 = re.match(r"(q|k|v|out)_proj\.(weight|bias)", a)
            if m2:
                return f"{base}/attn/{m2.group(1)}_proj/{m2.group(2)}"
            if a == "relative_position_index":
                return ""  # regenerated buffer
            return None
        m2 = re.match(r"norm([12])\.(weight|bias)", rest)
        if m2:
            return f"{base}/norm{m2.group(1)}/{m2.group(2)}"
        m2 = re.match(r"mlp\.(fc1|dw3x3|fc2|norm1|norm2|norm3)\.(.*)", rest)
        if m2:
            return f"{base}/mlp/{m2.group(1)}/{m2.group(2)}"
        return None

    # fusion
    m = re.match(r"stage([234])\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(\d+)\.(\w+)$", name)
    if m:
        s, mod, i, j, k, idx, rest = m.groups()
        sub = {"0": "_dw", "1": "_dwbn", "2": "_pw", "3": "_pwbn"}.get(idx)
        if sub is None:
            return None
        leaf = f"fuse{i}_{j}_{k}{sub}"
        if sub.endswith("bn"):
            return f"{prefix}stage{s}/m{mod}_fuse/{leaf}/{rest}"
        return f"{prefix}stage{s}/m{mod}_fuse/{leaf}/{rest}"
    m = re.match(r"stage([234])\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.([01])\.(\w+)$", name)
    if m:
        s, mod, i, j, idx, rest = m.groups()
        sub = "conv" if idx == "0" else "bn"
        return f"{prefix}stage{s}/m{mod}_fuse/fuse{i}_{j}/{sub}/{rest}"
    return None


def rewrite_interformer_e2e(name: str) -> str | None:
    """interformer_e2e / _new state dict -> InterFormerE2E tree.

    NB the reference constructs ``domain_trans_1/2`` even when DOMAIN_TRANS
    is off (unused params); they convert only into configs that enable it.
    """
    r = _rewrite_hrnet_trunk(name, "trunk")
    if r:
        return r
    if name.startswith("reduce."):
        return "reduce/" + name.split(".", 1)[1]
    if name == "single_pos_embedding":
        return ""  # fixed sine buffer, regenerated (intentionally dropped)
    if name.startswith("single_global_encoder."):
        return _rewrite_encoder(name[len("single_global_encoder."):], "single_encoder")
    if name.startswith("multi_global_encoder."):
        return _rewrite_encoder(name[len("multi_global_encoder."):], "multi_encoder")
    if name.startswith("multi_position_embedding."):
        return _rewrite_pos_embedding(
            "position_embedding." + name.split(".", 1)[1], "multi_pos")
    m = re.match(r"deconv_layers\.0\.(.*)", name)
    if m:
        return f"deconv/{'kernel' if m.group(1) == 'weight' else m.group(1)}"
    m = re.match(r"deconv_layers\.1\.(.*)", name)
    if m:
        return f"deconv/bn/{m.group(1)}"
    m = re.match(r"(domain_trans_[12]|final_layer|final_layer_single|final_layer_multi)\.(.*)", name)
    if m:
        return f"{m.group(1)}/{m.group(2)}"
    return None


REWRITERS = {
    "interformer_pureMulti": rewrite_pure_multi,
    "interformer": rewrite_interformer,
    "interformer_2stage": rewrite_interformer_2stage,
    "transpose_h": rewrite_transpose_h,
    "hrformer": rewrite_hrformer,
    "interformer_e2e": rewrite_interformer_e2e,
    "interformer_e2e_new": rewrite_interformer_e2e,
}


# ---------------------------------------------------------------------------
# value conversion + tree assembly
# ---------------------------------------------------------------------------

def _convert_value(flat_name: str, torch_name: str, v: np.ndarray) -> Tuple[str, np.ndarray]:
    leaf = flat_name.rsplit("/", 1)[-1]
    if leaf == "weight":
        # BN or LayerNorm scale / conv / linear — disambiguated by ndim
        if v.ndim == 1:
            return flat_name.replace("/weight", "/scale"), v
        if v.ndim == 4:
            return flat_name.replace("/weight", "/kernel"), v.transpose(2, 3, 1, 0)
        if v.ndim == 2:
            return flat_name.replace("/weight", "/kernel"), v.T
    if leaf == "kernel" and v.ndim == 4:
        # transposed conv [I, O, kh, kw] -> flipped HWIO
        return flat_name, np.flip(v, axis=(2, 3)).transpose(2, 3, 0, 1).copy()
    if leaf == "running_mean":
        return flat_name.replace("/running_mean", "/mean"), v
    if leaf == "running_var":
        return flat_name.replace("/running_var", "/var"), v
    if leaf == "num_batches_tracked":
        return "", v
    return flat_name, v


def _is_batch_stat(name: str) -> bool:
    return name.endswith("/mean") or name.endswith("/var")


def convert_state_dict(sd: Dict[str, np.ndarray], model_name: str,
                       strict: bool = False):
    """Returns ({'params': tree, 'batch_stats': tree}, unmatched names)."""
    rewrite = REWRITERS[model_name]
    params_flat: Dict[str, np.ndarray] = {}
    stats_flat: Dict[str, np.ndarray] = {}
    unmatched = []
    pending_inproj: Dict[str, np.ndarray] = {}

    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.endswith("relative_position_index"):
            continue
        tgt = rewrite(k)
        if tgt is None:
            unmatched.append(k)
            continue
        if "/IN_PROJ/" in tgt:
            pending_inproj[tgt] = v
            continue
        tgt, v = _convert_value(tgt, k, v)
        if not tgt:
            continue
        (stats_flat if _is_batch_stat(tgt) else params_flat)[tgt] = v

    # split packed in_proj into q/k/v
    for tgt, v in pending_inproj.items():
        base, leaf = tgt.split("/IN_PROJ/")
        c = v.shape[0] // 3
        for i, which in enumerate(("q_proj", "k_proj", "v_proj")):
            chunk = v[i * c:(i + 1) * c]
            if leaf == "weight":
                params_flat[f"{base}/{which}/kernel"] = chunk.T
            else:
                params_flat[f"{base}/{which}/bias"] = chunk

    if strict and unmatched:
        raise ValueError(f"unmatched torch params: {unmatched[:20]}")

    def unflatten(flat):
        tree: Dict[str, Any] = {}
        for name, v in flat.items():
            parts = name.split("/")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(v)
        return tree

    return {"params": unflatten(params_flat),
            "batch_stats": unflatten(stats_flat)}, unmatched


def convert_torch_checkpoint(path: str, cfg):
    """Load + convert a reference .pth for ``cfg.MODEL.NAME``."""
    sd = load_torch_state_dict(path)
    variables, unmatched = convert_state_dict(sd, cfg.MODEL.NAME)
    if unmatched:
        import logging
        logging.getLogger(__name__).warning(
            "weight conversion: %d unmatched torch params (first: %s)",
            len(unmatched), unmatched[:5])
    return variables
