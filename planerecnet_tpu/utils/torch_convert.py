"""PyTorch-checkpoint -> flax-variables converter.

Maps a reference PlaneRecNet ``state_dict`` (reference planerecnet.py:121-128
``torch.save``; module attribute layout per models/backbone.py, models/fpn.py,
models/dcn.py and the heads in planerecnet.py:292-607) onto this framework's
NHWC/HWIO flax variable tree, so released ``.pth`` weights reproduce the
reference's masks and depth maps on TPU.

Also supports torchvision-style ImageNet ResNet checkpoints for
backbone-only init with the ``layer{i}`` -> ``layers.{i-1}`` key remap
(reference backbone.py:211-224).

The mapping is derived *from the flax tree*: every flax leaf must resolve to
exactly one torch key, giving a built-in completeness check.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _conv_w(x: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


_BN_PARAM = {"scale": "weight", "bias": "bias"}
_BN_STATS = {"mean": "running_mean", "var": "running_var"}
_GN_PARAM = {"scale": "weight", "bias": "bias"}


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """Translate one flax variable path (collection stripped) to the
    reference's state_dict key. Returns None for keys with no torch
    counterpart."""
    module, rest = path[0], path[1:]
    leaf = rest[-1]

    def conv_key(prefix):
        return f"{prefix}.{'weight' if leaf == 'kernel' else 'bias'}"

    if module == "backbone":
        if rest[0] == "conv1":
            return "backbone.conv1.weight"
        if rest[0] == "bn1":
            return f"backbone.bn1.{(_BN_PARAM | _BN_STATS)[leaf]}"
        m = re.match(r"layer(\d+)_(\d+)", rest[0])
        if m:
            prefix = f"backbone.layers.{m.group(1)}.{m.group(2)}"
            sub = rest[1]
            if sub in ("bn1", "bn2", "bn3"):
                return f"{prefix}.{sub}.{(_BN_PARAM | _BN_STATS)[leaf]}"
            if sub == "downsample_bn":
                return f"{prefix}.downsample.1.{(_BN_PARAM | _BN_STATS)[leaf]}"
            if sub == "downsample_conv":
                return f"{prefix}.downsample.0.weight"
            if sub in ("conv1", "conv3"):
                return f"{prefix}.{sub}.weight"
            if sub == "conv2":
                if len(rest) == 3 and leaf in ("regular_conv_kernel",
                                               "regular_conv_bias"):
                    which = "weight" if leaf.endswith("kernel") else "bias"
                    return f"{prefix}.conv2.regular_conv.{which}"
                if len(rest) == 4:  # offset_conv / modulator_conv
                    return conv_key(f"{prefix}.conv2.{rest[2]}")
                return f"{prefix}.conv2.weight"
    elif module == "fpn":
        m = re.match(r"lateral_conv(\d+)", rest[0])
        if m:
            return conv_key(f"fpn.lateral_convs.{m.group(1)}")
        m = re.match(r"fpn_conv(\d+)", rest[0])
        if m:
            return conv_key(f"fpn.fpn_convs.{m.group(1)}")
        m = re.match(r"downsample(\d+)", rest[0])
        if m:
            return conv_key(f"fpn.downsample_layers.{m.group(1)}")
    elif module == "inst_head":
        m = re.match(r"(cate|kernel)_tower(\d+)_(conv|gn)", rest[0])
        if m:
            tower, i, kind = m.group(1), int(m.group(2)), m.group(3)
            idx = 3 * i + (0 if kind == "conv" else 1)
            if kind == "conv":
                return f"inst_head.{tower}_tower.{idx}.weight"
            return f"inst_head.{tower}_tower.{idx}.{_GN_PARAM[leaf]}"
        if rest[0] in ("cate_pred", "kernel_pred"):
            return conv_key(f"inst_head.{rest[0]}")
    elif module == "mask_head":
        m = re.match(r"level(\d+)_conv(\d+)_(conv|gn)", rest[0])
        if m:
            lvl, j, kind = m.group(1), m.group(2), m.group(3)
            prefix = f"mask_head.convs_all_levels.{lvl}.conv{j}"
            if kind == "conv":
                return f"{prefix}.0.weight"
            return f"{prefix}.1.{_GN_PARAM[leaf]}"
        if rest[0] == "conv_pred_conv":
            return "mask_head.conv_pred.0.weight"
        if rest[0] == "conv_pred_gn":
            return f"mask_head.conv_pred.1.{_GN_PARAM[leaf]}"
    elif module == "depth_decoder":
        name = rest[0]
        if name == "conv1x1":
            return conv_key("depth_decoder.conv1x1.0")
        if re.match(r"latlayer\d", name):
            return conv_key(f"depth_decoder.{name}")
        m = re.match(r"(conv|deconv|refine_conv)(\d?)$", name)
        if m:
            conv_idx = {"conv": 1, "deconv": 2, "refine_conv": 1}[m.group(1)]
            sub = rest[1]
            if sub == "conv":
                return conv_key(f"depth_decoder.{name}.{conv_idx}")
            if sub == "bn":
                return (f"depth_decoder.{name}.{conv_idx + 1}."
                        f"{(_BN_PARAM | _BN_STATS)[leaf]}")
        if name == "depth_pred":
            return conv_key("depth_decoder.depth_pred.1")
    return None


def _iter_flax_paths(variables: Dict):
    """Yield (collection, path-tuple, leaf array) over a variables dict."""
    import jax

    for coll, tree in variables.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            yield coll, tuple(p.key for p in path), leaf


def convert_state_dict(state_dict: Dict[str, np.ndarray],
                       variables: Dict) -> Dict:
    """Convert a torch state_dict (numpy-valued) into a variables dict shaped
    like ``variables`` (the flax template from ``model.init``)."""
    import jax

    state_dict = {k: np.asarray(v) for k, v in state_dict.items()}
    out = jax.tree_util.tree_map(lambda x: x, variables)  # deep copy
    missing = []
    used = set()

    def build(coll, tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(coll, v, prefix + (k,)) for k, v in tree.items()}
        path = prefix
        tkey = flax_path_to_torch_key(path)
        if tkey is None or tkey not in state_dict:
            missing.append((coll,) + path)
            return tree
        used.add(tkey)
        w = state_dict[tkey]
        if path[-1] == "kernel" or path[-1] == "regular_conv_kernel":
            w = _conv_w(w)
        return np.asarray(w, dtype=np.asarray(tree).dtype)

    converted = {coll: build(coll, dict(tree))
                 for coll, tree in variables.items()}
    if missing:
        raise KeyError(f"unconverted flax leaves: {missing[:10]} "
                       f"({len(missing)} total)")
    unused = [k for k in state_dict
              if k not in used and not k.endswith("num_batches_tracked")]
    if unused:
        raise KeyError(f"unused torch keys: {unused[:10]} "
                       f"({len(unused)} total)")
    return converted


def torch_to_flax_file(pth_path: str, variables: Dict) -> Dict:
    """Load a ``.pth`` checkpoint with torch (CPU) and convert."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, variables)


def convert_backbone_imagenet(state_dict: Dict[str, np.ndarray],
                              variables: Dict) -> Dict:
    """Backbone-only ImageNet init with the reference's key remap
    ``layer{i}.`` -> ``layers.{i-1}.`` and strict=False semantics
    (reference backbone.py:211-224): keys that don't land in the backbone
    (fc.*, DCN offset convs) are ignored and the remaining variables keep
    their current (fresh) values."""
    remapped = {}
    for key, value in state_dict.items():
        m = re.match(r"layer(\d)\.(.*)", key)
        if m:
            key = f"layers.{int(m.group(1)) - 1}.{m.group(2)}"
        remapped["backbone." + key] = np.asarray(value)

    def build(coll, tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(coll, v, prefix + (k,)) for k, v in tree.items()}
        if prefix[0] != "backbone":
            return tree
        tkey = flax_path_to_torch_key(prefix)
        if tkey is None or tkey not in remapped:
            return tree
        w = remapped[tkey]
        if prefix[-1] in ("kernel", "regular_conv_kernel"):
            w = _conv_w(w)
        return np.asarray(w, dtype=np.asarray(tree).dtype)

    return {coll: build(coll, dict(tree))
            for coll, tree in variables.items()}
