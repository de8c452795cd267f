"""Convert reference PyTorch checkpoints to tinyfaces_tpu parameter pytrees.

Handles two input flavors:
  * a reference training checkpoint (main.py:95-104): dict with a 'model'
    state_dict of DetectionModel — full detector weights;
  * a raw torchvision resnet101 ImageNet state_dict — backbone-only
    (score heads left at their fresh initialization).

Layout conversions (NCHW torch -> NHWC/HWIO flax):
  conv weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  bn weight/bias -> scale/bias;  running_mean/var -> batch_stats mean/var
  score4_upsample (C, C, 4, 4) dense ConvTranspose -> (4, 4, C) depthwise
  kernel by extracting the (always-diagonal, frozen-bilinear) channel
  diagonal; a non-diagonal kernel raises.

Usage:
  python tools/convert_torch_checkpoint.py ckpt.pth out.npz [--backbone-only]
then pass out.npz as --checkpoint / --pretrained-backbone.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: dict, path: list[str], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def convert_state_dict(sd: dict, prefix: str = "model.") -> dict:
    """torch state_dict -> {params, batch_stats} nested dicts."""
    params: dict = {}
    stats: dict = {}

    def backbone_path(name: str) -> list[str] | None:
        # conv1 / bn1 stem
        parts = name.split(".")
        if parts[0] in ("conv1", "bn1"):
            return ["backbone", parts[0]] + parts[1:]
        if parts[0].startswith("layer"):
            stage = parts[0]  # layer1..layer3
            if stage == "layer4":
                return None  # deleted in the reference (model.py:23)
            block = parts[1]
            rest = parts[2:]
            if rest[0] == "downsample":
                which = "downsample_conv" if rest[1] == "0" else "downsample_bn"
                return ["backbone", f"{stage}_{block}", which] + rest[2:]
            return ["backbone", f"{stage}_{block}"] + rest
        return None  # fc etc.

    for name, w in sd.items():
        w = np.asarray(w)
        if name.startswith(prefix):
            name = name[len(prefix):]
            path = backbone_path(name)
        elif name.startswith(("score_res3.", "score_res4.")):
            head, leaf = name.split(".")
            if leaf == "weight":
                _set(params, [head, "kernel"], _conv(w))
            else:
                _set(params, [head, "bias"], w)
            continue
        elif name.startswith("score4_upsample."):
            c = w.shape[0]
            diag = w[np.arange(c), np.arange(c)]  # (C, kh, kw)
            off_diag = w.copy()
            off_diag[np.arange(c), np.arange(c)] = 0
            if np.abs(off_diag).max() > 0:
                raise ValueError("score4_upsample has cross-channel weights; "
                                 "cannot express as depthwise")
            _set(params, ["score4_upsample", "kernel"], np.transpose(diag, (1, 2, 0)))
            continue
        else:
            path = backbone_path(name)

        if path is None:
            continue

        leaf = path[-1]
        if leaf == "weight":
            if w.ndim == 4:
                _set(params, path[:-1] + ["kernel"], _conv(w))
            else:  # BN gamma
                _set(params, path[:-1] + ["scale"], w)
        elif leaf == "bias":
            _set(params, path, w)
        elif leaf == "running_mean":
            _set(stats, path[:-1] + ["mean"], w)
        elif leaf == "running_var":
            _set(stats, path[:-1] + ["var"], w)
        # num_batches_tracked: dropped

    return {"params": params, "batch_stats": stats}


def convert_torch_checkpoint(path: str | Path, backbone_only: bool = False) -> dict:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model" in payload:
        sd = payload["model"]
        prefix = "model."
    else:
        sd = payload  # raw torchvision state_dict
        prefix = ""
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    out = convert_state_dict(sd, prefix=prefix)
    if backbone_only:
        out = {
            "params": {"backbone": out["params"]["backbone"]},
            "batch_stats": {"backbone": out["batch_stats"]["backbone"]},
        }
    return out


def main():
    parser = argparse.ArgumentParser("torch -> tinyfaces_tpu weight converter")
    parser.add_argument("checkpoint")
    parser.add_argument("out", help="output .npz")
    parser.add_argument("--backbone-only", action="store_true")
    args = parser.parse_args()

    from tinyfaces_tpu.utils.serialization import save_npz

    converted = convert_torch_checkpoint(args.checkpoint, args.backbone_only)
    save_npz(args.out, converted)
    n = sum(
        np.asarray(v).size
        for v in _leaves(converted)
    )
    print(f"Wrote {args.out} ({n / 1e6:.1f}M values)")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
