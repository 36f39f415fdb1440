"""Offline weight conversion: torch checkpoints → Flax param archives.

Usage:
    python -m atlaspatch_tpu.tools.convert_weights ENCODER SRC [--out DIR]
    python -m atlaspatch_tpu.tools.convert_weights sam2 model.pth [--out DIR]

Converts a downloaded source checkpoint (torchvision/timm/transformers/
open_clip naming — resolved per encoder family) into a .npz the runtime loads
directly from ATLASPATCH_WEIGHTS_DIR, avoiding torch at inference time.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def _flatten(tree: dict, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def convert_encoder(name: str, src: Path, out_dir: Path) -> Path:
    from atlaspatch_tpu.models.encoders.zoo import ENTRIES, _convert, _load_state_dict

    entry = ENTRIES[name]
    params = _convert(entry, _load_state_dict(src))
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{name}.npz"
    np.savez(out_path, **_flatten(params))
    return out_path


def convert_sam2(src: Path, out_dir: Path) -> Path:
    from atlaspatch_tpu.models.sam2.config import SAM2Config
    from atlaspatch_tpu.models.sam2.convert import load_checkpoint

    params = load_checkpoint(str(src), SAM2Config.tiny())
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "sam2_hiera_tiny.npz"
    np.savez(out_path, **_flatten(params))
    return out_path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("target", help="encoder name from the zoo, or 'sam2'")
    parser.add_argument("src", type=Path, help="source torch checkpoint path")
    parser.add_argument(
        "--out",
        type=Path,
        default=Path(os.environ.get("ATLASPATCH_WEIGHTS_DIR", "weights")),
    )
    args = parser.parse_args()
    if args.target == "sam2":
        out = convert_sam2(args.src, args.out)
    else:
        out = convert_encoder(args.target, args.src, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
