"""Checkpoint inspector CLI — show_model_content.lua.

Prints the config, metadata, and a pytree summary (leaf shapes/dtypes/param
counts) of any framework checkpoint.

Usage:  python -m ganreverser_tpu.cli.show logs/adversarial
"""
from __future__ import annotations

import sys

import jax
import numpy as np

from .. import io as gio
from ..models import count_parameters


def _summary(tree, prefix="", depth=0, max_depth=3):
    lines = []
    if isinstance(tree, dict) and depth < max_depth:
        for k, v in tree.items():
            lines += _summary(v, f"{prefix}/{k}", depth + 1, max_depth)
    elif hasattr(tree, "shape"):
        lines.append(f"  {prefix}: {tuple(tree.shape)} {tree.dtype}")
    else:
        n = count_parameters(tree) if isinstance(tree, dict) else "?"
        lines.append(f"  {prefix}: ... ({n} params)")
    return lines


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        sys.exit("usage: show <checkpoint-dir>")
    path = argv[0]
    tree, config, extra = gio.load_checkpoint(path)
    print(f"== checkpoint: {path}")
    print(f"-- extra: {extra}")
    print("-- config:")
    for k in sorted(config):
        print(f"   {k} = {config[k]}")
    print("-- contents:")
    for line in _summary(tree):
        print(line)
    for name in ("G", "D", "R"):
        if isinstance(tree, dict) and name in tree and "params" in tree[name]:
            print(f"-- {name}: {count_parameters(tree[name]['params'])} "
                  "parameters")


if __name__ == "__main__":
    main()
