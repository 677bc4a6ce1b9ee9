"""Emit reference-layout Torch7 ``.net`` fixtures for the on-device
import_t7 validation leg (VERDICT r4 item 6).

Builds the exact file layouts reference users hold — train.lua:256's
``adversarial.net`` {D, G, opt, epoch, plot_data, vis_noise_inputs} and
train_r.lua:234's ``r_*.net`` {R, opt} (plain + fixer) — with live
PyTorch weights serialized in torch layouts and the GPU nn.Copy wrappers
(models.lua:107-108 etc.), at an arbitrary geometry. The TPU session then
drives ``import_t7`` on them and runs sample/apply_r on the IMPORTED
checkpoints on the real chip, so the drop-in path is hardware-validated
end-to-end, not only CPU-parity-tested.

The serialized-module builders live in tests/test_torch7.py (single
source of truth with the parity tests); this script only composes files.

Usage: python benchmarks/make_t7_fixture.py OUT_DIR [--height 32]
       [--width 32] [--nd 32]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)  # the package, when run from elsewhere
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--height", type=int, default=32)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--nd", type=int, default=32)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    from test_torch7 import _r_torch, build_d2, build_g3, t7_bytes

    h, w, nd = args.height, args.width, args.nd
    opt = {"noiseDim": nd, "noiseMethod": "normal", "height": h,
           "width": w, "colorSpace": "rgb", "batchSize": 32, "seed": 1,
           "D_optmethod": "adam", "G_optmethod": "adam", "gpu": 0,
           "window": 3, "save": "logs", "dataset": "faces"}

    g = build_g3(nd=nd, h=h, w=w, cuda=True)
    d = build_d2(h=h, w=w, cuda=True)
    vis = np.random.default_rng(7).normal(size=(100, nd)).astype(
        np.float32)
    adv = os.path.join(args.out_dir, "adversarial.net")
    with open(adv, "wb") as f:
        f.write(t7_bytes({"G": g["tree"], "D": d["tree"], "opt": opt,
                          "epoch": 7, "plot_data": [[1, 0.5, 0.5]],
                          "vis_noise_inputs": vis}))
    print(f"[make_t7_fixture] {adv} (3x{h}x{w}, nd={nd})")

    for fixer in (False, True):
        r = _r_torch("normal", fixer=fixer, cuda=True, nd=nd, h=h, w=w)
        ropt = dict(opt)
        ropt["fixer"] = fixer
        name = f"r_3x{h}x{w}_nd{nd}_normal{'_fixer' if fixer else ''}.net"
        p = os.path.join(args.out_dir, name)
        with open(p, "wb") as f:
            f.write(t7_bytes({"R": r["tree"], "opt": ropt}))
        print(f"[make_t7_fixture] {p}")


if __name__ == "__main__":
    main()
