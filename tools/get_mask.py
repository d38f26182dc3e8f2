#!/usr/bin/env python
"""PNG mask -> 0/1 mask.npy converter (reference exp/inp_masks/get_mask.py
semantics: white pixels = kept, threshold at mid-gray, int mask saved as
.npy consumed by the inpainting operators)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description="convert a mask image to mask.npy")
    p.add_argument("src", help="mask image (white = keep)")
    p.add_argument("dst", nargs="?", default=None, help="output .npy (default: alongside src)")
    ns = p.parse_args(argv)

    import numpy as np
    from ddnm_tpu.data.io import load_mask

    # one source of truth for the threshold convention (data/io.py)
    mask = load_mask(ns.src).astype(np.int64)
    dst = Path(ns.dst) if ns.dst else Path(ns.src).with_suffix(".npy")
    np.save(dst, mask)
    print(f"wrote {dst} shape={mask.shape} kept={mask.mean():.3f}")


if __name__ == "__main__":
    main()
