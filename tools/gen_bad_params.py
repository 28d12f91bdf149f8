"""Extract the BAD learned box-pair constants from the reference repo into .npz data files.

The BAD descriptor ("Box Average Difference", Suarez et al.) uses *learned* box-pair
parameters — (x1, x2, y1, y2, radius) per pair plus a per-pair threshold — published with
the original BAD release and embedded in the reference at
`pytorch_model/descriptor/bad_params.py:4-1568`. These are learned model weights (pure
data, not code); we ship them as binary .npz artifacts the same way a framework ships a
checkpoint.

Run once against a checkout of the reference (read-only):

    python tools/gen_bad_params.py --reference /root/reference \
        --out onnx_image_processing_tpu/data

Produces `bad_params_256.npz` and `bad_params_512.npz`, each containing:
    box_params : (P, 5) float32 — columns (x1, x2, y1, y2, radius), raw 32x32-patch coords
    thresholds : (P,)  float32 — learned per-pair thresholds
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                  "onnx_image_processing_tpu", "data"))
    args = ap.parse_args()

    import numpy as np

    sys.path.insert(0, args.reference)
    from pytorch_model.descriptor.bad_params import _get_bad_learned_params

    os.makedirs(args.out, exist_ok=True)
    for num_pairs in (256, 512):
        box_params, thresholds = _get_bad_learned_params(num_pairs)
        path = os.path.join(args.out, f"bad_params_{num_pairs}.npz")
        np.savez_compressed(
            path,
            box_params=box_params.numpy().astype(np.float32),
            thresholds=thresholds.numpy().astype(np.float32),
        )
        print(f"wrote {path}: box_params {box_params.shape}, thresholds {thresholds.shape}")


if __name__ == "__main__":
    main()
