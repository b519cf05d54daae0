"""Per-exit palette-PNG qualitative dumps for arbitrary images.

Mirrors /root/reference/eval_image.py: load model(s), run images, save one
VOC-palette-colored PNG per exit as ``{net_id}_images/{img}_b{i}.png``
(eval_image.py:36-78) — same pseudo-palette formula
``(arange(21)[:, None] * [2^25-1, 2^15-1, 2^21-1]) % 255``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def voc_palette(n: int = 21) -> np.ndarray:
    base = np.array([2**25 - 1, 2**15 - 1, 2**21 - 1], np.int64)
    colors = (np.arange(n)[:, None] * base) % 255
    return colors.astype(np.uint8)


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate trained models.")
    p.add_argument("-M", "--models", nargs="+", default=[])
    p.add_argument("-i", "--images", nargs="+", default=[])
    p.add_argument("-v", "--verbose", action="store_true", default=False)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from PIL import Image

    from ee_semantic_segmentation_tpu.cli import common
    from ee_semantic_segmentation_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    colors = voc_palette()
    og_dir = os.getcwd()
    for model_path in args.models:
        net_id = common.net_id_of(model_path)
        if args.verbose:
            print(f"Started evaluation of {net_id}.")
        save_at = os.path.join(og_dir, f"{net_id}_images")
        os.makedirs(save_at, exist_ok=True)
        model, state = common.load_model(model_path)
        fwd = common.forward_fn(model, state)
        for img_path in args.images:
            if args.verbose:
                print(f"\tImage: {img_path}")
            pil = Image.open(os.path.join(og_dir, img_path)).convert("RGB")
            arr = np.asarray(pil, np.float32) / 255.0
            arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
            out = np.asarray(fwd(arr[None]))  # (E, 1, H, W, C)
            preds = out.argmax(-1)[:, 0].astype(np.uint8)  # (E, H, W)
            img_name = img_path.split("/")[-1].split(".")[0]
            for i in range(preds.shape[0]):
                r = Image.fromarray(preds[i], mode="P").resize(pil.size)
                r.putpalette(colors.reshape(-1))
                r.save(os.path.join(save_at, f"{img_name}_b{i + 1}.png"))
        if args.verbose:
            print(f"Finished {net_id} evalutation. Resulting images can be found @ {save_at}.")


if __name__ == "__main__":
    main()
