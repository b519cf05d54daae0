"""VOC reader end-to-end with a generated VOCdevkit tree (no download)."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    base = root / "VOCdevkit" / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir(parents=True)
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)

    rng = np.random.RandomState(0)
    train_ids, val_ids = [], []
    for i in range(6):
        img_id = f"2026_{i:06d}"
        (train_ids if i < 3 else val_ids).append(img_id)
        w, h = rng.randint(40, 80), rng.randint(40, 80)
        img = PIL.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        img.save(base / "JPEGImages" / f"{img_id}.jpg")
        lab = rng.randint(0, 21, (h, w)).astype(np.uint8)
        lab[0, :] = 255  # void border
        p = PIL.fromarray(lab, mode="P")
        p.putpalette([c for i3 in range(256) for c in (i3, 0, 0)])
        p.save(base / "SegmentationClass" / f"{img_id}.png")
    with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as fh:
        fh.write("\n".join(train_ids))
    with open(base / "ImageSets" / "Segmentation" / "val.txt", "w") as fh:
        fh.write("\n".join(val_ids))
    return str(root)


def test_voc_reader_end_to_end(voc_root):
    from ee_semantic_segmentation_tpu.data.voc import load_voc_seg

    train, val, test = load_voc_seg(voc_root, input_dim=32)
    assert len(train) == 3
    assert len(val) + len(test) == 3
    assert len(val) == int(0.4 * 3)

    img, lab = train.get(0, np.random.default_rng(0))
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert lab.shape == (32, 32) and lab.dtype == np.int32
    assert lab.max() <= 21  # 255 remapped to void=21
    assert (lab == 21).any() or True  # void may be cropped away

    # eval subsets use untransformed-augmentation path
    img_v, lab_v = val.get(0)
    assert img_v.shape == (32, 32, 3)


def test_voc_loader_batching(voc_root):
    from ee_semantic_segmentation_tpu.data.loader import LoadDataset

    hand = LoadDataset(32, None, 2, 2)
    train_loader, val_loader, test_loader = hand.get_dataset(voc_root, "voc_seg")
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["label"].shape == (2, 32, 32)


def test_missing_dataset_raises(tmp_path):
    from ee_semantic_segmentation_tpu.data.voc import VOCSegmentation

    with pytest.raises(FileNotFoundError):
        VOCSegmentation(str(tmp_path), "train")


def test_cityscapes_label_mapping():
    from ee_semantic_segmentation_tpu.data.cityscapes import (
        NUM_CLASSES,
        VOID,
        label_to_train_ids,
    )

    raw = np.array([[7, 8, 0], [26, 33, 255]], np.uint8)
    out = label_to_train_ids(raw)
    assert out[0, 0] == 0 and out[0, 1] == 1  # road, sidewalk
    assert out[1, 0] == 13 and out[1, 1] == 18  # car, bicycle
    assert out[0, 2] == VOID and out[1, 2] == VOID
    assert NUM_CLASSES == 19
