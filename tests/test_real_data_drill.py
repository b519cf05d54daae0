"""`make real-data` turnkey drill e2e against a generated mini VOCdevkit
tree (VERDICT r04 #5): validate -> short CLI train -> all seven eval CLIs ->
checklist, so real-data day is a rehearsed command, not an improvisation."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def mini_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("drill_voc")
    base = root / "VOCdevkit" / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir(parents=True)
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)

    rng = np.random.RandomState(1)
    train_ids, val_ids = [], []
    for i in range(10):
        img_id = f"2026_{i:06d}"
        (train_ids if i < 5 else val_ids).append(img_id)
        w, h = rng.randint(40, 80), rng.randint(40, 80)
        PIL.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            base / "JPEGImages" / f"{img_id}.jpg")
        lab = rng.randint(0, 21, (h, w)).astype(np.uint8)
        lab[0, :] = 255
        p = PIL.fromarray(lab, mode="P")
        p.putpalette([c for j in range(256) for c in (j, 0, 0)])
        p.save(base / "SegmentationClass" / f"{img_id}.png")
    for name, ids in (("train.txt", train_ids), ("val.txt", val_ids)):
        with open(base / "ImageSets" / "Segmentation" / name, "w") as fh:
            fh.write("\n".join(ids))
    return str(root)


@pytest.mark.slow
def test_real_data_drill_end_to_end(mini_voc, tmp_path):
    from tools.real_data_drill import run_drill

    results = run_drill(
        mini_voc, str(tmp_path), dim=32, epochs=1, batch=2, n_branches=2,
        backbone="resnet50", lr=0.05)

    assert os.path.exists(results["checkpoint"] + ".json")
    # reference CSV schemas reached the disk for every eval CLI
    assert {"b1_mIoU", "b2_mIoU", "mIoU"} <= set(results["mIoU"])
    assert {"b1_count", "mIoU_out", "t"} <= set(results["br_ent"])
    assert {"b1_count", "mIoU_out"} <= set(results["br_sim"])
    assert {"b1_flops", "b2_flops", "b3_flops"} <= set(results["flops"])
    assert {"avg_flops", "n_imgs"} <= set(results["ee_op"])
    # eval_image wrote one palette PNG per exit next to the checkpoint dir
    out_dir = os.path.join(str(tmp_path), "drill_images")
    assert os.path.exists(os.path.join(out_dir, "2026_000000_b1.png"))


def test_real_data_drill_rejects_broken_tree(tmp_path):
    from tools.real_data_drill import run_drill

    with pytest.raises(SystemExit):
        run_drill(str(tmp_path / "nonexistent"), str(tmp_path), dim=32,
                  epochs=1, batch=2)
