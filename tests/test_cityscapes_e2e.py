"""Cityscapes end-to-end with a generated leftImg8bit/gtFine tree
(driver configs #3/#4): reader trio, train CLI, eval CLI, non-square dims."""

import os

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

# all 19 mapped raw labelIds + some void ids, so every train class appears in
# GT (classes absent from GT∪pred give NaN IoU — reference default semantics,
# compute_mIoU.py:35 — which would make the dataset mIoU NaN)
_RAW_IDS = np.array(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33,
     0, 255], np.uint8,
)


def _make_city_tree(root, split, city, n, rng):
    img_dir = os.path.join(root, "leftImg8bit", split, city)
    lab_dir = os.path.join(root, "gtFine", split, city)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    for i in range(n):
        stem = f"{city}_{i:06d}_000019"
        w, h = rng.randint(50, 90), rng.randint(40, 70)
        img = PIL.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        img.save(os.path.join(img_dir, f"{stem}_leftImg8bit.png"))
        lab = _RAW_IDS[rng.randint(0, len(_RAW_IDS), (h, w))]
        PIL.fromarray(lab, mode="L").save(
            os.path.join(lab_dir, f"{stem}_gtFine_labelIds.png")
        )


@pytest.fixture(scope="module")
def city_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cityscapes"))
    rng = np.random.RandomState(0)
    _make_city_tree(root, "train", "aachen", 4, rng)
    _make_city_tree(root, "val", "frankfurt", 5, rng)
    return root


def test_cityscapes_reader_trio(city_root):
    from ee_semantic_segmentation_tpu.data.cityscapes import load_cityscapes_seg

    train, val, test = load_cityscapes_seg(city_root, 32)
    assert len(train) == 4
    assert len(val) == int(0.4 * 5) and len(val) + len(test) == 5

    img, lab = train.get(0, np.random.default_rng(0))
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert lab.shape == (32, 32) and lab.dtype == np.int32
    assert lab.max() <= 19  # void is 19, train ids 0..18

    # non-square (H, W)
    train_nq, _, _ = load_cityscapes_seg(city_root, (32, 64))
    img, lab = train_nq.get(0, np.random.default_rng(0))
    assert img.shape == (32, 64, 3) and lab.shape == (32, 64)


def test_cityscapes_load_dataset_dispatch(city_root):
    from ee_semantic_segmentation_tpu.data.loader import LoadDataset, dataset_class_info

    assert dataset_class_info("cityscapes") == (19, 19)
    hand = LoadDataset((32, 64), None, 2, 2)
    train_loader, _, test_loader = hand.get_dataset(city_root, "cityscapes")
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 32, 64, 3)
    assert batch["label"].shape == (2, 32, 64)
    assert batch["label"].max() <= 19


@pytest.mark.slow
def test_cityscapes_train_and_eval_cli(city_root, tmp_path, monkeypatch):
    """`main_bradeepv3 -d cityscapes` trains (19 classes, ignore=19) and
    `eval_mIoU -d cityscapes -c 19` evaluates the checkpoint."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("datasets", exist_ok=True)
    os.symlink(city_root, os.path.join("datasets", "cityscapes"))

    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import main as train_main

    ret = train_main([
        "-d", "cityscapes", "-t", "mobilenet", "-n", "1", "-N", "cs_tiny",
        "-e", "1", "-D", "32", "-b", "8", "-l", "0.05",
        "-p", str(tmp_path / "msgs.txt"),
    ])
    assert ret and os.path.exists(ret + ".json")

    import json

    cfg = json.load(open(ret + ".json"))["config"]
    assert cfg["num_classes"] == 19

    from ee_semantic_segmentation_tpu.cli.eval_miou import main as eval_main

    eval_main(["-M", ret, "-c", "19", "-D", "32", "32", "-d", "cityscapes",
               "-s", "cs_miou", "-b", "2"])
    import pandas as pd

    df = pd.read_csv("cs_miou.csv")
    assert "mIoU" in df.columns
    assert np.isfinite(df["mIoU"].iloc[0])


@pytest.mark.slow
def test_eval_miou_cli_non_square(city_root, tmp_path, monkeypatch):
    """-D H W with H != W flows through the eval CLI (round-1 silently used
    only dimensions[0]; the reference's -D takes two values)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("datasets", exist_ok=True)
    os.symlink(city_root, os.path.join("datasets", "cityscapes"))

    import jax
    import jax.numpy as jnp

    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train import checkpoint as ckpt
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg = BranchyConfig(
        backbone_depth=0, img_dim=(32, 64), n_branches=1, segment_ends=(8,),
        branch_channels=(80,), num_classes=19, backbone="mobilenet_v3_large",
        branch_params={"nout_channels": 32, "atrous_rates": (2, 4, 6)},
        classifier_mid=32,
    )
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3))
    )
    path = ckpt.save_checkpoint(str(tmp_path), "nq_eval", state, cfg)

    # config round-trips the (H, W) tuple through JSON
    assert ckpt.load_config(path).img_hw == (32, 64)

    from ee_semantic_segmentation_tpu.cli.eval_miou import main as eval_main

    eval_main(["-M", path, "-c", "19", "-D", "32", "64", "-d", "cityscapes",
               "-s", "nq_miou", "-b", "2"])
    import pandas as pd

    df = pd.read_csv("nq_miou.csv")
    assert np.isfinite(df["mIoU"].iloc[0])
