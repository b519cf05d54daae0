"""End-to-end CLI eval runs against a real saved checkpoint (synthetic data,
tiny MobileNetV3 model — shares compiled programs with test_cli.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    from ee_semantic_segmentation_tpu.models.branchy_deepv3 import (
        BranchyConfig,
        BranchyDeepLabV3,
    )
    from ee_semantic_segmentation_tpu.parallel import create_train_state
    from ee_semantic_segmentation_tpu.train import checkpoint as ckpt
    from ee_semantic_segmentation_tpu.train.optim import sgd_momentum

    cfg = BranchyConfig(
        backbone_depth=0, img_dim=32, n_branches=2, segment_ends=(8, 12),
        branch_channels=(80, 112), num_classes=21, backbone="mobilenet_v3_large",
        branch_params={"nout_channels": 32, "atrous_rates": (2, 4, 6)},
        classifier_mid=32,
    )
    model = BranchyDeepLabV3(config=cfg)
    state = create_train_state(
        model, sgd_momentum(), jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    d = tmp_path_factory.mktemp("ckpts")
    return ckpt.save_checkpoint(str(d), "tiny_eval", state, cfg)


@pytest.mark.slow
def test_eval_miou_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.eval_miou import main

    main(["-M", ckpt_path, "-c", "21", "-D", "32", "32", "-d", "synthetic",
          "-n", "2", "-s", "miou_out", "-b", "4"])
    assert os.path.exists("miou_out.csv")
    import pandas as pd

    df = pd.read_csv("miou_out.csv")
    assert {"b1_mIoU", "b2_mIoU", "mIoU"} <= set(df.columns)

    # --pallas_head: identical row values via the fused upsample+argmax head
    main(["-M", ckpt_path, "-c", "21", "-D", "32", "32", "-d", "synthetic",
          "-n", "2", "-s", "miou_pal", "-b", "4", "--pallas_head"])
    dfp = pd.read_csv("miou_pal.csv")
    for col in ("b1_mIoU", "b2_mIoU", "mIoU"):
        assert dfp[col].iloc[0] == pytest.approx(df[col].iloc[0], abs=1e-12)


@pytest.mark.slow
def test_eval_br_ent_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.eval_br_ent import main

    main(["-M", ckpt_path, "-c", "21", "-D", "32", "32", "-d", "synthetic",
          "-n", "2", "-t", "0.99", "-s", "ent_out", "-b", "4"])
    import pandas as pd

    df = pd.read_csv("ent_out.csv")
    need = {"b1_mIoU", "b1_count", "b2_mIoU", "b2_count", "mIoU_out",
            "count_out", "mIoU_gl", "out_gl", "t", "pool", "pool_size"}
    assert need <= set(df.columns)
    counts = df[["b1_count", "b2_count", "count_out"]].iloc[0].sum()
    assert counts == df["out_gl"].iloc[0] == 16


@pytest.mark.slow
def test_eval_flops_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.eval_flops import main

    main(["-M", ckpt_path, "-s", "32"])
    import pandas as pd

    df = pd.read_csv("2_branches_model_flops.csv")
    assert {"b1_flops", "b2_flops", "b3_flops"} <= set(df.columns)
    row = df.iloc[0]
    assert row["b1_flops"] < row["b2_flops"] < row["b3_flops"]


@pytest.mark.slow
def test_ee_dnn_op_ne_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.ee_dnn_op_ne import main

    main(["-M", ckpt_path, "-m", "ent", "-t", "0.99", "-s", "32", "32",
          "-d", "synthetic", "-n", "21"])
    import pandas as pd
    import glob

    files = glob.glob("ee_2_ent_lw_m2_res.csv")
    assert files
    df = pd.read_csv(files[0])
    assert {"avg_flops", "edge_flops", "mIoU", "n_imgs"} <= set(df.columns)
    assert df["n_imgs"].iloc[0] == 16
    # exit histogram columns sum to image count
    assert df[["e_1", "e_2", "out"]].iloc[0].sum() == 16

    # --engine masked: batched one-program engine, same schema; exits agree
    # with the sequential run (same gate semantics)
    from ee_semantic_segmentation_tpu.cli.ee_dnn_op_ne import main as main2

    main2(["-M", ckpt_path, "-m", "ent", "-t", "0.99", "-s", "32", "32",
           "-d", "synthetic", "-n", "21", "--engine", "masked", "-b", "4"])
    df2 = pd.read_csv(files[0])
    assert len(df2) == 2
    seq, msk = df2.iloc[0], df2.iloc[1]
    for col in ("e_1", "e_2", "out", "n_imgs"):
        assert msk[col] == seq[col], col
    assert msk["mIoU"] == pytest.approx(seq["mIoU"], rel=1e-6)
    # the masked engine's realized avg FLOPs can only be <= the sequential
    # engine's (which always also pays the final head for 'last')
    assert msk["avg_flops"] <= seq["avg_flops"] + 1e-6


@pytest.mark.slow
def test_eval_br_sim_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.eval_br_sim import main

    main(["-M", ckpt_path, "-c", "21", "-D", "32", "32", "-d", "synthetic",
          "-n", "2", "-m", "mse", "-t", "1e9", "-s", "sim_out", "-b", "4"])
    import pandas as pd

    df = pd.read_csv("sim_out.csv")
    # huge mse threshold: every image exits at the first gated position (b2)
    assert df["b2_count"].iloc[0] == 16 and df["count_out"].iloc[0] == 0


@pytest.mark.slow
def test_ee_dnn_op_cli_similarity(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.ee_dnn_op import main

    main(["-M", ckpt_path, "-m", "mse", "-t", "1e9", "-s", "32", "32",
          "-d", "synthetic", "-n", "21"])
    import glob

    import pandas as pd

    df = pd.read_csv(glob.glob("ee_2_mse_lw_m2_res.csv")[0])
    assert {"avg_flops", "avg_flops_2", "edge_flops_2", "ig_bk"} <= set(df.columns)
    # mse gate needs a reference exit: first firing chance is e_2
    assert df["e_2"].iloc[0] == 16


@pytest.mark.slow
def test_eval_br_images_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.cli.eval_br_images import main

    main(["-M", ckpt_path, "-c", "21", "-D", "32", "32", "-d", "synthetic",
          "-n", "2", "-m", "mse", "-t", "1e9", "-s", "img_out", "-b", "4"])
    import pandas as pd

    df = pd.read_csv("img_out.csv")
    assert df["b2_count"].iloc[0] == 16


@pytest.mark.slow
def test_eval_image_cli(ckpt_path, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from PIL import Image

    from ee_semantic_segmentation_tpu.cli.eval_image import main

    arr = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save("test_img.jpg")
    main(["-M", ckpt_path, "-i", "test_img.jpg"])
    out_dir = "tiny_eval_images"
    assert os.path.exists(os.path.join(out_dir, "test_img_b1.png"))
    assert os.path.exists(os.path.join(out_dir, "test_img_b3.png"))
    img = Image.open(os.path.join(out_dir, "test_img_b1.png"))
    assert img.size == (32, 32)
