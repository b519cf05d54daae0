"""Spatial partitioning (DP x SP) on the virtual 8-device CPU mesh.

The reference is strictly single-GPU; SP is part of this package's
TPU-native scaling surface: image height sharded over a 'space' mesh axis,
GSPMD inserting conv/pool halo exchanges.  These tests pin (a) mesh
construction/validation, (b) shard_batch placing (N, H, ...) arrays on
PartitionSpec('data', 'space'), and (c) numeric agreement of the SP eval
forward and train step with the pure-DP path on the same weights/batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ee_semantic_segmentation_tpu.parallel import (
    batch_space_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_mesh_2d,
    make_train_step,
    shard_batch,
    space_size,
)
from ee_semantic_segmentation_tpu.train.optim import sgd_momentum


def test_make_mesh_2d_shapes_and_validation():
    mesh = make_mesh_2d(sp=4)
    assert mesh.shape == {"data": 2, "space": 4}
    assert space_size(mesh) == 4
    assert space_size(make_mesh()) == 1
    mesh = make_mesh_2d(dp=4, sp=2)
    assert mesh.shape == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        make_mesh_2d(sp=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_mesh_2d(dp=2, sp=2)  # 2*2 != 8


def test_shard_batch_uses_space_axis():
    mesh = make_mesh_2d(dp=2, sp=4)
    images = np.zeros((4, 32, 32, 3), np.float32)
    labels = np.zeros((4, 32, 32), np.int32)
    odd_h = np.zeros((4, 30, 32), np.int32)  # H=30 not divisible by sp=4
    b = shard_batch(mesh, {"image": images, "label": labels, "odd": odd_h})
    want = batch_space_sharding(mesh)
    assert b["image"].sharding == want
    assert b["label"].sharding == want
    # falls back to data-only sharding, still correct
    assert np.asarray(b["odd"]).shape == (4, 30, 32)
    assert b["odd"].sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
        ndim=3,
    )


def test_sp_eval_forward_matches_single_device(tiny_model):
    """Height-sharded eval forward == unsharded forward (halo exchange is
    exact, not an approximation)."""
    model = tiny_model
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)

    ref = model.apply(variables, x, train=False)

    mesh = make_mesh_2d(dp=2, sp=4)
    fwd = make_eval_step(model, mesh)
    out = fwd(variables["params"], variables.get("batch_stats", {}), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_sp_train_step_matches_dp(tiny_model):
    """One fused train step on the ('data','space') mesh reproduces the pure
    DP step.  Elementwise parameter equality does NOT hold across mesh
    layouts (f32 reassociation in the BN-statistic reductions is amplified
    through the gradient: DP-vs-single-device shows the same ~4e-3 max-abs
    drift after one step), so assert what sharded training actually
    guarantees: equal loss, and an update in the same direction with the
    same magnitude.  Measured cos(dp, sp) = 0.9996, norm ratio 1.0004 on
    this config."""
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss

    model = tiny_model
    loss_obj = BrXEntropyLoss(ignore_index=5, b_reduction="sum", n_exits=2)

    rngnp = np.random.RandomState(1)
    images = rngnp.rand(8, 32, 32, 3).astype(np.float32)
    labels = rngnp.randint(0, 5, (8, 32, 32)).astype(np.int32)

    results = {}
    for name, mesh in (("dp", make_mesh()), ("sp", make_mesh_2d(dp=2, sp=4))):
        tx = sgd_momentum()
        state = create_train_state(
            model, tx, jax.random.PRNGKey(9), jnp.zeros((8, 32, 32, 3)), mesh=mesh
        )
        flat0, _ = jax.flatten_util.ravel_pytree(jax.device_get(state.params))
        step = make_train_step(model, loss_obj, tx, mesh=mesh)
        b = shard_batch(mesh, {"image": images, "label": labels})
        state, metrics = step(state, b["image"], b["label"], jnp.float32(0.05))
        flat1, _ = jax.flatten_util.ravel_pytree(jax.device_get(state.params))
        results[name] = (float(metrics["loss"]), np.asarray(flat1) - np.asarray(flat0))

    loss_dp, delta_dp = results["dp"]
    loss_sp, delta_sp = results["sp"]
    assert loss_sp == pytest.approx(loss_dp, rel=1e-4)
    cos = np.dot(delta_dp, delta_sp) / (
        np.linalg.norm(delta_dp) * np.linalg.norm(delta_sp)
    )
    assert cos > 0.995, cos
    ratio = np.linalg.norm(delta_sp) / np.linalg.norm(delta_dp)
    assert 0.99 < ratio < 1.01, ratio


def test_trainer_end_to_end_on_sp_mesh(tmp_path, monkeypatch):
    """The full train+eval orchestration accepts a ('data','space') mesh via
    kwargs['mesh'] — what the train CLIs' --sp flag wires up."""
    import os

    monkeypatch.chdir(tmp_path)
    from ee_semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset
    from ee_semantic_segmentation_tpu.ops.xentropy import BrXEntropyLoss
    from ee_semantic_segmentation_tpu.train.trainer import eval_deepv3

    loss = BrXEntropyLoss(ignore_index=21, b_reduction="sum", n_exits=3)
    kwargs = {
        "name": "tiny_sp",
        "res_dir": str(tmp_path),
        "input_dim": 32,
        "train_set": SyntheticSegDataset(size=32, n=8, num_classes=21, void=21, seed=0),
        "val_set": SyntheticSegDataset(size=32, n=4, num_classes=21, void=21, seed=1),
        "test_set": SyntheticSegDataset(size=32, n=4, num_classes=21, void=21, seed=2),
        "use_file": str(tmp_path / "msgs.txt"),
        "metrics": ["mIoU"],
        "minimize": False,
        "n_branches": 2,
        "count_branches": False,
        "backbone": "mobilenet_v3_large",
        "branch_params": {"nout_channels": 32, "atrous_rates": (2, 4, 6)},
        "classifier_mid": 32,
        "lr": 0.05,
        "num_epochs": 1,
        "batch_sizes": 8,
        "loss": loss,
        "use_scheduler": True,
        "nout_channels": 21,
        "skip": 0,
        "patience": 5,
        "val_batch": 4,
        "test_batch": 4,
        "mesh": make_mesh_2d(dp=4, sp=2),
    }
    saved = eval_deepv3(kwargs)
    assert saved and os.path.exists(saved + ".json")
    assert os.path.exists("mIoU_%d_branches_results.csv" % kwargs["n_branches"])


def test_train_cli_sp_flag_builds_2d_mesh():
    from ee_semantic_segmentation_tpu.cli.main_bradeepv3 import build_parser

    args = build_parser().parse_args(
        ["-d", "synthetic", "-D", "32", "-n", "2", "--sp", "2"]
    )
    assert args.sp == 2
    # default stays pure DP
    args = build_parser().parse_args(["-d", "synthetic"])
    assert args.sp == 1
