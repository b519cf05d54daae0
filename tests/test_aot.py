"""AOT serving artifacts (ee/aot.py): export -> serialize -> deserialize ->
run must reproduce the live model, including in a fresh process with no
model code imported."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def exported_forward(tiny_model, tiny_state, tmp_path_factory):
    from ee_semantic_segmentation_tpu.ee.aot import export_eval_forward, save_exported

    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    exp = export_eval_forward(tiny_model, variables, batch_size=2)
    path = str(tmp_path_factory.mktemp("aot") / "tiny_serving")
    save_exported(exp, path, {"head": "logits"})
    return tiny_model, variables, path


def test_export_roundtrip_matches_live_model(exported_forward):
    from ee_semantic_segmentation_tpu.ee.aot import load_exported, manifest_for

    model, variables, path = exported_forward
    exp = load_exported(path)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = exp.call(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    man = manifest_for(path)
    assert man["head"] == "logits"
    assert man["in_avals"][0]["shape"] == [2, 32, 32, 3]
    assert "cpu" in man["platforms"]


def test_exported_runs_without_model_code(exported_forward):
    """A fresh process with ONLY jax + the artifact (no model classes, no
    checkpoint) must produce the same logits — the deployment story."""
    model, variables, path = exported_forward
    x = np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    xp, op = path + "_x.npy", path + "_out.npy"
    np.save(xp, x)
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"blob = open({path + '.stablehlo'!r}, 'rb').read()\n"
        "exp = jax.export.deserialize(blob)\n"
        f"out = exp.call(jnp.asarray(np.load({xp!r})))\n"
        f"np.save({op!r}, np.asarray(out))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # keep the repo OFF the path: the artifact must not need our package
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=os.path.dirname(path),
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = np.load(op)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symbolic_batch_export_serves_any_batch(tiny_model, tiny_state, tmp_path):
    """batch_size=None exports a symbolic leading dim: the SAME artifact must
    serve N=1, 2 and 5, matching the live model at each size."""
    from ee_semantic_segmentation_tpu.ee.aot import (
        export_eval_forward,
        load_exported,
        manifest_for,
        save_exported,
    )

    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    exp = export_eval_forward(tiny_model, variables, batch_size=None)
    path = str(tmp_path / "tiny_poly")
    save_exported(exp, path, {"head": "logits"})
    loaded = load_exported(path)

    assert manifest_for(path)["in_avals"][0]["shape"][0] == "b"
    for n in (1, 2, 5):
        x = jnp.asarray(np.random.RandomState(n).rand(n, 32, 32, 3), jnp.float32)
        want = tiny_model.apply(variables, x, train=False)
        got = loaded.call(x)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_gated_symbolic_batch_rejects_pallas_head(tiny_model, tiny_state):
    from ee_semantic_segmentation_tpu.ee.aot import export_gated

    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    with pytest.raises(ValueError, match="symbolic batch"):
        export_gated(tiny_model, variables, None, tau=0.5, n_classes=5,
                     pallas_head=True)


def test_gated_export_matches_masked_engine(tiny_model, tiny_state, tmp_path):
    from ee_semantic_segmentation_tpu.ee.aot import (
        export_gated,
        load_exported,
        save_exported,
    )
    from ee_semantic_segmentation_tpu.ee.masked import make_masked_gated_apply

    variables = {"params": tiny_state.params, "batch_stats": tiny_state.batch_stats}
    kw = dict(tau=0.5, n_classes=5, skip=0, metric="ent")
    exp = export_gated(tiny_model, variables, batch_size=2, **kw)
    path = str(tmp_path / "tiny_gated")
    save_exported(exp, path, {"head": "gated"})

    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    live = make_masked_gated_apply(tiny_model, variables, pool="none", pool_size=1, **kw)
    want_labels, want_exits = live(x)
    got_labels, got_exits = load_exported(path).call(x)
    np.testing.assert_array_equal(np.asarray(got_exits), np.asarray(want_exits))
    np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(want_labels))
