"""Checkpoint save/restore, newest-step resume, GC, and the generalized
fine-tune surgery (conditioning-dim change keeps fresh init for exactly
the conditioned layers — audio_exp_nerf.py:498-514 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from idealnerf_tpu.ckpt import CheckpointManager, partial_restore
from idealnerf_tpu.models.face_nerf import FaceNeRFConfig, init_face_nerf


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "latent": jnp.ones((4, 2)),
        "step": jnp.asarray(7, jnp.int32),
    }
    mgr.save(7, tree)
    like = jax.tree.map(jnp.zeros_like, tree)
    back = mgr.restore(like)
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert int(back["step"]) == 7


def test_latest_step_and_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    tree = {"x": jnp.zeros(3)}
    for s in (5, 10, 15):
        mgr.save(s, {"x": jnp.full(3, float(s))})
    assert mgr.latest_step() == 15
    assert mgr.all_steps() == [10, 15]  # step 5 garbage-collected
    back = mgr.restore(tree)
    np.testing.assert_allclose(np.asarray(back["x"]), 15.0)


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    with pytest.raises(FileNotFoundError):
        mgr.restore({"x": jnp.zeros(2)})


def test_finetune_surgery_dim_change():
    """Checkpoint trained with dim_aud=64 restored into a dim_aud=32
    model: conditioned layers (trunk entry, post-skip, view entry) keep
    the fresh init; all other layers restore from the checkpoint."""
    old_cfg = FaceNeRFConfig(dim_aud=64, dim_expr=16, dim_latent=32)
    new_cfg = FaceNeRFConfig(dim_aud=32, dim_expr=16, dim_latent=32)
    old = init_face_nerf(jax.random.PRNGKey(0), old_cfg)
    fresh = init_face_nerf(jax.random.PRNGKey(1), new_cfg)

    merged, dropped = partial_restore(old, fresh)
    # unconditioned trunk layer restores from ckpt
    np.testing.assert_array_equal(
        np.asarray(merged["pts"][1]["w"]), np.asarray(old["pts"][1]["w"])
    )
    # conditioned layers keep fresh init (shape mismatch)
    np.testing.assert_array_equal(
        np.asarray(merged["pts"][0]["w"]), np.asarray(fresh["pts"][0]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged["pts"][5]["w"]), np.asarray(fresh["pts"][5]["w"])
    )
    dropped_paths = "\n".join(dropped)
    assert "pts/0/w" in dropped_paths and "pts/5/w" in dropped_paths
    # view entry layer unchanged here (expr dim identical) -> restored
    np.testing.assert_array_equal(
        np.asarray(merged["views"][0]["w"]), np.asarray(old["views"][0]["w"])
    )
    # exactly the two conditioned trunk layers dropped
    assert len(dropped) == 2, dropped


def test_ckpt_with_surgery_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    old_cfg = FaceNeRFConfig(dim_aud=64)
    old = init_face_nerf(jax.random.PRNGKey(0), old_cfg)
    mgr.save(100, {"coarse": old})
    fresh = {"coarse": init_face_nerf(jax.random.PRNGKey(1), FaceNeRFConfig(dim_aud=16))}
    merged, dropped = mgr.restore_partial(fresh)
    assert len(dropped) == 2
    np.testing.assert_array_equal(
        np.asarray(merged["coarse"]["pts"][3]["w"]),
        np.asarray(old["pts"][3]["w"]),
    )


def test_restore_variant_mismatch_error_names_subtrees(tmp_path):
    """A structure-mismatched restore names the differing subtrees and
    points at restore_partial (ROADMAP #8 ergonomics)."""
    import pytest

    from idealnerf_tpu.ckpt import CheckpointManager

    m = CheckpointManager(str(tmp_path))
    m.save(5, {"params": {"a": np.zeros((2, 3)), "extra": np.ones(4)}})
    like = {"params": {"a": np.zeros((2, 3)), "b": np.zeros(7)}}
    with pytest.raises(ValueError) as ei:
        m.restore(like)
    msg = str(ei.value)
    assert "restore_partial" in msg
    assert "params/extra" in msg and "params/b" in msg
