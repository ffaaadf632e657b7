"""Checkpoint roundtrip + best-file semantics (reference utils/model.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from eventad_tpu.utils import checkpoint as ckpt


def test_roundtrip(tmp_path, rng):
    tree = {"a": jnp.asarray(rng.randn(4, 3)),
            "b": (jnp.arange(5), {"c": jnp.ones((2, 2))})}
    ckpt.save_pytree(tmp_path / "x.npz", tree, {"epoch": 7})
    like = jax.tree.map(jnp.zeros_like, tree)
    back = ckpt.load_pytree(tmp_path / "x.npz", like)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.load_extra(tmp_path / "x.npz")["epoch"] == 7


def test_best_checkpoint_search(tmp_path):
    d = tmp_path / "models" / "exp_20260101_000000"
    d.mkdir(parents=True)
    tree = {"w": jnp.ones(3)}
    ckpt.save_checkpoint(d, tree, 3, 0.9, 0.5, True, False)
    # best_auc exists, best_ap doesn't -> best_auc wins over latest
    p = ckpt.find_best_checkpoint(str(tmp_path), "exp")
    assert p.name == "best_auc_model.npz"
    ckpt.save_checkpoint(d, tree, 4, 0.9, 0.6, False, True)
    p = ckpt.find_best_checkpoint(str(tmp_path), "exp")
    assert p.name == "best_ap_model.npz"
    # explicit path wins
    p = ckpt.find_best_checkpoint(str(tmp_path), "exp", "/explicit.npz")
    assert str(p) == "/explicit.npz"


def test_shape_mismatch_rejected(tmp_path):
    tree = {"w": jnp.ones((3,))}
    ckpt.save_pytree(tmp_path / "x.npz", tree)
    import pytest
    with pytest.raises(ValueError):
        ckpt.load_pytree(tmp_path / "x.npz", {"w": jnp.ones((4,))})
