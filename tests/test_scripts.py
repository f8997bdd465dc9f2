"""Auxiliary script coverage: sharded-checkpoint consolidation
(scripts/consolidate_sharded_ckpt.py, the ds_zero_to_pl_ckpt.py parity tool).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "consolidate_sharded_ckpt.py")


def _save_orbax_tree(path):
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    tree = {
        "params": {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3),
                   "b": jnp.ones((3,), jnp.float32)},
        "step": jnp.asarray(7, jnp.int32),
    }
    ocp.PyTreeCheckpointer().save(path, tree)
    return tree


def test_consolidate_to_safetensors(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    _save_orbax_tree(ckpt)
    out = str(tmp_path / "consolidated.safetensors")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--ckpt-dir", ckpt, "--out", out, "--safetensors"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr

    from safetensors.numpy import load_file

    flat = load_file(out)
    # bf16 upcast to fp32 (ZeRO->fp32 parity semantics)
    assert flat["params/w"].dtype == np.float32
    np.testing.assert_array_equal(flat["params/w"], np.arange(6, dtype=np.float32).reshape(2, 3))
    assert int(np.asarray(flat["step"]).item()) == 7


def test_consolidate_to_orbax(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    _save_orbax_tree(ckpt)
    out = str(tmp_path / "consolidated")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--ckpt-dir", ckpt, "--out", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr

    import orbax.checkpoint as ocp

    tree = ocp.PyTreeCheckpointer().restore(out)
    np.testing.assert_array_equal(np.asarray(tree["params"]["w"]),
                                  np.arange(6, dtype=np.float32).reshape(2, 3))
