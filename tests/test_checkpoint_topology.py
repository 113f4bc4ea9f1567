"""Structure-free checkpoint restore must be topology-portable: a state
saved SHARDED over a mesh (pipelined/EP prior, multi-chip training) has to
load in a process with a different device layout (single-chip sampler /
server) through load_params_subtree. Regression for the orbax behavior of
replaying the SAVED shardings when no target template is given."""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

ROOT = Path(__file__).resolve().parent.parent


def test_load_params_subtree_prefers_ema(tmp_path):
    """A full training state carrying an EMA shadow: consumers get the
    shadow by default (dalle2-pytorch samples with the EMA model),
    prefer_ema=False selects the online params."""
    from dalle2_video_tpu.train.checkpoint import (
        RollingCheckpointManager, load_params_subtree,
    )

    online = {"w": jnp.ones((4,))}
    shadow = {"w": jnp.full((4,), 2.0)}
    state = {
        "params": online,
        "opt_state": {"mu": online},
        "ema": {"params": shadow, "step": jnp.asarray(5, jnp.int32)},
    }
    mgr = RollingCheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
    mgr.save(1, state)
    mgr.close()

    tmpl = {"w": jnp.zeros((4,))}
    got = load_params_subtree(str(tmp_path / "ck"), tmpl)
    np.testing.assert_allclose(np.asarray(got["w"]), 2.0)
    got = load_params_subtree(str(tmp_path / "ck"), tmpl, prefer_ema=False)
    np.testing.assert_allclose(np.asarray(got["w"]), 1.0)


def test_structure_free_restore_across_topologies(tmp_path, mesh8):
    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    w = jnp.arange(16.0).reshape(8, 2)
    params = {"w": jax.device_put(w, NamedSharding(mesh8, P("data")))}
    state = {"params": params, "opt_state": {"mu": params}}
    mgr = RollingCheckpointManager(str(tmp_path / "ck"), max_to_keep=1)
    mgr.save(1, state)
    mgr.close()

    # same-topology sanity (this process, 8 devices)
    from dalle2_video_tpu.train.checkpoint import load_params_subtree

    got = load_params_subtree(str(tmp_path / "ck"), {"w": jnp.zeros((8, 2))})
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(w))

    # child process with ONE cpu device (conftest's 8-device XLA_FLAGS
    # stripped) — the saved 8-device shardings cannot be replayed there
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 1, jax.devices()
import jax.numpy as jnp
import numpy as np
from dalle2_video_tpu.train.checkpoint import load_params_subtree
p = load_params_subtree(r"{tmp_path / 'ck'}", {{"w": jnp.zeros((8, 2))}})
np.testing.assert_allclose(np.asarray(p["w"]), np.arange(16.0).reshape(8, 2))
print("CHILD-RESTORE-OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "CHILD-RESTORE-OK" in r.stdout
