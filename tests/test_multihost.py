"""Two-process multi-host simulation (VERDICT r2 #6; SURVEY §2d DCN row).

Drives the REAL multi-host wiring — jax.distributed.initialize over a local
coordinator, per-process BatchLoader sharding, and
shard_batch/make_array_from_process_local_data global-array assembly — with
two CPU processes of 4 virtual devices each (the JAX-native analogue of a
2-host slice; no TPU pod is available in this environment).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {root!r})

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address={coord!r},
        num_processes=2,
        process_id={pid},
        local_device_ids=list(range(4)),
    )
    import numpy as np
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()   # 2 procs x 4 local
    assert len(jax.local_devices()) == 4

    from dalle2_video_tpu.data.datasets import BatchLoader
    from dalle2_video_tpu.parallel.mesh import create_mesh, shard_batch

    # per-process loader shard: same global index set + seed on both hosts
    class _DS:
        def __len__(self):
            return 32
        def batch_items(self, idx):
            return {{"x": np.asarray(idx, np.float32)}}

    proc = jax.process_index()
    loader = BatchLoader(_DS(), 4, shuffle=True, seed=7,
                         shard_index=proc, num_shards=2)
    seen = []
    for batch in loader:
        seen.extend(np.asarray(batch["x"]).astype(int).tolist())

    # global-batch assembly: each host contributes its local slice; the
    # global array must equal the full batch on every process
    mesh = create_mesh()  # (8, 1) across both processes
    global_bs = 8
    full = np.arange(global_bs * 3, dtype=np.float32).reshape(global_bs, 3)
    local = full[proc * 4:(proc + 1) * 4]        # this host's slice
    arr = shard_batch(mesh, local)
    total = float(jax.jit(jnp.sum)(arr))
    shape = tuple(arr.shape)

    out = {{"proc": proc, "seen": sorted(seen), "sum": total,
            "shape": list(shape)}}
    print("CHILD_RESULT " + json.dumps(out), flush=True)
""")


def test_two_process_loader_shards_disjoint_and_global_batch(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    procs = []
    for pid in (0, 1):
        script = tmp_path / f"child{pid}.py"
        script.write_text(_CHILD.format(root=str(ROOT), coord=coord, pid=pid))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("CHILD_RESULT ")]
        assert line, out[-3000:]
        outs.append(json.loads(line[-1][len("CHILD_RESULT "):]))

    by_proc = {o["proc"]: o for o in outs}
    seen0, seen1 = set(by_proc[0]["seen"]), set(by_proc[1]["seen"])
    # host shards are DISJOINT and together cover the full index set
    assert not (seen0 & seen1), (seen0, seen1)
    assert seen0 | seen1 == set(range(32))
    # the assembled global array is identical on both processes: full batch
    expected_sum = float(sum(range(8 * 3)))
    for o in outs:
        assert o["shape"] == [8, 3], o
        assert abs(o["sum"] - expected_sum) < 1e-4, o
