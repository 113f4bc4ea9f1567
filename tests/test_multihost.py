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


_CHILD_TRAIN = textwrap.dedent("""
    import json, sys
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

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.parallel import create_mesh, shard_batch
    from dalle2_video_tpu.parallel.sharded import (
        make_sharded_train_step, shard_state)
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S, EMB = 8, 2, 8, 16
    # single-resolution stage: a 2-stage unet compiled >12 min/child on
    # the 1-core CI host; dim_mults=(1,) keeps the REAL train path (loss,
    # optimizer, zero1 sharding, collectives) at a CI-viable compile size
    u = UNet3DConfig(dim=8, dim_mults=(1,), attn_heads=2, attn_dim_head=4,
                     num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
                     init_cross_embed=False, init_conv_ksize=3)
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(u,), frame_sizes=(S,), frame_numbers=(T,), timesteps=10,
        learned_variance=False))
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False))
    state = trainer.init_state(jax.random.PRNGKey(0))

    mesh = create_mesh()  # global (8, 1) across both processes
    step = make_sharded_train_step(trainer, mesh, 1, zero1=True,
                                   donate_state=False)
    st = shard_state(state, mesh)

    rng = np.random.RandomState(0)  # same GLOBAL batch on both hosts
    video = rng.rand(B, T, S, S, 3).astype(np.float32)
    emb = rng.randn(B, EMB).astype(np.float32)
    proc = jax.process_index()
    lo, hi = proc * 4, (proc + 1) * 4  # this host's slice of the batch
    vid_s, emb_s = shard_batch(mesh, (video[lo:hi], emb[lo:hi]))

    losses = []
    for i in (1, 2):
        st, loss = step(st, jax.random.PRNGKey(i), vid_s, emb_s)
        losses.append(float(loss))
    ck = float(jax.jit(lambda p: sum(
        jnp.sum(x) for x in jax.tree_util.tree_leaves(p)
    ))(st.params["unet_0"]))
    print("CHILD_RESULT " + json.dumps(
        {{"proc": proc, "losses": losses, "checksum": ck}}), flush=True)
""")


def _launch_pair(tmp_path, template, timeout=1500):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    procs = []
    for pid in (0, 1):
        script = tmp_path / f"child{pid}.py"
        script.write_text(template.format(root=str(ROOT), coord=coord, pid=pid))
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        # generous bound: the single-core CI host compiles each child's
        # train step serially, and concurrent load can triple compile time
        out, _ = p.communicate(timeout=timeout)
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("CHILD_RESULT ")]
        assert line, out[-3000:]
        outs.append(json.loads(line[-1][len("CHILD_RESULT "):]))
    return outs


def test_two_process_train_step_matches_single_process(tmp_path):
    """The REAL multihost training path (r3 verdict: 'a single 2-process
    test'): two processes of 4 devices run make_sharded_train_step over
    the global mesh, each feeding its process-LOCAL batch slice through
    shard_batch's make_array_from_process_local_data path. Both hosts
    must observe the identical global loss/params, and those must match
    a single-process 8-device run of the same global batch."""
    outs = _launch_pair(tmp_path, _CHILD_TRAIN)
    a, b = outs
    assert a["losses"] == b["losses"], (a, b)  # same global computation
    assert a["checksum"] == b["checksum"], (a, b)

    # single-process reference on this process's own 8-device CPU mesh
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.parallel import create_mesh, shard_batch
    from dalle2_video_tpu.parallel.sharded import (
        make_sharded_train_step, shard_state)
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S, EMB = 8, 2, 8, 16
    # single-resolution stage: a 2-stage unet compiled >12 min/child on
    # the 1-core CI host; dim_mults=(1,) keeps the REAL train path (loss,
    # optimizer, zero1 sharding, collectives) at a CI-viable compile size
    u = UNet3DConfig(dim=8, dim_mults=(1,), attn_heads=2, attn_dim_head=4,
                     num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
                     init_cross_embed=False, init_conv_ksize=3)
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(u,), frame_sizes=(S,), frame_numbers=(T,), timesteps=10,
        learned_variance=False))
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False))
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = create_mesh()
    step = make_sharded_train_step(trainer, mesh, 1, zero1=True,
                                   donate_state=False)
    st = shard_state(state, mesh)
    rng = np.random.RandomState(0)
    video = rng.rand(B, T, S, S, 3).astype(np.float32)
    emb = rng.randn(B, EMB).astype(np.float32)
    vid_s, emb_s = shard_batch(mesh, (video, emb))
    ref_losses = []
    for i in (1, 2):
        st, loss = step(st, jax.random.PRNGKey(i), vid_s, emb_s)
        ref_losses.append(float(loss))
    np.testing.assert_allclose(a["losses"], ref_losses, rtol=2e-4)
    ck = float(jax.jit(lambda p: sum(
        jnp.sum(x) for x in jax.tree_util.tree_leaves(p)
    ))(st.params["unet_0"]))
    np.testing.assert_allclose(a["checksum"], ck, rtol=2e-4)


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
