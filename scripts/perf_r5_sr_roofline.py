"""Round-5: memory roofline + per-op attribution of the cascade SR train
step (VERDICT r4 #3 — the SR stage benched at 13.7% MFU, half the
flagship's proven 26.9% memory roofline, with zero byte analysis).

Applies the r3 roofline methodology (scripts/perf_r3_roofline.py) to the
SR step exactly as benched by scripts/bench_all.py::bench_cascade_sr
(64f x 128px dim-32 unet, memory_efficient, policy via
CASCADE_REMAT_POLICY):

  parent: one subprocess per variant — an SR-step OOM wedges the axon
          device state for the rest of the process (CLAUDE.md), so
          variants never share a process
  child:  1) streaming-saxpy HBM bandwidth on THIS chip (denominator)
          2) XLA post-fusion cost_analysis: bytes accessed + flops
          3) memory_analysis: peak temp HBM
          4) fresh timing -> roofline floors + overhead ratio
          5) (profile variants only) jax.profiler device trace,
             per-op totals bucketed by op family (probe5 methodology)

Variants: nothing_b4 (the shipped bench config, profiled) and conv_b4
(the byte-favored policy from the r4 flagship sweep). The companion
remat-policy *timing* A/B runs separately via the queue
(CASCADE_REMAT_POLICY=conv bench_all.py cascade_sr).

Run:  python scripts/perf_r5_sr_roofline.py              # all variants
Writes evidence/perf_r5/sr_roofline.jsonl (appended, one row per record).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_DIR = "evidence/perf_r5"
LOG = os.path.join(OUT_DIR, "sr_roofline.jsonl")
TRACE_DIR = "runs/profile_r5_sr"

VARIANTS = [
    # (policy, batch, profile?) — conv first: the r5 A/B measured it 5%
    # faster than "nothing" at B=4 (285.5 vs 300.5 ms) and it is now the
    # shipped default; profile BOTH so the recompute delta is visible in
    # the op buckets.
    ("conv", 4, True),
    ("nothing", 4, True),
]


def record(**row):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def measure_hbm_bw():
    """Streaming saxpy read+write bandwidth (r3 methodology, smaller
    buffer: the SR step itself wants most of HBM afterwards)."""
    import jax
    import jax.numpy as jnp

    n = 1 << 29  # 0.5 Gi bf16 elements = 1 GiB
    x = jnp.ones((n,), jnp.bfloat16)
    K = 8

    @jax.jit
    def saxpy(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-6), ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c[:128].astype(jnp.float32))

    float(jax.device_get(saxpy(x)))  # compile+warm
    t0 = time.time()
    float(jax.device_get(saxpy(x)))
    dt = (time.time() - t0) / K
    bw = 2 * 2 * n / dt
    record(name="hbm_bw_saxpy_rw", gbps=round(bw / 1e9, 1),
           ms_per_pass=round(dt * 1e3, 2))
    del x
    return bw


def profile_step(compiled, state, tag):
    """Capture a 3-step device trace and bucket per-op totals."""
    import jax

    st = state
    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            st, loss = compiled(st, jax.random.PRNGKey(50 + i))
        float(jax.device_get(loss))

    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    if not paths:
        record(name="profile", variant=tag, error="no xplane files")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    totals = defaultdict(float)
    counts = defaultdict(int)
    for plane in space.planes:
        if not ("TPU" in plane.name or "/device" in plane.name.lower()):
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if "XLA Op" not in line.name and "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1

    def bucket(op: str) -> str:
        o = op.lower()
        if "convolution" in o or "conv" in o:
            return "conv"
        if "flash" in o or "pallas" in o or "custom-call" in o:
            return "pallas/custom"
        if "dot" in o or "einsum" in o:
            return "matmul"
        if "reduce" in o:
            return "reduce"
        if "transpose" in o or "copy" in o or "reshape" in o or "bitcast" in o:
            return "layout/copy"
        if "scatter" in o or "gather" in o or "dynamic" in o:
            return "gather/scatter"
        if "fusion" in o or "loop" in o:
            return "fusion_other"
        return "other"

    buckets = defaultdict(float)
    for op, ms in totals.items():
        buckets[bucket(op)] += ms
    n_steps = 3
    record(name="profile_buckets", variant=tag,
           ms_per_step={k: round(v / n_steps, 2)
                        for k, v in sorted(buckets.items(),
                                           key=lambda kv: -kv[1])})
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:60]
    for op, ms in top:
        record(name="profile_op", variant=tag, op=op[:160],
               ms_per_step=round(ms / n_steps, 3), count=counts[op],
               bucket=bucket(op))


def run_child(policy: str, batch: int, profile: bool):
    os.environ["CASCADE_REMAT_POLICY"] = policy
    import jax

    from bench import peak_flops_for
    from bench_all import _cascade_decoder

    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    tag = f"{policy}_b{batch}"
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; variant {tag}", flush=True)
    bw = measure_hbm_bw()

    dec, T2, S2 = _cascade_decoder()
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (batch, T2, S2, S2, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (batch, 512))
    step = jax.jit(lambda s, r: trainer.train_step(
        s, r, video, video_embed=emb, unet_number=2))
    t0 = time.time()
    compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    print(f"compile: {time.time()-t0:.0f}s", flush=True)

    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    try:
        mem = compiled.memory_analysis()
        peak_mb = round((mem.argument_size_in_bytes + mem.output_size_in_bytes
                         + mem.temp_size_in_bytes) / 2**20, 1)
        temp_mb = round(mem.temp_size_in_bytes / 2**20, 1)
    except Exception as e:  # noqa: BLE001
        peak_mb, temp_mb = None, str(e)[:120]

    st = state
    for _ in range(3):
        st, loss = compiled(st, jax.random.PRNGKey(4))
    float(jax.device_get(loss))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        st, loss = compiled(st, jax.random.PRNGKey(4))
    float(jax.device_get(loss))
    dt = (time.time() - t0) / iters

    peak = peak_flops_for(dev)
    frames = batch * T2
    t_compute = flops / peak
    t_mem = bytes_acc / bw if bw else 0.0
    record(name="sr_roofline", variant=tag, policy=policy, batch=batch,
           ms=round(dt * 1e3, 1), frames_per_s=round(frames / dt, 1),
           mfu_pct=round(flops / dt / peak * 100, 1),
           flops=flops, gb_accessed=round(bytes_acc / 1e9, 2),
           gb_per_frame=round(bytes_acc / 1e9 / frames, 3),
           hbm_bw_gbps=round(bw / 1e9, 1),
           compute_floor_ms=round(t_compute * 1e3, 1),
           memory_floor_ms=round(t_mem * 1e3, 1),
           roofline_floor_ms=round(max(t_compute, t_mem) * 1e3, 1),
           overhead_ratio=round(dt / max(t_compute, t_mem), 2),
           peak_hbm_mb=peak_mb, temp_hbm_mb=temp_mb)

    if profile:
        profile_step(compiled, st, tag)
    print(f"variant {tag} complete", flush=True)


def main():
    child = os.environ.get("SR_ROOFLINE_CHILD")
    if child:
        policy, b, prof = child.split(":")
        run_child(policy, int(b), prof == "1")
        return
    for policy, batch, profile in VARIANTS:
        env = dict(os.environ,
                   SR_ROOFLINE_CHILD=f"{policy}:{batch}:{int(profile)}")
        rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                             env=env)
        if rc != 0:
            record(name="sr_roofline", variant=f"{policy}_b{batch}",
                   error=f"child rc={rc}")
    print("sr roofline sweep complete", flush=True)


if __name__ == "__main__":
    main()
