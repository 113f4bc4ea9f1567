"""Serving subsystem: micro-batcher coalescing, engine bucketing, HTTP API.

The batcher/engine are JAX-free by design, so these tests use callables
that record dispatch shapes; the HTTP test drives a real ThreadingHTTPServer
end to end with a tiny jitted "sampler" to prove the full request path
(tokenize-free double — the real stack is wired in scripts/serve.py).
"""

from __future__ import annotations

import http.client
import json
import threading
import time
from concurrent.futures import wait

import numpy as np
import pytest

from dalle2_video_tpu.serve.batcher import MicroBatcher
from dalle2_video_tpu.serve.engine import GenerationEngine, GenRequest


# ------------------------------------------------------------------ #
# MicroBatcher
# ------------------------------------------------------------------ #
def test_batcher_coalesces_concurrent_requests():
    calls = []
    release = threading.Event()

    def run_batch(key, items):
        # first batch blocks until all stragglers are queued, so the
        # second dispatch must contain every remaining request
        if not calls:
            release.wait(timeout=5.0)
        calls.append(list(items))
        return [x * 10 for x in items]

    mb = MicroBatcher(run_batch, max_batch=8, max_wait_ms=50.0)
    futs = [mb.submit(i) for i in range(6)]
    release.set()
    done, _ = wait(futs, timeout=5.0)
    assert len(done) == 6
    assert sorted(f.result() for f in futs) == [0, 10, 20, 30, 40, 50]
    stats = mb.stats.snapshot()
    assert stats["requests"] == 6
    # strictly fewer dispatches than requests = coalescing happened
    assert stats["batches"] < 6
    assert stats["max_batch_size"] >= 2
    mb.close()


def test_batcher_groups_by_key():
    calls = []

    def run_batch(key, items):
        calls.append((key, list(items)))
        return items

    mb = MicroBatcher(
        run_batch, max_batch=8, max_wait_ms=30.0, key_fn=lambda it: it % 2
    )
    futs = [mb.submit(i) for i in range(6)]
    wait(futs, timeout=5.0)
    # every dispatched group is key-homogeneous
    for key, items in calls:
        assert {it % 2 for it in items} == {key}
    assert sorted(f.result() for f in futs) == list(range(6))
    mb.close()


def test_batcher_error_fails_batch_but_keeps_serving():
    def run_batch(key, items):
        if any(x < 0 for x in items):
            raise ValueError("negative")
        return items

    mb = MicroBatcher(run_batch, max_batch=1, max_wait_ms=1.0)
    bad = mb.submit(-1)
    with pytest.raises(ValueError):
        bad.result(timeout=5.0)
    ok = mb.submit(7)
    assert ok.result(timeout=5.0) == 7
    assert mb.stats.snapshot()["errors"] == 1
    mb.close()


def test_batcher_respects_max_batch():
    seen = []

    def run_batch(key, items):
        seen.append(len(items))
        time.sleep(0.01)
        return items

    mb = MicroBatcher(run_batch, max_batch=2, max_wait_ms=50.0)
    futs = [mb.submit(i) for i in range(7)]
    wait(futs, timeout=10.0)
    assert max(seen) <= 2
    mb.close()


# ------------------------------------------------------------------ #
# GenerationEngine
# ------------------------------------------------------------------ #
def _fake_generate(prompts, seeds, *, cond_scale, ddim_steps):
    b = len(prompts)
    # encode dispatch facts into the tensor so tests can assert on them
    video = np.full((b, 2, 4, 4, 3), float(cond_scale), np.float32)
    video[:, 0, 0, 0, 0] = np.asarray(seeds, np.float32)
    return video


def test_engine_pads_to_bucket_and_slices():
    dispatched = []

    def gen(prompts, seeds, **kw):
        dispatched.append(len(prompts))
        return _fake_generate(prompts, seeds, **kw)

    eng = GenerationEngine(gen, buckets=(1, 4), max_wait_ms=40.0)
    reqs = [GenRequest(f"p{i}", seed=i, cond_scale=2.0) for i in range(3)]
    futs = [eng.submit(r) for r in reqs]
    results = [f.result(timeout=5.0) for f in futs]
    # 3 requests ride one padded bucket-4 batch (or several bucket dispatches)
    assert all(d in (1, 4) for d in dispatched)
    for i, res in enumerate(results):
        assert res["video"].shape == (2, 4, 4, 3)  # per-request slice
        assert res["video"][1, 0, 0, 0] == 2.0     # cond_scale plumbed
    seeds_seen = sorted(r["video"][0, 0, 0, 0] for r in results)
    assert seeds_seen == [0.0, 1.0, 2.0]           # right row per request
    eng.close()


def test_engine_separates_trace_keys():
    keys_seen = []

    def gen(prompts, seeds, *, cond_scale, ddim_steps):
        keys_seen.append((cond_scale, ddim_steps))
        return _fake_generate(prompts, seeds, cond_scale=cond_scale,
                              ddim_steps=ddim_steps)

    eng = GenerationEngine(gen, buckets=(1, 2), max_wait_ms=30.0)
    f1 = eng.submit(GenRequest("a", cond_scale=1.0))
    f2 = eng.submit(GenRequest("b", cond_scale=3.0, ddim_steps=8))
    r1, r2 = f1.result(timeout=5.0), f2.result(timeout=5.0)
    assert r1["video"][1, 0, 0, 0] == 1.0
    assert r2["video"][1, 0, 0, 0] == 3.0
    # never batched across different trace keys
    assert all(k in [(1.0, None), (3.0, 8)] for k in keys_seen)
    eng.close()


def test_engine_warmup_compiles_each_bucket():
    shapes = []

    def gen(prompts, seeds, **kw):
        shapes.append(len(prompts))
        return _fake_generate(prompts, seeds, **kw)

    eng = GenerationEngine(gen, buckets=(1, 2, 4), default_cond_scale=2.5)
    timings = eng.warmup()
    assert sorted(timings) == [1, 2, 4]
    assert sorted(shapes) == [1, 2, 4]  # exactly the bucket shapes
    eng.close()


def test_engine_replica_pool_runs_groups_concurrently():
    """Multi-replica serving (one callable per device): two groups with
    DIFFERENT trace keys overlap in time on distinct replicas instead of
    serializing behind one device lock. Each replica callable blocks
    until the other has also entered — only true concurrency passes."""
    barrier = threading.Barrier(2, timeout=5.0)
    served = []

    def make_replica(tag):
        def gen(prompts, seeds, **kw):
            barrier.wait()  # deadlocks (-> Barrier timeout) if serialized
            served.append(tag)
            return _fake_generate(prompts, seeds, **kw)

        return gen

    eng = GenerationEngine(
        [make_replica("a"), make_replica("b")],
        buckets=(1,), max_wait_ms=5.0,
    )
    futs = [
        eng.submit(GenRequest("p0", cond_scale=1.0)),   # key 1
        eng.submit(GenRequest("p1", cond_scale=3.0)),   # key 2
    ]
    results = [f.result(timeout=10.0) for f in futs]
    assert sorted(served) == ["a", "b"]  # one group per replica
    # per-request video rows (b sliced off) carry their group's cond_scale
    assert {float(r["video"][1, 0, 0, 0]) for r in results} == {1.0, 3.0}
    eng.close()


def test_engine_multi_replica_warmup_compiles_every_replica():
    shapes = {"a": [], "b": []}

    def make_replica(tag):
        def gen(prompts, seeds, **kw):
            shapes[tag].append(len(prompts))
            return _fake_generate(prompts, seeds, **kw)

        return gen

    eng = GenerationEngine(
        [make_replica("a"), make_replica("b")], buckets=(1, 2),
    )
    timings = eng.warmup()
    assert sorted(timings) == [1, 2]
    # every replica compiled every bucket exactly once
    assert sorted(shapes["a"]) == [1, 2]
    assert sorted(shapes["b"]) == [1, 2]
    eng.close()


def test_engine_inpaint_stacks_rows_and_separates_from_plain():
    """Inpainting requests: tensors stack across the group (padding
    repeats the last row), the inpaint kwargs reach generate_batch, and
    plain requests never share a dispatch with inpainting ones (the
    trace key differs)."""
    calls = []

    def gen(prompts, seeds, *, cond_scale, ddim_steps, **extra):
        calls.append((len(prompts), dict(extra)))
        b = len(prompts)
        if "inpaint_video" in extra:
            iv, im = extra["inpaint_video"], extra["inpaint_mask"]
            assert iv.shape == (b, 2, 4, 4, 3) and im.shape == (b, 2, 1, 1, 1)
            # echo the known region so the test can assert row identity
            return iv * im
        return np.zeros((b, 2, 4, 4, 3), np.float32)

    eng = GenerationEngine(gen, buckets=(4,), max_wait_ms=40.0)
    try:
        rng = np.random.RandomState(0)
        vids = [rng.rand(2, 4, 4, 3).astype(np.float32) for _ in range(3)]
        mask = np.zeros((2, 1, 1, 1), np.float32)
        mask[0] = 1.0
        futs = [
            eng.submit(GenRequest(f"p{i}", seed=i, inpaint_video=v,
                                  inpaint_mask=mask))
            for i, v in enumerate(vids)
        ]
        futs.append(eng.submit(GenRequest("plain", seed=9)))
        res = [f.result(timeout=5.0) for f in futs]
        # right row of the stacked batch came back to each request
        for i in range(3):
            np.testing.assert_allclose(res[i]["video"][0], vids[i][0])
            np.testing.assert_allclose(res[i]["video"][1], 0.0)
        # plain dispatch carried no inpaint kwargs
        plain_calls = [c for c in calls if "inpaint_video" not in c[1]]
        inp_calls = [c for c in calls if "inpaint_video" in c[1]]
        assert plain_calls and inp_calls
        # every dispatch padded to the bucket
        assert all(n == 4 for n, _ in calls)
    finally:
        eng.close()

    with pytest.raises(ValueError):
        eng2 = GenerationEngine(gen, buckets=(1,))
        try:
            eng2.submit(GenRequest("x", inpaint_video=vids[0]))  # no mask
        finally:
            eng2.close()


# ------------------------------------------------------------------ #
# HTTP server end to end
# ------------------------------------------------------------------ #
def test_http_server_end_to_end():
    import jax
    import jax.numpy as jnp

    from dalle2_video_tpu.serve.server import make_server

    @jax.jit
    def tiny_sampler(seeds):
        # stand-in jitted "cascade": deterministic in the seeds
        base = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        return seeds[:, None, None, None, None].astype(jnp.float32) + base

    def gen(prompts, seeds, *, cond_scale, ddim_steps):
        return np.asarray(tiny_sampler(jnp.asarray(seeds)))

    eng = GenerationEngine(gen, buckets=(1, 2), max_wait_ms=20.0)
    httpd = make_server(eng, "127.0.0.1", 0, device_name="cpu-test")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health == {"status": "ok", "device": "cpu-test"}

        body = json.dumps({"prompt": "a person smiling", "seed": 5})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        res = json.loads(conn.getresponse().read())
        assert res["shape"] == [2, 4, 4, 3]
        import base64
        import io

        arr = np.load(io.BytesIO(base64.b64decode(res["data_b64"])))
        assert arr.shape == (2, 4, 4, 3)
        assert arr[0, 0, 0, 0] == 5.0  # seed plumbed through the sampler

        conn.request("GET", "/v1/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] >= 1

        # gif payload: decodes to a T-frame GIF (demo format). seed=0:
        # nonzero seeds saturate the toy sampler's clip to identical
        # all-white frames, which GIF encoders collapse into one
        body = json.dumps({"prompt": "p", "seed": 0, "format": "gif_b64"})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        res = json.loads(conn.getresponse().read())
        import imageio.v2 as imageio

        gif = imageio.mimread(
            io.BytesIO(base64.b64decode(res["gif_b64"])), format="gif"
        )
        assert len(gif) == 2 and gif[0].shape[:2] == (4, 4)

        # malformed request -> 400, not a crash
        conn.request("POST", "/v1/generate", "{}",
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_engine_negative_prompt_rides_as_row_data():
    """negative_prompt is per-row data under a presence-only trace key:
    rows with negatives batch together (whatever the strings are), rows
    without never join them, and generate_batch receives the aligned
    negative_prompts list."""
    calls = []

    def gen(prompts, seeds, *, cond_scale, ddim_steps, **extra):
        calls.append((list(prompts), dict(extra)))
        b = len(prompts)
        out = np.zeros((b, 2, 4, 4, 3), np.float32)
        if "negative_prompts" in extra:
            for i, np_ in enumerate(extra["negative_prompts"]):
                out[i, 0, 0, 0, 0] = float(len(np_))  # echo row alignment
        return out

    eng = GenerationEngine(gen, buckets=(4,), max_wait_ms=40.0)
    try:
        futs = [
            eng.submit(GenRequest("a", negative_prompt="xx")),
            eng.submit(GenRequest("b", negative_prompt="yyyy")),
            eng.submit(GenRequest("c")),
        ]
        res = [f.result(timeout=5.0) for f in futs]
        assert res[0]["video"][0, 0, 0, 0] == 2.0
        assert res[1]["video"][0, 0, 0, 0] == 4.0
        assert res[2]["video"][0, 0, 0, 0] == 0.0
        neg_calls = [c for c in calls if "negative_prompts" in c[1]]
        plain_calls = [c for c in calls if "negative_prompts" not in c[1]]
        assert neg_calls and plain_calls
        # padding repeated the last row's negative too
        for prompts, extra in neg_calls:
            assert len(extra["negative_prompts"]) == len(prompts)
    finally:
        eng.close()


def test_engine_long_video_groups_and_plumbs():
    """Long-video requests (engine/longvideo.py over serving): n_frames/
    overlap are trace-static — rows group by them, the kwargs reach
    generate_batch, and the response shape follows n_frames. Mixing
    n_frames with inpaint_video (or overlap without n_frames) is
    rejected at submit."""
    calls = []

    def gen(prompts, seeds, *, cond_scale, ddim_steps, **extra):
        calls.append(dict(extra))
        b = len(prompts)
        t = extra.get("n_frames") or 2
        return np.zeros((b, t, 4, 4, 3), np.float32)

    eng = GenerationEngine(gen, buckets=(4,), max_wait_ms=40.0)
    try:
        futs = [
            eng.submit(GenRequest("a", n_frames=9, overlap=2)),
            eng.submit(GenRequest("b", n_frames=9, overlap=2)),
            eng.submit(GenRequest("c", n_frames=5)),   # default overlap
            eng.submit(GenRequest("plain")),
        ]
        res = [f.result(timeout=5.0) for f in futs]
        assert res[0]["video"].shape == (9, 4, 4, 3)
        assert res[1]["video"].shape == (9, 4, 4, 3)
        assert res[2]["video"].shape == (5, 4, 4, 3)
        assert res[3]["video"].shape == (2, 4, 4, 3)
        long_calls = [c for c in calls if "n_frames" in c]
        assert {(c["n_frames"], c["overlap"]) for c in long_calls} == {
            (9, 2), (5, None)
        }
        # plain dispatch carried no long-video kwargs
        assert any("n_frames" not in c for c in calls)

        with pytest.raises(ValueError, match="mutually exclusive"):
            eng.submit(GenRequest(
                "x", n_frames=9,
                inpaint_video=np.zeros((2, 4, 4, 3), np.float32),
                inpaint_mask=np.zeros((2, 1, 1, 1), np.float32),
            ))
        with pytest.raises(ValueError, match="overlap requires"):
            eng.submit(GenRequest("x", overlap=2))
    finally:
        eng.close()


def test_http_long_video_round_trip():
    """n_frames/overlap parse from the JSON payload and the longer video
    comes back."""
    from dalle2_video_tpu.serve.server import make_server

    def gen(prompts, seeds, *, cond_scale, ddim_steps, **extra):
        b = len(prompts)
        t = extra.get("n_frames") or 2
        out = np.zeros((b, t, 4, 4, 3), np.float32)
        out[:, 0, 0, 0, 0] = float(extra.get("overlap") or -1)
        return out

    eng = GenerationEngine(gen, buckets=(1, 2), max_wait_ms=10.0)
    httpd = make_server(eng, "127.0.0.1", 0, device_name="cpu-test")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        import base64
        import io

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        body = json.dumps({"prompt": "long", "n_frames": 7, "overlap": 3})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        res = json.loads(conn.getresponse().read())
        assert res["shape"] == [7, 4, 4, 3]
        arr = np.load(io.BytesIO(base64.b64decode(res["data_b64"])))
        assert arr[0, 0, 0, 0] == 3.0  # overlap reached generate_batch

        # long video + inpainting in one request -> 400
        buf = io.BytesIO()
        np.save(buf, np.zeros((2, 4, 4, 3), np.float32))
        v64 = base64.b64encode(buf.getvalue()).decode("ascii")
        buf = io.BytesIO()
        np.save(buf, np.zeros((2, 1, 1, 1), np.float32))
        m64 = base64.b64encode(buf.getvalue()).decode("ascii")
        body = json.dumps({"prompt": "x", "n_frames": 7,
                           "inpaint_video_b64": v64,
                           "inpaint_mask_b64": m64})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


def test_http_inpaint_round_trip():
    """Inpainting over the HTTP API: .npy-b64 video+mask in, known region
    echoed back in the payload; missing mask -> 400."""
    import base64
    import io

    from dalle2_video_tpu.serve.server import make_server

    def gen(prompts, seeds, *, cond_scale, ddim_steps, **extra):
        b = len(prompts)
        if "inpaint_video" in extra:
            return extra["inpaint_video"] * extra["inpaint_mask"]
        return np.zeros((b, 2, 4, 4, 3), np.float32)

    def npy_b64(a):
        buf = io.BytesIO()
        np.save(buf, a)
        return base64.b64encode(buf.getvalue()).decode("ascii")

    eng = GenerationEngine(gen, buckets=(1, 2), max_wait_ms=10.0)
    httpd = make_server(eng, "127.0.0.1", 0, device_name="cpu-test")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        known = np.random.RandomState(3).rand(2, 4, 4, 3).astype(np.float32)
        mask = np.zeros((2, 1, 1, 1), np.float32)
        mask[0] = 1.0

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        body = json.dumps({
            "prompt": "extend this", "seed": 1,
            "inpaint_video_b64": npy_b64(known),
            "inpaint_mask_b64": npy_b64(mask),
        })
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        res = json.loads(conn.getresponse().read())
        arr = np.load(io.BytesIO(base64.b64decode(res["data_b64"])))
        np.testing.assert_allclose(arr[0], known[0], atol=1e-6)
        np.testing.assert_allclose(arr[1], 0.0)

        # video without mask -> 400
        body = json.dumps({"prompt": "x", "inpaint_video_b64": npy_b64(known)})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()

        # malformed base64 -> 400, not a crash
        body = json.dumps({"prompt": "x", "inpaint_video_b64": "!!notb64!!",
                           "inpaint_mask_b64": npy_b64(mask)})
        conn.request("POST", "/v1/generate", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
        eng.close()


# ------------------------------------------------------------------ #
# Data-parallel serving over the mesh
# ------------------------------------------------------------------ #
def test_data_parallel_sampler_matches_single_device(mesh8):
    """make_data_parallel_sampler: one dispatched group sharded over the
    mesh's data axis returns the exact samples of the single-device path
    (per-row keys make every row's draws key-pure)."""
    import jax

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.parallel.sharded import make_data_parallel_sampler
    from dalle2_video_tpu.utils import keys as keyutil

    emb_dim = 16
    unet = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=emb_dim,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(unet,), frame_sizes=(8,), frame_numbers=(2,),
        timesteps=6, sample_timesteps=(3,),
    ))
    params = dec.init_params(jax.random.PRNGKey(0))

    def sample_fn(emb, ks):
        return dec.sample(params, ks, video_embed=emb)

    emb = jax.random.normal(jax.random.PRNGKey(1), (8, emb_dim))
    ks = keyutil.batch_keys(list(range(100, 108)))

    ref = np.asarray(sample_fn(emb, ks))
    dp = make_data_parallel_sampler(sample_fn, mesh8)
    got = dp(emb, ks)
    # output is sharded over the data axis of the mesh
    assert len(got.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)

    with pytest.raises(AssertionError):
        dp(emb[:3], ks[:3])  # 3 does not divide the data axis (4)


def test_engine_with_data_parallel_callable(mesh8):
    """Engine integration: requests dispatched through a mesh-sharded
    generate_batch keep per-request seed reproducibility (bucket padding
    and grouping cannot change a row's sample)."""
    import jax
    import jax.numpy as jnp

    from dalle2_video_tpu.parallel.sharded import make_data_parallel_sampler
    from dalle2_video_tpu.utils import keys as keyutil

    def sample_fn(emb, ks):
        # toy "sampler": per-row noise + conditioning, key-pure per row
        return emb[:, None] * 0.1 + keyutil.normal(ks, (emb.shape[0], 4))[:, :, None]

    dp = make_data_parallel_sampler(sample_fn, mesh8)

    def generate_batch(prompts, seeds, *, cond_scale, ddim_steps):
        emb = jnp.asarray([[float(len(p))] * 2 for p in prompts])
        ks = keyutil.batch_keys(np.asarray(seeds, dtype=np.uint32))
        return np.asarray(dp(emb, ks))

    eng = GenerationEngine(generate_batch, buckets=(4, 8), max_wait_ms=20.0)
    try:
        futs = [eng.submit(GenRequest("ab", seed=7)),
                eng.submit(GenRequest("xyz", seed=9)),
                eng.submit(GenRequest("q", seed=11))]
        wait(futs, timeout=60)
        res = [f.result(timeout=5) for f in futs]
        assert all(r["bucket"] in (4, 8) for r in res)
        # the same request served solo returns the identical sample
        solo = eng.generate(GenRequest("xyz", seed=9), timeout=60)
        np.testing.assert_allclose(solo["video"], res[1]["video"], atol=1e-6)
    finally:
        eng.close()
