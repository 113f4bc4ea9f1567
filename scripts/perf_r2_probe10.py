"""Probe #10: graph-level W-packed stage representation candidates.

a. stride-1 (3,2)-kernel conv on the packed (N, H, W/2, 128) tensor that
   computes BOTH pixel parities (dense overhead 4/3, Cin=Cout=128) — the
   candidate to replace C=64 convs so XLA never sees a 64-lane tensor.
b. conv_transpose(2,2,stride 2) vs dense+pixel-shuffle for the upsample
   (kills the 7-D shuffle relayout copies seen in the profile).

Run:  nohup python scripts/perf_r2_probe10.py > runs/perf_r2_probe10.log 2>&1 &
"""
from __future__ import annotations

import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

LOG = "runs/perf_r2_probe10.jsonl"
K = 16


def record(name, ms, flops=None, **extra):
    row = {"name": name, "ms": round(ms, 4)}
    if flops:
        row["flops"] = flops
        row["tflops_per_s"] = round(flops / (ms / 1e3) / 1e12, 2)
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sync(x):
    return float(jax.device_get(x))


def bench_chain(name, op, x0, flops, iters=5):
    def chained(x):
        x, _ = jax.lax.scan(lambda c, _: (op(c), None), x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t0 = time.time()
    try:
        compiled = jax.jit(chained).lower(x0).compile()
    except Exception as e:
        record(name, -1.0, error=str(e)[:200])
        return
    print(f"{name}: compiled {time.time()-t0:.0f}s", flush=True)
    sync(compiled(x0))
    t0 = time.time()
    for _ in range(iters):
        out = compiled(x0)
    sync(out)
    record(name, (time.time() - t0) / iters / K * 1e3, flops=flops)


N, H, W, C = 256, 64, 64, 64
key = jax.random.PRNGKey(0)
w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.bfloat16) * 0.05
x = jax.random.normal(key, (N, H, W, C), jnp.bfloat16) * 0.1
flops = 2 * N * H * W * 9 * C * C


def pack_w_kernel(w):
    """w (3,3,C,C) -> Kp (3,2,2C,2C): packed-domain stride-1 conv kernel.
    Input lane block = [even-pixel C | odd-pixel C] of packed col m; taps
    cover packed cols m-1 (j=0) and m (j=1) plus m+1 via the SAME j axis?
    Receptive field of outputs (2m, 2m+1) spans w in [2m-1, 2m+2] =
    packed cols m-1..m+1 -> needs a (3,3) packed kernel, not (3,2):
      K[kh, 1+dj, p_in*C+ci, p_out*C+co] = w[kh, (2*dj+p_in) - p_out + 1, ci, co]
    valid when 0 <= 2*dj + p_in - p_out + 1 <= 2."""
    kp = jnp.zeros((3, 3, 2 * C, 2 * C), w.dtype)
    for dj in (-1, 0, 1):
        for p_in in (0, 1):
            for p_out in (0, 1):
                kw = 2 * dj + p_in - p_out + 1
                if 0 <= kw <= 2:
                    kp = kp.at[:, 1 + dj, p_in * C:(p_in + 1) * C,
                               p_out * C:(p_out + 1) * C].set(w[:, kw])
    return kp


kp = pack_w_kernel(w)
dense_flops_ratio = (3 * 3 * 2 * C * 2 * C) / (2 * 3 * 3 * C * C)
print(f"packed dense/semantic flops ratio: {dense_flops_ratio}", flush=True)

xp = x.reshape(N, H, W // 2, 2 * C)


def conv_plain(t):
    return jax.lax.conv_general_dilated(
        t, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_packed(t):
    return jax.lax.conv_general_dilated(
        t, kp, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


# correctness
ref = conv_plain(x).reshape(N, H, W // 2, 2 * C)
got = conv_packed(xp)
err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
record("packedW_correctness", 0.0, max_abs_err=err)

bench_chain("conv64_plain_again", conv_plain, x, flops)
bench_chain("conv64_packedW", conv_packed, xp, flops)


def packed_vjp(t):
    y, vjp = jax.vjp(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), t, kp)
    gx, gw = vjp(y * y)
    return gx * 1e-2 + t + jnp.sum(gw).astype(t.dtype) * 1e-9


bench_chain("conv64_packedW_vjp", packed_vjp, xp, 3 * flops)

# --- b. upsample: dense+shuffle vs conv_transpose --------------------- #
from dalle2_video_tpu.ops.video import pixel_shuffle_spatial

wd = jax.random.normal(jax.random.PRNGKey(2), (C, 4 * C), jnp.bfloat16) * 0.05
x5 = jax.random.normal(key, (16, 16, 32, 32, C), jnp.bfloat16) * 0.1
up_flops = 2 * 16 * 16 * 32 * 32 * C * 4 * C


def up_shuffle(t):
    y = jax.nn.silu(t @ wd)
    y = pixel_shuffle_spatial(y, 2)
    # chain: back down to input shape via strided slice
    return y[:, :, ::2, ::2, :C] + t


# conv_transpose equivalent: K2[s1, s2, ci, co] = wd[ci, co*4 + s1*2 + s2]
# (pixel_shuffle_spatial channel order is (c, s1, s2))
def make_kt(wd):
    w4 = jnp.transpose(wd.reshape(C, C, 2, 2), (2, 3, 0, 1))  # (2,2,C,C)
    return jnp.flip(w4, axis=(0, 1))  # conv_transpose applies flipped taps


kt = make_kt(wd)


def up_convt(t):
    b, tt, h, w_, c = t.shape
    y = jax.lax.conv_transpose(
        t.reshape(b * tt, h, w_, c), kt, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.silu(y).reshape(b, tt, 2 * h, 2 * w_, c)
    return y[:, :, ::2, ::2, :C] + t


# correctness of the transpose-conv formulation
ref_u = jax.nn.silu(pixel_shuffle_spatial(x5 @ wd, 2))
got_u = up_convt(x5) - x5
ref_u = ref_u[:, :, ::2, ::2, :C]
err_u = float(jnp.max(jnp.abs(ref_u.astype(jnp.float32) - got_u.astype(jnp.float32))))
record("convT_upsample_correctness", 0.0, max_abs_err=err_u)

bench_chain("upsample_dense_shuffle", up_shuffle, x5, up_flops)
bench_chain("upsample_conv_transpose", up_convt, x5, up_flops)

print("probe10 complete", flush=True)
