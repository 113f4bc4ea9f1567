"""Production serving for text -> video generation (beyond reference).

The reference repo (SeanNobel/DALLE2-video) ships only offline scripts;
this subsystem makes the framework deployable: a continuous micro-batcher
that coalesces concurrent requests into static-shape bucketed batches
(XLA never recompiles in steady state), a generation engine that owns the
jitted sampler + warmup, and a dependency-free HTTP JSON API.
"""

from dalle2_video_tpu.serve.batcher import MicroBatcher
from dalle2_video_tpu.serve.engine import GenerationEngine
from dalle2_video_tpu.serve.server import serve_forever, make_server

__all__ = ["MicroBatcher", "GenerationEngine", "serve_forever", "make_server"]
