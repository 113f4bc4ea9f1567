from dalle2_video_tpu.data.datasets import (
    BatchLoader,
    CelebVTextDataset,
    split_indices,
)
from dalle2_video_tpu.data.tokenizer import (
    CONTEXT_LENGTH,
    ClipBPETokenizer,
    get_tokenizer,
    tokenize,
)

__all__ = [
    "BatchLoader",
    "CelebVTextDataset",
    "CONTEXT_LENGTH",
    "ClipBPETokenizer",
    "get_tokenizer",
    "split_indices",
    "tokenize",
]
