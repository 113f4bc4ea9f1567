"""Data layer tests: tokenizer contract, dataset stage detection, h5 lazy
loading, loader sharding/shuffling, preprocess end-to-end on synthetic mp4s."""

import numpy as np
import pytest

from dalle2_video_tpu.data import (
    BatchLoader,
    CelebVTextDataset,
    split_indices,
    tokenize,
)
from dalle2_video_tpu.data.tokenizer import EOT, SOT, ByteFallbackTokenizer


def test_tokenize_contract():
    toks = tokenize(["hello world", "a much longer sentence " * 30])
    assert toks.shape == (2, 77)
    assert toks.dtype == np.int32
    assert toks[0, 0] == SOT
    assert EOT in toks[0]
    # truncated row still ends with EOT
    assert toks[1, -1] == EOT


def test_tokenize_deterministic():
    a = tokenize("the same text")
    b = tokenize("the same text")
    np.testing.assert_array_equal(a, b)


def test_tokenize_no_truncate_raises():
    with pytest.raises(RuntimeError):
        tokenize(["word " * 100], truncate=False, tokenizer=ByteFallbackTokenizer())


@pytest.fixture(scope="module")
def h5_store(tmp_path_factory):
    import h5py

    d = tmp_path_factory.mktemp("data")
    path = d / "videos.h5"
    n, c, t, s = 10, 3, 4, 8
    rng = np.random.RandomState(0)
    data = rng.rand(n, c, t, s, s).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("videos", data=data)
    emb = rng.randn(n, 16).astype(np.float32)
    emb_path = d / "video_embeds.npy"
    np.save(emb_path, emb)
    toks = np.zeros((n, 77), np.int32)
    toks_path = d / "tokens.npy"
    np.save(toks_path, toks)
    return dict(videos=str(path), embeds=str(emb_path), tokens=str(toks_path), data=data)


def test_dataset_stage_detection(h5_store):
    ds_clip = CelebVTextDataset(
        texts_path=h5_store["tokens"], videos_path=h5_store["videos"]
    )
    assert ds_clip.stage == "CLIP"
    ds_dec = CelebVTextDataset(
        video_embeds_path=h5_store["embeds"], videos_path=h5_store["videos"]
    )
    assert ds_dec.stage == "decoder"
    ds_prior = CelebVTextDataset(
        text_embeds_path=h5_store["embeds"], video_embeds_path=h5_store["embeds"]
    )
    assert ds_prior.stage == "prior"
    with pytest.raises(ValueError):
        CelebVTextDataset(videos_path=h5_store["videos"])


def test_lazy_video_load_channels_last(h5_store):
    ds = CelebVTextDataset(
        video_embeds_path=h5_store["embeds"], videos_path=h5_store["videos"]
    )
    idx = np.array([3, 1, 7])
    batch = ds.batch_items(idx)
    vids = batch["videos"]
    assert vids.shape == (3, 4, 8, 8, 3)
    # order preserved despite sorted h5 read
    expected = np.transpose(h5_store["data"][[3, 1, 7]], (0, 2, 3, 4, 1))
    np.testing.assert_allclose(vids, expected)
    np.testing.assert_allclose(batch["video_embeds"], np.load(h5_store["embeds"])[idx])


def test_batch_loader_sharding(h5_store):
    ds = CelebVTextDataset(
        video_embeds_path=h5_store["embeds"], videos_path=h5_store["videos"]
    )
    l0 = BatchLoader(ds, batch_size=2, shuffle=False, shard_index=0, num_shards=2)
    l1 = BatchLoader(ds, batch_size=2, shuffle=False, shard_index=1, num_shards=2)
    b0 = [b["video_embeds"] for b in l0]
    b1 = [b["video_embeds"] for b in l1]
    assert len(b0) == len(b1) == 2  # 10 items / 2 shards / bs 2 (drop last)
    all0 = np.concatenate(b0)
    all1 = np.concatenate(b1)
    # disjoint shards
    assert not np.isin(all0[:, 0], all1[:, 0]).any()


def test_batch_loader_shuffle_reproducible(h5_store):
    ds = CelebVTextDataset(
        video_embeds_path=h5_store["embeds"], videos_path=h5_store["videos"]
    )
    a = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    b = BatchLoader(ds, batch_size=4, shuffle=True, seed=7)
    xa = next(iter(a))["video_embeds"]
    xb = next(iter(b))["video_embeds"]
    np.testing.assert_array_equal(xa, xb)
    # next epoch differs
    xa2 = next(iter(a))["video_embeds"]
    assert not np.array_equal(xa, xa2)


def test_split_indices_seeded():
    s1 = split_indices(100, 0.8, seed=1)
    s2 = split_indices(100, 0.8, seed=1)
    np.testing.assert_array_equal(s1["train"], s2["train"])
    assert len(s1["train"]) == 80 and len(s1["val"]) == 20
    assert len(np.intersect1d(s1["train"], s1["val"])) == 0


def test_preprocess_end_to_end(tmp_path):
    """Synthetic CelebV-Text corpus -> h5 + tokens (BASELINE preprocess config)."""
    cv2 = pytest.importorskip("cv2")
    from dalle2_video_tpu.data.preprocess import PreprocessConfig, run

    texts_root = tmp_path / "texts"
    videos_root = tmp_path / "videos"
    (texts_root / "face40_details_new").mkdir(parents=True)
    (texts_root / "emotion").mkdir()
    videos_root.mkdir()

    n_frames, size = 8, 32
    for i in range(3):
        name = f"clip{i}"
        (texts_root / "face40_details_new" / f"{name}.txt").write_text(
            f"a person number {i} with short hair"
        )
        (texts_root / "emotion" / f"{name}.txt").write_text("neutral emotion")
        vw = cv2.VideoWriter(
            str(videos_root / f"{name}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"),
            8,
            (48, 48),
        )
        rng = np.random.RandomState(i)
        for _ in range(n_frames):
            vw.write(rng.randint(0, 255, (48, 48, 3), np.uint8))
        vw.release()

    cfg = PreprocessConfig(
        texts_root=str(texts_root),
        videos_root=str(videos_root),
        out_h5=str(tmp_path / "out/videos.h5"),
        out_tokens=str(tmp_path / "out/tokens.npy"),
        seq_len=1,
        fps=n_frames,
        frame_size=size,
        normalize=False,
    )
    count, h5_path, tok_path = run(cfg)
    assert count == 3

    import h5py

    with h5py.File(h5_path) as f:
        assert f["videos"].shape == (3, 3, n_frames, size, size)
        assert f["videos"].dtype == np.float32
        v = f["videos"][0]
        assert 0.0 <= v.min() and v.max() <= 1.0
    toks = np.load(tok_path)
    assert toks.shape == (3, 77)

    # and the produced store feeds the dataset layer
    np.save(tmp_path / "emb.npy", np.zeros((3, 8), np.float32))
    ds = CelebVTextDataset(
        video_embeds_path=str(tmp_path / "emb.npy"), videos_path=h5_path
    )
    batch = ds.batch_items(np.array([0, 2]))
    assert batch["videos"].shape == (2, n_frames, size, size, 3)


def test_grain_loader(h5_store):
    """Grain pipeline: sharded, seeded, drop-remainder dict batches."""
    pytest.importorskip("grain")
    from dalle2_video_tpu.data.grain_pipeline import make_grain_loader

    ds = CelebVTextDataset(
        video_embeds_path=h5_store["embeds"], videos_path=h5_store["videos"]
    )
    loader = make_grain_loader(
        ds, batch_size=4, shuffle=True, seed=3, num_epochs=1, worker_count=0
    )
    batches = list(loader)
    assert len(batches) == 2  # 10 items, bs 4, drop remainder
    b = batches[0]
    assert b["videos"].shape == (4, 4, 8, 8, 3)
    assert b["video_embeds"].shape == (4, 16)
    # sharding yields disjoint halves
    l0 = make_grain_loader(ds, 2, shuffle=False, num_epochs=1, worker_count=0,
                           shard_index=0, num_shards=2)
    l1 = make_grain_loader(ds, 2, shuffle=False, num_epochs=1, worker_count=0,
                           shard_index=1, num_shards=2)
    e0 = np.concatenate([x["video_embeds"][:, 0] for x in l0])
    e1 = np.concatenate([x["video_embeds"][:, 0] for x in l1])
    assert not np.isin(e0, e1).any()


def _write_merges(path, merges):
    """Write a CLIP-format merges file (line 0 is a version header)."""
    import gzip

    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: synthetic\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def test_bpe_merge_semantics(tmp_path):
    """ClipBPETokenizer applies merges by rank with OpenAI CLIP's exact id
    layout: 256 byte tokens, 256 byte</w> tokens, merges at 512+rank,
    SOT/EOT last. Golden-checked by hand on a synthetic merges table."""
    from dalle2_video_tpu.data.tokenizer import ClipBPETokenizer

    path = str(tmp_path / "merges.txt.gz")
    # rank 0: t+h -> 'th'; rank 1: th+e</w> -> 'the</w>'; rank 2: h+e</w>
    _write_merges(path, [("t", "h"), ("th", "e</w>"), ("h", "e</w>")])
    tok = ClipBPETokenizer(path)

    # byte-token ids follow bytes_to_unicode order: printable ascii first,
    # so id('x') = ord(x) - 33 for ascii, id('x</w>') = 256 + that
    bid = lambda ch: ord(ch) - 33

    assert tok.encode("the") == [512 + 1]           # t+h, then th+e</w>
    assert tok.encode("he") == [512 + 2]            # h+e</w> (rank 2)
    assert tok.encode("ha") == [bid("h"), 256 + bid("a")]  # no merge applies
    assert tok.encode("a") == [256 + bid("a")]      # single char -> 'a</w>'
    # merge ORDER matters: in 'the', t+h (rank 0) fires before h+e</w>
    # (rank 2) even though both match the initial pair set
    assert tok.encode("the") != [bid("t"), 512 + 2]
    # specials sit at the end of the vocab (with the real 48894-merge asset
    # this layout puts them at exactly 49406/49407 = SOT/EOT)
    assert tok.encoder["<|startoftext|>"] == len(tok.encoder) - 2
    assert tok.encoder["<|endoftext|>"] == len(tok.encoder) - 1
    # case/whitespace normalization (clip.tokenize lowercases + collapses)
    assert tok.encode("  THE\n\the ") == tok.encode("the he")


def test_real_clip_vocab_golden_ids():
    """Exact OpenAI token ids — runs only when the real CLIP BPE asset is
    present (docs/PARITY.md records the fetch: same file as
    https://github.com/openai/CLIP clip/bpe_simple_vocab_16e6.txt.gz)."""
    from dalle2_video_tpu.data.tokenizer import _DEFAULT_BPE_PATHS, get_tokenizer

    if not any(__import__("os").path.exists(p) for p in _DEFAULT_BPE_PATHS):
        import pytest

        pytest.skip("real CLIP BPE vocab asset not present (no egress)")
    ids = tokenize(["a photo of a cat"], tokenizer=get_tokenizer())
    assert ids[0, :7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]


def test_config_embedded_interpolation(tmp_path):
    """${ref} resolves typed when it IS the value, and substitutes as text
    when embedded in a longer string (OmegaConf-style)."""
    from dalle2_video_tpu.utils.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text(
        "base: runs\n"
        "dim: 64\n"
        "typed: ${dim}\n"
        "run_dir: ${base}/decoder\n"
        "name: ${base}-${dim}\n"
        "nested:\n"
        "  inner: ${dim}\n"
        "  path: x/${nested.inner}/y\n"
    )
    cfg = load_config(str(p))
    assert cfg["typed"] == 64 and isinstance(cfg["typed"], int)
    assert cfg["run_dir"] == "runs/decoder"
    assert cfg["name"] == "runs-64"
    assert cfg["nested"]["path"] == "x/64/y"


def test_batchloader_propagates_worker_errors():
    """An IO error mid-epoch must FAIL the iteration, not truncate it
    silently (the old sentinel-on-finally swallowed worker exceptions)."""
    import pytest

    class Boom:
        def __len__(self):
            return 8

        def batch_items(self, sel):
            if int(np.asarray(sel)[0]) >= 4:
                raise IOError("corrupted shard")
            return {"x": np.zeros((len(sel), 1))}

    loader = BatchLoader(Boom(), batch_size=2, shuffle=False)
    with pytest.raises(IOError, match="corrupted shard"):
        list(loader)


def test_batchloader_early_abandon_does_not_hang():
    """Abandoning iteration early (next(iter(...))) must release the
    prefetch worker promptly instead of leaving it blocked on a full
    queue forever."""
    import threading
    import time

    class DS:
        def __len__(self):
            return 64

        def batch_items(self, sel):
            return {"x": np.zeros((len(sel), 1))}

    before = threading.active_count()
    for _ in range(4):
        next(iter(BatchLoader(DS(), batch_size=2, shuffle=False, prefetch=1)))
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch workers leaked"
