"""Training-shard writer round trip (VERDICT r3 item 5): pack → read →
exact token stream; batch iterator collate shape."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def packed_dir(ray_session, tmp_path_factory):
    import ray.data

    from address_parser_ray.pipelines.training import write_packed_shards

    rng = np.random.default_rng(11)
    words = ["spark", "merge", "join", "batch", "window", "agg", "scan"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(words, size=int(rng.integers(1, 40)))),
        }
        for i in range(137)
    ]
    docs = ray.data.from_pandas(pd.DataFrame(rows))
    out = str(tmp_path_factory.mktemp("shards"))
    manifest = write_packed_shards(docs, out, capacity=64, buckets=4)
    return out, manifest, pd.DataFrame(rows)


def test_manifest_covers_every_doc(packed_dir):
    out, manifest, rows = packed_dir
    assert manifest["train"]["n_docs"] + manifest["heldout"]["n_docs"] == len(rows)
    # T6 split rule
    assert manifest["heldout"]["n_docs"] == (rows["doc_id"] % 10 == 0).sum()


def test_token_stream_roundtrip_exact(packed_dir):
    """Concatenating shards per (split, bucket) in batch_id order must
    reproduce the EXACT token stream of the docs in doc_id order."""
    from address_parser_ray.pipelines.training import (
        _doc_token_ids,
        VOCAB_SIZE,
        read_packed,
    )

    out, _, rows = packed_dir
    for split in ("train", "heldout"):
        df = read_packed(out, split).to_pandas()
        assert (df["n_tokens"] == df["input_ids"].map(len)).all()
        for bucket, g in df.groupby("bucket"):
            g = g.sort_values("batch_id")
            got = [t for seq in g["input_ids"] for t in seq]
            sel = rows[
                (rows["doc_id"] % 4 == bucket)
                & ((rows["doc_id"] % 10 == 0) == (split == "heldout"))
            ].sort_values("doc_id")
            exp = [
                int(t)
                for text in sel["text"]
                for t in _doc_token_ids(text, VOCAB_SIZE)
            ]
            assert got == exp, (split, bucket)


def test_packing_respects_capacity_rule(packed_dir):
    """batch_id = tokens_before // capacity ⇒ every sequence except
    possibly the last of a bucket holds ≥ capacity - (max doc) tokens
    and starts exactly at its prefix boundary."""
    from address_parser_ray.pipelines.training import read_packed

    out, _, _ = packed_dir
    df = read_packed(out, "train").to_pandas()
    for _, g in df.groupby("bucket"):
        g = g.sort_values("batch_id")
        before = np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
        assert (before // 64 == g["batch_id"].to_numpy()).all()


def test_iter_packed_batches_collate(packed_dir):
    from address_parser_ray.pipelines.training import (
        PAD_ID,
        iter_packed_batches,
        read_packed,
    )

    out, _, _ = packed_dir
    total = 0
    for batch in iter_packed_batches(out, "train", batch_size=4):
        ids, mask = batch["input_ids"], batch["attention_mask"]
        assert ids.shape == mask.shape and ids.dtype == np.int32
        # padding exactly where mask is 0; no PAD under the mask
        assert (ids[mask == 0] == PAD_ID).all()
        assert (ids[mask == 1] != PAD_ID).all()
        total += ids.shape[0]
    assert total == read_packed(out, "train").count()


def test_iter_torch_batches_gated(packed_dir):
    from address_parser_ray.pipelines.training import iter_torch_batches

    out, _, _ = packed_dir
    try:
        import torch  # noqa: F401
        has_torch = True
    except ImportError:
        has_torch = False
    if has_torch:
        b = next(iter_torch_batches(out, "train"))
        assert hasattr(b["input_ids"], "dtype")
    else:
        with pytest.raises(ImportError):
            next(iter_torch_batches(out, "train"))
