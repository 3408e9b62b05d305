"""streaming/incremental_segments.py: C4 segment dedup as data
arrives — within-batch survivor rule, cross-batch store anti-join,
replay idempotence, and the file-source stream end to end."""

from __future__ import annotations

import json
import os

from automated_data_pipeline_spark.streaming.incremental_segments import (
    SegmentHashStore,
    dedup_segments_against_store,
    start_incremental_segment_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_segment_store_batches_and_replay(spark, tmp_path):
    store = SegmentHashStore(str(tmp_path / "seg_store"))
    # seg_words=2: doc 1 = [a b][c d], doc 2 = [a b][x y] — "a b" is a
    # within-batch duplicate, kept only at its (1, 0) survivor
    b1 = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    r1 = {r["doc_id"]: r for r in dedup_segments_against_store(
        spark, b1, store, seg_words=2, batch_key="k1").collect()}
    assert r1[1]["kept_text"] == "a b c d" and r1[1]["n_kept"] == 2
    assert r1[2]["kept_text"] == "x y"
    assert (r1[2]["n_segs"], r1[2]["n_kept"]) == (2, 1)

    # batch 2: "c d" and "x y" are corpus duplicates now; "p q" novel;
    # doc 4 is entirely boilerplate -> empty kept_text, still emitted
    b2 = _docs(spark, [(3, "c d p q"), (4, "x y a b")])
    r2 = {r["doc_id"]: r for r in dedup_segments_against_store(
        spark, b2, store, seg_words=2, batch_key="k2").collect()}
    assert r2[3]["kept_text"] == "p q"
    assert r2[4]["kept_text"] == "" and r2[4]["n_kept"] == 0

    # replay of k2: identical rows, store unchanged
    n_store = store.read(spark).count()
    replay = {r["doc_id"]: r for r in dedup_segments_against_store(
        spark, b2, store, seg_words=2, batch_key="k2").collect()}
    assert {d: (r["kept_text"], r["n_segs"], r["n_kept"])
            for d, r in replay.items()} == \
           {d: (r["kept_text"], r["n_segs"], r["n_kept"])
            for d, r in r2.items()}
    assert store.read(spark).count() == n_store


def test_segment_partial_tail_and_order_preserved(spark, tmp_path):
    store = SegmentHashStore(str(tmp_path / "seg_store2"))
    # 5 tokens at seg_words=2 -> [a b][c d][e]; all novel, original order
    out = dedup_segments_against_store(
        spark, _docs(spark, [(7, "a b c d e")]), store,
        seg_words=2, batch_key="k1",
    ).collect()
    assert out[0]["kept_text"] == "a b c d e"
    assert (out[0]["n_segs"], out[0]["n_kept"]) == (3, 3)


def test_incremental_segment_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    rows1 = [{"doc_id": 1, "text": "one fish two fish"},
             {"doc_id": 2, "text": "red fish blue fish"}]
    rows2 = [{"doc_id": 3, "text": "one fish new stuff"}]
    with open(os.path.join(src, "a.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows1))
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows2))

    store = SegmentHashStore(str(tmp_path / "seg"))
    out = str(tmp_path / "curated")
    q = start_incremental_segment_dedup(
        spark, src, store, out, str(tmp_path / "ckpt"), seg_words=2
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["kept_text"] == "one fish two fish"
    assert got[2]["kept_text"] == "red fish blue fish"
    # doc 3's "one fish" segment is corpus boilerplate by the time its
    # file lands; only the novel tail survives
    assert got[3]["kept_text"] == "new stuff"


def test_streaming_equals_batch_over_arbitrary_batch_splits(spark, tmp_path):
    """Feeding the corpus through the store in doc_id-ordered batches
    must reproduce the BATCH operator's survivor set exactly, no matter
    where the batch boundaries fall (the streaming variant is an
    incremental evaluation of the same rule, not an approximation)."""
    from automated_data_pipeline_spark.operators.spans import segment_dedup

    texts = [
        "a b c d a b",      # self + cross dup material
        "c d a b x y",
        "x y p q",
        "p q a b c d",
        "fresh words only here",
    ]
    full = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    batch_keep = {
        (r["doc_id"], r["seg_idx"]): r["keep"]
        for r in segment_dedup(full, "text", "doc_id", seg_words=2).collect()
    }

    for split in ([1], [2, 4], [1, 2, 3, 4]):
        store = SegmentHashStore(
            str(tmp_path / f"store_{'_'.join(map(str, split))}")
        )
        bounds = [0] + split + [len(texts)]
        streamed: dict[tuple[int, int], bool] = {}
        for bi in range(len(bounds) - 1):
            rows = [
                (i, texts[i]) for i in range(bounds[bi], bounds[bi + 1])
            ]
            if not rows:
                continue
            batch = spark.createDataFrame(rows, "doc_id long, text string")
            out = dedup_segments_against_store(
                spark, batch, store, seg_words=2, batch_key=f"k{bi}"
            ).collect()
            for r in out:
                toks = texts[r["doc_id"]].split(" ")
                n_segs = (len(toks) + 1) // 2
                assert r["n_segs"] == n_segs
                streamed[r["doc_id"]] = r
        # per-doc kept counts must match the batch survivor rule
        from collections import Counter

        batch_kept_per_doc = Counter(
            d for (d, _i), keep in batch_keep.items() if keep
        )
        for doc in range(len(texts)):
            assert streamed[doc]["n_kept"] == batch_kept_per_doc.get(doc, 0), (
                f"split {split}, doc {doc}"
            )


def test_segment_store_compact_preserves_dedup_state(spark, tmp_path):
    """Compacting the append-only store (inherited FingerprintStore
    machinery) must not lose or duplicate hashes: a post-compact batch
    still sees every earlier segment, and file count shrinks."""
    import os

    store = SegmentHashStore(str(tmp_path / "seg_store_c"))
    for bi, text in enumerate(["a b c d", "c d e f", "e f g h"]):
        dedup_segments_against_store(
            spark, _docs(spark, [(bi, text)]), store,
            seg_words=2, batch_key=f"k{bi}",
        ).collect()
    n_before = store.read(spark).count()
    files_before = sum(
        1 for f in os.listdir(store.path) if f.endswith(".parquet")
    )
    store.compact(spark, n_files=1)
    files_after = sum(
        1 for f in os.listdir(store.path) if f.endswith(".parquet")
    )
    assert files_after < files_before
    assert store.read(spark).count() == n_before
    # every earlier segment is still boilerplate; only "z z" is novel
    out = dedup_segments_against_store(
        spark, _docs(spark, [(9, "a b e f z z")]), store,
        seg_words=2, batch_key="k9",
    ).collect()
    assert out[0]["kept_text"] == "z z" and out[0]["n_kept"] == 1
