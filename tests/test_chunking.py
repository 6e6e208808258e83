"""Chunking + packing: hand-computed boundaries and pack bins."""

import pytest


def test_chunk_boundaries_hand_computed(spark):
    from ds2_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(130))),
            (2, "a b c"),
            (3, ""),
            (4, None),
            (5, " ".join(f"u{i}" for i in range(64))),   # exactly one chunk
            (6, " ".join(f"v{i}" for i in range(65))),   # boundary +1
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(docs, chunk_tokens=64, overlap=8).collect()
    }
    # 130 tokens, stride 56: chunks of 64 / 64 / 18 at starts 0/56/112
    assert rows[(1, 0)]["n_tokens"] == 64
    assert rows[(1, 0)]["chunk_text"].startswith("t0 t1 ")
    assert rows[(1, 1)]["n_tokens"] == 64
    assert rows[(1, 1)]["chunk_text"].startswith("t56 ")
    assert rows[(1, 2)]["n_tokens"] == 18
    assert rows[(1, 2)]["chunk_text"].endswith(" t129")
    assert (1, 3) not in rows
    # overlap: last 8 tokens of chunk 0 reappear at the head of chunk 1
    tail0 = rows[(1, 0)]["chunk_text"].split()[-8:]
    head1 = rows[(1, 1)]["chunk_text"].split()[:8]
    assert tail0 == head1
    assert rows[(2, 0)]["n_tokens"] == 3
    assert all(d not in (3, 4) for d, _ in rows)  # empty/NULL: no chunks
    assert rows[(5, 0)]["n_tokens"] == 64 and (5, 1) not in rows
    assert rows[(6, 1)]["n_tokens"] == 9  # 65-56 tokens in the tail chunk

    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_pack_bins_hand_computed(spark):
    from ds2_spark.operators.chunking import chunk_documents, pack_chunks

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(130))), (2, "a b c")],
        "doc_id long, text string",
    )
    ch = chunk_documents(docs, chunk_tokens=64, overlap=8)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["bin"], r["bin_offset"])
        for r in pack_chunks(ch, budget_tokens=100).collect()
    }
    # cumsum order (1,0)=64 (1,1)=128 (1,2)=146 (2,0)=149
    assert got == {
        (1, 0): (0, 0),
        (1, 1): (0, 64),
        (1, 2): (1, 28),
        (2, 0): (1, 46),
    }

    # keyed packing restarts the line per key
    keyed = ch.withColumn("grp", ch["doc_id"] % 2)
    g = {
        (r["doc_id"], r["chunk_idx"]): (r["bin"], r["bin_offset"])
        for r in pack_chunks(keyed, budget_tokens=100, key_col="grp").collect()
    }
    assert g[(2, 0)] == (0, 0)  # doc 2 is alone in its group

    # oversized chunk -> loud failure, not silent truncation
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="exceeds budget"):
        pack_chunks(ch, budget_tokens=32).collect()


def test_chunk_reconstruction_property(spark):
    """Property: dropping each chunk's first `overlap` tokens (except
    chunk 0) and concatenating reconstructs the document exactly, for
    a sweep of awkward lengths around every boundary."""
    from ds2_spark.operators.chunking import chunk_documents

    chunk_tokens, overlap = 16, 4
    stride = chunk_tokens - overlap
    lengths = sorted(
        {1, 2, stride, stride + 1, chunk_tokens, chunk_tokens + 1,
         2 * stride, 2 * stride + overlap, 50, 51, 52, 53, 100, 149}
    )
    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in lengths],
        "doc_id long, text string",
    )
    rows = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r[
            "chunk_text"
        ].split()
    for n in lengths:
        chunks = [by_doc[n][i] for i in range(len(by_doc[n]))]
        rebuilt = list(chunks[0]) if chunks else []
        for c in chunks[1:]:
            assert c[:overlap] == rebuilt[-overlap:]  # overlap agrees
            rebuilt.extend(c[overlap:])
        assert rebuilt == [f"w{i}" for i in range(n)], n
        assert all(len(c) <= chunk_tokens for c in chunks)
        assert all(len(c) >= 1 for c in chunks)
