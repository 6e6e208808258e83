"""Blocked fuzzy matching: verify distances, blocking recall
semantics, and the hot-block cap."""


def test_blocked_fuzzy_pairs(spark):
    from ds2_spark.operators.fuzzy import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "apple pie"),
            (2, "apple pei"),      # dist 2, same block
            (3, "apple pies"),     # dist 1 vs 1, len 10 -> same len bucket (9//4 == 10//4 == 2)
            (4, "kitten"),
            (5, "sitting"),        # dist 3 BUT different first char: blocked away (disclosed)
            (6, "zzzzzzzzzzzzzzz"),
            (7, ""),               # empty keys are dropped
        ],
        "doc_id long, title string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in blocked_fuzzy_pairs(df, key_col="title", max_dist=3).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 2  # pei -> piei -> pies
    assert (4, 5) not in got  # first-char block boundary: disclosed recall loss
    assert all(6 not in p and 7 not in p for p in got)

    # hot-block cap: 4 identical keys in one block, cap 3 -> no pairs
    hot = spark.createDataFrame(
        [(i, "same title") for i in range(4)], "doc_id long, title string"
    )
    assert blocked_fuzzy_pairs(hot, key_col="title", max_block=3).count() == 0
    assert blocked_fuzzy_pairs(hot, key_col="title", max_block=4).count() == 6
