"""U6 model-inference plumbing: the pandas-UDF embedding path with the
deterministic fake model (functions/scoring.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from finmapreduce_spark.functions.scoring import (
    EMBED_DIM,
    _hash_embed_batch,
    embed_text_udf,
)


def test_embed_udf_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"document number {i % 3}") for i in range(20)], "id long, text string"
    ).withColumn("emb", embed_text_udf("fake-hash")(F.col("text")))
    rows = {r["id"]: r["emb"] for r in df.collect()}
    assert all(len(v) == EMBED_DIM for v in rows.values())
    # pure function of the text: same text -> identical vector
    assert rows[0] == rows[3] == rows[18]
    assert rows[0] != rows[1]
    # unit-normalised
    assert abs(sum(x * x for x in rows[0]) - 1.0) < 1e-9


def test_embed_matches_local_reference(spark):
    import pandas as pd

    texts = ["alpha", "beta gamma", ""]
    local = _hash_embed_batch(pd.Series(texts))
    df = spark.createDataFrame([(t,) for t in texts], "text string").withColumn(
        "emb", embed_text_udf("fake-hash")(F.col("text"))
    )
    got = np.array([r["emb"] for r in df.select("emb").collect()])
    assert np.allclose(got, local)


def test_hashing_bow_is_a_real_similarity_model(spark):
    """The default embedder (feature-hashing BoW) is content-AWARE:
    overlapping texts score high cosine, disjoint texts score ~0 —
    the property the fake-hash stand-in cannot provide — and the UDF
    matches the local reference exactly."""
    import pandas as pd

    from finmapreduce_spark.functions.scoring import _hashing_bow_batch

    texts = [
        "revenue grew fifteen percent this year",
        "revenue grew ten percent this year",
        "quarterly kumquat futures denominated elsewhere",
        "",
    ]
    local = _hashing_bow_batch(pd.Series(texts))
    df = spark.createDataFrame([(t,) for t in texts], "text string").withColumn(
        "emb", embed_text_udf()(F.col("text"))
    )
    got = np.array([r["emb"] for r in df.select("emb").collect()])
    assert np.allclose(got, local)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    assert cos(got[0], got[1]) > 0.6  # 5/7 shared tokens
    assert abs(cos(got[0], got[2])) < 0.35  # disjoint vocab
    assert cos(got[0], got[0]) == pytest.approx(1.0)


def test_real_model_path_raises():
    from finmapreduce_spark.functions import scoring

    scoring._MODELS.clear()
    with pytest.raises(NotImplementedError):
        scoring._load_model("bert-base-uncased")
    scoring._MODELS.clear()


def test_pick_n_probes_monotone_and_meets_target(spark, sf_dir):
    """Round-3 #3: the probe tuner's recall curve is nondecreasing in
    n_probes, and the chosen setting clears the target (or is the cap
    when the target is unreachable on this data)."""
    from finmapreduce_spark.queries.similarity import pick_n_probes

    out = pick_n_probes(spark, sf_dir, target_recall=0.25, max_probes=4)
    curve = out["curve"]
    vals = [curve[n] for n in sorted(curve)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    if vals[-1] >= 0.25:
        assert curve[out["n_probes"]] >= 0.25
    else:
        assert out["n_probes"] == 4


def test_pick_pq_config_walks_code_size_and_meets_target(spark, sf_dir):
    """Round-4 #3: the PQ tuner walks codebook configs in increasing
    code-size order, the parameterized builder reproduces the default
    catalog config exactly, and the chosen config clears the target
    (or is the largest tried when unreachable on this data)."""
    from finmapreduce_spark.queries.similarity import (
        K_PQ,
        PQ_SUBS,
        _pq_split,
        _pq_topk,
        ann_pq_adc_topk,
        pick_pq_config,
    )

    # the parameterized builder at the default config IS the catalog query
    assert _pq_split(2) == PQ_SUBS
    a = ann_pq_adc_topk(spark, sf_dir).collect()
    b = _pq_topk(spark, sf_dir, K_PQ, _pq_split(2)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    configs = [(4, 2), (16, 4)]
    out = pick_pq_config(spark, sf_dir, target_recall=0.2, configs=configs)
    assert set(out["curve"]) <= {"k4x2", "k16x4"}
    assert (out["k_pq"], out["n_subspaces"]) in configs
    if out["curve"].get("k4x2", 0.0) >= 0.2:
        assert (out["k_pq"], out["n_subspaces"]) == (4, 2)
        assert out["code_bits"] == 4
    else:
        assert (out["k_pq"], out["n_subspaces"]) == (16, 4)
        assert out["code_bits"] == 16
    # measured recall of the chosen config is recorded in the curve
    tag = f"k{out['k_pq']}x{out['n_subspaces']}"
    assert tag in out["curve"]


def test_pick_lsh_bands_nested_monotone(spark, sf_dir):
    """Round-5: along the doubling chain 1x8 ⊆ 2x4 ⊆ 4x2 ⊆ 8x1 the
    candidate sets nest, so recall AND candidate count are monotone
    non-decreasing; the chosen layout clears the target (or is the
    loosest when unreachable)."""
    from finmapreduce_spark.queries.dedup import pick_lsh_bands

    out = pick_lsh_bands(spark, sf_dir, target_recall=2.0)  # force full walk
    curve = [out["curve"][f"{nb}x{nr}"] for nb, nr in [(1, 8), (2, 4), (4, 2), (8, 1)]]
    recalls = [c["recall"] for c in curve]
    cands = [c["candidates"] for c in curve]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)
    assert out["n_truth"] > 0
    # unreachable target -> loosest layout returned
    assert (out["bands"], out["rows"]) == (8, 1)
    out2 = pick_lsh_bands(spark, sf_dir, target_recall=recalls[0])
    assert (out2["bands"], out2["rows"]) == (1, 8)  # strictest suffices


def test_hashing_bow_tokenizer_matches_oracle_on_boundary_whitespace():
    """The UDF tokenizes with SQL-trim + RE2-\\s semantics exactly —
    trailing newlines, NBSP, \\v and padded spaces all hash to the
    same buckets the DuckDB oracle derives (the latent divergence a
    Unicode str.strip()/\\s tokenizer would hit on real corpora)."""
    import duckdb
    import pandas as pd

    from finmapreduce_spark.functions.scoring import (
        EMBED_DIM,
        _hashing_bow_batch,
    )

    texts = ["hello world\n", "  padded  ", "tab\tsep", "a\x0bvtab", "",
             "nbsp\xa0word", "mixed \n\r\x0c end\n"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    for i, s in enumerate(texts):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, s])
    rows = con.execute("""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
          FROM t
        ), hx AS (SELECT doc_id, md5(w) AS h FROM toks),
        feat AS (
          SELECT doc_id,
                 ((strpos('0123456789abcdef', substring(h,7,1)) - 1) * 16
                  + strpos('0123456789abcdef', substring(h,8,1)) - 1) % 64 AS idx,
                 CAST(sum(CASE WHEN (strpos('0123456789abcdef', substring(h,10,1)) - 1) % 2 = 1
                          THEN 1 ELSE -1 END) AS DOUBLE) AS wgt
          FROM hx GROUP BY 1,2)
        SELECT doc_id, idx, wgt FROM feat
    """).fetchall()
    want = {i: np.zeros(EMBED_DIM) for i in range(len(texts))}
    for doc_id, idx, wgt in rows:
        want[doc_id][idx] = wgt
    got = _hashing_bow_batch(pd.Series(texts))
    for i in range(len(texts)):
        assert np.allclose(got[i], want[i]), texts[i]


def test_ivf_incremental_insert_equivalence(spark, sf_dir):
    """The exactness claim licensing incremental IVF maintenance:
    under FROZEN centroids, routing the delta batch separately and
    unioning equals routing the whole corpus in one pass (assignment
    is per-row). If this ever breaks, inserts need a rebuild."""
    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.similarity import (
        K_CLUSTERS,
        KMEANS_ITERS,
        _assign,
        _ivf_is_delta,
        _recompute,
        _serve_cells,
        ann_ivf_incremental_topk,
        emb_table,
    )

    v = emb_table(spark, sf_dir)
    base = v.filter(~_ivf_is_delta(F.col("vec_id")))
    cents = base.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("c_norm"),
    )
    for _ in range(KMEANS_ITERS):
        cents = _recompute(_assign(base, cents))
    # monolithic: one routing pass over the FULL corpus, same centroids
    mono = _serve_cells(_assign(v, cents))
    inc = ann_ivf_incremental_topk(spark, sf_dir)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, mono.collect()))


def test_ivf_delta_segment_serves_union(spark, sf_dir, tmp_path):
    """Persisted lifecycle: base cells written once, a delta epoch
    appended as its own vectors-delta-1/ segment, serving reads the
    union — results identical to the pure-DataFrame incremental query
    (which the driver oracle certifies)."""
    import os

    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.similarity import (
        K_CLUSTERS,
        KMEANS_ITERS,
        _assign,
        _ivf_is_delta,
        _recompute,
        _serve_cells,
        ann_ivf_incremental_topk,
        append_ivf_delta,
        emb_table,
        read_ivf_vectors,
    )

    root = str(tmp_path / "ivf")
    v = emb_table(spark, sf_dir)
    base = v.filter(~_ivf_is_delta(F.col("vec_id")))
    delta = v.filter(_ivf_is_delta(F.col("vec_id")))
    cents = base.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("c_norm"),
    )
    for _ in range(KMEANS_ITERS):
        cents = _recompute(_assign(base, cents))
    cents = cents.persist()
    _assign(base, cents).write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "vectors")
    )
    seg = append_ivf_delta(spark, root, _assign(delta, cents), tag="e1")
    assert "vectors-delta-00000001-e1" in seg
    cents.unpersist()

    served = _serve_cells(
        read_ivf_vectors(spark, root).select("vec_id", "v", "norm", "cid")
    )
    want = ann_ivf_incremental_topk(spark, sf_dir)
    assert sorted(map(tuple, served.collect())) == sorted(map(tuple, want.collect()))
    # base cells untouched by the append (segment isolation)
    assert os.path.isdir(os.path.join(root, "vectors"))
    assert not any(
        "delta" in p for p in os.listdir(os.path.join(root, "vectors"))
    )


def test_ivf_compaction_folds_segments_and_preserves_serving(spark, sf_dir, tmp_path):
    """compact_ivf_index: a replayed epoch (same rows, new segment) is
    deduped away, segments fold into one clean cid-partitioned layout,
    and serving results are unchanged. The two-sided guard refuses
    appends while the compaction lock is held."""
    import os

    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.similarity import (
        K_CLUSTERS,
        KMEANS_ITERS,
        _assign,
        _ivf_is_delta,
        _recompute,
        _serve_cells,
        append_ivf_delta,
        compact_ivf_index,
        emb_table,
        read_ivf_vectors,
    )
    from finmapreduce_spark.sources.sinks import store_lock_path

    root = str(tmp_path / "ivf")
    v = emb_table(spark, sf_dir)
    base = v.filter(~_ivf_is_delta(F.col("vec_id")))
    delta = v.filter(_ivf_is_delta(F.col("vec_id")))
    cents = base.filter(F.col("vec_id") < K_CLUSTERS).select(
        F.col("vec_id").cast("int").alias("cid"),
        F.col("v").alias("cv"),
        F.col("norm").alias("c_norm"),
    )
    for _ in range(KMEANS_ITERS):
        cents = _recompute(_assign(base, cents))
    cents = cents.persist()
    _assign(base, cents).write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "vectors")
    )
    routed = _assign(delta, cents)
    append_ivf_delta(spark, root, routed, tag="run1-0")
    append_ivf_delta(spark, root, routed, tag="run2-0")  # cross-run replay
    cents.unpersist()

    def serve():
        return sorted(
            map(
                tuple,
                _serve_cells(
                    read_ivf_vectors(spark, root).select(
                        "vec_id", "v", "norm", "cid"
                    )
                ).collect(),
            )
        )

    before = serve()
    stats = compact_ivf_index(spark, root)
    assert stats["segments_folded"] == 2
    assert stats["rows_after"] < stats["rows_before"]  # replay deduped
    assert serve() == before  # serving unchanged
    assert not any("vectors-delta" in p for p in os.listdir(root))
    # guard: append refuses while a compaction lock is held
    lock = store_lock_path(root)
    with open(lock, "w") as fh:
        fh.write("pid=held")
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="compacted"):
            append_ivf_delta(spark, root, routed, tag="run3-0")
    finally:
        os.remove(lock)


def test_ivf_resubmitted_vector_latest_wins(spark, tmp_path):
    """A vec_id resubmitted with a CHANGED vector must be served from
    its newest ingest (highest segment seq) — deterministically, both
    through read_ivf_vectors and after compaction."""
    import os

    from finmapreduce_spark.queries.similarity import (
        append_ivf_delta,
        compact_ivf_index,
        read_ivf_vectors,
    )

    root = str(tmp_path / "ivf")
    schema = "vec_id long, v array<double>, norm double, cid int"
    base = spark.createDataFrame(
        [(1, [1.0, 0.0], 1.0, 0), (2, [0.0, 1.0], 1.0, 1)], schema
    )
    base.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "vectors")
    )
    v2a = spark.createDataFrame([(2, [0.6, 0.8], 1.0, 1)], schema)
    v2b = spark.createDataFrame([(2, [0.8, 0.6], 1.0, 0)], schema)
    append_ivf_delta(spark, root, v2a, tag="epoch-a")
    append_ivf_delta(spark, root, v2b, tag="epoch-b")

    def v_of_2():
        rows = {r["vec_id"]: (list(r["v"]), r["cid"]) for r in
                read_ivf_vectors(spark, root).collect()}
        assert set(rows) == {1, 2}
        return rows[2]

    assert v_of_2() == ([0.8, 0.6], 0)  # newest ingest wins, new cell too
    compact_ivf_index(spark, root)
    assert v_of_2() == ([0.8, 0.6], 0)  # compaction bakes the same choice
    # replaying tag epoch-b overwrites its own segment, not a new one
    append_ivf_delta(spark, root, v2b, tag="epoch-b")
    segs = [p for p in os.listdir(root) if p.startswith("vectors-delta-")]
    assert len(segs) == 1 and segs[0].endswith("epoch-b")


def test_valid_vectors_filters_poison_rows(spark):
    """Ingest guard: NULL vector, NULL element, ragged dim, and zero
    vector are all dropped; the good row keeps emb_table's norm."""
    from finmapreduce_spark.queries.similarity import valid_vectors

    df = spark.createDataFrame(
        [
            (1, [3.0, 4.0]),          # good
            (2, None),                # NULL vector
            (3, [1.0, None]),         # NULL element
            (4, [1.0, 2.0, 3.0]),     # ragged (dim 3, expect 2)
            (5, [0.0, 0.0]),          # zero norm → NaN cosine poison
        ],
        "vec_id long, v array<double>",
    )
    out = valid_vectors(df, expected_dim=2).collect()
    assert [(r["vec_id"], r["norm"]) for r in out] == [(1, 5.0)]


def test_ivf_refresh_equals_monolithic_rebuild(spark, sf_dir, tmp_path):
    """refresh_ivf_index: after base build + delta appends, an offline
    refresh (retrain on everything, full re-route) must yield serving
    identical to ann_ivf_kmeans_topk's monolithic train over the same
    corpus, with all delta segments consumed and centroids rewritten."""
    import os

    from pyspark.sql import functions as F

    from finmapreduce_spark.queries.similarity import (
        _assign,
        _ivf_is_delta,
        _serve_cells,
        _train_centroids,
        ann_ivf_kmeans_topk,
        append_ivf_delta,
        emb_table,
        read_ivf_vectors,
        refresh_ivf_index,
    )

    root = str(tmp_path / "ivf")
    v = emb_table(spark, sf_dir)
    base = v.filter(~_ivf_is_delta(F.col("vec_id")))
    delta = v.filter(_ivf_is_delta(F.col("vec_id")))
    cents = _train_centroids(base).persist()
    _assign(base, cents).write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "vectors")
    )
    cents.write.mode("overwrite").parquet(os.path.join(root, "centroids"))
    append_ivf_delta(spark, root, _assign(delta, cents), tag="e1")
    cents.unpersist()

    stats = refresh_ivf_index(spark, root)
    assert stats["segments_folded"] == 1
    assert not any(p.startswith("vectors-delta") for p in os.listdir(root))

    served = sorted(
        map(
            tuple,
            _serve_cells(
                read_ivf_vectors(spark, root).select("vec_id", "v", "norm", "cid")
            ).collect(),
        )
    )
    want = sorted(map(tuple, ann_ivf_kmeans_topk(spark, sf_dir).collect()))
    assert served == want
    # the rewritten centroid sidecar carries the refreshed VECTORS,
    # not just the cid set (the streaming appender routes through it)
    cdir = os.path.join(root, "centroids")
    assert os.path.isdir(cdir)
    canon = lambda rows: sorted(  # noqa: E731
        (r["cid"], [round(x, 9) for x in r["cv"]], round(r["c_norm"], 9))
        for r in rows
    )
    got_c = canon(spark.read.parquet(cdir).collect())
    want_c = canon(_train_centroids(v).collect())
    assert got_c == want_c


def test_ivf_unrecognized_segment_fails_loudly(spark, tmp_path):
    """A delta dir that doesn't parse must raise, not be silently
    ignored — ignoring it would serve an index missing ingested
    vectors."""
    import os

    from finmapreduce_spark.queries.similarity import read_ivf_vectors

    root = str(tmp_path / "ivf")
    schema = "vec_id long, v array<double>, norm double, cid int"
    spark.createDataFrame([(1, [1.0], 1.0, 0)], schema).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(os.path.join(root, "vectors"))
    os.makedirs(os.path.join(root, "vectors-delta-1"))  # legacy layout
    with pytest.raises(RuntimeError, match="unrecognized"):
        read_ivf_vectors(spark, root)


def test_ivf_interrupted_refresh_blocks_until_rerun(spark, tmp_path):
    """A crashed refresh leaves a mixed state that is WRONG to serve
    (re-routed base beside stale-cid segments). The sentinel blocks
    reads, appends, and compaction; re-running refresh completes and
    unblocks. Also: an invalid tag is rejected at WRITE time instead
    of bricking every subsequent read."""
    import os

    from finmapreduce_spark.queries.similarity import (
        _refresh_sentinel,
        append_ivf_delta,
        compact_ivf_index,
        read_ivf_vectors,
        refresh_ivf_index,
    )

    root = str(tmp_path / "ivf")
    schema = "vec_id long, v array<double>, norm double, cid int"
    base = spark.createDataFrame(
        [(i, [1.0 * i, 1.0], float((i * i + 1) ** 0.5), i % 2)
         for i in range(10)],
        schema,
    )
    base.write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(root, "vectors")
    )
    delta = spark.createDataFrame([(11, [2.0, 2.0], 8.0 ** 0.5, 1)], schema)
    append_ivf_delta(spark, root, delta, tag="e1")

    # writer-side tag validation (would otherwise brick the store)
    with pytest.raises(ValueError, match="invalid IVF delta tag"):
        append_ivf_delta(spark, root, delta, tag="")
    with pytest.raises(ValueError, match="invalid IVF delta tag"):
        append_ivf_delta(spark, root, delta, tag="a/b")

    # simulate a refresh crash mid-mutation
    with open(_refresh_sentinel(root), "w") as fh:
        fh.write("")
    with pytest.raises(RuntimeError, match="interrupted refresh"):
        read_ivf_vectors(spark, root)
    with pytest.raises(RuntimeError, match="interrupted refresh"):
        append_ivf_delta(spark, root, delta, tag="e2")
    with pytest.raises(RuntimeError, match="interrupted refresh"):
        compact_ivf_index(spark, root)

    # re-running refresh completes from the partial state and unblocks
    stats = refresh_ivf_index(spark, root)
    assert stats["n_vectors"] == 11
    assert not os.path.exists(_refresh_sentinel(root))
    assert {r["vec_id"] for r in read_ivf_vectors(spark, root).collect()} == (
        set(range(10)) | {11}
    )


def test_s2s_udf_matches_local_reference_and_semantics(spark):
    """The pair-scorer UDF (unigram-lm hermetic arm) must match the
    local batch function exactly through the Arrow hop, and behave
    like a conditional LM: a candidate repeating the reference's
    tokens scores HIGHER (less surprisal) than an out-of-vocabulary
    candidate against the same reference."""
    import pandas as pd

    from finmapreduce_spark.functions.scoring import (
        _unigram_nll_batch,
        s2s_score_udf,
    )

    refs = [
        "revenue grew fifteen percent this year",
        "revenue grew fifteen percent this year",
        "",
    ]
    cands = [
        "revenue grew fifteen percent",
        "quarterly kumquat futures denominated elsewhere",
        "anything",
    ]
    local = _unigram_nll_batch(pd.Series(refs), pd.Series(cands))
    df = spark.createDataFrame(
        list(zip(refs, cands)), "ref string, cand string"
    ).withColumn("s", s2s_score_udf()(F.col("ref"), F.col("cand")))
    got = [r["s"] for r in df.select("s").collect()]
    assert np.allclose(got, local)
    # in-vocabulary candidate beats OOV candidate under the same ref
    assert got[0] > got[1]
    # scores are -mean NLL: always negative for nonempty vocab
    assert all(g < 0 for g in got)


def test_s2s_gates_raise_informatively():
    from finmapreduce_spark.functions.scoring import _load_pair_scorer

    with pytest.raises(NotImplementedError, match="unigram-lm"):
        _load_pair_scorer("nonsense-scorer")
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch"):
            _load_pair_scorer("s2s:facebook/bart-large-cnn")
