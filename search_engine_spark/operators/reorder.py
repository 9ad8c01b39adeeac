"""Document-ID reordering for index compression — URL-order id assignment.

Web-search engines renumber documents so that similar pages get nearby
doc_ids; posting-list deltas then shrink and the gap codecs pack tighter.
Ordering by URL is the classic cheap heuristic (Yan, Ding & Suel, WWW'09
"Inverted index compression and query processing with optimized document
ordering"): pages on the same site share vocabulary, and URL lexicographic
order clusters a site's pages contiguously. The reference never renumbers
(MySQL auto-increment page ids, model/Page.java) — at 10^12 documents the
ordering is worth a large constant factor of index size, so this engine
makes it a first-class build step.

Interaction with the doc-sharded block layout (operators/blocks.py): with
bucket = new_id % N_BUCKETS, a run of w consecutive same-site ids lands in
each bucket every N_BUCKETS steps, so a site-local term's within-bucket
gaps collapse to the CONSTANT N_BUCKETS — the best case for the PForDelta
codec (one bit width, zero exceptions) — instead of the large variable
gaps a scattered ordering produces. tests/test_reorder.py pins that the
encoded index is strictly smaller on a site-clustered corpus.

Scale notes (10^12 rows):
* The dense rank is NOT a global window (that is one partition — the
  round-1 scale-killer). It is the standard distributed zip-with-index:
  range-repartition by the sort key, rank locally per partition, then add
  per-partition offsets. The only driver-side data is one count per
  partition (bounded by the cluster's partition count, not by data).
* The ranked narrow frame (doc_id, _pid, _rn) is persisted before the
  offsets are collected: the offset pass and the final projection must see
  the SAME range boundaries, and RangePartitioner samples its input — two
  independent evaluations are not guaranteed identical. In a real
  deployment the mapping is staged durably anyway (it must be: future
  incremental batches need it to keep assigning ids), so the persist is
  the in-memory stand-in for that staging write.
* Remapping postings/docs is a plain key join on doc_id — both sides
  corpus-sized, so it shuffles; never broadcast the mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_ordered_ids(
    docs: DataFrame,
    order_cols: tuple[str, ...] = ("url", "doc_id"),
    n_parts: int | None = None,
) -> DataFrame:
    """(doc_id, new_id): new_id is the dense 0-based rank of the document
    under lexicographic (url, doc_id) order. Deterministic: doc_id breaks
    every tie, so the mapping is a pure function of the corpus."""
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    keep = ["doc_id"] + [c for c in order_cols if c != "doc_id"]
    ranged = (
        docs.select(*keep)
        .repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    # Persisted for the life of the session (the in-memory stand-in for the
    # durable mapping-table write a real deployment does here; release with
    # spark.catalog.clearCache() if the session lives on).
    local = ranged.withColumn("_rn", F.row_number().over(w)).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    return local.select(
        "doc_id",
        (off_col + F.col("_rn") - 1).cast("long").alias("new_id"),
    )


def reorder_docs(docs: DataFrame, mapping: DataFrame) -> DataFrame:
    """Swap doc_id for its url-ordered new_id ahead of the index build.

    The original id is kept as orig_doc_id so query results can be mapped
    back (presentation joins on it). Corpus-sized ⋈ corpus-sized on doc_id:
    a shuffle join by design — do not broadcast either side."""
    other = [c for c in docs.columns if c != "doc_id"]
    return (
        docs.join(mapping, "doc_id")
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("doc_id").alias("orig_doc_id"),
            *other,
        )
    )


def reorder_postings(postings: DataFrame, mapping: DataFrame) -> DataFrame:
    """Remap an already-built logical postings frame (doc_id, term, tf)
    onto the url-ordered ids — the cheap path when postings exist and the
    corpus does not need re-tokenizing."""
    other = [c for c in postings.columns if c != "doc_id"]
    return postings.join(mapping, "doc_id").select(
        F.col("new_id").alias("doc_id"), *other
    )


# ------------------------------------------------- recursive graph bisection

BP_LEAF = 32
BP_MAX_ITER = 20


def _csr_rows_cat(side, indptr, indices):
    """Concatenate the CSR term rows of the docs in `side` — vectorized
    gather (no per-doc Python loop)."""
    import numpy as np

    if side.size == 0:
        return np.empty(0, dtype=indices.dtype), np.zeros(0, dtype=np.int64)
    cnt = (indptr[side + 1] - indptr[side]).astype(np.int64)
    total = int(cnt.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype), cnt
    base = np.repeat(indptr[side], cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(cnt) - cnt, cnt
    )
    return indices[base + within], cnt


def _bp_bisect(order, indptr, indices, doc_keys, max_iter, leaf):
    """Recursive bisection over one shard's doc-term incidence (CSR row d
    = doc d's distinct local term ids): returns `order` rearranged so
    docs sharing vocabulary are adjacent. Pure numpy; deterministic —
    swap ranking ties break on the stable doc key.

    Gain model (Dhulipala et al. KDD'16 "Compressing graphs and indexes
    with recursive graph bisection", as in Lucene's BPIndexReorderer):
    with a = n_own(t), c = n_other(t) the halves' doc counts for term t
    and the cost model b(a, c) = a·log2(|L|/(a+1)) + c·log2(|R|/(c+1)),
    a doc's move gain is Σ_{t∈d} [b(a, c) − b(a−1, c+1)] under the
    iteration's count snapshot. Each iteration ranks both halves by gain
    descending and swaps the top pairs while the pair gain sum is
    positive; stop on a no-swap iteration or after max_iter."""
    import numpy as np

    n = order.size
    if n <= leaf:
        return order
    half = n // 2
    L, R = order[:half].copy(), order[half:].copy()
    n_terms = int(indices.max()) + 1 if indices.size else 1

    def side_gain(side, n_own, n_other, size_own, size_other):
        with np.errstate(divide="ignore", invalid="ignore"):
            before = n_own * np.log2(size_own / (n_own + 1.0)) + (
                n_other * np.log2(size_other / (n_other + 1.0))
            )
            after = (n_own - 1.0) * np.log2(size_own / n_own) + (
                n_other + 1.0
            ) * np.log2(size_other / (n_other + 2.0))
            delta_t = before - after  # defined wherever n_own ≥ 1
        cat, cnt = _csr_rows_cat(side, indptr, indices)
        seg = np.zeros(side.size, dtype=np.float64)
        if cat.size:
            cs = np.concatenate(([0.0], np.cumsum(delta_t[cat])))
            ends = np.cumsum(cnt)
            seg = cs[ends] - cs[ends - cnt]
        return seg

    def live_gain(d, n_own, n_other, size_own, size_other):
        # recompute one doc's move gain from the LIVE counts (n_own[t] ≥ 1
        # for t ∈ d while d sits in `own`, so no zero divisions)
        ts = indices[indptr[d] : indptr[d + 1]]
        if ts.size == 0:
            return 0.0
        a, c = n_own[ts], n_other[ts]
        before = a * np.log2(size_own / (a + 1.0)) + c * np.log2(
            size_other / (c + 1.0)
        )
        after = (a - 1.0) * np.log2(size_own / a) + (c + 1.0) * np.log2(
            size_other / (c + 2.0)
        )
        return float((before - after).sum())

    sL, sR = float(half), float(n - half)
    for _ in range(max_iter):
        tl, _ = _csr_rows_cat(L, indptr, indices)
        tr, _ = _csr_rows_cat(R, indptr, indices)
        nL = np.bincount(tl, minlength=n_terms).astype(np.float64)
        nR = np.bincount(tr, minlength=n_terms).astype(np.float64)
        gL = side_gain(L, nL, nR, sL, sR)
        gR = side_gain(R, nR, nL, sR, sL)
        oL = np.lexsort((doc_keys[L], -gL))
        oR = np.lexsort((doc_keys[R], -gR))
        # walk the gain-ranked pairs with LIVE count updates: each accepted
        # swap shifts the counts, so later pairs are judged against the
        # already-improved split (without this, equal static gains would
        # swap wholesale and oscillate). Stop at the first non-positive
        # live pair — the static ranking is descending, so the remainder
        # is (approximately) no better.
        swapped = 0
        moved = False
        for i in range(min(L.size, R.size)):
            dL, dR = int(L[oL[i]]), int(R[oR[i]])
            g = live_gain(dL, nL, nR, sL, sR) + live_gain(dR, nR, nL, sR, sL)
            if g <= 1e-12:
                break
            tsL = indices[indptr[dL] : indptr[dL + 1]]
            tsR = indices[indptr[dR] : indptr[dR + 1]]
            nL[tsL] -= 1.0
            nR[tsL] += 1.0
            nR[tsR] -= 1.0
            nL[tsR] += 1.0
            L[oL[i]], R[oR[i]] = dR, dL
            swapped += 1
            if not np.array_equal(tsL, tsR):
                moved = True
        if swapped == 0 or not moved:
            break
    return np.concatenate(
        [
            _bp_bisect(L, indptr, indices, doc_keys, max_iter, leaf),
            _bp_bisect(R, indptr, indices, doc_keys, max_iter, leaf),
        ]
    )


def bp_order_local(doc_ids, term_lists, max_iter=BP_MAX_ITER, leaf=BP_LEAF):
    """Pure-Python/numpy BP reorder of one shard: doc_ids (int list) +
    term_lists (list of iterables of term strings) → doc_ids in the
    bisected order. Unit-testable without Spark; the applyInPandas path
    below is this function over each shard's pandas group."""
    import numpy as np

    ids = np.asarray(doc_ids, dtype=np.int64)
    order0 = np.argsort(ids, kind="stable")  # canonical start: id order
    vocab: dict[str, int] = {}
    indptr = np.zeros(ids.size + 1, dtype=np.int64)
    idx_list: list[int] = []
    for row, d in enumerate(order0):
        ts = sorted(set(term_lists[d]))
        for t in ts:
            idx_list.append(vocab.setdefault(t, len(vocab)))
        indptr[row + 1] = len(idx_list)
    indices = np.asarray(idx_list, dtype=np.int64)
    rows = np.arange(ids.size, dtype=np.int64)
    keys = ids[order0]
    out_rows = _bp_bisect(rows, indptr, indices, keys, max_iter, leaf)
    return ids[order0][out_rows].tolist()


def bp_ordered_ids(
    docs: DataFrame,
    postings: DataFrame,
    n_shards: int = 8,
    max_iter: int = BP_MAX_ITER,
    leaf: int = BP_LEAF,
) -> DataFrame:
    """(doc_id, new_id): recursive-graph-bisection doc-id assignment —
    the state-of-the-art compression ordering (Dhulipala et al. KDD'16;
    Lucene 9 ships it as BPIndexReorderer), upgrading `url_ordered_ids`'
    URL heuristic to an optimization of the actual log-gap objective.

    Distribution shape mirrors Lucene's per-segment reorder: docs are
    sharded by doc_id % n_shards and each shard bisects LOCALLY inside
    one applyInPandas task (numpy; O(E·log n·iters) per shard), then
    new_id = shard_offset + local_rank with offsets from the tiny
    (n_shards-row) count aggregate. Global ordering across shards is the
    shard order — at 10^12 docs the shard would be the natural partition
    (site / crawl segment), which is exactly where vocabulary clusters
    anyway. Deterministic: canonical id-order start, fixed iteration
    budget, stable tie keys."""
    import pandas as pd

    spark = docs.sparkSession
    shard = (F.col("doc_id") % n_shards).cast("long")
    tagged = (
        docs.select("doc_id").withColumn("shard", shard)
        .join(postings.select("doc_id", "term"), "doc_id", "left")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["doc_id", "term"])
        by_doc: dict[int, list[str]] = {}
        for d, t in zip(pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()):
            lst = by_doc.setdefault(int(d), [])
            if isinstance(t, str):  # left-join null = termless doc
                lst.append(t)
        ids = sorted(by_doc)
        ordered = bp_order_local(
            ids, [by_doc[d] for d in ids], max_iter=max_iter, leaf=leaf
        )
        return pd.DataFrame(
            {
                "shard": pdf["shard"].iloc[0],
                "doc_id": ordered,
                "local_rank": range(len(ordered)),
            }
        )

    ranked = tagged.groupBy("shard").applyInPandas(
        run, "shard long, doc_id long, local_rank long"
    )
    counts = {
        r["shard"]: r["cnt"]
        for r in docs.select(shard.alias("shard"))
        .groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for s in sorted(counts):
        offsets[s] = acc
        acc += counts[s]
    off_col = F.element_at(
        F.create_map(
            *[F.lit(x) for s in sorted(offsets) for x in (s, offsets[s])]
        ),
        F.col("shard"),
    )
    return ranked.select(
        "doc_id", (off_col + F.col("local_rank")).cast("long").alias("new_id")
    )
