"""BPE tokenizer training (operators/bpe.py): the pair-count step is
oracle-paired (test_oracle_parity / driver gate); this file pins the
invariants SQL can't state — the greedy merge fold's semantics and the
iterative learner against an independent pure-Python BPE."""

from pyspark.sql import functions as F

from search_engine_spark.operators.bpe import (
    _merge_expr,
    bpe_learn,
    bpe_pairs,
    word_freqs,
)

DOC_SCHEMA = (
    "doc_id long, text string, url string, status int, site string"
)


def _docs(spark, texts):
    rows = [
        (i, t, f"u{i}", 200, "s") for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference BPE (Sennrich'16 pseudocode, greedy argmax
    with the (count desc, 'a|b' asc) tiebreak)."""
    vocab = {tuple(w): c for w, c in word_counts.items() if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1])
        )
        (a, b), n = best
        merges.append((a, b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


class TestMergeFold:
    def _run(self, spark, syms, a, b):
        df = spark.createDataFrame([(syms,)], "syms array<string>")
        return df.select(
            _merge_expr(F.col("syms"), a, b).alias("m")
        ).collect()[0]["m"]

    def test_left_to_right_greedy_overlap(self, spark):
        # 'aaa' under (a,a): leftmost pair merges, no overlap re-merge
        assert self._run(spark, ["a", "a", "a"], "a", "a") == ["aa", "a"]

    def test_multiple_disjoint_merges_one_pass(self, spark):
        assert self._run(
            spark, ["a", "b", "c", "a", "b"], "a", "b"
        ) == ["ab", "c", "ab"]

    def test_no_match_is_identity(self, spark):
        assert self._run(spark, ["x", "y", "z"], "a", "b") == [
            "x", "y", "z"
        ]

    def test_merged_symbols_are_atomic(self, spark):
        # after ab exists, (b,c) must not fire inside it
        df = spark.createDataFrame(
            [(["ab", "c"],)], "syms array<string>"
        )
        got = df.select(
            _merge_expr(F.col("syms"), "b", "c").alias("m")
        ).collect()[0]["m"]
        assert got == ["ab", "c"]


class TestPairsAndLearn:
    TEXTS = [
        "low low low lower lower newest newest newest",
        "newest newest newest widest widest widest",
        "low lowest newest widest wider",
    ]

    def _word_counts(self, spark):
        wf = word_freqs(_docs(spark, self.TEXTS))
        return {r["word"]: r["c"] for r in wf.collect()}

    def test_pairs_match_python_counts(self, spark):
        wc = self._word_counts(spark)
        counts: dict[str, int] = {}
        for w, c in wc.items():
            if len(w) < 2:
                continue
            for i in range(len(w) - 1):
                p = w[i] + "|" + w[i + 1]
                counts[p] = counts.get(p, 0) + c
        want = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:50]
        got = [
            (r["pair"], r["n"])
            for r in bpe_pairs(_docs(spark, self.TEXTS), k=50).collect()
        ]
        assert got == want

    def test_learn_matches_reference_bpe(self, spark):
        wc = self._word_counts(spark)
        want = _py_bpe(wc, 8)
        got = bpe_learn(_docs(spark, self.TEXTS), n_merges=8)
        assert got == want
        # the classic corpus learns 'est'-family merges
        assert ("e", "s", want[0][2]) == want[0] or any(
            a + b in ("es", "st", "est") for a, b, _ in want[:3]
        )

    def test_learn_early_stop_when_fully_merged(self, spark):
        docs = _docs(spark, ["ab ab ab"])
        merges = bpe_learn(docs, n_merges=10)
        # 'ab' merges once into a single symbol; nothing else remains
        assert merges == [("a", "b", 3)]

    def test_first_merge_equals_pairs_argmax(self, spark):
        docs = _docs(spark, self.TEXTS)
        top = bpe_pairs(docs, k=1).collect()[0]
        a, b, n = bpe_learn(docs, n_merges=1)[0]
        assert (a + "|" + b, n) == (top["pair"], top["n"])


class TestEncode:
    TEXTS = TestPairsAndLearn.TEXTS

    def test_vocab_matches_python_encode(self, spark):
        docs = _docs(spark, self.TEXTS)
        from search_engine_spark.operators.bpe import bpe_vocab

        wf = word_freqs(docs)
        wc = {r["word"]: r["c"] for r in wf.collect()}
        merges = [(a, b) for a, b, _ in _py_bpe(wc, 6)]
        got = {
            r["subword"]: r["n"]
            for r in bpe_vocab(docs, merges).collect()
        }
        # python twin: replay merges over every word (incl. 1-char)
        want: dict[str, int] = {}
        for w, c in wc.items():
            syms = list(w)
            for a, b in merges:
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            for s in syms:
                want[s] = want.get(s, 0) + c
        assert got == want
        # mass conservation: char occurrences = Σ len(subword)·n
        total_chars = sum(len(w) * c for w, c in wc.items())
        assert sum(len(s) * n for s, n in got.items()) == total_chars

    def test_token_counts_shrink_with_merges(self, spark):
        docs = _docs(spark, self.TEXTS)
        from search_engine_spark.operators.bpe import bpe_token_counts

        wf = {r["word"]: r["c"] for r in word_freqs(docs).collect()}
        merges = [(a, b) for a, b, _ in _py_bpe(wf, 6)]
        base = {
            r["doc_id"]: r["n_subwords"]
            for r in bpe_token_counts(docs, []).collect()
        }
        enc = {
            r["doc_id"]: r["n_subwords"]
            for r in bpe_token_counts(docs, merges).collect()
        }
        assert set(base) == set(enc)
        # zero merges = character counts; merges strictly compress here
        for d in base:
            assert enc[d] < base[d]
        # exact zero-merge pin: chars per doc via the same tokenizer
        from search_engine_spark.functions.text_columns import (
            explode_terms,
        )

        chars = {
            r["doc_id"]: r["n"]
            for r in explode_terms(docs, lemmatize=False)
            .groupBy("doc_id")
            .agg(F.sum(F.length("term")).alias("n"))
            .collect()
        }
        assert base == chars

    def test_apply_merges_checkpoint_path(self, spark):
        """checkpoint_every smaller than the merge list exercises the
        plan-depth pinning path and changes nothing in the result."""
        docs = _docs(spark, self.TEXTS)
        from search_engine_spark.operators.bpe import apply_merges

        wf = {r["word"]: r["c"] for r in word_freqs(docs).collect()}
        merges = [(a, b) for a, b, _ in _py_bpe(wf, 8)]
        a = sorted(
            (tuple(r["syms"]), r["c"])
            for r in apply_merges(
                word_freqs(docs), merges, checkpoint_every=2
            ).collect()
        )
        b = sorted(
            (tuple(r["syms"]), r["c"])
            for r in apply_merges(
                word_freqs(docs), merges, checkpoint_every=1000
            ).collect()
        )
        assert a == b
