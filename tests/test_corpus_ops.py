"""Tests for corpus-preparation operators (functions/corpus_ops.py):
chunking coverage/overlap invariants, n-gram construction, vocabulary
OOV bounds, exact-integer TF-IDF determinism, grouped KMV accuracy,
and mixture-sample determinism.
"""

import pyspark.sql.functions as F
import pytest

from nolock_social_ocr_services_spark.functions import corpus_ops as co


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_chunked_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, ""), (4, None)],
                               "doc_id long, text string")
    rows = co.chunked(df, size=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"].split(" ")
    # doc 1: 150 tokens, stride 48 -> chunks at 0,48,96,144 (4 chunks)
    assert sorted(by_doc[1]) == [0, 1, 2, 3]
    assert by_doc[1][0] == [f"w{i}" for i in range(64)]
    assert by_doc[1][3] == [f"w{i}" for i in range(144, 150)]  # short tail
    # overlap: chunk 1 starts 48, so its first 16 tokens repeat chunk 0's tail
    assert by_doc[1][1][:16] == by_doc[1][0][48:]
    # union of chunks covers all tokens
    covered = set()
    for c in by_doc[1].values():
        covered.update(c)
    assert covered == {f"w{i}" for i in range(150)}
    # tiny doc -> one chunk; empty/null docs -> no chunks
    assert by_doc[2] == {0: ["a", "b"]}
    assert 3 not in by_doc and 4 not in by_doc


def test_ngram_counts_small_vector(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b",), ("x",), ("",)], "text string"
    )
    got = {
        r["ngram"]: r["n_occurrences"]
        for r in co.ngram_counts(df, n=2).collect()
    }
    assert got == {"a b": 3, "b a": 1, "b c": 1}


def test_vocab_and_oov_bounds(docs):
    row = co.oov_rate(docs, top_v=128).collect()[0]
    assert 0 < row["covered_occurrences"] <= row["total_occurrences"]
    assert 0.0 <= row["oov_rate"] < 1.0
    # larger vocab covers at least as much
    row_big = co.oov_rate(docs, top_v=512).collect()[0]
    assert row_big["covered_occurrences"] >= row["covered_occurrences"]


def test_tfidf_exact_and_plan_independent(spark):
    df = spark.createDataFrame(
        [(1, "rare common common"), (2, "common common other"), (3, "common filler")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["top_term"], r["score"])
            for r in co.tfidf_top_terms(df).collect()}
    # doc 1: rare tf=1 df=1 -> 1e6; common tf=2 df=3 -> 666666 -> rare wins
    assert rows[1] == ("rare", 1_000_000)
    # repartitioned input gives identical argmaxes
    rows2 = {r["doc_id"]: (r["top_term"], r["score"])
             for r in co.tfidf_top_terms(df.repartition(5)).collect()}
    assert rows == rows2


def test_kmv_by_group_accuracy(spark, docs):
    toks = docs.select("lang", F.explode(co.words(F.col("text"))).alias("token"))
    truth = {
        r["lang"]: r["n"]
        for r in toks.groupBy("lang")
        .agg(F.countDistinct("token").alias("n"))
        .collect()
    }
    for r in co.kmv_by_group(toks, "lang", "token", k=32).collect():
        t = truth[r["lang"]]
        if t <= 32:
            assert r["est_distinct"] == t  # exact below k
        else:
            assert abs(r["est_distinct"] - t) / t < 0.45  # k=32 sketch


def test_mixture_sample_rates_and_subset(docs):
    kept = co.mixture_sample(docs, "source", {"src0": 80, "src1": 5})
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"src0", "src1"}
    base = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["src0"] / base["src0"] > counts.get("src1", 0) / base["src1"]
    # kept src1 rows are exactly the 5%-threshold subset of an 80% pass
    wide = set(r["doc_id"] for r in
               co.mixture_sample(docs, "source", {"src1": 80})
               .select("doc_id").collect())
    narrow = set(r["doc_id"] for r in
                 co.mixture_sample(docs, "source", {"src1": 5})
                 .select("doc_id").collect())
    assert narrow <= wide


def test_lm_perplexity_matches_hand_model(spark):
    # corpus: "a b a b", "a b c", "x" (no bigrams -> no row)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in co.lm_perplexity(df).collect()}
    assert set(got) == {1, 2}
    import math

    # bigram counts: (a,b)=3 (b,a)=1 (b,c)=1 ; ctx: a=3, b=2 ; V=4 (a b c x)
    lp = {
        ("a", "b"): round(math.log((3 + 1) / (3 + 4)), 9),
        ("b", "a"): round(math.log((1 + 1) / (2 + 4)), 9),
        ("b", "c"): round(math.log((1 + 1) / (2 + 4)), 9),
    }
    d1 = [lp[("a", "b")], lp[("b", "a")], lp[("a", "b")]]
    d2 = [lp[("a", "b")], lp[("b", "c")]]
    for doc_id, logs in ((1, d1), (2, d2)):
        anlp = round(-sum(logs) / len(logs), 6)
        assert got[doc_id].n_bigrams == len(logs)
        assert got[doc_id].avg_neg_logp == pytest.approx(anlp, abs=1e-9)
        assert got[doc_id].ppl == pytest.approx(round(math.exp(anlp), 4), abs=1e-6)
    # likelier text scores lower: repeated common bigram beats rare ones
    assert got[1].avg_neg_logp < got[2].avg_neg_logp


def test_top_ngram_char_frac_golden(spark):
    """Gopher top-2-gram character fraction: argmax with (count desc,
    gram asc) tie-break; docs with < n tokens have no row."""
    from nolock_social_ocr_services_spark.functions import corpus_ops

    docs = spark.createDataFrame(
        [
            ("d1", "x y x y z"),  # "x y" x2; joined len 9 -> 2*3/9
            ("d2", "p q r"),      # tie "p q"/"q r" x1 -> lexic. "p q"
            ("d3", "solo"),       # 1 token -> no bigram -> no row
            ("d4", None),
        ],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.top_ngram, r.n_occ, r.char_frac)
        for r in corpus_ops.top_ngram_char_frac(docs, n=2).collect()
    }
    assert got == {
        "d1": ("x y", 2, round(6 / 9, 6)),
        "d2": ("p q", 1, 0.6),
    }


def test_decontaminate_flags_shared_13grams(spark):
    # bench doc: 14 tokens -> two 13-grams
    bench_text = " ".join(f"t{i}" for i in range(14))
    # x: exact copy (2 shared 13-grams); y: shares only a 12-token
    # window (below n); z: disjoint; s: shorter than n (never flagged)
    y_text = " ".join(f"t{i}" for i in range(12)) + " other tail words"
    z_text = " ".join(f"z{i}" for i in range(20))
    s_text = "t0 t1 t2"
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, y_text), (3, z_text), (4, s_text)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["hit_ngrams"], r["contaminated"])
        for r in co.decontaminate(corpus, bench, n=13).collect()
    }
    assert out == {1: (2, True), 2: (0, False), 3: (0, False), 4: (0, False)}


def test_decontaminate_plan_broadcasts_benchmark(spark, sf_dir):
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        explain_str,
    )
    from nolock_social_ocr_services_spark.queries import q_decontaminate

    df = q_decontaminate(spark, sf_dir)
    plan = explain_str(df)
    # both the n-gram probe and the flag re-attach are broadcast hash
    # joins: the corpus side must never sort-merge (no wide shuffle of
    # the big table at 100 TB), and nothing here is Python
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert batch_eval_count(df) == 0


def test_decontaminate_excise_removes_exact_covered_tokens(spark):
    # bench: tokens t0..t13 (two 13-grams). corpus doc 1 = exact copy
    # -> every token covered -> empty rebuild, 14 removed. doc 2 has
    # the full bench text embedded mid-doc: prefix/suffix survive and
    # exactly the 14 embedded tokens go. doc 3 clean; doc 4 below n.
    bench_text = " ".join(f"t{i}" for i in range(14))
    embedded = "keep1 keep2 " + bench_text + " keep3"
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, embedded), (3, "u v w x y z a b c d e f g h"),
         (4, "t0 t1 t2")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, bench_text)], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in co.decontaminate_excise(corpus, bench, n=13).collect()
    }
    assert out[1] == ("", 14)
    assert out[2] == ("keep1 keep2 keep3", 14)
    assert out[3] == ("u v w x y z a b c d e f g h", 0)
    assert out[4] == ("t0 t1 t2", 0)


def test_dsir_weights_prefer_target_like_docs(spark):
    rows = [
        # target docs (source t) define the distribution: fruit words
        (1, "apple banana apple cherry banana", "t"),
        (2, "banana cherry apple apple", "t"),
        # raw doc 10 shares the target's vocabulary, 11 does not
        (10, "apple banana cherry apple", "r"),
        (11, "gearbox piston camshaft flywheel", "r"),
        (12, "", "r"),  # empty: no gram mass -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r
        for r in co.dsir_log_weights(df, F.col("source") == "t").collect()
    }
    assert 12 not in got
    assert got[1]["is_target"] == 1 and got[10]["is_target"] == 0
    # unigrams + bigrams: doc 10 has 4 tokens -> 4 + 3 = 7 grams
    assert got[10]["n_grams"] == 7
    assert got[10]["log_w"] > got[11]["log_w"]


def test_dsir_select_topk_and_gumbel_determinism(docs):
    tgt = F.col("source") == "src0"
    base = co.dsir_select(docs, tgt, k=20)
    a = base.collect()
    assert len(a) == 20
    # only raw docs compete; scores are sorted desc with doc_id tiebreak
    src0_ids = {
        r["doc_id"] for r in docs.filter(tgt).select("doc_id").collect()
    }
    assert not ({r["doc_id"] for r in a} & src0_ids)
    scores = [(-(r["score"]), r["doc_id"]) for r in a]
    assert scores == sorted(scores)
    # deterministic Gumbel noise: same seed -> identical selection,
    # and the noise actually perturbs the pure-weight ranking
    g1 = co.dsir_select(docs, tgt, k=20, gumbel_seed=7).collect()
    g2 = co.dsir_select(docs, tgt, k=20, gumbel_seed=7).collect()
    assert g1 == g2
    assert [r["doc_id"] for r in g1] != [r["doc_id"] for r in a]


def test_domain_cap_quota_math_and_subset(spark):
    rows = [(i, f"doc {i}", "big") for i in range(400)] + [
        (1000 + i, f"doc {1000 + i}", "small") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = co.domain_cap(df, quota_scale=8).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    # small domain: quota = min(5, ceil(8*sqrt(5))=18) = 5 -> threshold
    # 1e6 -> every row passes
    assert len(by_src["small"]) == 5
    assert all(r["cap_quota"] == 5 for r in by_src["small"])
    # big domain: quota = min(400, ceil(8*20)) = 160 -> threshold
    # 400000 -> ~40% kept (hash-approximate, never the full domain)
    big = by_src["big"]
    assert all(r["cap_quota"] == 160 and r["cap_threshold"] == 400000 for r in big)
    assert 100 <= len(big) <= 220
    # kept sets are a subset of the input and plan-independent
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids <= {r[0] for r in rows}
    again = {
        r["doc_id"] for r in co.domain_cap(df.repartition(13), quota_scale=8).collect()
    }
    assert again == kept_ids


def test_bpe_train_golden_merges_and_greedy_overlap(spark):
    # classic BPE example (Sennrich et al. 2016): hand-computed rounds
    text = " ".join(["low"] * 3 + ["lower"] * 2 + ["newest"] * 4 + ["widest"])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    seg_df, merges = co.bpe_train(df, iters=3)
    # r1: 'we' (6 = 2 in lower-family + 4 in newest); r2: 'lo' wins the
    # 5-5 tie with 'st' on left-symbol order; r3: 'st' (5)
    assert merges == [
        (1, "w", "e", "we", 6),
        (2, "l", "o", "lo", 5),
        (3, "s", "t", "st", 5),
    ]
    seg = {r["word"]: r["syms"] for r in seg_df.collect()}
    assert seg["low"] == ["lo", "w"]
    assert seg["lower"] == ["lo", "we", "r"]
    assert seg["newest"] == ["n", "e", "we", "st"]
    assert seg["widest"] == ["w", "i", "d", "e", "st"]
    # greedy left-to-right non-overlap: "aaa" under (a,a) -> ["aa","a"],
    # then (aa,a) -> ["aaa"], then NO pairs remain -> early stop
    df2 = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    seg2_df, merges2 = co.bpe_train(df2, iters=3)
    assert [(m[1], m[2]) for m in merges2] == [("a", "a"), ("aa", "a")]
    assert seg2_df.collect()[0]["syms"] == ["aaa"]


def _ref_bpe(word_freqs, iters):
    """Pure-python BPE reference: same spec as corpus_ops.bpe_train —
    pair counts weighted by word freq, argmax tie-break (count DESC,
    left ASC, right ASC), greedy left-to-right non-overlapping apply."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for t in range(iters):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((t + 1, l, r, l + r, c))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


@pytest.mark.parametrize("seed", [7, 23])
def test_bpe_train_matches_pure_python_reference(spark, seed):
    """Randomized cross-check: a seeded corpus over a 3-letter alphabet
    (maximal pair collisions, repeats like 'aaa' stressing the greedy
    non-overlap rule) must produce the exact merge table and the exact
    segmentation of every word that the pure-python reference does."""
    import random

    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 7)))
        for _ in range(25)
    ]
    freqs = {w: rng.randint(1, 9) for w in set(vocab)}
    text_words = [w for w, f in sorted(freqs.items()) for _ in range(f)]
    rng.shuffle(text_words)
    df = spark.createDataFrame(
        [(1, " ".join(text_words))], "doc_id long, text string"
    )
    seg_df, merges = co.bpe_train(df, iters=4)
    ref_merges, ref_syms = _ref_bpe(freqs, iters=4)
    assert merges == ref_merges
    got = {r["word"]: r["syms"] for r in seg_df.collect()}
    assert got == ref_syms


def test_char_entropy_golden_and_map_only(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "aaaa"),        # one symbol -> 0 bits
            (2, "abab"),        # uniform over 2 -> 1 bit
            (3, "abcd"),        # uniform over 4 -> 2 bits
            (4, "aab"),         # 2/3,1/3 -> ~0.918296
            (5, ""),            # empty -> no row
            (6, None),          # null -> no row
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in co.char_entropy(df).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["entropy_bits"] == 0.0
    assert got[2]["entropy_bits"] == 1.0
    assert got[3]["entropy_bits"] == 2.0
    h = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert got[4]["entropy_bits"] == pytest.approx(h, abs=1e-5)
    assert got[4]["n_chars"] == 3
    # map-only: no shuffle, no Python stage anywhere in the plan
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        exchange_count,
    )

    assert exchange_count(co.char_entropy(df)) == 0
    assert batch_eval_count(co.char_entropy(df)) == 0


def test_bpe_encode_broadcasts_vocab_and_matches_segmentation(spark):
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        explain_str,
        has_broadcast_join,
    )

    text = " ".join(["low"] * 3 + ["newest"] * 2)
    df = spark.createDataFrame(
        [(1, text), (2, "low widest")], "doc_id long, text string"
    )
    enc = co.bpe_encode(df, iters=2)
    # freq-weighted rounds: r1 merges (l,o)->'lo' (4 'low's dominate),
    # r2 merges (lo,w)->'low' — so every 'low' token encodes to itself
    rows = enc.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["subword"])
    assert by_doc[2].count("low") == 1  # 'low' fully merged after r2
    # doc-level stream length = sum of per-word subword counts
    seg = {
        r["word"]: r["syms"] for r in co.bpe_train(df, iters=2)[0].collect()
    }
    want1 = seg["low"] * 3 + seg["newest"] * 2
    assert sorted(by_doc[1]) == sorted(want1)
    # the encode join is a broadcast (vocab side), never a shuffle join
    plan = explain_str(enc)
    assert has_broadcast_join(enc)
    assert "SortMergeJoin" not in plan
    assert batch_eval_count(enc) == 0


def test_token_budget_plan_integer_math_and_caps(spark):
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        explain_str,
        has_broadcast_join,
    )

    # srcA: 10 tokens, srcB: 4 tokens, srcC weighted but absent
    df = spark.createDataFrame(
        [
            (1, "w " * 10, "srcA"),
            (2, "w w w w", "srcB"),
            (3, "ignored tokens here", "unweighted"),
        ],
        "doc_id long, text string, source string",
    )
    out = co.token_budget_plan(
        df,
        {"srcA": 500, "srcB": 300, "srcC": 200},
        budget_tokens=100,
        max_epochs_milli=4000,
    )
    rows = {r["source"]: r.asDict() for r in out.collect()}
    # unweighted source excluded; absent weighted source yields no row
    assert set(rows) == {"srcA", "srcB"}
    a, b = rows["srcA"], rows["srcB"]
    # need = floor(budget * w / 1000)
    assert (a["need_tokens"], b["need_tokens"]) == (50, 30)
    # srcA: ceil(1000*50/10) = 5000 -> capped at 4000 milli-epochs,
    # planned = min(50, 10*4) = 40, deficit 10
    assert (a["epochs_milli"], a["planned_tokens"], a["deficit_tokens"]) == (
        4000,
        40,
        10,
    )
    # srcB: ceil(1000*30/4) = 7500 -> capped, planned = min(30, 16) = 16
    assert (b["epochs_milli"], b["planned_tokens"], b["deficit_tokens"]) == (
        4000,
        16,
        14,
    )
    # recipe join broadcasts; no Python anywhere
    assert has_broadcast_join(out)
    assert "SortMergeJoin" not in explain_str(out)
    assert batch_eval_count(out) == 0


def test_token_budget_plan_uncapped_fit(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j", "s")], "doc_id long, text string, source string"
    )
    r = co.token_budget_plan(
        df, {"s": 1000}, budget_tokens=20, max_epochs_milli=4000
    ).first()
    # need 20, have 10 -> 2.0 epochs exactly, no deficit
    assert (r["epochs_milli"], r["planned_tokens"], r["deficit_tokens"]) == (
        2000,
        20,
        0,
    )


def test_curate_verdicts_and_rule_priority(spark):
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        exchange_count,
    )

    good = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "one two three"),            # too_short
            (2, "ab ab ab ab ab ab"),        # low entropy (also repetitive
            #                                  -> entropy wins by priority)
            (3, "spam " * 12 + "ham"),       # repetitive, entropy ~2.4 ok
            (4, good),                        # kept (digest owner)
            (5, good),                        # dup of 4
            (6, "a genuinely varied sentence with many different words"),
        ],
        "doc_id long, text string",
    )
    out = co.curate(df)
    # plan pins FIRST (pre-execution — AQE's post-run final plan prints
    # a materialized stage's Exchange twice): one narrow exchange (the
    # digest rank); zero Python
    assert exchange_count(out) == 1
    assert batch_eval_count(out) == 0
    got = {r["doc_id"]: r["verdict"] for r in out.collect()}
    assert got == {
        1: "too_short",
        2: "low_entropy",
        3: "repetitive",
        4: "kept",
        5: "dup",
        6: "kept",
    }


def test_bpe_fertility_hand_computed(spark):
    from nolock_social_ocr_services_spark.plans.inspect import (
        batch_eval_count,
        explain_str,
        has_broadcast_join,
    )

    df = spark.createDataFrame(
        [(1, "low low low lower", "en"), (2, "low widest", "de")],
        "doc_id long, text string, lang string",
    )
    out = co.bpe_fertility(df, iters=2)
    # global merges: r1 (l,o)->lo [5 occurrences], r2 (lo,w)->low [5]
    # seg: low=[low](1 sym), lower=[low,e,r](3), widest=[w..t](6)
    rows = {r["lang"]: r.asDict() for r in out.collect()}
    en, de = rows["en"], rows["de"]
    assert (en["n_words"], en["n_subwords"], en["n_chars"]) == (4, 6, 14)
    assert (en["fertility_milli"], en["chars_per_subword_milli"]) == (
        1500,
        2333,
    )
    assert (de["n_words"], de["n_subwords"], de["n_chars"]) == (2, 7, 9)
    assert (de["fertility_milli"], de["chars_per_subword_milli"]) == (
        3500,
        1285,
    )
    # vocab join broadcasts; no row-Python
    assert has_broadcast_join(out)
    assert "SortMergeJoin" not in explain_str(out)
    assert batch_eval_count(out) == 0


def test_curate_shuffle_excludes_text(spark):
    # the text column must be projected away BEFORE the dedup-rank
    # exchange — only (id, digest, n_tokens, flags) cross the wire
    df = spark.createDataFrame([(1, "w x y z q")], "doc_id long, text string")
    out = co.curate(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    exch = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert exch and all("text#" not in ln for ln in exch)


def test_nb_quality_matches_python_oracle(spark):
    from nolock_social_ocr_services_spark.functions import corpus_ops

    rows = [
        (0, "good clean prose text", 1),
        (1, "good solid prose here", 1),
        (2, "spam spam buy now", 0),
        (3, "buy spam now cheap", 0),
        (4, "good prose with spam", 0),   # mixed doc to score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ref int")
    out = {
        r.doc_id: r
        for r in corpus_ops.nb_quality(df, F.col("ref") == 1).collect()
    }

    import math
    from collections import Counter

    cp, cn = Counter(), Counter()
    for _id, text, ref in rows:
        (cp if ref else cn).update(text.split())
    tp, tn = sum(cp.values()), sum(cn.values())
    v = len(set(cp) | set(cn))
    prior = round(math.log(2 / 3), 9)

    def logit(text):
        s = sum(
            round(
                math.log(
                    ((cp[t] + 1.0) * (tn + v)) / ((cn[t] + 1.0) * (tp + v))
                ),
                9,
            )
            for t in text.split()
        )
        return round(s + prior, 6)

    for _id, text, ref in rows:
        assert out[_id].nb_logit == pytest.approx(logit(text), abs=2e-6)
        assert out[_id].is_ref == ref
    # reference-corpus docs score above the spammy ones
    assert out[0].p_hq > 0.5 > out[2].p_hq
    assert out[1].nb_logit > out[4].nb_logit > out[3].nb_logit


def test_pareto_keep_deterministic_and_monotone_in_alpha(spark):
    """The keep set is a pure function of (doc_id, salt, alpha); p=1
    docs always survive; raising alpha (thinner tail) can only shrink
    the kept set at fixed scores."""
    from nolock_social_ocr_services_spark.functions import corpus_ops

    scored = spark.createDataFrame(
        [(i, i / 99.0) for i in range(100)], "doc_id long, p_hq double"
    )
    k1 = {r.doc_id for r in corpus_ops.pareto_keep(scored).collect() if r.keep}
    k2 = {r.doc_id for r in corpus_ops.pareto_keep(scored).collect() if r.keep}
    assert k1 == k2
    assert 99 in k1              # p_hq = 1.0: threshold 0, draw > 0 always
    assert 0 < len(k1) < 100     # stochastic middle: neither all nor none
    k_sharp = {
        r.doc_id
        for r in corpus_ops.pareto_keep(scored, alpha=50.0).collect()
        if r.keep
    }
    assert k_sharp <= k1
    # high scores survive more often than low scores
    assert len([d for d in k1 if d >= 50]) > len([d for d in k1 if d < 50])


# -- KMV sketch intersection ----------------------------------------------------


def _overlap_tokens(spark, n_shared=20, n_only=30):
    """Two groups whose token sets share exactly n_shared of
    n_shared + n_only tokens each (true Jaccard = shared/union)."""
    rows = []
    for i in range(n_shared):
        rows += [("A", f"shared{i}"), ("B", f"shared{i}")]
    for i in range(n_only):
        rows += [("A", f"only_a{i}"), ("B", f"only_b{i}")]
    return spark.createDataFrame(rows, "grp string, token string")


def test_kmv_overlap_exact_when_k_covers_union(spark):
    """With k >= |union| the sketch IS the full hash set, so the
    estimator is exact: J = 20 / 80, intersection = 20, union = 80."""
    toks = _overlap_tokens(spark)
    out = co.kmv_overlap_pairs(toks, "grp", "token", k=128).collect()
    assert len(out) == 1
    r = out[0]
    assert r.grp_a == "A" and r.grp_b == "B"
    assert r.k_merged == 80 and r.n_both == 20
    assert r.jaccard_est == pytest.approx(0.25)
    assert r.est_union == 80 and r.est_intersection == 20


def test_kmv_overlap_estimates_within_tolerance(spark):
    """k << |union|: estimates stay in a sane band around truth
    (J = 100/300 ~ 0.333 with k=64 -> stderr ~ 1/sqrt(64) ~ 0.125)."""
    toks = _overlap_tokens(spark, n_shared=100, n_only=100)
    r = co.kmv_overlap_pairs(toks, "grp", "token", k=64).first()
    assert r.k_merged == 64
    assert abs(r.jaccard_est - 100 / 300) < 0.2
    assert abs(r.est_union - 300) / 300 < 0.35


def test_kmv_sketches_merge_equals_direct(spark):
    """Mergeability: k-min of (sketch_A union sketch_B) equals the
    sketch built directly over the concatenated data — the property
    that lets shards sketch independently at 100 TB."""
    toks = _overlap_tokens(spark)
    sk = {r.grp: r.sketch for r in co.kmv_sketches(toks, "grp", "token", k=16).collect()}
    both = toks.withColumn("grp", F.lit("ALL"))
    direct = co.kmv_sketches(both, "grp", "token", k=16).first().sketch
    merged = sorted(set(sk["A"]) | set(sk["B"]))[:16]
    assert merged == sorted(direct)
