"""Text-operator edge cases the corpus doesn't contain: Spark and the
DuckDB oracle must agree on empty and whitespace-only documents
(string_split('', '') is [''] in DuckDB but [] in Spark — every char-split
oracle needs an explicit guard)."""

from __future__ import annotations

import duckdb
import pytest

from simple_query_engine_spark.operators import text as TX


@pytest.fixture(scope="module")
def tricky_docs(spark):
    rows = [
        (1, "hello world", "en", "s", 11),
        (2, "", "en", "s", 0),
        (3, "   ", "en", "s", 3),  # whitespace-only normalizes to ''
        (4, "a", "en", "s", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'hello world', 'en', 's', 11), (2, '', 'en', 's', 0), "
        "(3, '   ', 'en', 's', 3), (4, 'a', 'en', 's', 1)"
        ") t(doc_id, text, lang, source, n_chars)"
    )
    return df, con


def test_rolling_hash_agrees_on_empty_docs(spark, tricky_docs, tmp_path):
    df, con = tricky_docs
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)
    spark_rows = sorted(
        map(tuple, TX.q_rolling_hash(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_rolling_hash"]).fetchall())
    )
    assert spark_rows == duck_rows
    by_id = dict(spark_rows)
    assert by_id[2] == 0 and by_id[3] == 0  # empty/whitespace → fold seed


def test_token_count_agrees_on_empty_docs(spark, tricky_docs, tmp_path):
    df, con = tricky_docs
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    spark_rows = sorted(
        map(tuple, TX.q_token_count(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_token_count"]).fetchall())
    )
    assert spark_rows == duck_rows


def test_tfidf_ranks_doc_specific_terms_first(spark, tmp_path):
    """A word unique to one document must outscore a word present in every
    document (whose idf is ln(1)=0); ranks are 1..k with non-increasing
    scores; empty docs contribute no rows."""
    rows = [
        (1, "shared zebra zebra apple", "en", "s", 24),
        (2, "shared banana", "en", "s", 13),
        (3, "shared cherry", "en", "s", 13),
        (4, "", "en", "s", 0),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = TX.q_tfidf_top_terms(spark, str(tmp_path)).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.term_rank)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc
    assert by_doc[1][0].word == "zebra"  # tf=2, doc-unique
    for terms in by_doc.values():
        assert [t.term_rank for t in terms] == list(range(1, len(terms) + 1))
        scores = [t.tfidf for t in terms]
        assert scores == sorted(scores, reverse=True)
        # 'shared' appears in every non-empty doc → idf ln(4/3), still > 0
        # because the EMPTY doc counts in N; it must rank below doc-unique words
        assert terms[0].word != "shared"


def test_unigram_surprisal_ranks_rare_tokens_higher(spark, sf_dir):
    from simple_query_engine_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    rows = T.q_unigram_surprisal(spark, sf_dir).collect()
    assert len(rows) == docs
    assert all(r.avg_surprisal > 0 for r in rows)
    # Cross-entropy of a corpus-estimated unigram LM is bounded by the
    # vocabulary's max surprisal: -ln(1/total_tokens).
    import math

    total = sum(r.n_tokens for r in rows)
    assert all(r.avg_surprisal <= math.log(total) + 1e-9 for r in rows)


def test_unigram_surprisal_quantization_matches_float_reference(spark, sf_dir):
    """The quantized-ln integer formulation must stay within quantization
    error (0.5/SCALE per ln term → ≤ ~1e-6 on the mean) of the naive
    float avg(−ln p); 1e-3 leaves two orders of headroom."""
    import math
    from collections import Counter

    from simple_query_engine_spark.operators import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    tokens_by_doc = {
        r.doc_id: [w for w in " ".join(r.text.lower().split()).split(" ") if w]
        for r in docs
    }
    vocab = Counter(w for toks in tokens_by_doc.values() for w in toks)
    total = sum(vocab.values())
    rows = T.q_unigram_surprisal(spark, sf_dir).collect()
    for r in rows:
        toks = tokens_by_doc[r.doc_id]
        assert r.n_tokens == len(toks)
        ref = sum(-math.log(vocab[w] / total) for w in toks) / len(toks)
        assert abs(r.avg_surprisal - ref) < 1e-3, (r.doc_id, r.avg_surprisal, ref)


def test_unigram_surprisal_plan_single_scan(spark, sf_dir):
    """Round-5 perf regression guard: the round-5 version ran an eager
    words.count() and re-tokenized the corpus.  The rewrite must show, in
    the FINAL adaptive plan, exactly one parquet scan of documents (the
    vocab/totals branches consume ReusedExchange nodes) and no eager
    action before the plan executes."""
    from simple_query_engine_spark.operators import text as T

    df = T.q_unigram_surprisal(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("FileScan parquet") == 1, final
    assert final.count("ReusedExchange") >= 2, final


def test_bigram_surprisal_plan_single_scan(spark, sf_dir):
    """Same guard for the bigram-LM variant: the doc×bigram aggregate is
    referenced by three branches (per-doc sums, bigram vocabulary, prefix
    marginals); the FINAL adaptive plan must consume ReusedExchange nodes
    and scan the documents parquet exactly once."""
    from simple_query_engine_spark.operators import text as T

    df = T.q_bigram_surprisal(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("FileScan parquet") == 1, final
    assert final.count("ReusedExchange") >= 2, final


def test_repetition_edge_docs_agree_with_oracle(spark, tmp_path):
    """Empty / single-word / fully-repetitive docs: Spark and DuckDB must
    agree (the usual string_split('') hazard), and the metrics must take
    their boundary values (no bigrams -> null frac; 'a a a' -> frac 1.0)."""
    import duckdb

    rows = [
        (1, "a a a", "en", "s", 5),
        (2, "", "en", "s", 0),
        (3, "solo", "en", "s", 4),
        (4, "x y x y", "en", "s", 7),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'a a a', 'en', 's', 5), (2, '', 'en', 's', 0), "
        "(3, 'solo', 'en', 's', 4), (4, 'x y x y', 'en', 's', 7)"
        ") t(doc_id, text, lang, source, n_chars)"
    )
    spark_rows = sorted(
        map(tuple, TX.q_text_repetition(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_repetition"]).fetchall())
    )
    assert spark_rows == duck_rows
    by_id = {r[0]: r for r in spark_rows}
    assert by_id[1] == (1, 3, round(1 / 3, 4), 1.0)  # 'a a' twice of 2 bigrams
    assert by_id[2][1] == 1 and by_id[2][3] is None  # '' -> one empty token
    assert by_id[3] == (3, 1, 1.0, None)
    assert by_id[4] == (4, 4, 0.5, 0.6667)  # 'x y' twice of 3 bigrams


def test_gopher_quality_planted_docs(spark, tmp_path):
    """Hand-computed Gopher char-fraction values on planted docs, plus
    Spark-vs-DuckDB agreement on the edge shapes (empty doc, fully
    repetitive doc, coverage union of overlapping duplicated 5-grams)."""
    import duckdb

    texts = {
        1: "x y z x y z x y z",  # every word inside a duplicated 5-gram
        2: " ".join("abcdefghijklmnopqrst"),  # 20 distinct 1-char words
        3: "",  # empty: NULL ppm, pass=1
        4: "p q r s t u v p q r s t w x y z",  # one repeated 5-gram
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in texts.items()]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{t}', 'en', 's', {len(t)})" for i, t in texts.items()
    )
    con.execute(
        f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
        "t(doc_id, text, lang, source, n_chars)"
    )
    spark_rows = sorted(
        map(tuple, TX.q_text_gopher_quality(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_gopher_quality"]).fetchall())
    )
    assert spark_rows == duck_rows
    by_id = {r[0]: r for r in spark_rows}
    # doc 1: 'x y z' occurs 3x, chars3 = 3*3 = 9 of 9; both duplicated
    # 5-grams together cover positions 1..9 -> dup chars 9 of 9.
    assert by_id[1] == (1, 9, 9, 1_000_000, 1_000_000, 0)
    # doc 2: all 3-grams distinct -> top gram covers 3 of 20 chars
    # (150000 ppm <= 180000) and no duplicated 5-gram -> pass.
    assert by_id[2] == (2, 20, 20, 150_000, 0, 1)
    # doc 3: empty -> one empty token, zero chars, NULL ppm, pass.
    assert by_id[3] == (3, 1, 0, None, None, 1)
    # doc 4: tie on (c=2, cl=3) across 'p q r'/'q r s'/'r s t' breaks to
    # 'p q r' (gram asc): 6 of 16 chars; the repeated 5-gram at positions
    # 1 and 8 covers word indices 1..5 and 8..12 -> 10 of 16 chars.
    assert by_id[4] == (4, 16, 16, 375_000, 625_000, 0)


def test_bigram_freq_counts(spark, tmp_path):
    rows = [
        (1, "to be or not to be", "en", "s", 18),
        (2, "to be", "en", "s", 5),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.gram: r.n for r in TX.q_text_bigram_freq(spark, str(tmp_path)).collect()}
    assert out["to be"] == 3
    assert out["be or"] == 1
    assert out["not to"] == 1


def test_bpe_train_matches_reference_python_bpe(spark, sf_dir):
    """Independent model: the classic Sennrich-style BPE training loop
    (word -> symbol tuple, frequency-weighted pair counting, greedy
    left-to-right merge, lexical tie-break) must produce the same K merge
    rules and counts as the DataFrame implementation."""
    import re
    from collections import Counter

    from simple_query_engine_spark.operators.text import (
        BPE_MERGES,
        q_text_bpe_train,
    )
    from simple_query_engine_spark.sources.catalog import table

    texts = [
        r.text for r in table(spark, sf_dir, "documents").select("text").collect()
    ]
    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[tuple(w)] += 1

    def pair_counts(v):
        c = Counter()
        for syms, freq in v.items():
            for a, b in zip(syms, syms[1:]):
                c[(a, b)] += freq
        return c

    def apply_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    expected = []
    for step in range(1, BPE_MERGES + 1):
        counts = pair_counts(vocab)
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((step, a, b, a + b, n))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            new_vocab[apply_merge(syms, a, b)] += freq
        vocab = new_vocab

    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in q_text_bpe_train(spark, sf_dir).orderBy("step").collect()
    ]
    assert got == expected

def _reference_bpe_final_vocab(texts, merges):
    """Word -> final symbol tuple after the classic Sennrich training loop
    (the test_bpe_train model, kept per-word so the encode entries can be
    checked against it)."""
    import re
    from collections import Counter

    word_freq = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            word_freq[w] += 1
    syms_of = {w: tuple(w) for w in word_freq}

    def apply_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    for _ in range(merges):
        counts = Counter()
        for w, syms in syms_of.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freq[w]
        (a, b), _n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        syms_of = {w: apply_merge(s, a, b) for w, s in syms_of.items()}
    return word_freq, syms_of


def test_bpe_encode_top_symbols_matches_reference(spark, sf_dir):
    """The encoded-corpus symbol rollup must equal the reference model's
    frequency-weighted symbol counts over the final vocab."""
    from collections import Counter

    from simple_query_engine_spark.operators.text import (
        BPE_MERGES,
        BPE_TOP_SYMBOLS,
        q_text_bpe_encode,
    )
    from simple_query_engine_spark.sources.catalog import table

    texts = [
        r.text for r in table(spark, sf_dir, "documents").select("text").collect()
    ]
    word_freq, syms_of = _reference_bpe_final_vocab(texts, BPE_MERGES)
    totals = Counter()
    for w, syms in syms_of.items():
        for s in syms:
            totals[s] += word_freq[w]
    expected = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[
        :BPE_TOP_SYMBOLS
    ]
    got = [
        (r.symbol, r.total_count)
        for r in q_text_bpe_encode(spark, sf_dir)
        .orderBy("total_count", "symbol", ascending=[False, True])
        .collect()
    ]
    assert got == expected


def test_bpe_encode_docs_matches_reference_encoding(spark, sf_dir):
    """Per-document token counts under the trained merges must equal
    encoding each document's words with the reference model's final vocab."""
    import re

    from simple_query_engine_spark.operators.text import (
        BPE_MERGES,
        q_text_bpe_encode_docs,
    )
    from simple_query_engine_spark.sources.catalog import table

    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    _, syms_of = _reference_bpe_final_vocab(docs.values(), BPE_MERGES)
    expected = {}
    for doc_id, text in docs.items():
        words = re.findall(r"[a-z]+", text.lower())
        if words:
            expected[doc_id] = (
                len(words),
                sum(len(syms_of[w]) for w in words),
            )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens_trained)
        for r in q_text_bpe_encode_docs(spark, sf_dir).collect()
    }
    assert got == expected
    # trained merges only ever SHRINK a word's token count vs character split
    for doc_id, (n_words, n_tokens) in got.items():
        n_chars = sum(
            len(w) for w in re.findall(r"[a-z]+", docs[doc_id].lower())
        )
        assert n_words <= n_tokens <= n_chars

def test_bpe_fertility_matches_reference(spark, sf_dir):
    """Per-language fertility must equal the reference model's rollup,
    and the integer-ppm ratio must be the exact floor division."""
    import re

    from simple_query_engine_spark.operators.text import (
        BPE_MERGES,
        q_text_bpe_fertility,
    )
    from simple_query_engine_spark.sources.catalog import table

    rows = table(spark, sf_dir, "documents").select("lang", "text").collect()
    _, syms_of = _reference_bpe_final_vocab([r.text for r in rows], BPE_MERGES)
    agg: dict[str, list[int]] = {}
    for r in rows:
        for w in re.findall(r"[a-z]+", r.text.lower()):
            cur = agg.setdefault(r.lang, [0, 0])
            cur[0] += 1
            cur[1] += len(syms_of[w])
    expected = {
        lang: (n_words, n_tokens, n_tokens * 1_000_000 // n_words)
        for lang, (n_words, n_tokens) in agg.items()
    }
    got = {
        r.lang: (r.n_words, r.n_tokens, r.fertility_ppm)
        for r in q_text_bpe_fertility(spark, sf_dir).collect()
    }
    assert got == expected
    # every language's fertility is >= 1 token/word by construction
    assert all(f >= 1_000_000 for _, _, f in got.values())


def test_quality_classifier_learns_planted_vocab(spark, tmp_path):
    """The corpus's lang column carries no lexical signal (declared in the
    entry docstring), so learning power is pinned on a planted fixture:
    two classes with disjoint content vocabularies plus shared stopwords
    must separate perfectly, scores signed by class."""
    import pandas as pd

    en_vocab = ["alpha", "bravo", "charlie", "delta", "echo"]
    xx_vocab = ["uno", "dos", "tres", "cuatro", "cinco"]
    shared = ["the", "of"]
    rows = []
    for i in range(40):
        is_en = i % 2 == 0
        vocab = en_vocab if is_en else xx_vocab
        words = [vocab[(i + j) % len(vocab)] for j in range(8)] + shared
        text = " ".join(words)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en" if is_en else "fr",
                "source": "src0",
                "n_chars": len(text),
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    got = {
        r.doc_id: r for r in TX.q_quality_classifier(spark, str(tmp_path)).collect()
    }
    assert len(got) == 40
    for i, r in got.items():
        assert r.actual_en == (i % 2 == 0), i
        assert r.predicted_en == r.actual_en, (i, r.score_micro)
        assert (r.score_micro > 0) == r.actual_en, i
        assert r.n_tokens == 10, i


def test_quality_classifier_token_counts_match_token_count_entry(spark, sf_dir):
    base = {
        r.doc_id: r.n_tokens for r in TX.q_token_count(spark, sf_dir).collect()
    }
    got = {
        r.doc_id: r.n_tokens
        for r in TX.q_quality_classifier(spark, sf_dir).collect()
    }
    assert got == {k: v for k, v in base.items() if v > 0} or got == base


def test_bm25_matches_python_model(spark, sf_dir):
    """Full integer BM25 recomputed in plain Python (postings, df, the
    quantized-ln idf, the cleared-denominator term score, ranking) —
    every (query, rank) row must match exactly."""
    import math
    import re
    from collections import Counter

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    postings: dict[int, Counter] = {}
    for d in docs:
        w = [
            t
            for t in re.sub(r"\s+", " ", d.text.lower()).strip().split(" ")
            if t
        ]
        if w:
            postings[d.doc_id] = Counter(w)
    dl = {did: sum(c.values()) for did, c in postings.items()}
    n_docs, t_tokens = len(dl), sum(dl.values())
    scale = TX.SURPRISAL_LN_SCALE
    expected: dict[tuple[int, int], tuple[int, int]] = {}
    for qid, terms in TX.BM25_QUERIES.items():
        scores: dict[int, tuple[int, int]] = {}
        for term in terms:
            df = sum(1 for c in postings.values() if term in c)
            if df == 0:
                continue
            idf = round(math.log(2 * n_docs + 2) * scale) - round(
                math.log(2 * df + 1) * scale
            )
            for did, c in postings.items():
                tf = c.get(term)
                if not tf:
                    continue
                s = (idf * 22 * t_tokens * tf) // (
                    10 * t_tokens * tf + 3 * t_tokens + 9 * dl[did] * n_docs
                )
                n, tot = scores.get(did, (0, 0))
                scores[did] = (n + 1, tot + s)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))
        for rank, (did, (n, tot)) in enumerate(ranked[: TX.BM25_TOP_K], 1):
            expected[(qid, rank)] = (did, n, tot)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.n_matched_terms, r.score_micro)
        for r in TX.q_text_bm25_search(spark, sf_dir).collect()
    }
    assert got == expected
    # every query returns a full page at the corpus vocabularies
    assert len(got) == len(TX.BM25_QUERIES) * TX.BM25_TOP_K


def test_boilerplate_templates_surface_planted_footer(spark, tmp_path):
    """A planted 8-word footer shared by most docs must rank first with
    exact occurrence/doc/source counts; singleton windows never rank."""
    footer = "contact us at example site all rights reserved"[:100]
    rows = []
    for i in range(6):
        body = f"unique body words number {i} alpha{i} beta{i} gamma{i} delta{i}"
        rows.append((i, body + " " + footer, "en", f"s{i % 2}", 0))
    rows.append((6, "totally unrelated standalone document body here now", "en", "s0", 0))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = TX.q_text_boilerplate_templates(spark, str(tmp_path)).collect()
    assert out
    top = out[0]
    assert top.gram == footer
    assert (top.n_occurrences, top.n_docs, top.n_sources) == (6, 6, 2)
    assert all(r.n_occurrences >= 2 for r in out)


def test_normalization_agrees_on_vertical_tab(spark):
    """Java \\s includes \\x0B but DuckDB's RE2 \\s does not — the shared
    normalization pins an EXPLICIT five-char whitespace class on both
    sides so a vertical-tab document tokenizes identically per engine."""
    import duckdb
    from pyspark.sql import functions as F

    weird = "A\x0bB \tc\nd\x0b"
    df = spark.createDataFrame([(weird,)], ["text"])
    got_spark = df.select(TX._normalized(F.col("text")).alias("n")).first().n
    con = duckdb.connect()
    got_duck = con.execute(
        f"SELECT {TX._NORM} FROM (SELECT ? AS text)", [weird]
    ).fetchone()[0]
    assert got_spark == got_duck == "a b c d"
