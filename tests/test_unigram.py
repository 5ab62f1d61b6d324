"""Unigram-LM tokenizer: vocabulary, Viterbi encode, prune trainer vs
a pure-Python model of the same integer objective (Kudo 2018 reduced
to fewest-pieces-then-max-score — see llm/unigram.py)."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from eventkit_spark.llm.unigram import (
    COST_BASE,
    SCORE_CLAMP,
    _dp_full,
    _packed_scores,
    _walk_pieces,
    unigram_encode,
    unigram_encode_with_store,
    unigram_store_init,
    unigram_train,
    unigram_vocab,
)

RX = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_INF = 1 << 62

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a banana and a bandana",
    "internationalization and internationalism",
    "the theory of the thermal theme",
    "",
    "aaaa bbbb aaaa",
    "123 456 123!",
]


def py_vocab(texts, vocab_size, min_len=2, max_len=4):
    freq = collections.Counter()
    for t in texts:
        freq.update(RX.findall(t))
    raw = collections.Counter()
    chars = collections.Counter()
    for w, f in freq.items():
        for l in range(min_len, max_len + 1):
            for s in range(0, len(w) - l + 1):
                raw[w[s : s + l]] += f
        for c in w:
            chars[c] += f
    top = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    out = {p: min(r, SCORE_CLAMP) for p, r in top}
    out.update({c: min(r, SCORE_CLAMP) for c, r in chars.items()})
    return out


def py_cost(word, vocab, L):
    dp = [0] + [_INF] * len(word)
    for i in range(1, len(word) + 1):
        best = _INF
        for l in range(1, min(L, i) + 1):
            s = vocab.get(word[i - l : i])
            if s is None and l == 1:
                s = 0
            if s is None:
                continue
            best = min(best, dp[i - l] + COST_BASE - s)
        dp[i] = best
    return dp[len(word)]


def py_encode(texts, vocab, L):
    out = []
    for t in texts:
        p = s = 0
        for w in RX.findall(t):
            dp = py_cost(w, vocab, L)
            pieces = (dp + COST_BASE - 1) // COST_BASE  # ceil: score may be 0
            p += pieces
            s += pieces * COST_BASE - dp
        out.append((p, s))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_vocab_matches_python_model(spark, docs):
    got = {
        r["piece"]: r["score"]
        for r in unigram_vocab(docs, vocab_size=20).collect()
    }
    assert got == py_vocab(TEXTS, 20)


def test_encode_matches_python_model(spark, docs):
    vocab = py_vocab(TEXTS, 20)
    L = max(len(p) for p in vocab)
    want = py_encode(TEXTS, vocab, L)
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in unigram_encode(docs, vocab_size=20).collect()
    }
    assert got == {i: want[i] for i in range(len(TEXTS))}


def test_empty_doc_reports_zero(spark, docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in unigram_encode(docs, vocab_size=8).collect()
    }
    assert got[5] == (0, 0)


def test_char_only_vocab_counts_chars(spark, docs):
    # single-char-only vocabulary: every word segments into its chars,
    # so n_tokens == total pretoken characters
    chars = collections.Counter()
    for t in TEXTS:
        for w in RX.findall(t):
            chars.update(w)
    vocab = spark.createDataFrame(
        sorted((c, min(f, SCORE_CLAMP)) for c, f in chars.items()),
        "piece string, score long",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_encode(docs, vocab=vocab).collect()
    }
    want = {
        i: sum(len(w) for w in RX.findall(t)) for i, t in enumerate(TEXTS)
    }
    assert got == want


def test_walk_reconstructs_words_and_costs(spark, docs):
    vocab_df = unigram_vocab(docs, vocab_size=20)
    vocab = {r["piece"]: r["score"] for r in vocab_df.collect()}
    L = max(len(p) for p in vocab)
    types = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col("text"), F.lit(RX.pattern), 0
                )
            ).alias("word")
        )
        .distinct()
    )
    wm = _packed_scores(types, vocab_df, L)
    rows = (
        wm.select(
            "word",
            "m",
            _dp_full(F.col("word"), F.col("m"), L).alias("__dparr"),
        )
        .select(
            "word",
            F.col("__dparr"),
            _walk_pieces(
                F.col("word"), F.col("__dparr"), F.col("m"), L
            ).alias("toks"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # the chosen pieces tile the word exactly
        assert "".join(r["toks"]) == r["word"]
        # and their summed cost equals the DP optimum
        cost = sum(
            COST_BASE - vocab.get(p, 0 if len(p) == 1 else None)
            for p in r["toks"]
        )
        assert cost == r["__dparr"][-1]
        assert cost == py_cost(r["word"], vocab, L)


def test_train_prunes_to_size_and_keeps_alphabet(spark, docs):
    out = unigram_train(
        docs, vocab_size=6, start_size=24, iters=3
    ).collect()
    pieces = {r["piece"]: r["score"] for r in out}
    multi = [p for p in pieces if len(p) > 1]
    assert len(multi) <= 6
    alphabet = set()
    for t in TEXTS:
        for w in RX.findall(t):
            alphabet.update(w)
    assert alphabet <= set(pieces)
    assert all(1 <= s <= SCORE_CLAMP for s in pieces.values())


def test_train_deterministic(spark, docs):
    a = sorted(
        map(tuple, unigram_train(docs, vocab_size=5, start_size=20).collect())
    )
    b = sorted(
        map(tuple, unigram_train(docs, vocab_size=5, start_size=20).collect())
    )
    assert a == b


def test_trained_vocab_beats_char_baseline(spark, docs):
    trained = unigram_train(docs, vocab_size=10, start_size=40, iters=2)
    enc = unigram_encode(docs, vocab=trained)
    total = enc.agg(F.sum("n_tokens")).first()[0]
    baseline = sum(
        len(w) for t in TEXTS for w in RX.findall(t)
    )
    assert total <= baseline


def test_store_roundtrip_and_unknown_chars(spark, docs, tmp_path):
    vocab = unigram_train(docs, vocab_size=6, start_size=24, iters=1)
    path = str(tmp_path / "uni_store")
    unigram_store_init(vocab, path)
    direct = {
        tuple(r)
        for r in unigram_encode(docs, vocab=vocab).collect()
    }
    stored = {
        tuple(r)
        for r in unigram_encode_with_store(docs, path).collect()
    }
    assert direct == stored
    # inference on text with characters the store never saw: the
    # 0-score <unk> char fallback segments them, one token per char
    new = spark.createDataFrame(
        [(0, "zzz qq")], "doc_id long, text string"
    )
    got = unigram_encode_with_store(new, path).collect()[0]
    assert got["n_tokens"] == 5  # z and q unseen -> one 0-score char each


def test_lexical_diversity_counts(spark, docs):
    from eventkit_spark.llm.text import lexical_diversity

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_types"],
            r["n_hapax"],
            r["ttr_ppm"],
        )
        for r in lexical_diversity(docs).collect()
    }
    for i, t in enumerate(TEXTS):
        words = RX.findall(t)
        cnt = collections.Counter(words)
        tok = len(words)
        typ = len(cnt)
        hap = sum(1 for c in cnt.values() if c == 1)
        ttr = typ * 1_000_000 // tok if tok else 0
        assert got[i] == (tok, typ, hap, ttr), f"doc {i}"


def test_vocab_size_independence(spark, docs):
    """The packed-map design's core claim: a vocabulary 100x larger
    (dominated by pieces the corpus never contains) changes nothing
    about the encode result or its feasibility — per-word DP work is
    bounded by word structure, not vocabulary size."""
    small = unigram_vocab(docs, vocab_size=20)
    base = {p: s for p, s in ((r["piece"], r["score"]) for r in small.collect())}
    # pad with thousands of alien pieces at scores that could never win
    alien = [
        (f"q{i:03d}x"[: 2 + i % 3], 1) for i in range(4000)
    ]
    alien = [(p, s) for p, s in alien if p not in base and len(p) >= 2]
    big = spark.createDataFrame(
        sorted(base.items()) + sorted(set(alien)),
        "piece string, score long",
    )
    a = sorted(map(tuple, unigram_encode(docs, vocab=small).collect()))
    b = sorted(map(tuple, unigram_encode(docs, vocab=big).collect()))
    assert a == b


def test_tokenize_tiles_words_and_matches_encode(spark, docs):
    from eventkit_spark.llm.unigram import unigram_tokenize

    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in unigram_tokenize(docs, vocab_size=20).collect()
    }
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in unigram_encode(docs, vocab_size=20).collect()
    }
    for i, t in enumerate(TEXTS):
        # order-preserving: concatenated tokens == concatenated pretokens
        assert "".join(toks[i]) == "".join(RX.findall(t)), f"doc {i}"
        # token count agrees with the packed-cost encode
        assert len(toks[i]) == enc[i], f"doc {i}"
    assert toks[5] == []


def test_oracle_constants_match_engine():
    """The DuckDB oracle replays the DP with its own copies of the
    cost base / clamp — a silent drift in either side would fail
    every unigram contract; pin them equal."""
    import __spark_entry__ as e
    from eventkit_spark.llm import unigram

    assert e._UNI_BIG == unigram.COST_BASE
    assert e._UNI_CLAMP == unigram.SCORE_CLAMP


def test_vocab_rejects_bad_lengths(spark, docs):
    with pytest.raises(ValueError):
        unigram_vocab(docs, vocab_size=5, min_len=4, max_len=2)


def test_min_len_one_vocab_encodes(spark, docs):
    """min_len=1 puts single chars in BOTH vocab branches; the union
    dedup must keep the packed-score map build free of duplicate keys
    (previously DUPLICATED_MAP_KEY)."""
    v = unigram_vocab(docs, vocab_size=10, min_len=1, max_len=3)
    pieces = [r["piece"] for r in v.collect()]
    assert len(pieces) == len(set(pieces))
    out = unigram_encode(docs, vocab=v)
    assert out.count() == len(TEXTS)


def test_walk_tie_break_matches_python_model(spark, docs):
    """The backward walk's EXACT piece sequence (not just its cost):
    smallest-l wins DP-identity ties, which the trainer's usage counts
    depend on — a tie broken the other way would train a different
    vocabulary while still passing the tiling/cost assertions."""
    vocab_df = unigram_vocab(docs, vocab_size=20)
    vocab = {r["piece"]: r["score"] for r in vocab_df.collect()}
    L = max(len(p) for p in vocab)

    def py_walk(word):
        dp = [0] + [_INF] * len(word)
        for i in range(1, len(word) + 1):
            best = _INF
            for l in range(1, min(L, i) + 1):
                s = vocab.get(word[i - l : i])
                if s is None and l == 1:
                    s = 0
                if s is None:
                    continue
                best = min(best, dp[i - l] + COST_BASE - s)
            dp[i] = best
        toks, pos = [], len(word)
        while pos > 0:
            for l in range(1, min(L, pos) + 1):
                s = vocab.get(word[pos - l : pos])
                if s is None and l == 1:
                    s = 0
                if s is None:
                    continue
                if dp[pos] == dp[pos - l] + COST_BASE - s:
                    toks.append(word[pos - l : pos])
                    pos -= l
                    break
        return list(reversed(toks))

    types = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(RX.pattern), 0)
            ).alias("word")
        )
        .distinct()
    )
    wm = _packed_scores(types, vocab_df, L)
    rows = (
        wm.select(
            "word", "m", _dp_full(F.col("word"), F.col("m"), L).alias("d")
        )
        .select(
            "word",
            _walk_pieces(F.col("word"), F.col("d"), F.col("m"), L).alias(
                "toks"
            ),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert list(r["toks"]) == py_walk(r["word"]), r["word"]


def test_user_vocab_duplicate_pieces_collapse(spark, docs):
    # duplicate pieces in a USER-supplied vocabulary must not blow up
    # the packed-score map (DUPLICATED_MAP_KEY); max score wins (r8
    # ADVICE). Encoding must equal the deduped-vocab encoding.
    base = py_vocab(TEXTS, 12)
    rows = [(p, s) for p, s in base.items()] + [
        (p, s - 1) for p, s in list(base.items())[:3]
    ]
    dup_df = spark.createDataFrame(rows, "piece string, score long")
    clean_df = spark.createDataFrame(
        sorted(base.items()), "piece string, score long"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in unigram_encode(docs, vocab=dup_df).collect()
    }
    want = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in unigram_encode(docs, vocab=clean_df).collect()
    }
    assert got == want


def test_train_seed_equals_standalone_vocab(spark, docs):
    # the trainer's wt-seeded vocabulary path (one corpus scan) must
    # produce exactly the standalone unigram_vocab seed — the r8 ADVICE
    # refactor may not drift the seed
    from eventkit_spark.llm.tokenize import pretoken_counts
    from eventkit_spark.llm.unigram import _vocab_from_types

    a = {
        r["piece"]: r["score"]
        for r in unigram_vocab(docs, vocab_size=25).collect()
    }
    wt = pretoken_counts(docs, "text", 1)
    b = {
        r["piece"]: r["score"]
        for r in _vocab_from_types(wt, 25, 2, 4).collect()
    }
    assert a == b


def test_train_rejects_bad_lengths(spark, docs):
    # the r9 seed refactor must keep unigram_vocab's range validation
    with pytest.raises(ValueError):
        unigram_train(docs, min_len=0)
    with pytest.raises(ValueError):
        unigram_train(docs, min_len=5, max_len=4)
