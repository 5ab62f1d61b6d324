"""BPE tokenizer: fold-merge semantics, trainer, encoder vs a pure
Python model of the classic algorithm (Sennrich et al. 2016)."""

import collections
import re

import pytest
from pyspark.sql import functions as F

from eventkit_spark.llm.tokenize import (
    _merge_pair,
    bpe_apply_merges,
    bpe_encode,
    bpe_token_freq,
    bpe_train,
)

RX = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def py_merge(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_train(texts, n):
    freq = collections.Counter()
    for t in texts:
        freq.update(RX.findall(t))
    words = {w: (list(w), f) for w, f in freq.items()}
    merges = []
    for rank in range(1, n + 1):
        pc = collections.Counter()
        for _, (s, f) in words.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, c))
        words = {w: (py_merge(s, l, r), f) for w, (s, f) in words.items()}
    return merges, words


TEXTS = [
    "the cat sat on the mat",
    "the hat of the cat!",
    "a cat, a mat, a hat 42",
    "",  # must survive encode with zeros
    "zzzz aaaa abab banana",  # overlap / chain merge stress
]


@pytest.mark.parametrize(
    "syms,l,r",
    [
        (list("aaaa"), "a", "a"),  # chained greedy: [aa, aa]
        (list("aaa"), "a", "a"),  # odd run: [aa, a]
        (list("abab"), "a", "b"),
        (list("ababa"), "b", "a"),  # match starts mid-word
        (list("x"), "a", "b"),  # no pair possible
        ([], "a", "b"),
        (["ab", "c", "ab", "ab"], "ab", "ab"),  # multi-char symbols
        (list("banana"), "a", "n"),
    ],
)
def test_merge_fold_matches_greedy(spark, syms, l, r):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_merge_pair(F.col("syms"), l, r).alias("m")).first()["m"]
    assert got == py_merge(syms, l, r)


def test_merge_fold_randomized_batch(spark):
    """Seeded random sweep: 200 symbol arrays over a 3-letter alphabet
    (collision-heavy) x random merge pairs, folded in ONE Spark job,
    must match the greedy Python model case-for-case."""
    import random

    rng = random.Random(20260815)
    alpha = ["a", "b", "ab"]
    cases = []
    for i in range(200):
        syms = [rng.choice(alpha) for _ in range(rng.randrange(0, 12))]
        l, r = rng.choice(alpha), rng.choice(alpha)
        cases.append((i, syms, l, r))
    df = spark.createDataFrame(cases, "i int, syms array<string>, l string, r string")
    # one plan: group cases by (l, r) so each distinct pair folds once
    by_pair = {}
    for i, syms, l, r in cases:
        by_pair.setdefault((l, r), []).append(i)
    got = {}
    for (l, r), idxs in by_pair.items():
        rows = (
            df.filter(F.col("i").isin(idxs))
            .select("i", _merge_pair(F.col("syms"), l, r).alias("m"))
            .collect()
        )
        got.update({row["i"]: row["m"] for row in rows})
    for i, syms, l, r in cases:
        assert got[i] == py_merge(syms, l, r), (syms, l, r)


def test_train_matches_python_model(spark):
    exp, _ = py_train(TEXTS, 8)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()]
    assert got == exp


def test_distributed_path_matches_driver_path(spark):
    # driver_types_max=0 forces the fully distributed fold loop; both
    # paths must learn identical rulesets (same counts, same tie-break)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    fast = [tuple(r) for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()]
    dist = [
        tuple(r)
        for r in bpe_train(docs, n_merges=6, driver_types_max=0)
        .orderBy("rank")
        .collect()
    ]
    assert fast == dist
    ff = {
        r["token"]: r["freq"]
        for r in bpe_token_freq(docs, n_merges=6).collect()
    }
    df_ = {
        r["token"]: r["freq"]
        for r in bpe_token_freq(docs, n_merges=6, driver_types_max=0).collect()
    }
    assert ff == df_


def test_encode_counts_and_empty_doc(spark):
    _, words = py_train(TEXTS, 6)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"])
        for r in bpe_encode(docs, n_merges=6).collect()
    }
    exp = {}
    for i, t in enumerate(TEXTS):
        ws = RX.findall(t)
        exp[i] = (
            sum(len(words[w][0]) for w in ws),
            sum(len(w) for w in ws),
        )
    assert got == exp
    assert got[3] == (0, 0)  # empty doc kept, zeroed


def test_apply_merges_preserves_order(spark):
    merges, words = py_train(TEXTS, 6)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    rules = [(l, r) for _, l, r, _ in merges]
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_apply_merges(docs, rules).collect()
    }
    for i, t in enumerate(TEXTS):
        exp = [tok for w in RX.findall(t) for tok in words[w][0]]
        assert got[i] == exp, f"doc {i}"


def test_apply_merges_kernel_path_parity(spark):
    """max_fold_merges=0 forces the Arrow kernel encode; it must equal
    the nested-fold path token-for-token on every doc."""
    merges, _ = py_train(TEXTS, 8)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    rules = [(l, r) for _, l, r, _ in merges]
    fold = {r["doc_id"]: r["tokens"]
            for r in bpe_apply_merges(docs, rules).collect()}
    kern = {r["doc_id"]: r["tokens"]
            for r in bpe_apply_merges(docs, rules, max_fold_merges=0).collect()}
    assert kern == fold


def test_token_freq_matches_model(spark):
    _, words = py_train(TEXTS, 6)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    exp = collections.Counter()
    for _, (s, f) in words.items():
        for tok in s:
            exp[tok] += f
    got = {
        r["token"]: r["freq"] for r in bpe_token_freq(docs, n_merges=6).collect()
    }
    assert got == dict(exp)
    # top-k cutoff is deterministic: (freq DESC, token)
    topk = [
        (r["token"], r["freq"])
        for r in bpe_token_freq(docs, n_merges=6, top=5).collect()
    ]
    exp_top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert sorted(topk, key=lambda kv: (-kv[1], kv[0])) == exp_top


def test_bpe_store_lifecycle(spark, tmp_path):
    """Train-once / apply-every-batch: the persisted ruleset encodes a
    NEW batch identically to applying the in-memory merges directly."""
    from eventkit_spark.llm.tokenize import (
        bpe_encode_with_store,
        bpe_load_merges,
        bpe_store_init,
    )

    train_docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    store = str(tmp_path / "tok")
    bpe_store_init(train_docs, store, n_merges=6)
    rules = bpe_load_merges(spark, store)
    exp_merges, _ = py_train(TEXTS, 6)
    assert rules == [(l, r) for _, l, r, _ in exp_merges]

    batch = spark.createDataFrame(
        [(100, "the mat of that cat"), (101, "brand new words here")],
        "doc_id int, text string",
    )
    via_store = {r["doc_id"]: r["tokens"]
                 for r in bpe_encode_with_store(batch, store).collect()}
    direct = {r["doc_id"]: r["tokens"]
              for r in bpe_apply_merges(batch, rules).collect()}
    assert via_store == direct and len(via_store) == 2


def test_null_text_rows_survive_the_surface(spark):
    """The ADVICE bug class was NULL-key row loss. NULL-text documents
    must neither crash nor vanish: bpe_encode keeps them with zeros,
    bpe_apply_merges with an empty token array, train just ignores
    them (regexp over NULL yields no pretokens)."""
    from eventkit_spark.llm.tokenize import bpe_encode

    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, None), (2, "a cat mat")],
        "doc_id int, text string",
    )
    merges = [tuple(r)[1:3] for r in bpe_train(docs, n_merges=4).collect()]
    enc = {r["doc_id"]: (r["n_tokens"], r["n_chars"])
           for r in bpe_encode(docs, n_merges=4).collect()}
    assert set(enc) == {0, 1, 2}
    assert enc[1] == (0, 0)
    ap = {r["doc_id"]: r["tokens"]
          for r in bpe_apply_merges(docs, merges).collect()}
    assert set(ap) == {0, 1, 2} and ap[1] == []


def test_train_stops_on_degenerate_corpus(spark):
    # single-char words only: no pairs to merge anywhere
    docs = spark.createDataFrame([(0, "a b c a b")], "doc_id int, text string")
    assert bpe_train(docs, n_merges=4).count() == 0
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)


def test_distributed_train_releases_all_cached_frames(spark):
    # Regression (r6 advice): the second-to-last persisted word-type
    # frame leaked one cache entry per distributed training call.
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    bpe_train(docs, n_merges=4, driver_types_max=0).collect()
    after = jsc.getPersistentRDDs().size()
    assert after <= before, f"leaked {after - before} cached frame(s)"


def test_byte_level_matches_char_level_on_ascii(spark):
    """Printable-ASCII corpora: byte seeds map to themselves (GPT-2
    table is identity on 33-126), so byte-level training with no
    end-of-word marker learns the char-level ruleset exactly — on both
    the driver and the distributed path."""
    from eventkit_spark.llm.tokenize import bpe_train_bytes

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    )
    char = [tuple(r) for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()]
    byte = [tuple(r) for r in bpe_train_bytes(docs, n_merges=6).orderBy("rank").collect()]
    dist = [
        tuple(r)
        for r in bpe_train_bytes(docs, n_merges=6, driver_types_max=0)
        .orderBy("rank").collect()
    ]
    assert byte == char == dist


def test_byte_level_non_ascii_and_eow(spark):
    """Non-ASCII input seeds through the byte table (no <unk>, no
    crash): a 2-byte UTF-8 char yields two byte symbols, and the
    most frequent pair merges them back. The end-of-word marker joins
    merges like any symbol."""
    from eventkit_spark.llm.tokenize import bpe_train_bytes, bytes_to_unicode

    t = bytes_to_unicode()
    docs = spark.createDataFrame(
        [(0, "é é é")], "doc_id int, text string"
    )
    got = bpe_train_bytes(docs, n_merges=1).collect()[0]
    eb = "é".encode("utf-8")
    assert (got["lhs"], got["rhs"]) == (t[eb[0]], t[eb[1]])
    assert got["pair_count"] == 3

    # eow: single-symbol words merge with the marker
    docs2 = spark.createDataFrame(
        [(0, "a a a b")], "doc_id int, text string"
    )
    got2 = bpe_train_bytes(docs2, n_merges=1, eow="</w>").collect()[0]
    assert (got2["lhs"], got2["rhs"], got2["pair_count"]) == ("a", "</w>", 3)


def test_bytes_to_unicode_is_the_public_table(spark):
    """Pin the construction: 256 distinct symbols, identity on the
    printable ranges, 256+k (ascending) on the rest."""
    from eventkit_spark.llm.tokenize import bytes_to_unicode

    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t)) == 256
    assert t[ord("A")] == "A" and t[33] == "!" and t[255] == chr(255)
    assert ord(t[0]) == 256 and ord(t[32]) == 256 + 32


def test_apply_merges_byte_level_roundtrip(spark):
    """byte_level encode: applying a bpe_train_bytes ruleset yields
    tokens whose concatenation reproduces each pretoken's byte-mapped
    form (+ eow), on BOTH the fold path and the Arrow kernel path; on
    printable ASCII without a marker it matches the char-level path."""
    from eventkit_spark.llm.tokenize import (
        bpe_apply_merges, bpe_train_bytes, bytes_to_unicode,
    )

    t = bytes_to_unicode()
    docs = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(TEXTS + ["é ño é"])],
        "doc_id int, text string",
    )
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(docs, n_merges=6, eow="</w>")
        .orderBy("rank").collect()
    ]
    fold = bpe_apply_merges(docs, rules, byte_level=True, eow="</w>")
    kern = bpe_apply_merges(
        docs, rules, byte_level=True, eow="</w>", max_fold_merges=0
    )
    f = {r["doc_id"]: r["tokens"] for r in fold.collect()}
    assert f == {r["doc_id"]: r["tokens"] for r in kern.collect()}

    import re

    from eventkit_spark.llm.text import BPE_REGEX

    for r in docs.collect():
        expect = "".join(
            "".join(t[b] for b in w.encode("utf-8")) + "</w>"
            for w in re.findall(BPE_REGEX, r["text"])
        )
        assert "".join(f[r["doc_id"]]) == expect

    # ASCII, no marker: byte-level encode == char-level encode
    ascii_docs = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(TEXTS)], "doc_id int, text string"
    )
    rules2 = [
        (r["lhs"], r["rhs"])
        for r in bpe_train_bytes(ascii_docs, n_merges=6).orderBy("rank").collect()
    ]
    b = bpe_apply_merges(ascii_docs, rules2, byte_level=True).collect()
    c = bpe_apply_merges(ascii_docs, rules2).collect()
    assert {r["doc_id"]: r["tokens"] for r in b} == {
        r["doc_id"]: r["tokens"] for r in c
    }


def test_bpe_encode_bytes_ascii_parity(spark):
    """bpe_encode_bytes(eow=None) on printable ASCII == bpe_encode
    row-for-row (bytes seed to themselves, so merges and counts
    coincide) — the fertility-parity contract for the byte family; the
    non-ASCII + eow form counts byte symbols, not chars."""
    from eventkit_spark.llm.tokenize import bpe_encode, bpe_encode_bytes

    docs = spark.createDataFrame(
        [(i, txt) for i, txt in enumerate(TEXTS)], "doc_id int, text string"
    )
    a = sorted(bpe_encode(docs, n_merges=6).collect())
    b = sorted(bpe_encode_bytes(docs, n_merges=6).collect())
    assert a == b

    # and per-language fertility derived from the two agrees on ASCII
    from pyspark.sql import functions as F

    fa = bpe_encode(docs, n_merges=6).agg(
        F.sum("n_tokens").alias("t"), F.sum("n_chars").alias("c")).first()
    fb = bpe_encode_bytes(docs, n_merges=6).agg(
        F.sum("n_tokens").alias("t"), F.sum("n_chars").alias("c")).first()
    assert (fa["t"], fa["c"]) == (fb["t"], fb["c"])

    # eow form: one extra pre-merge symbol per pretoken, merges may
    # differ; n_chars = bytes + 1 per word (é is 2 bytes)
    uni = spark.createDataFrame([(0, "é é x")], "doc_id int, text string")
    r = bpe_encode_bytes(uni, n_merges=1, eow="</w>").first()
    assert r["n_chars"] == (2 + 1) * 2 + (1 + 1)
