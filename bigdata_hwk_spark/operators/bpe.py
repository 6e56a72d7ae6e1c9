"""Distributed BPE tokenizer training — pair statistics + merge table.

Not in the reference (SURVEY.md §2.11 north-star extensions): before an
LLM pretraining run ever sees the corpus, a tokenizer is trained ON the
corpus, and at 100 TB that training is itself a distributed analytics
job. Byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL) learns a merge
table: repeatedly find the most frequent ADJACENT symbol pair across
the corpus and fuse it into a new symbol.

The scale insight — the one every production BPE trainer uses — is that
the corpus collapses to its WORD HISTOGRAM first: pair counts only ever
depend on (distinct word, frequency), and by Heaps' law the vocabulary
grows ~n^0.7 while the corpus grows ~n, so after one corpus-scale
groupBy every subsequent merge iteration touches a table orders of
magnitude smaller than the input. That first groupBy is the ONLY
corpus-scale shuffle; it map-side combines (word counts are the
textbook combiner case), and the k merge rounds after it are k tiny
jobs over the persisted vocabulary.

Segmentation state is a single string per word — each current symbol
individually WRAPPED in an ASCII unit separator (``"\\x1f"``, absent
from the corpus by an enforced filter) and concatenated: ``"abc"`` →
``"␟a␟␟b␟␟c␟"``. Applying merge (l, r) is then ONE literal, leftmost
non-overlapping ``replace`` of ``"␟l␟␟r␟"`` with ``"␟lr␟"``. The
per-symbol wrap (rather than a shared joiner) is load-bearing: two
adjacent pair instances never share a character, so the replace scan
that continues AFTER each match still sees the next instance intact —
a shared joiner would let ``[a,a,a,a]`` under-merge to ``[aa,a,a]``
(the consumed boundary separator hides the second pair) where greedy
BPE produces ``[aa,aa]``. The wrap also makes boundary coincidences
impossible (a match must align with a whole symbol: symbol interiors
never contain the separator), and leftmost non-overlapping scan IS the
greedy left-to-right pass classic BPE specifies. Successive merges nest as
literal ``replace`` calls inside one whole-stage-codegen projection —
iteration k re-derives segmentation from the pristine vocab with k
nested replaces instead of mutating cached state, so the persisted
vocab never changes and no lineage/cache churn accumulates.

Per iteration the driver receives exactly ONE row (the argmax pair via
``orderBy(...).limit(1)``) — bounded metadata, not data — and ties
break deterministically (count DESC, left ASC, right ASC), making the
whole merge table reproducible bit-for-bit across engines and runs;
``tests/test_bpe.py`` pins it against a pure-Python reference trainer.

``bpe_pair_stats`` (round 0 of the same computation: char-level pair
counts over the word histogram) is fully SQL-expressible and carries
the DuckDB oracle; the iterative merge loop is rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import persist_scoped

# ASCII unit separator: symbol delimiter inside segmentation strings.
# Words containing it are excluded (cannot be represented); the fixture
# corpus is plain ASCII text and contains none, and at production scale
# the excluded tail is noise bytes, not language.
BPE_SEP = "\x1f"
BPE_PAIR_TOPK = 64
BPE_MERGES = 12
BPE_MIN_PAIR_COUNT = 2
# Broadcast the (word -> n_tokens) side of the encode join only while
# the measured vocab is comfortably driver-sized; a production-scale
# vocab (Heaps ~n^0.7 of a 100 TB corpus) must be allowed to degrade to
# a shuffle hash join on the same key instead of OOMing the broadcast.
BPE_BROADCAST_MAX_VOCAB = 4_000_000


def _word_vocab(documents: DataFrame) -> DataFrame:
    """(word, f): the corpus word histogram — the one corpus-scale
    shuffle in BPE training (map-side combined word counts)."""
    return (
        documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("word")
        )
        .filter(
            (F.col("word") != "") & ~F.col("word").contains(BPE_SEP)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def _adjacent_pairs(vocab: DataFrame, syms_col) -> DataFrame:
    """(left_sym, right_sym, f) — one row per adjacent symbol pair per
    vocab word, weighted later by the word's frequency ``f``.

    ``syms_col`` is a Column producing the wrapped segmentation string;
    trimming the outer separators and splitting on the doubled
    inter-symbol separator recovers [s1, .., sk], and the two
    off-by-one slices zip into the adjacent pairs — all JVM built-ins,
    no Python in the loop.
    """
    inner = F.split(
        F.btrim(syms_col, F.lit(BPE_SEP)), BPE_SEP + BPE_SEP
    )
    pairs = F.arrays_zip(
        F.slice(inner, 1, F.size(inner) - 1).alias("left_sym"),
        F.slice(inner, 2, F.size(inner) - 1).alias("right_sym"),
    )
    return (
        vocab.select("f", F.explode(pairs).alias("p"))
        .select("p.left_sym", "p.right_sym", "f")
    )


def _char_syms(word_col) -> F.Column:
    """word → per-char wrapped segmentation: "abc" → "␟a␟␟b␟␟c␟"."""
    return F.array_join(
        F.transform(
            F.split(word_col, ""),
            lambda c: F.concat(F.lit(BPE_SEP), c, F.lit(BPE_SEP)),
        ),
        "",
    )


def bpe_pair_stats(
    documents: DataFrame, k: int = BPE_PAIR_TOPK
) -> DataFrame:
    """(rank, left_sym, right_sym, pair_count): the top-k most frequent
    adjacent character pairs across the corpus, occurrence-weighted —
    BPE merge round 0 as one declarative plan (and the profiling query
    a tokenizer team runs before committing to a vocab size).

    Corpus → word histogram → per-word char pairs (weighted by word
    frequency, so the pair explode runs over the Heaps-compressed vocab,
    not the corpus) → global count → deterministic top-k (count DESC,
    then pair lexicographic; row_number, no ties left to the engine).
    """
    vocab = _word_vocab(documents)
    counts = (
        _adjacent_pairs(vocab, _char_syms(F.col("word")))
        .groupBy("left_sym", "right_sym")
        .agg(F.sum("f").alias("pair_count"))
    )
    w = Window.orderBy(
        F.desc("pair_count"), "left_sym", "right_sym"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "left_sym",
            "right_sym",
            F.col("pair_count").cast("bigint").alias("pair_count"),
        )
    )


def bpe_pair_stats_sql(k: int = BPE_PAIR_TOPK) -> str:
    """Oracle: identical word filter, identical per-character pair
    extraction (DuckDB ``range`` + ``substring`` — the corpus is ASCII,
    so Java code-unit and UTF-8 codepoint indexing agree), identical
    deterministic ranking."""
    return f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
v AS (SELECT word, count(*) AS f FROM w
      WHERE word <> '' AND strpos(word, chr(31)) = 0 GROUP BY word),
idx AS (SELECT word, f, unnest(range(1, length(word))) AS i FROM v),
p AS (SELECT substring(word, CAST(i AS INT), 1) AS left_sym,
             substring(word, CAST(i AS INT) + 1, 1) AS right_sym, f
      FROM idx),
agg AS (SELECT left_sym, right_sym, sum(f) AS pair_count
        FROM p GROUP BY left_sym, right_sym),
ranked AS (SELECT row_number() OVER (ORDER BY pair_count DESC,
                                     left_sym, right_sym) AS rank,
                  left_sym, right_sym, pair_count
           FROM agg)
SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym,
       CAST(pair_count AS BIGINT) AS pair_count
FROM ranked WHERE rank <= {k}
"""


def bpe_merge_table(
    documents: DataFrame,
    n_merges: int = BPE_MERGES,
    min_count: int = BPE_MIN_PAIR_COUNT,
) -> DataFrame:
    """(merge_rank, left_sym, right_sym, merged, pair_count): the
    learned BPE merge table — ``n_merges`` greedy rounds, each fusing
    the currently most frequent adjacent symbol pair (ties broken
    count DESC, left ASC, right ASC; stop early when the best pair's
    count drops below ``min_count``).

    Distributed shape: the word histogram is persisted ONCE; iteration
    k runs one aggregation job over it with the segmentation derived on
    the fly by k nested literal ``replace`` calls (one codegen
    projection — the vocab table itself is never rewritten), and ships
    exactly one argmax row to the driver. No corpus re-scan after round
    0, no growing lineage, no Python row path.

    Rows-only by design (an iterative argmax loop is not one SQL
    query); exactness is pinned against a pure-Python reference trainer
    in ``tests/test_bpe.py``.
    """
    spark = documents.sparkSession
    vocab, release = persist_scoped(_word_vocab(documents))
    try:
        merges, _ = _train_merges(vocab, n_merges, min_count)
        return spark.createDataFrame(
            merges,
            "merge_rank bigint, left_sym string, right_sym string, "
            "merged string, pair_count bigint",
        )
    finally:
        release()


def _sized_vocab(vocab: DataFrame) -> DataFrame:
    """Materialize the persisted vocab and right-size its partitioning:
    the merge loop runs n_merges tiny jobs over this table, and a
    Heaps-compressed vocab of a few thousand rows spread over 32 shuffle
    partitions pays 32 task launches per round for microseconds of work
    each. Partitions ∝ measured row count (one narrow coalesce on top of
    the cache — no second shuffle); a production-scale vocab keeps the
    session's full parallelism."""
    n = vocab.count()  # also materializes the persist
    parallelism = vocab.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(parallelism, n // 50_000 + 1))
    return vocab.coalesce(parts)


def _train_merges(
    vocab: DataFrame, n_merges: int, min_count: int
) -> tuple[list[tuple[int, str, str, str, int]], F.Column]:
    """Run the greedy merge loop over a persisted word-histogram and
    return (merge table rows, final segmentation Column) — the Column
    is the k-nested-replace projection that segments any word under the
    learned merges, reused by the encode side."""
    vocab = _sized_vocab(vocab)
    syms = _char_syms(F.col("word"))
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(vocab, syms)
            .groupBy("left_sym", "right_sym")
            .agg(F.sum("f").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < min_count:
            break
        l, r, c = (
            best[0]["left_sym"],
            best[0]["right_sym"],
            int(best[0]["pair_count"]),
        )
        merges.append((rank, l, r, l + r, c))
        syms = F.replace(
            syms,
            F.lit(BPE_SEP + l + BPE_SEP + BPE_SEP + r + BPE_SEP),
            F.lit(BPE_SEP + l + r + BPE_SEP),
        )
    return merges, syms


def bpe_encode_stats(
    documents: DataFrame,
    n_merges: int = BPE_MERGES,
    min_count: int = BPE_MIN_PAIR_COUNT,
) -> DataFrame:
    """(doc_id, n_words, n_chars, n_tokens): the apply side — encode
    every document under the merge table just trained on the corpus and
    report per-doc token counts (n_chars/n_tokens is the compression
    ratio a tokenizer team reads off a candidate vocab; all-integer
    output so engines cannot disagree).

    Distributed shape: tokens-per-word is computed ONCE per distinct
    word on the Heaps-compressed vocab (the same nested-replace codegen
    projection the trainer ends with — the corpus is never re-segmented
    row by row), then documents explode to words and equi-join that
    (word → n_tokens) table; the vocab side is Heaps-law small relative
    to the corpus, so the join broadcasts while the MEASURED vocab row
    count stays under ``BPE_BROADCAST_MAX_VOCAB`` (the count is free —
    the persisted vocab was already materialized by ``_sized_vocab``);
    above it the hint is withheld so AQE picks a shuffle hash join on
    the same key instead of force-broadcasting an oversized vocab. Docs with no encodable word (empty text, or every
    word carrying the separator byte) keep a row with zero counts via
    the left join — conservation (sum(n_chars) is merge-invariant) is
    property-tested.

    Rows-only by design (the merge table is data-dependent, so no
    static SQL can express train-then-encode); exactness is pinned
    against the pure-Python reference encoder in ``tests/test_bpe.py``.
    """
    vocab, release = persist_scoped(_word_vocab(documents))
    try:
        _, syms = _train_merges(vocab, n_merges, min_count)
        inner = F.split(
            F.btrim(syms, F.lit(BPE_SEP)), BPE_SEP + BPE_SEP
        )
        word_tok = vocab.select(
            "word",
            F.length("word").alias("w_chars"),
            F.size(inner).alias("w_tokens"),
        )
        doc_words = documents.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("word"),
        ).filter((F.col("word") != "") & ~F.col("word").contains(BPE_SEP))
        n_vocab = vocab.count()  # cached; materialized in _sized_vocab
        tok_side = (
            F.broadcast(word_tok)
            if n_vocab <= BPE_BROADCAST_MAX_VOCAB
            else word_tok
        )
        per_doc = (
            doc_words.join(tok_side, "word")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("w_chars").alias("n_chars"),
                F.sum("w_tokens").alias("n_tokens"),
            )
        )
        out = (
            documents.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
                F.coalesce("n_chars", F.lit(0)).cast("bigint").alias("n_chars"),
                F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
            )
        )
        # releasing the vocab cache here is safe AND correct: the merges
        # are already driver-side literals baked into `syms`, and the
        # returned (lazy) plan references the deterministic histogram
        # exactly once — the cache only ever amortized the train loop's
        # per-round jobs
        return out
    finally:
        release()


def bpe_apply_reference(
    word: str, merges: list[tuple[int, str, str, str, int]]
) -> list[str]:
    """Pure-Python reference encoder (test oracle for the encode side):
    apply the learned merges in rank order, each as the same leftmost
    non-overlapping greedy pass the trainer uses."""
    syms: list[str] = list(word)
    for _, l, r, _, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_train_reference(
    word_freqs: dict[str, int],
    n_merges: int = BPE_MERGES,
    min_count: int = BPE_MIN_PAIR_COUNT,
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python reference trainer (test oracle for the distributed
    loop): same greedy argmax, same deterministic tie-break, same
    leftmost non-overlapping merge application."""
    segs = {w: tuple(w) for w in word_freqs}
    out = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < min_count:
            break
        out.append((rank, l, r, l + r, c))
        for w, syms in segs.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            segs[w] = tuple(merged)
    return out
