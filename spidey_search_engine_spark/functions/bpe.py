"""Byte-pair-encoding tokenizer APPLICATION, distributed.

`textstats.with_bpe_token_estimate` budgets corpora cheaply; this module
actually tokenizes, with an injectable trained merges table — the op a
training pipeline runs right before chunking/packing, and the source of
the REAL `n_tokens` those stages consume.

Semantics are standard greedy BPE (Sennrich et al. 2016 / GPT-2 shape):

* pre-tokenize to words with a GPT-2-ish regex (leading-space words,
  letter/digit/punct runs) — kept as a plain Python regex so the
  pure-python reference in tests is the same code path;
* each word starts as its character sequence; repeatedly merge the
  adjacent pair with the LOWEST merge rank until no mergeable pair
  remains;
* tokens of all words concatenate in order.

Scale shape: one mapInPandas pass (Arrow batches, no shuffle) with a
per-executor WORD memo — corpora are Zipfian, so the per-word merge loop
runs once per distinct word per executor, not once per occurrence (the
same memo trick the index tokenizer uses). The merges table rides the
UDF closure (a trained table is vocab-sized, i.e. broadcastable
metadata, like the dictionary head or ANN centroids).

Determinism: pure function of (text, merges). Not SQL-expressible (the
merge loop is unbounded-depth recursion over rank order), so this op is
pinned by a pure-python reference + golden tests instead of a DuckDB
oracle — same verification tier as ivf_train_kmeans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRETOKEN = re.compile(
    r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")


def bpe_word(word: str, ranks: "dict[tuple[str, str], int]") -> "list[str]":
    """Greedy BPE of one pre-token: merge the lowest-rank adjacent pair
    until none applies. Pure python — the distributed kernel and the
    test reference both call THIS function."""
    parts = list(word)
    while len(parts) > 1:
        best, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


MAX_WORD_LEN = 1024


def bpe_tokenize(text: str, ranks: "dict[tuple[str, str], int]",
                 memo: "dict[str, list[str]] | None" = None,
                 memo_cap: "int | None" = None,
                 max_word_len: int = MAX_WORD_LEN) -> "list[str]":
    """All BPE tokens of ``text`` in order (pure-python reference).

    Pretokens longer than ``max_word_len`` are emitted as raw characters
    (= BPE with no applicable merges): bpe_word is O(L^2), so one
    megabyte-long uniform junk run (crawl garbage is full of them) would
    otherwise stall an executor for hours; a real corpus word never
    approaches the cap. ``memo_cap`` is enforced per WORD insert, not per
    document, so a single document with millions of distinct pretokens
    cannot grow the memo past the cap either."""
    out: "list[str]" = []
    for w in _PRETOKEN.findall(text):
        if len(w) > max_word_len:
            out.extend(w)
            continue
        if memo is not None:
            toks = memo.get(w)
            if toks is None:
                if memo_cap is not None and len(memo) >= memo_cap:
                    memo.clear()
                toks = bpe_word(w, ranks)
                memo[w] = toks
        else:
            toks = bpe_word(w, ranks)
        out.extend(toks)
    return out


def _passthrough_schema(df: DataFrame, extra: str) -> str:
    """mapInPandas output DDL = the input columns (backtick-escaped --
    names with spaces/dashes must survive the DDL parse) + extra
    fields. Shared by apply_bpe / tokens_to_ids so the escaping fix
    lives once."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in df.schema.fields)
    return f"{cols}, {extra}"


def apply_bpe(df: DataFrame, merges: "list[tuple[str, str]]",
              text_col: str = "text", out_col: str = "bpe_tokens",
              memo_cap: int = 1 << 20) -> DataFrame:
    """Adds ``out_col`` (array<string> of BPE tokens) and
    ``{out_col}_n`` (int count) — ONE Arrow pass, no shuffle.

    ``merges`` is the trained merge list in rank order (element 0 merges
    first). ``memo_cap`` bounds the per-executor word memo (reset when
    full, enforced per word insert — Zipf means the hot head stays
    resident either way); pretokens over MAX_WORD_LEN chars skip the
    quadratic merge loop and emit as characters (see bpe_tokenize).
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("duplicate pairs in merges table")
    if out_col in df.columns or f"{out_col}_n" in df.columns:
        raise ValueError(f"output column {out_col!r} already present")
    schema = _passthrough_schema(
        df, f"`{out_col}` array<string>, `{out_col}_n` int")

    def gen(batches):
        memo: "dict[str, list[str]]" = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                toks.append(bpe_tokenize(t if t is not None else "",
                                         ranks, memo, memo_cap=memo_cap))
            pdf = pdf.copy()
            pdf[out_col] = toks
            pdf[f"{out_col}_n"] = [len(t) for t in toks]
            yield pdf

    return df.mapInPandas(gen, schema)


def word_counts(df: DataFrame, text_col: str = "text",
                max_words: int = 1_000_000) -> "list[tuple[str, int]]":
    """(word, count) head of the corpus pretoken frequency table, by ONE
    distributed pass (mapInPandas pretokenize -> hash agg) + a bounded
    head collect ordered (count desc, word asc — deterministic).

    BPE training operates on word FREQUENCIES, not the corpus: the word
    table is vocab-scale, and its Zipf head carries almost all pair mass,
    so training on the top `max_words` is the standard 100-TB strategy
    (the same head-vs-tail cut as the dictionary preload). The corpus is
    read once regardless of n_merges.
    """
    def gen(batches):
        import pandas as pd
        for pdf in batches:
            counts: "dict[str, int]" = {}
            for t in pdf[text_col]:
                if t is None:
                    continue
                for w in _PRETOKEN.findall(t):
                    counts[w] = counts.get(w, 0) + 1
            yield pd.DataFrame({"word": list(counts),
                                "n": list(counts.values())})

    wc = (df.mapInPandas(gen, "word string, n long")
          .groupBy("word").agg(F.sum("n").alias("n"))
          .orderBy(F.desc("n"), F.asc("word")).limit(max_words))
    return [(r["word"], int(r["n"])) for r in wc.collect()]


def train_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              max_words: int = 1_000_000) -> "list[tuple[str, str]]":
    """Learn a merges table from the corpus (Sennrich et al. 2016).

    One distributed word-count pass (word_counts), then driver-side
    training over the frequency head with INCREMENTAL pair-count updates:
    a pair->count table plus a pair->{word ids} index, so each merge
    re-scans only the words containing the merged pair, and selection is
    a lazy-invalidation max-heap (entries re-pushed on count change;
    stale tops discarded against pair_n on pop) — O(log n) per merge, the
    classic fast-BPE shape, NOT an O(|pairs|) rescan per merge (at the
    1M-word head with a 32k-merge run the linear scan costs hours).
    Tie-break on (count desc, pair asc) is fully deterministic.

    Stops early when no pair repeats. The result feeds apply_bpe.
    """
    import heapq

    words = word_counts(df, text_col, max_words)
    seqs = [list(w) for w, _ in words]
    freqs = [n for _, n in words]
    pair_n: "dict[tuple[str, str], int]" = {}
    pair_w: "dict[tuple[str, str], set[int]]" = {}
    for wi, seq in enumerate(seqs):
        for a, b in zip(seq, seq[1:]):
            p = (a, b)
            pair_n[p] = pair_n.get(p, 0) + freqs[wi]
            pair_w.setdefault(p, set()).add(wi)
    heap = [(-n, p) for p, n in pair_n.items()]
    heapq.heapify(heap)
    merges: "list[tuple[str, str]]" = []
    for _ in range(n_merges):
        # deterministic argmax (count desc, pair asc): pop until the top
        # entry's count matches the live table — stale entries from
        # count updates are discarded here (lazy invalidation)
        bp = None
        while heap:
            negn, p = heap[0]
            if pair_n.get(p, 0) != -negn:
                heapq.heappop(heap)
                continue
            if -negn < 2:
                heap = []
                break
            bp = p
            break
        if bp is None:
            break
        merges.append(bp)
        merged = bp[0] + bp[1]
        for wi in list(pair_w.get(bp, ())):
            seq, f = seqs[wi], freqs[wi]
            # remove this word's contribution, rewrite, re-add
            for a, b in zip(seq, seq[1:]):
                p = (a, b)
                pair_n[p] -= f
                if p != bp:
                    heapq.heappush(heap, (-pair_n[p], p))
                    pair_w.get(p, set()).discard(wi)
            new = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == bp:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seqs[wi] = new
            for a, b in zip(new, new[1:]):
                p = (a, b)
                pair_n[p] = pair_n.get(p, 0) + f
                heapq.heappush(heap, (-pair_n[p], p))
                pair_w.setdefault(p, set()).add(wi)
        pair_w.pop(bp, None)
        pair_n.pop(bp, None)
    return merges


def build_vocab(df: DataFrame, tokens_col: str = "bpe_tokens",
                max_vocab: int = 1 << 20, reserve: int = 1) -> DataFrame:
    """(token, id) — frequency-ranked vocabulary over a token-array
    column. id = reserve + rank-1 (count desc, token asc — deterministic);
    ids below `reserve` stay free for specials (0 = OOV/unk by default).
    One explode + hash agg + a top-`max_vocab` rank: the vocab table is
    bounded metadata, the same tier as the dictionary head."""
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    return (df.select(F.explode(tokens_col).alias("token"))
            .groupBy("token").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("token")).limit(max_vocab)
            .select("token", (F.row_number().over(w) + reserve - 1)
                    .cast("int").alias("id")))


def tokens_to_ids(df: DataFrame, vocab: DataFrame,
                  tokens_col: str = "bpe_tokens",
                  out_col: str = "token_ids",
                  oov_id: int = 0) -> DataFrame:
    """Adds ``out_col`` (array<int>): each token mapped through the vocab,
    misses to ``oov_id`` — the final step that makes a sequence table
    trainer-ready (int ids, not strings).

    The vocab ships as a plain dict in the kernel closure (bounded by
    build_vocab's max_vocab — broadcast-sized metadata, NOT a join: a
    per-token join would explode + shuffle + reassemble the whole corpus
    to look up a dictionary that fits in executor memory)."""
    mapping = {r["token"]: int(r["id"]) for r in vocab.collect()}

    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already present")
    schema = _passthrough_schema(df, f"`{out_col}` array<int>")

    def gen(batches):
        get = mapping.get
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [[get(t, oov_id) for t in toks]
                            if toks is not None else []
                            for toks in pdf[tokens_col]]
            yield pdf

    return df.mapInPandas(gen, schema)
