"""Distributed byte-pair-encoding merge training (Sennrich-style).

The vocabulary-construction step of an LLM training-data pipeline that
the q78 frequency vocab cannot express: learn the first K merge rules
from corpus statistics.  Classic BPE (Sennrich et al. 2016,
``learn_bpe``) iterates: count adjacent symbol pairs weighted by word
frequency (overlapping occurrences counted, exactly like the reference
algorithm's ``get_stats``), merge the most frequent pair everywhere,
repeat.  Here each iteration is a handful of DataFrame ops over the
*distinct-word* table (Zipf: tiny relative to the corpus), so the whole
training loop distributes and the corpus is scanned exactly once.

Representation trick — symbol sequences as delimited strings: a word's
symbol sequence ``[ab, c]`` is stored as ``¦ab¦¦c¦`` (every symbol
wrapped in ``¦``, concatenated).  Merging pair (a, b) everywhere is then
one ``replace(repr, '¦a¦¦b¦', '¦ab¦')`` — and because ``replace`` in
both Spark and DuckDB substitutes non-overlapping occurrences strictly
left to right, this IS the greedy merge order BPE specifies (``¦a¦¦a¦¦a¦``
→ ``¦aa¦¦a¦``).  The wrapper chars make matches symbol-exact: ``¦a¦¦b¦``
can never match inside ``¦ca¦¦b¦``, because the character before ``a``
is ``c``, not ``¦``.  Tokens that themselves contain ``¦`` (U+00A6) are
unrepresentable in this encoding and are dropped from the vocabulary
statistics by ``_word_table`` (the oracle mirrors the filter) — enforced,
not assumed.

Scale notes (100 TB corpus):
- The corpus is touched once (token explode → groupBy token).  Every
  merge iteration runs over |vocab| rows — millions at web scale, not
  billions — and the pair table is a flatMap of that (~avg word length
  rows per word), aggregated with map-side combine.
- The best pair is a 1-row argmax, broadcast into the merge join; the
  per-iteration state (word reprs) is localCheckpoint-pinned so K
  iterations cost K small jobs instead of a 2^K re-execution tree
  (CLAUDE.md loop discipline).
- No Python UDFs anywhere: regexp/replace/zip_with all run inside
  whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

SEP = "¦"  # '¦' — never appears in corpus tokens


def _word_table(
    docs: DataFrame, text_col: str, keep_token: bool = False
) -> DataFrame:
    """(repr, cnt[, token]): each distinct corpus token as its initial
    symbol sequence (one symbol per character), weighted by occurrence
    count.  ``keep_token`` carries the original token through the merge
    rounds — needed by appliers (tokenization) that must map corpus
    tokens back to their final symbol sequences."""
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    # Policy: a token containing the symbol delimiter U+00A6 cannot be
    # represented in the ¦-wrapped encoding — it is DROPPED from the
    # vocabulary statistics (mirrored in the oracle's w0 CTE) rather
    # than silently corrupting the symbol stream.  Real corpora never
    # tokenize to '¦', so this is a guard, not a behavior change.
    toks = toks.where(~F.col("token").contains(SEP))
    words = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    cols = [F.regexp_replace("token", "(.)", f"{SEP}$1{SEP}").alias("repr"), "cnt"]
    if keep_token:
        cols.append(F.col("token"))
    return words.select(*cols)


# GPT-2-style pre-tokenization, simplified to a lookahead-free regex so
# Java regex (Spark) and RE2 (DuckDB) agree: a pre-token is an optional
# leading space glued to a letter run, digit run or punctuation run, or a
# run of spaces.  (The original GPT-2 pattern's `\s+(?!\S)` needs negative
# lookahead, which RE2 rejects; contraction splits need \p{L} classes —
# both dropped, policy documented here.)
BYTE_PRETOK_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"


def byte_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(repr, cnt): byte-level BPE initial state — each pre-token rendered
    as its UTF-8 bytes in hex, one ¦-wrapped two-hex-char symbol per byte.

    Byte-level BPE (GPT-2, Radford et al. 2019) merges over the byte
    alphabet so ANY string is representable with a 256-symbol base
    vocabulary — no unknown tokens, spaces carried as leading ``20``
    bytes on the following word.  The hex rendering keeps the symbol
    stream inside the same ¦-delimited string machinery as the
    word-level learner (symbols are always even-length hex, trivially
    decodable with unhex), and [0-9A-F] can never collide with the
    delimiter, so no token filter is needed on this path."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BYTE_PRETOK_RE), F.lit(0))
        ).alias("token")
    )
    words = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    return words.select(
        F.regexp_replace(
            F.hex(F.encode("token", "UTF-8")), "(..)", f"{SEP}$1{SEP}"
        ).alias("repr"),
        "cnt",
    )


def byte_bpe_merges(
    docs: DataFrame, text_col: str = "text", num_merges: int = 4
) -> DataFrame:
    """Learn the first ``num_merges`` BYTE-LEVEL merge rules →
    (step, left_sym, right_sym, merged, freq), symbols as hex byte
    strings.  Same distributed loop as :func:`bpe_merges` — only the
    alphabet (bytes) and the pre-tokenizer (regex runs instead of
    whitespace split) differ."""
    if num_merges < 1:
        raise ValueError(f"need num_merges >= 1, got {num_merges}")
    words = byte_word_table(docs, text_col).localCheckpoint(eager=True)
    bests, _ = _merge_rounds(words, num_merges)
    return merges_from_bests(bests)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left_sym, right_sym, freq) adjacent-pair counts, overlapping
    occurrences included, weighted by word frequency — Sennrich
    ``get_stats`` semantics."""
    syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM repr)"), SEP + SEP)
    prs = F.zip_with(
        syms,
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
    )
    pairs = words.select("cnt", F.explode(prs).alias("p")).where(
        F.col("p.r").isNotNull()
    )
    return pairs.groupBy(
        F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
    ).agg(F.sum("cnt").alias("freq"))


def _merge_rounds(
    words: DataFrame, num_merges: int, keep_last_words: bool = False
) -> tuple[list[DataFrame], list[DataFrame]]:
    """Run the merge loop → ([best per step], [word table per step]).

    ``word_tables[k]`` is the table AFTER k merges (index 0 = initial);
    the last rewrite is skipped unless ``keep_last_words`` (learners only
    need the chosen pairs, appliers need the final state too).  Every
    materialized frame is localCheckpoint-pinned (loop discipline).

    Pair exhaustion: when a round finds no adjacent pair (every word is
    a single symbol), its ``best`` is EMPTY and the crossJoin empties
    every later word table — subsequent rounds contribute no merge rows
    and zero symbol counts, so learners simply emit fewer than
    ``num_merges`` rules (classic learn_bpe stops the same way)."""
    bests, word_tables = [], [words]
    for step in range(1, num_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("freq"), "left_sym", "right_sym")
            .limit(1)
            .localCheckpoint(eager=True)  # pin the choice: referenced by
            # the output AND by every later iteration's word table
        )
        bests.append(best)
        if step < num_merges or keep_last_words:
            pat = F.concat(
                F.lit(SEP), F.col("left_sym"), F.lit(SEP + SEP), F.col("right_sym"), F.lit(SEP)
            )
            rep = F.concat(F.lit(SEP), F.col("left_sym"), F.col("right_sym"), F.lit(SEP))
            carry = [c for c in words.columns if c != "repr"]
            words = (
                words.crossJoin(F.broadcast(best))
                .select(F.replace("repr", pat, rep).alias("repr"), *carry)
                .localCheckpoint(eager=True)  # pin per iteration or the
                # replace chain re-runs every earlier merge per reference
            )
            word_tables.append(words)
    return bests, word_tables


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 4,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merge rules from a document
    corpus → (step, left_sym, right_sym, merged, freq), one row per rule
    in learned order.

    Ties on pair frequency break deterministically by (left_sym,
    right_sym) ascending, so the learned rules are identical across
    engines, partitionings and reruns.  ``freq`` is the pair's
    occurrence count at the time it was chosen (counts shift as earlier
    merges rewrite words, which is why the loop cannot be collapsed into
    one ranking).
    """
    if num_merges < 1:
        raise ValueError(f"need num_merges >= 1, got {num_merges}")
    words = _word_table(docs, text_col).localCheckpoint(eager=True)
    bests, _ = _merge_rounds(words, num_merges)
    return merges_from_bests(bests)


def merges_from_bests(bests: list[DataFrame]) -> DataFrame:
    """(step, left_sym, right_sym, merged, freq) from a _merge_rounds
    ``bests`` list — split out so callers holding a cached rounds run
    (one per session/dataset) can derive the learn output without
    replaying the loop."""
    merge_rows = [
        best.select(
            F.lit(step).alias("step"),
            "left_sym",
            "right_sym",
            F.concat("left_sym", "right_sym").alias("merged"),
            "freq",
        )
        for step, best in enumerate(bests, start=1)
    ]
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out


def bpe_compression_curve(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 4,
) -> DataFrame:
    """Apply side of BPE training: corpus-wide symbol count after each
    merge round → (step, total_symbols), step 0 = character tokens.

    The curve a tokenizer team actually reads off a BPE run — how much
    each merge compresses the corpus (total_symbols drops by the chosen
    pair's non-overlapping occurrence count each round).  Same loop and
    pinning as :func:`bpe_merges`; each round adds one O(|vocab|)
    aggregate over the rewritten word table."""
    if num_merges < 1:
        raise ValueError(f"need num_merges >= 1, got {num_merges}")
    words = _word_table(docs, text_col).localCheckpoint(eager=True)
    _, word_tables = _merge_rounds(words, num_merges, keep_last_words=True)
    return curve_from_tables(word_tables)


def curve_from_tables(word_tables: list[DataFrame]) -> DataFrame:
    """(step, total_symbols) from a _merge_rounds ``word_tables`` list
    (step k = table after k merges) — cache-shareable like
    :func:`merges_from_bests`."""

    def total(w: DataFrame, step: int) -> DataFrame:
        syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM repr)"), SEP + SEP)
        return w.agg(
            F.sum(F.col("cnt") * F.size(syms)).alias("total_symbols")
        ).select(F.lit(step).alias("step"), "total_symbols")

    out = total(word_tables[0], 0)
    for k in range(1, len(word_tables)):
        out = out.unionByName(total(word_tables[k], k))
    return out


def byte_bpe_oracle_sql(num_merges: int = 4) -> str:
    """DuckDB oracle for :func:`byte_bpe_merges`: the standard unrolled
    merge chain over a byte-level w0 (identical pre-tokenizer regex —
    RE2 and Java agree on this lookahead-free pattern — and
    hex(encode(token)) byte rendering, both engines uppercase)."""
    w0 = f"""
    WITH w0 AS (
      SELECT regexp_replace(hex(encode(token)), '(..)', '{SEP}\\1{SEP}', 'g') AS repr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +'))
              AS token FROM documents)
      GROUP BY ALL)"""
    return bpe_oracle_sql(num_merges, w0_sql=w0)


def bpe_oracle_sql(
    num_merges: int = 4,
    curve: bool = False,
    carry_token: bool = False,
    w0_sql: str | None = None,
) -> str:
    """DuckDB oracle for :func:`bpe_merges` (and, with ``curve=True``,
    :func:`bpe_compression_curve`): the same loop unrolled into chained
    CTEs (w0 → p1/b1/w1 → ...), replaying the identical tokenize /
    pair-count / argmax / left-to-right replace per round.
    ``carry_token`` threads the original token through every w CTE (for
    tokenization oracles built on the final table) and returns the bare
    chain — the caller appends its own final SELECT."""
    tok_sel = ", token" if carry_token else ""
    if w0_sql is not None:
        assert not carry_token, "w0_sql override does not thread token"
        parts = [w0_sql]
    else:
        parts = [
            f"""
    WITH w0 AS (
      SELECT regexp_replace(token, '(.)', '{SEP}\\1{SEP}', 'g') AS repr,
             CAST(COUNT(*) AS BIGINT) AS cnt{tok_sel}
      FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
              AS token FROM documents)
      WHERE token NOT LIKE '%{SEP}%'
      GROUP BY ALL)"""
        ]
    for k in range(1, num_merges + 1):
        parts.append(
            f""",
    p{k} AS (
      SELECT unnest(list_transform(range(1, len(s)),
                    j -> {{'l': s[j], 'r': s[j + 1]}})) AS pr, cnt
      FROM (SELECT string_split(trim(repr, '{SEP}'), '{SEP}{SEP}') AS s, cnt
            FROM w{k - 1})),
    b{k} AS (
      SELECT pr.l AS left_sym, pr.r AS right_sym,
             CAST(SUM(cnt) AS BIGINT) AS freq
      FROM p{k} GROUP BY 1, 2
      ORDER BY freq DESC, left_sym, right_sym LIMIT 1)"""
        )
        if k < num_merges or curve or carry_token:
            parts.append(
                f""",
    w{k} AS (
      SELECT replace(repr, '{SEP}' || left_sym || '{SEP}{SEP}' || right_sym || '{SEP}',
                     '{SEP}' || left_sym || right_sym || '{SEP}') AS repr, cnt{tok_sel}
      FROM w{k - 1}, b{k})"""
            )
    if carry_token:
        return "".join(parts)  # caller appends its own final SELECT
    if curve:
        selects = "\n    UNION ALL ".join(
            f"SELECT {k} AS step, CAST(SUM(cnt * len(string_split("
            f"trim(repr, '{SEP}'), '{SEP}{SEP}'))) AS BIGINT) AS total_symbols"
            f" FROM w{k}"
            for k in range(0, num_merges + 1)
        )
    else:
        selects = "\n    UNION ALL ".join(
            f"SELECT {k} AS step, left_sym, right_sym, left_sym || right_sym AS merged, freq FROM b{k}"
            for k in range(1, num_merges + 1)
        )
    parts.append(f"\n    {selects}")
    return "".join(parts)
