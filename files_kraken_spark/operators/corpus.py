"""Corpus-level training-data pipeline operators: sequence packing,
deterministic stratified sampling, benchmark-contamination checks, and
rule-based quality filtering.

These are the batch operations a pretraining data pipeline runs over
the whole corpus after per-document scoring (functions/text.py) and
dedup (operators/dedup.py). All pure DataFrame — the only shuffles
are the keyed windows/joins noted per function, and every rule/ratio
is plain Catalyst arithmetic that an external SQL engine reproduces
bit-for-bit (identical double ops on identical inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import EN_STOPWORDS, token_count, tokens
from .dedup import shingle_sets


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    group_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins.

    Contiguous offset packing: documents are laid out in ``id_col``
    order (within ``group_col`` if given); each doc's bin is
    ``floor(exclusive_prefix_tokens / budget)`` — the streaming
    packing a sequence-packing dataloader performs, expressed as one
    window over the corpus. Integer math only, so the assignment is
    exactly reproducible anywhere.

    One shuffle (the window partition). At 100 TB partition by shard
    (``group_col``) so no single ordering spans the corpus.
    """
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = token_count(F.col(text_col))
    out = df.select(
        *([F.col(group_col)] if group_col else []),
        F.col(id_col),
        n_tok.alias("n_tokens"),
    ).withColumn("offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return out.select(
        *out.columns,
        F.floor(F.col("offset") / budget).alias("bin"),
    )


def stratified_sample_hash(
    df: DataFrame, id_col: str, stratum_col: str, pct: int
) -> DataFrame:
    """Deterministic ~pct% sample per stratum: keep rows whose portable
    md5-derived hash of (stratum, id) lands below ``pct`` mod 100.

    Unlike ``df.sample``, the decision is a pure function of the keys —
    reproducible across runs, engines, and cluster sizes, and stable
    under re-partitioning (the property a train/eval split must have).
    The stratum is part of the hashed key, so each stratum draws an
    INDEPENDENT pseudorandom sequence (expected-rate sampling per
    stratum, not exact-count — use a per-stratum rank for exactness).
    No shuffle at all: the filter runs at the scan.
    """
    key = F.concat_ws(
        ":", F.col(stratum_col).cast("string"), F.col(id_col).cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return df.filter(F.pmod(h, F.lit(100)) < pct)


def contamination_pairs(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark-contamination check: (train_id, eval_id, n_shared)
    for document pairs sharing ≥ ``min_shared`` distinct k-word
    shingles — the standard n-gram-overlap leak detector run before
    training on any corpus that may contain eval data.

    Same inverted-index shape as the Jaccard dedup: the join is on the
    shingle value, so only documents sharing a shingle ever meet — no
    cross join at any scale.
    """
    tr = shingle_sets(train, id_col, text_col, k).select(
        F.col(id_col).alias("train_id"), "shingle"
    )
    ev = shingle_sets(eval_, id_col, text_col, k).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    return (
        tr.join(ev, "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES /
    Efraimidis-Spirakis): per row draw u = hash-uniform(id) ∈ (0,1],
    score = ln(u)/w, keep the top-k scores per stratum. Rows with
    higher weight win proportionally more often, the draw is a pure
    function of the id (reproducible anywhere), and the selection is
    one window over the corpus — the distributed replacement for
    reservoir sampling, used for weighted corpus mixing.

    Keys with w <= 0 are excluded (zero mass).
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    # map the 32-bit hash to (0, 1]: (h+1) / 2^32 — never 0, so ln is finite
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    score = F.log(u) / F.col(weight_col)
    parts = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*parts).orderBy(F.col("__score").desc(), F.col(id_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__score", score)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__score", "__rk")
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str, max_frac: float = 0.2) -> DataFrame:
    """Gopher-style repetition rule: fraction of duplicated word
    bigrams within each document (1 - distinct/total). Boilerplate and
    degenerate generations repeat n-grams heavily; natural text
    doesn't. Pure per-row array expressions — shuffle-free."""
    t = tokens(F.col(text_col))
    n = F.size(t)
    bg = F.zip_with(
        F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    frac = F.when(
        n >= 2, F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.when(n >= 2, F.size(bg)).otherwise(F.lit(0)).alias("n_bigrams"),
        frac.alias("dup_bigram_frac"),
        (frac <= max_frac).alias("r_repetition"),
    )


_STOPWORD_PAT = r"\b(?:" + "|".join(EN_STOPWORDS) + r")\b"


def quality_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style rule filter: per-document boolean rules plus the
    conjunctive ``keep`` verdict.

    - ``r_word_count``: 5 ≤ words ≤ 1000
    - ``r_mean_word_len``: mean token length in [2, 12] (computed as
      (chars_of_collapsed_text - (wc-1)) / wc — exact integer inputs)
    - ``r_symbol_ratio``: non-alphanumeric-non-space chars / words < 0.6
    - ``r_stopword``: at least one English stopword present

    Pure Catalyst expressions; the ratios are single double divisions
    of exact integers, so any engine reproduces them bit-for-bit.
    """
    text = F.col(text_col)
    collapsed = F.trim(F.regexp_replace(text, r"\s+", " "))
    wc = token_count(text)
    chars = F.length(collapsed)
    mean_wl = (chars - (wc - F.lit(1))) / wc
    symbols = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    sym_ratio = symbols / wc
    r_wc = (wc >= 5) & (wc <= 1000)
    r_mwl = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    r_sym = sym_ratio < 0.6
    r_stop = F.lower(text).rlike(_STOPWORD_PAT)
    return df.select(
        F.col(id_col),
        wc.alias("word_count"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_stop.alias("r_stopword"),
        (r_wc & r_mwl & r_sym & r_stop).alias("keep"),
    )


def export_shards(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    max_records_per_file: int | None = None,
    sort_within_by: str | list[str] | None = None,
    fmt: str = "parquet",
    shards_per_partition: int | None = None,
    metrics: list[Column] | None = None,
) -> dict:
    """Sharded corpus export — the write side of a training-data
    pipeline. Produces a layout trainers consume directly:

    - ``partition_by``: hive-style directory partitioning (e.g. one
      directory per ``lang`` — partition pruning for downstream readers)
    - ``max_records_per_file``: bounded shard size via Spark's
      ``maxRecordsPerFile`` (the writer splits output files, no extra
      shuffle)
    - ``sort_within_by``: ``sortWithinPartitions`` so each shard is
      internally ordered (e.g. by packed-sequence id) without a global
      sort
    - ``shards_per_partition``: optional ``repartition(n, keys)`` to
      fix the writer-task count — at 100 TB this, not
      maxRecordsPerFile, decides shard parallelism; records land in
      shards by key hash, deterministically.
    - ``fmt``: ``parquet`` (default) or ``json`` (JSONL shards — the
      common interchange format for text corpora)

    All layout decisions ride the normal write path (no driver
    materialization, no collect): this function only configures the
    writer.

    Returns the export metrics dict observed DURING the write (row
    count + optional per-column aggregates via ``metrics``) — Spark's
    ``Observation`` rides the write job itself, so accounting costs no
    second scan of the corpus.
    """
    keys = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    )
    if shards_per_partition:
        if keys:
            df = df.repartition(shards_per_partition, *[F.col(k) for k in keys])
        else:
            # round-robin: hash-partitioning on spark_partition_id()
            # maps whole input partitions onto shards (collisions +
            # empty shards); plain repartition(n) balances exactly
            df = df.repartition(shards_per_partition)
    if sort_within_by:
        cols = [sort_within_by] if isinstance(sort_within_by, str) else list(sort_within_by)
        df = df.sortWithinPartitions(*cols)
    from pyspark.sql import Observation

    obs = Observation("export_shards")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows_written"), *(metrics or []))
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    if keys:
        writer = writer.partitionBy(*keys)
    writer.format(fmt).save(path)
    return obs.get


def bpe_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: int = 8,
) -> DataFrame:
    """Distributed BPE merge training (Sennrich et al. 2016) over the
    corpus, returning the learned merge table ``(rank, pair, cnt)`` —
    rank 1..merges, ``pair`` the two symbols joined by a space, ``cnt``
    the word-frequency-weighted count that won the round.

    BPE trains on the word-frequency dictionary, not raw text: one
    corpus-wide tokenize + groupBy builds ``(word, count)`` (the only
    corpus-sized shuffle), then every merge round runs over the dict —
    pair counts are an explode + sum keyed on the pair, the winner is a
    global top-1 (ties to the lexicographically smaller pair), and the
    merge is applied with plain (non-regex) ``replace`` on the
    space-delimited symbol string via a 1-row broadcast join — no
    driver collect anywhere.

    Engine-portable determinism: counts are integers; both Spark and
    DuckDB ``replace`` scan left-to-right non-overlapping, and the
    merge applies replace 3× so chained runs of a repeated symbol merge
    identically (runs longer than ~9 symbols may keep stragglers — the
    same stragglers on every engine). Words end with the canonical
    '</w>' marker symbol.

    Scale: the dict is |vocab| rows (≪ corpus); each round
    localCheckpoints it (the per-round plan embeds the previous round
    twice — once through the pair counts, once through the merge join —
    so without truncation lineage doubles per round) and shuffles only
    pair counts. For byte-level BPE
    at web scale the same plan applies with bytes as initial symbols.
    """
    from .ranks import spread_small_scan

    # The tokenize explode + its partial agg inherit the scan's
    # partitioning; spread the narrow text projection first so a
    # single-file corpus doesn't serialize the one corpus-sized pass
    # onto one task (no-op once the scan has >= cores partitions).
    words = (
        spread_small_scan(df.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
        .select(
            F.concat(
                F.expr(
                    "array_join(transform(sequence(1, char_length(w)), "
                    "i -> substr(w, i, 1)), ' ')"
                ),
                F.lit(" </w>"),
            ).alias("sym"),
            "wc",
        )
        .persist()
    )
    merge_rows = []
    for r in range(merges):
        pair_list = F.expr(
            "transform(sequence(1, size(split(sym, ' ')) - 1), "
            "i -> concat(element_at(split(sym, ' '), i), ' ', "
            "element_at(split(sym, ' '), i + 1)))"
        )
        counts = (
            words.select(F.explode(pair_list).alias("pair"), "wc")
            .groupBy("pair")
            .agg(F.sum("wc").cast("long").alias("cnt"))
        )
        best = (
            counts.orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .select(
                F.lit(r + 1).cast("long").alias("rank"),
                "pair",
                "cnt",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            )
            .localCheckpoint()
        )
        merge_rows.append(best.select("rank", "pair", "cnt"))
        padded = F.concat(F.lit(" "), F.col("sym"), F.lit(" "))
        search = F.concat(F.lit(" "), F.col("pair"), F.lit(" "))
        repl = F.concat(F.lit(" "), F.col("merged"), F.lit(" "))
        merged_sym = padded
        for _ in range(3):
            merged_sym = F.replace(merged_sym, search, repl)
        words = (
            words.crossJoin(F.broadcast(best))
            .select(F.trim(merged_sym).alias("sym"), "wc")
            .localCheckpoint()
        )
    out = merge_rows[0]
    for b in merge_rows[1:]:
        out = out.unionByName(b)
    return out


def bpe_apply(
    df: DataFrame,
    merges_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Tokenize with a TRAINED BPE merge table (`bpe_train` output):
    returns ``(id, n_bpe_tokens)`` — the post-merge symbol count per
    document.

    The scalable shape: merges apply to the DISTINCT-word dictionary
    (|vocab| rows), not to every token occurrence; occurrences then
    join the broadcast per-word symbol counts and aggregate. The merge
    fold itself is a Catalyst ``aggregate`` over the (tiny, broadcast)
    rank-ordered merge array — replace 3× per merge, mirroring
    `bpe_train`'s application — so there is no Python crossing and no
    driver collect.
    """
    marr = (
        merges_df.select(
            F.struct(
                F.col("rank"),
                F.col("pair"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            ).alias("s")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")),
                lambda s: F.concat(s["pair"], F.lit("\t"), s["merged"]),
            ).alias("ml")
        )
    )
    occ = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    dict_df = occ.select("w").distinct().crossJoin(F.broadcast(marr))
    init = F.concat(
        F.lit(" "),
        F.expr(
            "array_join(transform(sequence(1, char_length(w)), "
            "i -> substr(w, i, 1)), ' ')"
        ),
        F.lit(" </w> "),
    )

    def _rep3(acc, pat, rep):
        x = acc
        for _ in range(3):
            x = F.replace(x, pat, rep)
        return x

    folded = F.aggregate(
        F.col("ml"),
        init,
        lambda acc, x: _rep3(
            acc,
            F.concat(F.lit(" "), F.split_part(x, F.lit("\t"), F.lit(1)), F.lit(" ")),
            F.concat(F.lit(" "), F.split_part(x, F.lit("\t"), F.lit(2)), F.lit(" ")),
        ),
    )
    dict_tok = dict_df.select(
        "w", F.size(F.split(F.trim(folded), " ")).alias("n_sym")
    )
    return (
        occ.join(F.broadcast(dict_tok), "w")
        .groupBy(id_col)
        .agg(F.sum("n_sym").cast("long").alias("n_bpe_tokens"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking for retrieval/context pipelines: token
    windows of ``chunk_tokens`` advancing by ``chunk_tokens - overlap``,
    emitted as ``(id, chunk_no, n_tokens, chunk_text)``. The final
    window may be short; documents shorter than one stride yield a
    single chunk; empty documents yield none.

    Pure Catalyst: tokenize once, ``posexplode`` the window-start
    sequence, ``slice`` the token array — a narrow map with row fan-out
    ≈ tokens/stride, no shuffle at all. At 100 TB chunking is a
    map-only pass that parallelizes with the scan.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") > 0)
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__t") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    return toks.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_no", "__s"),
        F.col("__t"),
    ).select(
        F.col(id_col),
        "chunk_no",
        F.size(F.slice("__t", F.col("__s"), F.lit(chunk_tokens))).alias("n_tokens"),
        F.array_join(
            F.slice("__t", F.col("__s"), F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
    )


def temperature_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_total: int = 10_000,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-sampling
    recipe, α = 0.5): a group with share p of the corpus gets a target
    share ∝ √p — upweighting small sources, damping dominant ones.
    Returns per-group ``(group, n_docs, target_n, rep_factor)`` where
    ``rep_factor`` is the integer per-document replication to hit the
    target (callers expand with ``explode(sequence(1, rep_factor))``
    and a downstream shuffle/pack).

    α = 0.5 deliberately, and in INTEGER arithmetic throughout: each
    group's weight is ``floor(sqrt(n_docs · 10^6))`` — a scaled integer
    square root (IEEE sqrt is correctly rounded, and floor(sqrt(k)) is
    exact for k ≪ 2^52, so every engine computes the identical BIGINT)
    — then weights SUM as integers (order-independent, unlike a sum of
    irrational doubles) and targets are integer-scaled shares. An
    arbitrary ``pow(p, α)`` would be libm-dependent; this is
    bit-reproducible everywhere. One tiny aggregate + a broadcast-sized
    group table — no data pass beyond the group counts.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = F.floor(F.sqrt((F.col("n_docs") * F.lit(1_000_000)).cast("double"))).cast(
        "long"
    )
    counts = counts.withColumn("__w", w)
    tot = counts.agg(F.sum("__w").cast("long").alias("z"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.expr(f"({target_total} * __w) DIV z").alias("target_n"),
        )
        .withColumn(
            "rep_factor",
            F.expr("(target_n + n_docs - 1) DIV n_docs"),
        )
    )


# Knuth's multiplicative constant: portable BIGINT hash both engines
# compute identically (no xxhash in DuckDB). Inputs wrap to 31 bits
# BEFORE the multiply so the product stays < 2^63 for ANY BIGINT id —
# DuckDB errors on overflow where Spark would silently wrap.
_MIX = 2_654_435_761
_MOD = 4_294_967_296
_WRAP = 2_147_483_648


def global_shuffle_order(
    df: DataFrame, id_col: str, seed: int = 1
) -> DataFrame:
    """Deterministic pseudorandom training order: every epoch of a
    training run must see the corpus in a shuffled-but-reproducible
    order, independent of file layout or partitioning. Position =
    rank of a multiplicative integer hash of (id, seed) — change the
    seed, get an uncorrelated new permutation; same seed, same order
    on any engine and any cluster size.

    Scale shape: the hash is a narrow map, and the global rank is the
    distributed zipWithIndex pattern — range-exchange sort on
    (shuffle_key, id), per-partition row_number, plus a broadcast of
    per-partition counts (one small int per partition) to offset into
    the global position. NO unpartitioned window: ``row_number()`` over
    a global ORDER BY would move the whole corpus to one task. The
    result is still exactly the global rank — range boundaries vary
    with sampling, but offsets are exact counts over a total order, so
    ``position`` is deterministic regardless of partitioning. For
    sharded export, write with ``repartitionByRange(n_shards,
    "position")`` and the per-shard files come out both shuffled and
    deterministic.
    """
    from .ranks import global_row_number

    h = (((F.col(id_col) + F.lit(seed)) % F.lit(_WRAP)) * F.lit(_MIX)) % F.lit(_MOD)
    keyed = df.select(F.col(id_col), h.alias("shuffle_key"))
    # the two-phase distributed rank lives in operators/ranks.py now
    # (shared with the window-function queries); it early-returns on
    # empty input (a zero-entry create_map would fail analysis) and
    # documents the persist contract for its range-exchanged frame.
    return global_row_number(
        keyed, [F.col("shuffle_key"), F.col(id_col)], "position"
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pct: int = 90,
    group_col: str | None = None,
) -> DataFrame:
    """Train/validation split that cannot leak duplicated content
    across the boundary: the split decision is made per CONTENT GROUP,
    not per row. Default grouping is the exact-duplicate fingerprint
    (md5 of the raw text); pass ``group_col`` (e.g. the ``component``
    from `connected_components` over MinHash pairs) to make the
    boundary near-duplicate-safe as well — the split logic is
    identical, only the grouping key changes.

    Every group hashes to a side from its CONTENT FINGERPRINT (the md5
    hex of the group key), not from any row id — engine-replayable, and
    genuinely stable under corpus growth: a new duplicate never changes
    the group's fingerprint, so an existing group's side can never flip
    (the property that keeps eval sets frozen across dataset versions;
    a min-id hash, by contrast, flips when a lower-id duplicate
    arrives, and goes negative-sided for negative ids — round-4
    advice). The side function is a positional weighted sum of the
    first 8 hex chars (ascii·31^i mod 100) — plain integer arithmetic
    both engines evaluate identically.

    Scale: one groupBy(fingerprint) + one join back — both shuffles on
    the dedup key the pipeline already uses.
    """
    if group_col is None:
        keyed = df.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("__grp")
        )
        fp = F.col("__grp")  # already an md5 hex fingerprint
    else:
        keyed = df.select(F.col(id_col), F.col(group_col).alias("__grp"))
        fp = F.md5(F.col("__grp").cast("string"))
    gmin = keyed.groupBy("__grp").agg(F.min(id_col).alias("__gmin"))
    side = _hex_side(fp)
    return (
        keyed.join(gmin, "__grp")
        .select(
            F.col(id_col),
            F.col("__gmin").alias("group_id"),
            F.when(side < F.lit(train_pct), F.lit("train"))
            .otherwise(F.lit("val"))
            .alias("split"),
        )
    )


#: weights for the fingerprint→side hash: 31^i for the i-th of the
#: first 8 hex chars; max sum ≈ 102·Σ31^i ≈ 2.9e12 — well inside BIGINT
#: on both engines.
SIDE_WEIGHTS = [31**i for i in range(8)]


def _hex_side(fp) -> "F.Column":
    """Portable [0,100) side from a hex-string fingerprint: weighted
    ascii sum of the first 8 chars mod 100. ``ascii``/``substring`` are
    identical on Spark and DuckDB, inputs are non-negative, and the
    arithmetic stays in BIGINT — no sign or overflow divergence."""
    total = F.lit(0).cast("bigint")
    for i, w in enumerate(SIDE_WEIGHTS):
        # ascii() is INT; the weight products need BIGINT (31^6·102
        # already overflows int32 — ANSI mode faults instead of wrapping)
        total = total + F.ascii(F.substring(fp, i + 1, 1)).cast("bigint") * F.lit(w)
    return total % F.lit(100)


def per_group_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    quality_col: str | None = None,
) -> DataFrame:
    """Per-source/domain document cap — the curation rule that stops a
    single crawl domain from dominating a pretraining mix: keep at most
    ``cap`` docs per group, best-first (``quality_col`` descending when
    given, else lowest id). Deterministic: ties break on id.

    One window shuffle on the group key. At 100 TB the group key is
    the natural partition key of a crawl corpus, so the sort is local
    to each domain's rows; heavily-skewed domains are exactly the rows
    the cap discards, so AQE's skew split handles the sort spill.
    """
    order = (
        [F.col(quality_col).desc(), F.col(id_col)]
        if quality_col
        else [F.col(id_col)]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values (theta) sketch of each key's distinct-token
    set: the ``k`` smallest md5-derived 32-bit hashes per key, plus the
    key's exact distinct-hash count ``nd``. Returns
    ``(key_col, h, rn, nd)`` — the mergeable summary behind
    distinct-count, set-union and set-intersection ESTIMATES whose
    cost is O(k) per key instead of O(vocabulary):

    - distinct estimate: ``(k-1)·2³² div h_k`` (Bar-Yossef et al. 2002)
    - union of two keys: the k smallest of the two sketch sets ARE the
      k smallest of the true union (any hash below the union's k-th
      minimum is below its own key's k-th minimum), so sketches merge
      without touching the data
    - intersection/Jaccard: common hashes among the union's k minima

    All arithmetic is exact integers over md5 hashes, so an external
    engine replays the sketch AND every downstream estimate
    bit-identically — the property that makes these registry-oracle
    material where HLL register layouts are not.

    Scale shape: one (key, hash) distinct-agg shuffle, then a keyed
    window top-k — no global window, no driver collect; sketches are
    k rows per key, so every cross-key set operation downstream is a
    broadcast-size problem regardless of corpus size.
    """
    from .dedup import md5_hash64
    from ..functions.text import tokens

    tk = (
        df.select(
            F.col(key_col),
            F.explode(tokens(F.col(text_col))).alias("__tok"),
        )
        .select(F.col(key_col), md5_hash64(F.col("__tok")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("h")
    wn = Window.partitionBy(key_col)
    return (
        tk.withColumn("rn", F.row_number().over(w))
        .withColumn("nd", F.count(F.lit(1)).over(wn))
        .filter(F.col("rn") <= k)
        .select(key_col, "h", "rn", "nd")
    )
