"""Incremental view maintenance (IVM) for join-aggregate views —
the RELATIONAL leg of the maintain-vs-retrain story (round 12).

Every other analytics family already carries a maintenance contract
(graph trajectories, BM25 counters, IVF assignments, curation flags,
dedup clusters); this module gives the same contract to the oldest
shape in the book: a materialized ``SELECT key, aggs FROM fact JOIN
dim GROUP BY key`` view kept current under inserts AND retractions,
using the classic delta-join expansion

    Δ(O ⋈ L) = ΔO ⋈ L  ∪  O ⋈ ΔL  ∪  ΔO ⋈ ΔL

(three |Δ|-bounded joins — the base⋈base term is the persisted view
and is never recomputed) and split aggregate handling:

- **Subtractable aggregates** (COUNT / SUM over exact integers):
  maintained as additive BIGINT counters — insert adds, retraction
  subtracts, a group whose count reaches zero leaves the view. Exact
  by construction: integer addition is associative and commutative,
  so merge order and partitioning cannot change a bit.
- **Non-subtractable aggregates** (MIN / MAX): a retraction may have
  removed the extreme, so affected groups are RE-ELECTED by
  rescanning only their surviving fact rows — a semi-join-bounded
  rescan, the same re-election design ``t_curation_decremental``
  uses for dedup representatives. Insert-only merges never rescan
  (``least``/``greatest`` against the delta suffices).

Exactness discipline (house rule, see operators/graph.py): every
measure is fixed-point BIGINT — quantities as integers, prices in
cents, revenue in cent-percent micro-units (price_cents × (100 −
discount_pct)) — so merged-equals-retrained is bit-identical and the
DuckDB oracle replays it with integer arithmetic only. Float division
happens once, in fixed shape, at presentation.

Scale shape at 100 TB: the view state is |groups| rows (bucketed by
the group key in the store); an insert batch costs three
|Δ|-broadcast joins plus one |Δ-groups|-bounded outer-join merge; a
retraction batch adds one rescan bounded by the AFFECTED groups'
fact rows (orders bucketed by group key ⇒ partition-pruned). The
router probe (two bounded aggregates) reads the affected-group
fraction and falls back to a full retrain past the configured
threshold — the ``pagerank_maintain`` design applied to SQL views.

Reference parity note: the reference engine (files-kraken,
/root/reference/src — a TinyDB file watcher) has no materialized
views; this family is part of the beyond-reference surface (SURVEY
§6), motivated by continuous-aggregate maintenance in stream
processors (Flink's retract streams, Materialize/DBSP deltas) —
public designs, re-expressed as Spark DataFrame algebra.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Measure",
    "DEFAULT_MEASURES",
    "fact_rows",
    "view_aggregate",
    "merge_insert",
    "apply_changes",
    "ivm_maintain",
    "present_view",
    "distinct_support",
    "merge_distinct_support",
    "distinct_view",
    "distinct_kmv_state",
    "merge_distinct_kmv",
    "distinct_kmv_view",
    "topk_view",
    "merge_topk",
    "rollup_state",
    "mg_counts",
    "mg_reduce",
    "merge_mg",
]

#: group key of the maintained view
KEY = "o_custkey"


@dataclass(frozen=True)
class Measure:
    """Declarative measure spec (round-13: the round-12 worked example's
    hard-coded ``_COUNTERS``/``_MINMAX`` tuples lifted to data, the way
    ``Blueprint`` declares fields). ``kind`` decides the maintenance
    class the merge core applies:

    - ``count`` / ``sum`` — SUBTRACTABLE: maintained as additive BIGINT
      counters (insert adds, retraction subtracts); exact because
      integer addition is associative/commutative.
    - ``min`` / ``max`` — NON-SUBTRACTABLE: insert-only batches fold
      with least/greatest; retraction-affected groups RE-ELECT from
      survivor fact rows (semi-join-bounded rescan).

    ``col`` is the fact-row column the aggregate reads (``None`` only
    for ``count``). Every measure is BIGINT by contract — the caller's
    fact builder owns the fixed-point lift (see :func:`_micro`)."""

    name: str
    kind: str
    col: str | None = None

    def __post_init__(self):
        if self.kind not in ("count", "sum", "min", "max"):
            raise ValueError(f"unknown measure kind {self.kind!r}")
        if self.kind != "count" and self.col is None:
            raise ValueError(f"measure {self.name!r} ({self.kind}) needs col")

    @property
    def subtractable(self) -> bool:
        return self.kind in ("count", "sum")

    def agg(self) -> Column:
        """Aggregate expression over fact rows (also the shape of each
        delta-side partial aggregate)."""
        fn = {"count": lambda: F.count(F.lit(1)),
              "sum": lambda: F.sum(self.col),
              "min": lambda: F.min(self.col),
              "max": lambda: F.max(self.col)}[self.kind]
        return fn().cast("long").alias(self.name)

    def fold(self, a: Column | str, b: Column | str) -> Column:
        """Insert-only fold of two partial extremes (min/max only)."""
        return (F.least if self.kind == "min" else F.greatest)(a, b)

    def re_agg(self, col: str) -> Column:
        """Re-election aggregate over survivor fact rows (min/max only)."""
        return (F.min if self.kind == "min" else F.max)(col).cast("long")

    def roll(self, keys: list[str]) -> Column:
        """Re-aggregation of STORED state to a coarser grain: COUNT and
        SUM add as BIGINTs, MIN of MINs, MAX of MAXes. The empty-state
        global grain coalesces count-kind to 0 (SQL's ``count(*)`` over
        zero rows is 0 while ``sum`` of nothing is NULL — GROUP BY
        ROLLUP's grand-total row on an empty corpus says exactly that)."""
        if self.subtractable:
            out = F.sum(self.name)
            if not keys and self.kind == "count":
                out = F.coalesce(out, F.lit(0))
        elif self.kind == "min":
            out = F.min(self.name)
        else:
            out = F.max(self.name)
        return out.cast("long").alias(self.name)


#: the round-12 worked example's view, now just the default spec:
#: SELECT key, count(*), sum(qty), sum(rev), min(price), max(qty)
DEFAULT_MEASURES: tuple[Measure, ...] = (
    Measure("n_items", "count"),
    Measure("sum_qty", "sum", "qty"),
    Measure("sum_rev_c100", "sum", "rev_c100"),
    Measure("min_price_c", "min", "price_c"),
    Measure("max_qty", "max", "qty"),
)


def _sentinel(measures: tuple[Measure, ...]) -> Measure:
    """The emptiness sentinel: the view's row-count measure. Emptied-
    group detection (a group leaves the view when its count reaches 0)
    and had-retraction detection both need one; a spec without a count
    measure cannot support retractions, so demand it up front."""
    for m in measures:
        if m.kind == "count":
            return m
    raise ValueError("measure spec needs a count measure (group liveness)")


def _micro(col: str, scale: int) -> Column:
    """Exact fixed-point lift: round(col * scale) as BIGINT. The
    synthetic TPC-H doubles carry ≤2 decimal digits, so round() at
    cent scale is exact on both engines."""
    return F.round(F.col(col) * scale).cast("long")


def fact_rows(
    orders: DataFrame, lineitem: DataFrame, dims: tuple[str, ...] = ()
) -> DataFrame:
    """The view's fact rows: orders ⋈ lineitem on the order key,
    projected to the group key (+ any extra order-side ``dims``, for
    multi-grain views) + exact integer measures. Column pruning
    happens here (two joins of narrow projections, never full rows);
    at scale both sides are bucketed by l_orderkey so this join is
    co-located."""
    o = orders.select("o_orderkey", KEY, *dims)
    l = lineitem.select(
        "l_orderkey",
        F.round("l_quantity").cast("long").alias("qty"),
        _micro("l_extendedprice", 100).alias("price_c"),
        (
            _micro("l_extendedprice", 100)
            * (F.lit(100) - _micro("l_discount", 100))
        ).alias("rev_c100"),
    )
    return l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        KEY, *dims, "o_orderkey", "qty", "price_c", "rev_c100"
    )


def view_aggregate(
    facts: DataFrame,
    keys: list[str] | None = None,
    measures: tuple[Measure, ...] = DEFAULT_MEASURES,
) -> DataFrame:
    """From-scratch aggregation of fact rows into view state — also
    the shape of each delta-side partial aggregate. All BIGINT.
    ``keys`` generalizes the group key to a composite (multi-grain
    views maintain their FINEST grain through the same algebra);
    ``measures`` declares the view's aggregates (round-13: spec-driven,
    the hard-coded worked example generalized)."""
    return facts.groupBy(*(keys or [KEY])).agg(*[m.agg() for m in measures])


def merge_insert(
    state: DataFrame,
    delta_facts: DataFrame,
    keys: list[str] | None = None,
    measures: tuple[Measure, ...] = DEFAULT_MEASURES,
) -> DataFrame:
    """Insert-only merge: counters add, MIN/MAX fold with least/
    greatest — no rescan anywhere. One outer join bounded by
    |state ∪ Δ-groups| (AQE broadcasts the delta side). Delegates to
    :func:`apply_changes`' insert path — ONE implementation of the
    counter/fold algebra; this stays a named entrypoint because the
    insert-only contract needs no survivor table."""
    return apply_changes(state, delta_facts, None, keys=keys, measures=measures)


def apply_changes(
    state: DataFrame,
    ins_facts: DataFrame | None,
    del_facts: DataFrame | None,
    survivor_facts: DataFrame | None = None,
    keys: list[str] | None = None,
    measures: tuple[Measure, ...] = DEFAULT_MEASURES,
) -> DataFrame:
    """General changefeed merge (inserts + retractions in one batch),
    driven entirely by the declarative ``measures`` spec — the algebra
    is per-KIND, not per-column, so ANY view shaped `GROUP BY keys`
    over COUNT/SUM/MIN/MAX measures maintains through this one core
    (``v_ivm2_*`` proves it on a second schema).

    Subtractable measures (count/sum): one full-outer merge of three
    partial aggregates — O(|state| ∪ |Δ-groups|), delta sides
    broadcast. Groups whose count reaches zero leave the view (a
    retracted-empty group has no row, exactly like k-core's
    membership overlay).

    Non-subtractable measures (min/max): groups with NO retraction
    fold with least/greatest; groups WITH a retraction re-elect from
    ``survivor_facts`` restricted to those groups (left-semi bounded
    rescan). ``survivor_facts`` must be the post-change fact rows
    (base minus retracted, plus inserted) — the caller owns that
    definition because it knows which store the survivors live in.
    """
    ks = keys or [KEY]
    counters = [m for m in measures if m.subtractable]
    extremes = [m for m in measures if not m.subtractable]
    sentinel = _sentinel(measures)
    names = [m.name for m in measures]

    sides = {"s": state}
    if ins_facts is not None:
        sides["i"] = view_aggregate(ins_facts, ks, measures)
    if del_facts is not None:
        sides["d"] = view_aggregate(del_facts, ks, measures)

    j = None
    for tag, df in sides.items():
        named = df.select(
            *ks, *[F.col(c).alias(f"{tag}_{c}") for c in names]
        )
        j = named if j is None else j.join(named, ks, "full_outer")

    def _ctr(c: str) -> Column:
        out = F.coalesce(F.col(f"s_{c}"), F.lit(0))
        if "i" in sides:
            out = out + F.coalesce(F.col(f"i_{c}"), F.lit(0))
        if "d" in sides:
            out = out - F.coalesce(F.col(f"d_{c}"), F.lit(0))
        return out.cast("long").alias(c)

    def _fold(m: Measure) -> Column:
        # least/greatest need two args; with no insert side the fold
        # is the state value itself
        if "i" in sides:
            return m.fold(f"s_{m.name}", f"i_{m.name}")
        return F.col(f"s_{m.name}")

    merged = j.select(
        *[F.col(k) for k in ks],
        *[_ctr(m.name) for m in counters],
        *[_fold(m).alias(f"fold_{m.name}") for m in extremes],
        (
            F.col(f"d_{sentinel.name}").isNotNull()
            if "d" in sides
            else F.lit(False)
        ).alias("had_retraction"),
    ).filter(F.col(sentinel.name) > 0)

    if "d" not in sides or not extremes:
        return merged.select(
            *ks,
            *[m.name for m in counters],
            *[F.col(f"fold_{m.name}").alias(m.name) for m in extremes],
        )

    if survivor_facts is None:
        raise ValueError("retractions require survivor_facts for re-election")

    # |Δ|-bounded probe side: the retraction batch's own group keys
    # (filtering the merged frame would recompute the O(|state|)
    # three-way merge a second time just to build the broadcast side;
    # the extra keys this set may carry — groups the batch emptied —
    # have no survivor rows and re-elect to nothing)
    affected = del_facts.select(*ks).distinct()
    reelected = (
        survivor_facts.join(F.broadcast(affected), ks, "left_semi")
        .groupBy(*ks)
        .agg(*[m.re_agg(m.col).alias(f"re_{m.name}") for m in extremes])
    )
    return merged.join(reelected, ks, "left").select(
        *ks,
        *[m.name for m in counters],
        *[
            F.when(F.col("had_retraction"), F.col(f"re_{m.name}"))
            .otherwise(F.col(f"fold_{m.name}"))
            .alias(m.name)
            for m in extremes
        ],
    )


def ivm_maintain(
    state: DataFrame,
    ins_facts: DataFrame | None,
    del_facts: DataFrame | None,
    survivor_facts: DataFrame | None = None,
    keys: list[str] | None = None,
    measures: tuple[Measure, ...] = DEFAULT_MEASURES,
    affected_threshold_pct: int = 50,
    mode: str = "auto",
) -> tuple[DataFrame, dict]:
    """Stats-driven routing entry point for view maintenance — the
    relational sibling of ``graph.pagerank_maintain`` /
    ``dedup.cc_maintain`` (round-13, closing the round-12 verdict's
    "routers inside the streaming runtime" item): every path returns
    state EXACTLY equal to the from-scratch view over the post-change
    facts, so the route is a pure cost decision driven by the same
    signal ``v_ivm_maintain_route`` registers as oracle-paired data —
    the DELETION-affected-group fraction (retractions are what makes
    a view merge expensive: the MIN/MAX re-election rescans every
    affected group's surviving fact rows).

    Returns ``(state', info)`` where ``info`` is the routing record —
    ``{"route", "n_groups", "n_affected"}`` (counts ``None`` when the
    probe was skipped) — so a foreachBatch caller can keep the
    per-batch route HISTORY as data (the ``v_ivm_route_history``
    query serves exactly that).

    ``mode='auto'`` probes with two bounded jobs (distinct retracted
    group keys semi-joined to state, and a state count — the probe
    measures the re-election's own cost bound, not a proxy) and picks
    retrain past the threshold. A PURE-INSERT batch routes to merge
    with ZERO probe jobs — the insert fold is |Δ|-bounded by
    construction and cannot lose to a corpus-wide retrain. A
    pure-counter measure spec also skips the probe: subtraction is
    O(|Δ-groups|) regardless of the affected fraction.
    ``mode='merge'`` / ``mode='retrain'`` force a path, zero probe
    jobs (plan-only contexts)."""
    if mode not in ("auto", "merge", "retrain"):
        raise ValueError(f"mode must be auto|merge|retrain, got {mode!r}")
    # Fail BEFORE any probe job launches (round-13 review finding: the
    # auto path ran both bounded probe jobs and only then hit the
    # missing-survivors ValueError inside the chosen leg): a batch
    # with retractions and non-subtractable measures needs survivors
    # on EVERY route — merge re-elects from them, retrain rebuilds
    # from them.
    if (
        del_facts is not None
        and any(not m.subtractable for m in measures)
        and survivor_facts is None
    ):
        raise ValueError(
            "retractions with min/max measures require survivor_facts "
            "on every route (merge re-elects from them, retrain "
            "rebuilds from them)"
        )
    ks = keys or [KEY]

    def _merge() -> DataFrame:
        return apply_changes(
            state, ins_facts, del_facts, survivor_facts, ks, measures
        )

    def _retrain() -> DataFrame:
        if survivor_facts is None:
            raise ValueError("retrain path requires survivor_facts")
        return view_aggregate(survivor_facts, ks, measures)

    if mode == "merge":
        return _merge(), {"route": "merge", "n_groups": None,
                          "n_affected": None}
    if mode == "retrain":
        return _retrain(), {"route": "retrain", "n_groups": None,
                            "n_affected": None}
    if del_facts is None or all(m.subtractable for m in measures):
        return _merge(), {"route": "merge", "n_groups": None,
                          "n_affected": None}

    affected = del_facts.select(*ks).distinct()
    n_affected = state.join(F.broadcast(affected), ks, "left_semi").count()
    n_groups = state.count()
    info = {"n_groups": n_groups, "n_affected": n_affected}
    if n_groups and 100 * n_affected > affected_threshold_pct * n_groups:
        import warnings

        warnings.warn(
            f"ivm_maintain: affected fraction {n_affected}/{n_groups} "
            f"exceeds {affected_threshold_pct}% — routing to full retrain "
            "(the re-election would rescan most groups' facts anyway)",
            stacklevel=2,
        )
        return _retrain(), {**info, "route": "retrain"}
    return _merge(), {**info, "route": "merge"}


def present_view(state: DataFrame) -> DataFrame:
    """Presentation projection: micro-units truncate to cents with
    integer DIV (house rule — no float rounding, whose half-way ties
    the two engines break differently), then ONE exact-integer/100.0
    division, identical IEEE result on both engines."""
    return state.select(
        KEY,
        "n_items",
        "sum_qty",
        (F.expr("sum_rev_c100 DIV 100") / 100.0).alias("revenue"),
        (F.col("min_price_c") / 100.0).alias("min_price"),
        "max_qty",
    )


# --- COUNT(DISTINCT) maintenance: the auxiliary-multiset trick -----

def distinct_support(facts: DataFrame, value_col: str) -> DataFrame:
    """Auxiliary multiset state making COUNT(DISTINCT value) SUBTRACTABLE:
    one (group, value, cnt) row per distinct pair, cnt a BIGINT
    multiplicity counter (the classic IVM support-table / DBSP reduce
    design). COUNT(DISTINCT) itself is not subtractable — retracting a
    row can't tell you whether another row still supports the value —
    but the multiset is: insert adds to cnt, retraction subtracts, the
    value leaves the group when cnt reaches 0, and the view is one
    cnt>0 count per group. State is |distinct (group, value)| rows,
    bucketed by group at the store."""
    return facts.groupBy(KEY, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def merge_distinct_support(
    state: DataFrame,
    ins_facts: DataFrame | None,
    del_facts: DataFrame | None,
    value_col: str,
) -> DataFrame:
    """Fold insert/retraction batches into the support multiset — one
    outer join bounded by the batch's (group, value) pairs; rows at
    cnt 0 drop. Pure counter algebra: exact, order-free."""
    j = state.select(KEY, value_col, F.col("cnt").alias("s_cnt"))
    keys = [KEY, value_col]
    if ins_facts is not None:
        i = distinct_support(ins_facts, value_col).select(
            KEY, value_col, F.col("cnt").alias("i_cnt")
        )
        j = j.join(i, keys, "full_outer")
    else:
        j = j.withColumn("i_cnt", F.lit(None).cast("long"))
    if del_facts is not None:
        d = distinct_support(del_facts, value_col).select(
            KEY, value_col, F.col("cnt").alias("d_cnt")
        )
        j = j.join(d, keys, "full_outer")
    else:
        j = j.withColumn("d_cnt", F.lit(None).cast("long"))
    return (
        j.select(
            KEY,
            value_col,
            (
                F.coalesce("s_cnt", F.lit(0))
                + F.coalesce("i_cnt", F.lit(0))
                - F.coalesce("d_cnt", F.lit(0))
            )
            .cast("long")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def distinct_view(support: DataFrame) -> DataFrame:
    """Serve COUNT(DISTINCT) from the support multiset."""
    return support.groupBy(KEY).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )


# --- sketch-routed COUNT(DISTINCT): KMV state, O(k) per group -------
#
# The support multiset is EXACT under inserts and retractions but its
# state grows with |distinct (group, value)| — the one state in the
# family whose ×10 exponent (0.50, SCALING.md round 12) tracks the
# corpus, not the groups. The 100 TB alternative is the classic KMV
# (theta) sketch per group — the k smallest value hashes — capping
# state at k rows/group at the cost of (a) a ~1/sqrt(k-2) relative
# error past k distinct values and (b) APPEND-ONLY maintenance
# (a sketch cannot subtract: evicted hashes are gone, so a retraction
# forces a group rebuild — exactly why the route is a DESIGN-time
# state-shape decision, served as data by v_ivm_distinct_maintain_route,
# not a per-batch flip like ivm_maintain's). Same Bar-Yossef et al.
# estimator and md5-derived integer hashes as operators/corpus.kmv_sketch,
# so DuckDB replays state, merge, and estimate bit-identically.


def distinct_kmv_state(
    facts: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch state: the ``k`` smallest md5-derived
    32-bit hashes of the group's distinct values — ``(keys…, h, rn)``,
    ≤ k rows per group however many distinct values exist. One
    (group, hash) distinct shuffle + a keyed top-k window."""
    from pyspark.sql import Window

    from .dedup import md5_hash64

    ks = keys or [KEY]
    hashed = facts.select(
        *ks, md5_hash64(F.col(value_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(*ks).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*ks, "h", "rn")
    )


def merge_distinct_kmv(
    state: DataFrame,
    ins_facts: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Append-only sketch merge: any hash below the union's k-th
    minimum is below its own side's k-th minimum, so the k smallest
    of (stored sketch ∪ batch hashes) ARE the k smallest of the true
    union — merged state equals the from-scratch sketch on the full
    fact set, bit-for-bit (the oracle-paired query proves it). Cost:
    the batch's (group, hash) distinct + a (k + |Δgroup|)-bounded
    re-rank per touched group; untouched groups pass through the
    window unchanged (≤ k rows each)."""
    from pyspark.sql import Window

    from .dedup import md5_hash64

    ks = keys or [KEY]
    batch = ins_facts.select(
        *ks, md5_hash64(F.col(value_col).cast("string")).alias("h")
    )
    pool = state.select(*ks, "h").unionByName(batch).distinct()
    w = Window.partitionBy(*ks).orderBy("h")
    return (
        pool.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*ks, "h", "rn")
    )


def distinct_kmv_view(
    state: DataFrame, keys: list[str] | None = None, k: int = 64
) -> DataFrame:
    """Serve the distinct estimate from sketch state: a group holding
    fewer than k hashes has seen ALL its distinct hashes (the sketch
    IS the set — exact, modulo 32-bit birthday collisions); at k the
    k-th minimum estimates the cardinality as (k-1)·2³² div h_k —
    exact integer division, replayable by any engine.

    ``k`` MUST equal the k the state was built/merged with — it is not
    recoverable from the rows (an undersaturated group is
    indistinguishable from a saturated smaller-k one), and serving
    with a LARGER k silently misreads every saturated group as exact
    (round-13 review finding). The one detectable direction — state
    rows beyond the claimed k — raises instead of truncating."""
    ks = keys or [KEY]
    per = state.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk")
    )
    # rn > k in state proves a k mismatch (built with a larger k);
    # an in-plan guard would cost a job, so assert on the cheap
    # aggregate we already compute at serve time via a runtime error
    # column: greatest(n_kept) over k flags the impossible state.
    per = per.withColumn(
        "n_kept",
        F.when(
            F.col("n_kept") <= k, F.col("n_kept")
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"distinct_kmv_view: state holds more than k={k} "
                    "rows for a group — built with a larger k; pass "
                    "the build k"
                )
            ).cast("long")
        ),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"({k - 1} * 4294967296) div greatest(hk, 1)")
    )
    return per.select(*ks, est.cast("long").alias("kmv_distinct_est"))


# --- top-k ranked-view maintenance: k-bounded re-election ----------

def topk_view(facts: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k fact rows by (price_c desc, o_orderkey, qty) —
    the ranked-view shape (a per-key leaderboard). The tiebreak chain
    is total, so the view is deterministic on both engines."""
    from pyspark.sql import Window

    w = Window.partitionBy(KEY).orderBy(
        F.col("price_c").desc(), F.col("o_orderkey"), F.col("qty")
    )
    return (
        facts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        # qty stays in the view: stored rows carry their FULL sort key,
        # so a later fold re-ranks ties exactly as from-scratch would
        .select(KEY, "rnk", "price_c", "o_orderkey", "qty")
    )


def merge_topk(
    state: DataFrame,
    ins_facts: DataFrame | None,
    del_facts: DataFrame | None,
    survivor_facts: DataFrame | None,
    k: int = 3,
) -> DataFrame:
    """Maintain the top-k view: a stored top-k row can only be
    displaced by an INSERT ranking above it (re-rank the stored k
    rows plus the group's inserts — k+|Δgroup| rows, no rescan) or
    vacated by a RETRACTION of a stored row, in which case row k+1 is
    unknown and the group re-elects from its surviving fact rows
    (broadcast-left-semi-bounded rescan — MIN/MAX re-election
    generalized to k). Groups a retraction touches only below their
    stored top-k serve verbatim — but since "below" can't be decided
    without the retracted row's rank, any group with a retraction
    re-elects (the same conservative affected-set the aggregate core
    uses; the delta-cost probe prices it)."""
    affected = None
    if del_facts is not None:
        affected = del_facts.select(KEY).distinct()
    # fold inserts against the stored k rows: any base row outside the
    # stored top-k is dominated by k pooled rows, so top-k(state ∪ Δ)
    # = top-k(base ∪ Δ) for groups without a retraction
    pool = state.select(KEY, "price_c", "o_orderkey", "qty")
    if ins_facts is not None:
        pool = pool.unionByName(
            ins_facts.select(KEY, "price_c", "o_orderkey", "qty")
        )
    folded = topk_view(pool, k)
    if affected is None:
        return folded
    if survivor_facts is None:
        raise ValueError("retractions require survivor_facts for re-election")
    reelected = topk_view(
        survivor_facts.join(F.broadcast(affected), KEY, "left_semi"), k
    )
    return folded.join(
        F.broadcast(affected), KEY, "left_anti"
    ).unionByName(reelected)


def rollup_state(
    state: DataFrame,
    keys: list[str],
    measures: tuple[Measure, ...] = DEFAULT_MEASURES,
) -> DataFrame:
    """Coarsen maintained view state to a shorter key list WITHOUT
    touching fact rows: every stored aggregate re-aggregates exactly
    (COUNT/SUM add as BIGINTs; MIN of MINs, MAX of MAXes) — the
    rollup-lattice property that makes multi-grain serving a pure
    function of the finest maintained grain. One changefeed merge at
    the finest grain keeps EVERY grain current; the coarser grains
    cost one |state|-bounded aggregation each, never a fact scan.
    The global grain (``keys=[]``) over an EMPTY state matches SQL's
    GROUP BY ROLLUP grand-total row: count-kind measures coalesce to
    0 (``count(*)`` of nothing is 0; ``sum``/``min``/``max`` of
    nothing stay NULL)."""
    g = state.groupBy(*keys) if keys else state.groupBy()
    return g.agg(*[m.roll(keys) for m in measures])


# --- heavy-hitters maintenance: mergeable Misra-Gries summaries -----

def mg_counts(rows: DataFrame, value_col: str, keys: list[str] | None = None
              ) -> DataFrame:
    """Exact (keys…, value, cnt) BIGINT counts — both the from-scratch
    input to :func:`mg_reduce` and (unreduced) the EXACT alternative
    state shape the route probe weighs the sketch against: plain
    counters are subtractable, so the exact table maintains under
    retraction; its cost is one state row per distinct value."""
    ks = keys or []
    return rows.groupBy(*ks, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def mg_reduce(
    counts: DataFrame,
    value_col: str,
    k: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """One Misra-Gries reduction: subtract the (k+1)-th largest count
    from every count, keep the strictly positive residues — at most
    ``k`` rows (per group) remain, each an UNDER-estimate of its true
    count by at most the subtracted threshold. Deterministic given the
    count multiset (the threshold is the rank-(k+1) count VALUE, so
    ties at the boundary cannot change it), which is what lets the
    DuckDB oracle replay summaries bit-for-bit — the same
    replayability contract as the KMV sketch above.

    Grouped: the threshold is a keyed window rank (partitioned —
    never a global window). Global (``keys=None``): a distributed
    top-(k+1) (``TakeOrderedAndProject``, no single-task stage)
    aggregated to a 1-row threshold frame and broadcast — the
    1-row-BNLJ shape the plan audit certifies structurally."""
    if k < 1:
        raise ValueError("mg_reduce needs k >= 1")
    ks = keys or []
    if ks:
        from pyspark.sql import Window

        w = Window.partitionBy(*ks).orderBy(
            F.desc("cnt"), F.col(value_col)
        )
        thr = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == k + 1)
            .select(*ks, F.col("cnt").alias("_thr"))
        )
        merged = counts.join(thr, ks, "left").select(
            *ks,
            value_col,
            (F.col("cnt") - F.coalesce("_thr", F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
        return merged.filter(F.col("cnt") > 0)
    top = counts.orderBy(F.desc("cnt"), F.col(value_col)).limit(k + 1)
    thr = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("cnt"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_thr")
    )
    return (
        counts.crossJoin(F.broadcast(thr))
        .select(
            value_col,
            (F.col("cnt") - F.col("_thr")).cast("long").alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def merge_mg(
    state: DataFrame,
    delta_summary: DataFrame,
    value_col: str,
    k: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Merge two Misra-Gries summaries (Agarwal et al.'s mergeable-
    summaries rule, public result): pairwise-sum the residues, then
    one :func:`mg_reduce`. The merged summary keeps the family's
    guarantee — every value's undercount is at most
    (N − Σsummary)/(k+1) over the COMBINED stream — which is the
    bound ``ev_heavy_mg_error`` registers as data. Append-only like
    KMV: a sketch cannot subtract; the exact counter table
    (:func:`mg_counts`, unreduced) is the retraction-capable shape
    the route weighs this against."""
    ks = keys or []
    join_keys = [*ks, value_col]
    a = state.select(*join_keys, F.col("cnt").alias("_a"))
    b = delta_summary.select(*join_keys, F.col("cnt").alias("_b"))
    summed = a.join(b, join_keys, "full_outer").select(
        *join_keys,
        (F.coalesce("_a", F.lit(0)) + F.coalesce("_b", F.lit(0)))
        .cast("long")
        .alias("cnt"),
    )
    return mg_reduce(summed, value_col, k, keys or None)
