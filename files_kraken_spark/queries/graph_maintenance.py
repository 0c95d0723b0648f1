"""Incremental GRAPH maintenance queries (round 11) — the third leg of
the maintain-vs-retrain story, next to incremental dedup
(operators/dedup.py batch-vs-corpus pairs), incremental ANN
(operators/similarity.py frozen-centroid/codebook merges) and
incremental curation (queries/curation.py):

- ``g_pagerank_incremental`` — merge an append-only edge batch into a
  persisted PageRank trajectory (delta-PageRank over the dirty
  frontier); the oracle is the FROM-SCRATCH unrolled build on the
  union, so the driver hash-compare IS the merged-equals-retrained
  proof.
- ``g_pagerank_delta_frontier`` — the maintenance cost model as data:
  per round, how many nodes the merge actually recomputes.
- ``g_cc_incremental`` — merge a near-dup pair batch into persisted
  connected-components state via the label-graph CC
  (`dedup.cc_incremental`); oracle = from-scratch transitive closure
  on the union pair set.
- ``g_cc_merge_audit`` — the post-merge component audit an operator
  watches: which union components absorbed several base components /
  new docs (the CC analogue of ``sim_ivf_merge_occupancy``).

Splits are pure integer modulo (``o_orderkey % 10`` for the supply
graph, ``doc_id % 10`` for documents) — identical on both engines,
stable under partitioning. All PageRank math is BIGINT micro-units
with DIV truncation (bit-exact), CC labels are min-ids (canonical), so
every equality here is exact, not approximate.

Scale shape (the argument the frontier query quantifies): a retrain
shuffles every edge once per round and every doc through CC rounds; a
merge probes the edge table against a small frontier per round, runs
CC over at most |batch| label edges, and relabels via one broadcast
map join. A daily batch touches its k-hop out-cone, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as DD
from ..operators.graph import (
    dirty_frontiers,
    pagerank_history,
    pagerank_incremental,
)
from ..sources.tables import load_table
from . import register
from .analytics import _kcore_oracle_sql, _pagerank_oracle_sql
from .llm_ops import _SQL_SHINGLES

# Supply-graph split: orders with o_orderkey % 10 >= 8 arrive as the
# maintenance batch; a (supplier, customer) pair is BASE if any early
# order carries it, and DELTA if only late orders do.
_SQL_SUPPLY_SPLIT = """
pall AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
pbase AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 10 < 8
),
pdelta AS (SELECT sk, ck FROM pall EXCEPT SELECT sk, ck FROM pbase),
edges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pall
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pall
),
dedges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pdelta
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pdelta
)"""


def _supply_split(spark: SparkSession, sf_dir: str):
    """(base_edges, delta_edges, union_edges) for the symmetrized
    supplier–customer supply graph under the o_orderkey % 10 split."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def _pairs(o):
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
            .distinct()
        )

    def _sym(p):
        fwd = p.select(
            F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
        )
        return fwd.unionByName(
            p.select(
                (F.lit(10_000_000) + F.col("ck")).alias("src"),
                F.col("sk").alias("dst"),
            )
        )

    pairs_all = _pairs(orders).persist()
    pairs_base = _pairs(orders.filter(F.col("o_orderkey") % 10 < 8)).persist()
    pairs_delta = pairs_all.join(pairs_base, ["sk", "ck"], "left_anti")
    return _sym(pairs_base), _sym(pairs_delta), _sym(pairs_all)


@register(
    "g_pagerank_incremental",
    oracle=_pagerank_oracle_sql(3, 85),
    doc="Delta-PageRank maintenance: the base supply graph (orders "
    "with o_orderkey%10<8) is ranked once with its full per-round "
    "trajectory persisted (pagerank_history — (iters+1) longs per "
    "node, the graph analogue of frozen centroids); the late-order "
    "edge batch then merges via pagerank_incremental, which recomputes "
    "ONLY the per-round dirty frontier (new nodes, out-degree-changed "
    "sources' neighborhoods, and their k-hop out-cone) and reads every "
    "clean node's value from the stored trajectory. The oracle is the "
    "FROM-SCRATCH 3-round unrolled build on the union graph — the "
    "hash-compare is the merged-equals-retrained proof, exact because "
    "every step is BIGINT micro-units with DIV truncation. Scale "
    "shape: per round one edge-table probe against a small frontier "
    "(broadcast semi-join), one trajectory-slice lookup, one "
    "frontier-bounded groupBy — vs the retrain's corpus-wide shuffle "
    "per round.",
)
def g_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_e, delta_e, union_e = _supply_split(spark, sf_dir)
    hist = pagerank_history(base_e, iters=3, damping_pct=85)
    return pagerank_incremental(union_e, delta_e, hist, iters=3, damping_pct=85)


@register(
    "g_pagerank_delta_frontier",
    oracle="WITH "
    + _SQL_SUPPLY_SPLIT
    + """,
bnodes AS (SELECT sk AS n FROM pbase UNION SELECT 10000000 + ck FROM pbase),
dn AS (SELECT src AS n FROM dedges UNION SELECT dst FROM dedges),
newn AS (SELECT n FROM dn EXCEPT SELECT n FROM bnodes),
seed AS (SELECT DISTINCT src AS n FROM dedges UNION SELECT n FROM newn),
dstat AS (
  SELECT n FROM newn
  UNION
  SELECT e.dst FROM edges e JOIN seed s ON s.n = e.src
),
d1 AS (SELECT n FROM dstat),
d2 AS (SELECT n FROM dstat UNION SELECT e.dst FROM edges e JOIN d1 ON d1.n = e.src),
d3 AS (SELECT n FROM dstat UNION SELECT e.dst FROM edges e JOIN d2 ON d2.n = e.src)
SELECT CAST(1 AS BIGINT) AS round, CAST(count(*) AS BIGINT) AS n_dirty FROM d1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM d2
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM d3""",
    doc="The maintenance cost model as data: per PageRank round, the "
    "size of the dirty set the incremental merge recomputes (D_1 = "
    "new nodes + out-neighbors of changed-degree sources; D_t adds "
    "one out-hop per round, monotone). Everything outside D_iters is "
    "served from the stored trajectory untouched — this query is the "
    "measured gap between frontier-local maintenance and a full "
    "retrain, and at 100 TB it is the number an operator watches to "
    "decide when accumulated batches justify a re-rank. Pure set "
    "algebra over the same split as g_pagerank_incremental, so both "
    "engines count identical frontiers.",
)
def g_pagerank_delta_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    base_e, delta_e, union_e = _supply_split(spark, sf_dir)
    base_nodes = (
        base_e.select(F.col("src").alias("node"))
        .unionByName(base_e.select(F.col("dst").alias("node")))
        .distinct()
    )
    frontiers = dirty_frontiers(union_e, delta_e, base_nodes, iters=3)
    out = None
    for t, d in enumerate(frontiers, start=1):
        part = d.agg(F.count(F.lit(1)).cast("long").alias("n_dirty")).select(
            F.lit(t).cast("long").alias("round"), "n_dirty"
        )
        out = part if out is None else out.unionByName(part)
    return out


# Document near-dup pair graph split: a pair is BASE iff BOTH docs are
# in the base corpus (Jaccard between two docs is independent of the
# rest of the corpus, so filtering the all-pairs frame by endpoint
# split is exactly "the pairs a base-only run would have found").
_SQL_CC_UNION = f"""WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
uedges AS (SELECT id_a AS a, id_b AS b FROM jpairs
           UNION ALL SELECT id_b, id_a FROM jpairs),
ureach(n, m) AS (
  SELECT DISTINCT a, a FROM uedges
  UNION
  SELECT e.b, r.m FROM ureach r JOIN uedges e ON e.a = r.n
),
ucomp AS (SELECT n AS doc_id, min(m) AS component FROM ureach GROUP BY n)"""

_SQL_CC_BASE = """,
bpairs AS (
  SELECT id_a, id_b FROM jpairs
  WHERE id_a % 10 < 8 AND id_b % 10 < 8
),
bedges AS (SELECT id_a AS a, id_b AS b FROM bpairs
           UNION ALL SELECT id_b, id_a FROM bpairs),
breach(n, m) AS (
  SELECT DISTINCT a, a FROM bedges
  UNION
  SELECT e.b, r.m FROM breach r JOIN bedges e ON e.a = r.n
),
bcomp AS (SELECT n AS doc_id, min(m) AS component FROM breach GROUP BY n)"""


def _cc_state_and_batch(spark: SparkSession, sf_dir: str):
    """(state, new_pairs): CC labels over the base-doc pair graph and
    the append batch (every Jaccard≥0.8 pair with ≥1 late doc)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pairs = pairs.select("id_a", "id_b").persist()
    both_base = (F.col("id_a") % 10 < 8) & (F.col("id_b") % 10 < 8)
    state = DD.connected_components(pairs.filter(both_base))
    return state, pairs.filter(~both_base)


@register(
    "g_cc_incremental",
    oracle=_SQL_CC_UNION
    + "\nSELECT doc_id, component FROM ucomp",
    doc="Incremental dedup-group maintenance: connected components "
    "over the base docs' (doc_id%10<8) Jaccard≥0.8 pair graph are the "
    "persisted state; the late docs' pair batch merges via "
    "dedup.cc_incremental — lift each new pair to its endpoints' "
    "CANONICAL labels (min-id), run CC on that label graph (at most "
    "one edge per batch pair), broadcast the merge map back over "
    "state. Exact, not approximate: a batch can only merge whole "
    "components or mint new ones, and min of merged min-ids is the "
    "union component's min-id. Oracle = from-scratch transitive "
    "closure on the UNION pair set, so the hash-compare is the "
    "merged-equals-retrained proof. Scale shape: state is read once "
    "and shuffled never; the only CC rounds run on the |batch|-edge "
    "label graph.",
)
def g_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, new_pairs = _cc_state_and_batch(spark, sf_dir)
    return DD.cc_incremental(state, new_pairs)


@register(
    "g_cc_merge_audit",
    oracle=_SQL_CC_UNION
    + _SQL_CC_BASE
    + """
SELECT u.component,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(DISTINCT b.component) AS BIGINT) AS n_base_components,
       CAST(sum(CASE WHEN b.component IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_docs
FROM ucomp u LEFT JOIN bcomp b ON b.doc_id = u.doc_id
GROUP BY u.component""",
    doc="Post-merge component audit (the CC analogue of the IVF "
    "occupancy audit): per union component, how many docs it holds, "
    "how many distinct BASE components were merged into it, and how "
    "many members are new-batch docs. n_base_components > 1 flags a "
    "batch that bridged previously-separate dedup groups — the signal "
    "that keep-one-per-group decisions made against the old state "
    "need revisiting; at 100 TB this audit is the retrain/requeue "
    "trigger. One broadcast join of the (small) component frames — "
    "no corpus rescans beyond the pair build both sides already share.",
)
def g_cc_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, new_pairs = _cc_state_and_batch(spark, sf_dir)
    merged = DD.cc_incremental(state, new_pairs)
    return (
        merged.join(
            state.select("doc_id", F.col("component").alias("__base_comp")),
            "doc_id",
            "left",
        )
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.countDistinct("__base_comp").cast("long").alias("n_base_components"),
            F.count(F.when(F.col("__base_comp").isNull(), 1))
            .cast("long")
            .alias("n_new_docs"),
        )
    )


@register(
    "g_pagerank_maintain_route",
    oracle="WITH "
    + _SQL_SUPPLY_SPLIT
    + """,
bnodes AS (SELECT sk AS n FROM pbase UNION SELECT 10000000 + ck FROM pbase),
dn AS (SELECT src AS n FROM dedges UNION SELECT dst FROM dedges),
newn AS (SELECT n FROM dn EXCEPT SELECT n FROM bnodes),
seed AS (SELECT DISTINCT src AS n FROM dedges UNION SELECT n FROM newn),
d1 AS (
  SELECT n FROM newn
  UNION
  SELECT e.dst FROM edges e JOIN seed s ON s.n = e.src
),
vn AS (SELECT src AS n FROM edges UNION SELECT dst FROM edges),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n_dirty_d1,
         (SELECT CAST(count(*) AS BIGINT) FROM vn) AS n_nodes
)
SELECT n_nodes, n_dirty_d1,
       CAST((n_dirty_d1 * 1000000) // n_nodes AS BIGINT) AS dirty_ppm,
       CASE WHEN 100 * n_dirty_d1 > 50 * n_nodes
            THEN 'retrain' ELSE 'merge' END AS route
FROM c""",
    doc="The pagerank_maintain routing decision as data: the one-hop "
    "dirty fraction |D_1|/|V| the auto mode probes (exact BIGINT "
    "counts, ppm via truncating integer division) and the route it "
    "implies at the default 50% threshold. Measured round 11 "
    "(SCALING.md): on this dense bipartite supply graph even a 0.2% "
    "edge batch dirties >99.9% of nodes in one hop and the frontier-"
    "local merge costs 6-8x a retrain at every batch size — so the "
    "correct route here is 'retrain', and because D_t is monotone a "
    "saturated D_1 PROVES it. Both routes return bit-identical ranks "
    "(g_pagerank_incremental's hash-green is that proof), making the "
    "router a pure cost decision driven by this one number. Probe "
    "cost: one semi-join count + one distinct-node count, both "
    "column-pruned bounded jobs.",
)
def g_pagerank_maintain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import dirty_frontiers

    base_e, delta_e, union_e = _supply_split(spark, sf_dir)
    base_nodes = (
        base_e.select(F.col("src").alias("node"))
        .unionByName(base_e.select(F.col("dst").alias("node")))
        .distinct()
    )
    d1 = dirty_frontiers(union_e, delta_e, base_nodes, iters=1)[0]
    nd = d1.agg(F.count(F.lit(1)).cast("long").alias("n_dirty_d1"))
    nn = (
        union_e.select(F.col("src").alias("node"))
        .unionByName(union_e.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return nn.crossJoin(nd).select(
        "n_nodes",
        "n_dirty_d1",
        F.expr("CAST((n_dirty_d1 * 1000000) DIV n_nodes AS BIGINT)").alias(
            "dirty_ppm"
        ),
        F.when(
            100 * F.col("n_dirty_d1") > 50 * F.col("n_nodes"), F.lit("retrain")
        )
        .otherwise(F.lit("merge"))
        .alias("route"),
    )


def _pagerank_base_oracle_sql(iters: int = 3, damping: int = 85) -> str:
    """Unrolled integer PageRank over the BASE supply graph (pbase) —
    the from-scratch target the tombstone merge must hit when the
    late-order pairs are RETRACTED from a full-graph trajectory.
    Same micro-unit/DIV contract as analytics._pagerank_oracle_sql."""
    base = (100 - damping) * 1_000_000 // 100
    rounds = []
    for n in range(iters):
        rounds.append(
            f"""gr{n + 1} AS (
  SELECT n.node,
         CAST({base} + ({damping} * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM gnodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr // d.deg) AS s
    FROM gedges e JOIN gdeg d ON d.src = e.src JOIN gr{n} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        "WITH "
        + _SQL_SUPPLY_SPLIT
        + """,
gedges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pbase
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pbase
),
gdeg AS (SELECT src, count(*) AS deg FROM gedges GROUP BY src),
gnodes AS (SELECT src AS node FROM gedges UNION SELECT dst FROM gedges),
gr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM gnodes),
"""
        + ",\n".join(rounds)
        + f"\nSELECT node, pr FROM gr{iters}"
    )


@register(
    "g_pagerank_decremental",
    oracle=_pagerank_base_oracle_sql(3, 85),
    doc="Tombstone PageRank maintenance — the retraction half that "
    "closes pagerank_incremental's append-only contract: the FULL "
    "supply graph is ranked once with its trajectory persisted; the "
    "late-order pair batch (o_orderkey%10>=8 exclusives) is then "
    "RETRACTED, and pagerank_decremental serves the post-delete ranks "
    "by recomputing only the dirty cone of the retracted srcs "
    "(removed in-contributions + shrunk out-degrees + k-hop "
    "propagation, probed over post∪retracted so both direct cases "
    "fall out of the same dirty_frontiers recurrence; nodes whose "
    "last edge died leave the node set). The oracle is the "
    "FROM-SCRATCH unrolled build on the post-delete graph — the "
    "hash-compare is the tombstoned-equals-rebuilt proof, exact via "
    "BIGINT micro-units + DIV truncation. Scale shape: identical to "
    "the append merge, and the same pagerank_maintain density caveat "
    "applies.",
)
def g_pagerank_decremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_decremental

    base_e, delta_e, union_e = _supply_split(spark, sf_dir)
    hist = pagerank_history(union_e, iters=3, damping_pct=85)
    return pagerank_decremental(base_e, delta_e, hist, iters=3, damping_pct=85)


@register(
    "g_cc_decremental",
    oracle=_SQL_CC_UNION + _SQL_CC_BASE + "\nSELECT doc_id, component FROM bcomp",
    doc="Tombstone dedup-group maintenance — the retraction half that "
    "closes g_cc_incremental's append-only contract: the FULL corpus "
    "pair graph's CC labels are the persisted state; every pair "
    "touching a late doc (doc_id%10>=8) is then RETRACTED, and "
    "dedup.cc_decremental serves the post-delete labels by rebuilding "
    "ONLY the affected components from their surviving pairs "
    "(deletions can split a component — no label algebra decides a "
    "split without the surviving pairs — but they never merge, so "
    "untouched components serve from state verbatim; docs whose last "
    "pair died leave the output). Oracle = from-scratch transitive "
    "closure on the base pair set, so the hash-compare is the "
    "tombstoned-equals-rebuilt proof. Scale shape: one broadcast "
    "affected-label lookup, CC rounds over the affected components' "
    "pairs only, state never shuffled — the cost is bounded by the "
    "damage, not the lake.",
)
def g_cc_decremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pairs = pairs.select("id_a", "id_b").persist()
    both_base = (F.col("id_a") % 10 < 8) & (F.col("id_b") % 10 < 8)
    state = DD.connected_components(pairs)
    return DD.cc_decremental(
        state, pairs.filter(both_base), pairs.filter(~both_base)
    )


def _pagerank_post_oracle_sql(iters: int = 3, damping: int = 85) -> str:
    """Unrolled integer PageRank over the POST-CHANGEFEED supply graph
    (orders classes 0-7 and 9: class 8's exclusive pairs were
    retracted, class 9's exclusives added relative to the class 0-8
    base) — the from-scratch target g_pagerank_changefeed must hit."""
    base = (100 - damping) * 1_000_000 // 100
    rounds = []
    for n in range(iters):
        rounds.append(
            f"""fr{n + 1} AS (
  SELECT n.node,
         CAST({base} + ({damping} * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
  FROM fnodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr // d.deg) AS s
    FROM fedges e JOIN fdeg d ON d.src = e.src JOIN fr{n} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    return (
        """WITH ppost AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % 10 < 8 OR o_orderkey % 10 = 9
),
fedges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM ppost
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM ppost
),
fdeg AS (SELECT src, count(*) AS deg FROM fedges GROUP BY src),
fnodes AS (SELECT src AS node FROM fedges UNION SELECT dst FROM fedges),
fr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM fnodes),
"""
        + ",\n".join(rounds)
        + f"\nSELECT node, pr FROM fr{iters}"
    )


@register(
    "g_pagerank_changefeed",
    oracle=_pagerank_post_oracle_sql(3, 85),
    doc="MIXED-changefeed PageRank maintenance — appends and "
    "retractions in ONE batch, the shape a CDC feed actually "
    "delivers: the base supply graph (order classes 0-8) is ranked "
    "with its trajectory persisted; one batch then retracts class 8's "
    "exclusive pairs and adds class 9's, and pagerank_apply_changes "
    "merges both through the shared frontier core (dirty seed = both "
    "batches' srcs + the added batch's new nodes; probes over "
    "post ∪ retracted; nodes whose last edge died retire). Oracle = "
    "the from-scratch unrolled build on the post-change graph, so the "
    "hash-compare proves the general core — and therefore both "
    "specialized halves it now backs (g_pagerank_incremental / "
    "g_pagerank_decremental are its retracted=∅ / added=∅ cases). "
    "Same BIGINT micro-unit exactness; same pagerank_maintain density "
    "caveat at scale.",
)
def g_pagerank_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_apply_changes

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def _pairs(o):
        return (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
            .distinct()
        )

    def _sym(p):
        fwd = p.select(
            F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
        )
        return fwd.unionByName(
            p.select(
                (F.lit(10_000_000) + F.col("ck")).alias("src"),
                F.col("sk").alias("dst"),
            )
        )

    p_base = _pairs(orders.filter(F.col("o_orderkey") % 10 < 9)).persist()
    p_post = _pairs(
        orders.filter(
            (F.col("o_orderkey") % 10 < 8) | (F.col("o_orderkey") % 10 == 9)
        )
    ).persist()
    added = _sym(p_post.join(p_base, ["sk", "ck"], "left_anti"))
    retracted = _sym(p_base.join(p_post, ["sk", "ck"], "left_anti"))
    hist = pagerank_history(_sym(p_base), iters=3, damping_pct=85)
    return pagerank_apply_changes(
        _sym(p_post), added, retracted, hist, iters=3, damping_pct=85
    )


_SQL_CC_POST = f"""WITH RECURSIVE {_SQL_SHINGLES.strip().rstrip()},
jpairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.8),
fpairs AS (
  SELECT id_a, id_b FROM jpairs
  WHERE id_a % 10 <> 8 AND id_b % 10 <> 8
),
fedges AS (SELECT id_a AS a, id_b AS b FROM fpairs
           UNION ALL SELECT id_b, id_a FROM fpairs),
freach(n, m) AS (
  SELECT DISTINCT a, a FROM fedges
  UNION
  SELECT e.b, r.m FROM freach r JOIN fedges e ON e.a = r.n
),
fcomp AS (SELECT n AS doc_id, min(m) AS component FROM freach GROUP BY n)"""


@register(
    "g_cc_changefeed",
    oracle=_SQL_CC_POST + "\nSELECT doc_id, component FROM fcomp",
    doc="MIXED-changefeed dedup-group maintenance: the persisted CC "
    "state covers the class 0-8 docs' pair graph; one batch then "
    "RETRACTS every pair touching a class-8 doc and ADDS every pair "
    "touching a class-9 doc (endpoint-class membership defines the "
    "pair sets, so the split is pure integer modulo on both engines), "
    "and dedup.cc_apply_changes composes the two exact halves — "
    "component-local rebuild for the splits, label-graph merge for "
    "the joins. Deletion only splits, addition only merges, each half "
    "is individually exact, so the composition hash-matches the "
    "from-scratch transitive closure on the post-change pair set "
    "(docs in classes 0-7 and 9). Cost stays bounded by the damage: "
    "affected components' pairs + |added| label edges.",
)
def g_cc_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pairs = pairs.select("id_a", "id_b").persist()
    in_base = (F.col("id_a") % 10 != 9) & (F.col("id_b") % 10 != 9)
    in_post = (F.col("id_a") % 10 != 8) & (F.col("id_b") % 10 != 8)
    state = DD.connected_components(pairs.filter(in_base))
    return DD.cc_apply_changes(
        state,
        pairs.filter(in_post),
        added_pairs=pairs.filter(in_post & ~in_base),
        retracted_pairs=pairs.filter(in_base & ~in_post),
    )


def _frontier_split_sql(p: str, mod: int, lim: int) -> str:
    """One batch-size split's D_1 stats CTE block (prefix ``p``):
    base = orders with o_orderkey % mod < lim, delta = the rest's
    exclusive pairs — the same dirty recurrence as
    g_pagerank_maintain_route at a parametrized batch fraction."""
    return f"""{p}pb AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey % {mod} < {lim}
),
{p}pd AS (SELECT sk, ck FROM pall EXCEPT SELECT sk, ck FROM {p}pb),
{p}de AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM {p}pd
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM {p}pd
),
{p}bn AS (SELECT sk AS n FROM {p}pb UNION SELECT 10000000 + ck FROM {p}pb),
{p}dn AS (SELECT src AS n FROM {p}de UNION SELECT dst FROM {p}de),
{p}nn AS (SELECT n FROM {p}dn EXCEPT SELECT n FROM {p}bn),
{p}sd AS (SELECT DISTINCT src AS n FROM {p}de UNION SELECT n FROM {p}nn),
{p}d1 AS (
  SELECT n FROM {p}nn
  UNION
  SELECT e.dst FROM edges e JOIN {p}sd s ON s.n = e.src
),
{p}row AS (
  SELECT '{p}' AS split,
         (SELECT CAST(count(*) AS BIGINT) FROM {p}de) AS n_delta_edges,
         (SELECT CAST(count(*) AS BIGINT) FROM {p}d1) AS n_dirty_d1
)"""


@register(
    "g_pagerank_frontier_curve",
    oracle="WITH "
    + """pall AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT sk AS src, 10000000 + ck AS dst FROM pall
  UNION ALL
  SELECT 10000000 + ck AS src, sk AS dst FROM pall
),
vn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM
       (SELECT src AS n FROM edges UNION SELECT dst FROM edges)),
"""
    + ",\n".join(
        _frontier_split_sql(p, m, l)
        for p, m, l in [("b20", 10, 8), ("b2", 100, 98), ("b02", 1000, 998)]
    )
    + """
SELECT r.split, r.n_delta_edges, r.n_dirty_d1, vn.n_nodes,
       CAST((r.n_dirty_d1 * 1000000) // vn.n_nodes AS BIGINT) AS dirty_ppm
FROM (SELECT * FROM b20row UNION ALL SELECT * FROM b2row
      UNION ALL SELECT * FROM b02row) r, vn""",
    doc="The frontier-saturation curve as driver-verified data — the "
    "measurement behind pagerank_maintain's routing default, "
    "registered: one-hop dirty-set size at THREE batch fractions "
    "(20%, 2%, 0.2% of orders as the late batch) over the same "
    "supply graph. On this dense bipartite graph dirty_ppm stays at "
    "~10^6 (total saturation) even at the 0.2% batch — the "
    "oracle-checked witness that frontier-local maintenance cannot "
    "win here at ANY batch size, which is exactly why the router "
    "measures instead of assuming. Exact BIGINT counts, ppm by "
    "truncating division; the three splits share the pall/edges "
    "build, so the query costs one pair scan + three bounded "
    "frontier probes.",
)
def g_pagerank_frontier_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import dirty_frontiers

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    pall = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
        .distinct()
        .persist()
    )

    def _sym(p):
        fwd = p.select(
            F.col("sk").alias("src"), (F.lit(10_000_000) + F.col("ck")).alias("dst")
        )
        return fwd.unionByName(
            p.select(
                (F.lit(10_000_000) + F.col("ck")).alias("src"),
                F.col("sk").alias("dst"),
            )
        )

    union_e = _sym(pall).persist()
    nn = (
        union_e.select(F.col("src").alias("node"))
        .unionByName(union_e.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    out = None
    for label, mod, lim in [("b20", 10, 8), ("b2", 100, 98), ("b02", 1000, 998)]:
        pbase = (
            li.join(
                orders.filter(F.col("o_orderkey") % mod < lim),
                li["l_orderkey"] == orders["o_orderkey"],
            )
            .select(F.col("l_suppkey").alias("sk"), F.col("o_custkey").alias("ck"))
            .distinct()
        )
        delta_e = _sym(pall.join(pbase, ["sk", "ck"], "left_anti"))
        base_nodes = (
            _sym(pbase)
            .select(F.col("src").alias("node"))
            .unionByName(_sym(pbase).select(F.col("dst").alias("node")))
            .distinct()
        )
        d1 = dirty_frontiers(union_e, delta_e, base_nodes, iters=1)[0]
        row = (
            delta_e.agg(F.count(F.lit(1)).cast("long").alias("n_delta_edges"))
            .crossJoin(
                d1.agg(F.count(F.lit(1)).cast("long").alias("n_dirty_d1"))
            )
            .select(
                F.lit(label).alias("split"), "n_delta_edges", "n_dirty_d1"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.crossJoin(F.broadcast(nn)).select(
        "split",
        "n_delta_edges",
        "n_dirty_d1",
        "n_nodes",
        F.expr("CAST((n_dirty_d1 * 1000000) DIV n_nodes AS BIGINT)").alias(
            "dirty_ppm"
        ),
    )


@register(
    "g_cc_damage_curve",
    oracle=_SQL_CC_UNION
    + """,
comps AS (SELECT CAST(count(DISTINCT component) AS BIGINT) AS n_components,
                 CAST(count(*) AS BIGINT) AS n_docs FROM ucomp),
spl(split, m, l) AS (VALUES ('b20', 10, 8), ('b2', 100, 98), ('b02', 1000, 998)),
touched AS (
  SELECT s.split, u.component
  FROM spl s
  JOIN jpairs p ON p.id_a % s.m >= s.l OR p.id_b % s.m >= s.l
  JOIN ucomp u ON u.doc_id = p.id_a OR u.doc_id = p.id_b
  GROUP BY 1, 2
),
aff AS (
  SELECT t.split,
         CAST(count(DISTINCT t.component) AS BIGINT) AS n_affected,
         CAST((SELECT count(*) FROM ucomp u2
               WHERE u2.component IN
                 (SELECT component FROM touched t2 WHERE t2.split = t.split))
              AS BIGINT) AS n_docs_affected
  FROM touched t GROUP BY t.split
)
SELECT s.split, c.n_components, c.n_docs,
       CAST(coalesce(a.n_affected, 0) AS BIGINT) AS n_affected,
       CAST(coalesce(a.n_docs_affected, 0) AS BIGINT) AS n_docs_affected,
       CAST((coalesce(a.n_docs_affected, 0) * 1000000) // c.n_docs
            AS BIGINT) AS damage_ppm
FROM spl s CROSS JOIN comps c
LEFT JOIN aff a ON a.split = s.split""",
    doc="The CC tombstone DAMAGE curve — the contrast datum to "
    "g_pagerank_frontier_curve, registered as oracle-paired data: at "
    "three retraction fractions (pairs touching the late 20% / 2% / "
    "0.2% of docs), how many dedup components — and what share of "
    "member docs — would cc_decremental's component-local rebuild "
    "actually touch. Where the dense supply graph's PageRank frontier "
    "saturates at EVERY batch size (retrain wins), the near-dup pair "
    "graph's components are small and scattered, so the damage share "
    "falls with the batch — the measured reason the CC merge path is "
    "worth keeping while the PageRank router defaults to retrain on "
    "graphs like these. Exact BIGINT counts, ppm by truncating "
    "division; the three splits share the one pair build and the one "
    "transitive closure.",
)
def g_cc_damage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pairs = pairs.select("id_a", "id_b").persist()
    state = DD.connected_components(pairs).persist()
    totals = state.agg(
        F.countDistinct("component").cast("long").alias("n_components"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    out = None
    for label, m, l in [("b20", 10, 8), ("b2", 100, 98), ("b02", 1000, 998)]:
        late = (F.col("id_a") % m >= l) | (F.col("id_b") % m >= l)
        ends = (
            pairs.filter(late)
            .select(F.col("id_a").alias("doc_id"))
            .unionByName(pairs.filter(late).select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        affected = (
            ends.join(state, "doc_id").select("component").distinct()
        )
        members = state.join(
            F.broadcast(affected), "component", "left_semi"
        )
        row = (
            affected.agg(F.count(F.lit(1)).cast("long").alias("n_affected"))
            .crossJoin(
                members.agg(
                    F.count(F.lit(1)).cast("long").alias("n_docs_affected")
                )
            )
            .select(
                F.lit(label).alias("split"), "n_affected", "n_docs_affected"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.crossJoin(F.broadcast(totals)).select(
        "split",
        "n_components",
        "n_docs",
        F.coalesce("n_affected", F.lit(0)).cast("long").alias("n_affected"),
        F.coalesce("n_docs_affected", F.lit(0))
        .cast("long")
        .alias("n_docs_affected"),
        F.expr(
            "CAST((coalesce(n_docs_affected, 0) * 1000000) DIV n_docs AS BIGINT)"
        ).alias("damage_ppm"),
    )


@register(
    "g_cc_maintain_route",
    oracle=_SQL_CC_UNION
    + """,
late AS (
  SELECT id_a, id_b FROM jpairs WHERE id_a % 10 >= 8 OR id_b % 10 >= 8
),
lends AS (SELECT id_a AS doc_id FROM late UNION SELECT id_b FROM late),
aff AS (
  SELECT DISTINCT u.component FROM ucomp u JOIN lends e ON e.doc_id = u.doc_id
),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ucomp) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM ucomp
          WHERE component IN (SELECT component FROM aff)) AS n_docs_affected
)
SELECT n_docs, n_docs_affected,
       CAST((n_docs_affected * 1000000) // n_docs AS BIGINT) AS damage_ppm,
       CASE WHEN 100 * n_docs_affected > 50 * n_docs
            THEN 'retrain' ELSE 'merge' END AS route
FROM c""",
    doc="The cc_maintain routing decision as data — the CC sibling of "
    "g_pagerank_maintain_route (round-12, closing the round-11 "
    "asymmetry): the tombstone DAMAGE fraction dedup.cc_maintain's "
    "auto mode probes (share of corpus docs living in components a "
    "retracted pair touches — exactly the state share the "
    "component-local rebuild would recompute) and the route it "
    "implies at the default 50% threshold, over the same 20% "
    "tombstone split as g_cc_decremental. Exact BIGINT counts, ppm "
    "via truncating integer division. Both routes return identical "
    "labels (g_cc_decremental's hash-green is that proof), so this "
    "one number IS the decision; g_cc_damage_curve shows how it "
    "moves with batch size. Probe cost: one broadcast endpoint-label "
    "lookup + a members count + a state count — no CC rounds.",
)
def g_cc_maintain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    pairs = pairs.select("id_a", "id_b").persist()
    late = (F.col("id_a") % 10 >= 8) | (F.col("id_b") % 10 >= 8)
    state = DD.connected_components(pairs).persist()
    affected = (
        pairs.filter(late)
        .select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.filter(late).select(F.col("id_b").alias("doc_id")))
        .distinct()
        .join(state, "doc_id")
        .select("component")
        .distinct()
    )
    nd = state.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    na = (
        state.join(F.broadcast(affected), "component", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_affected"))
    )
    return nd.crossJoin(na).select(
        "n_docs",
        "n_docs_affected",
        F.expr("CAST((n_docs_affected * 1000000) DIV n_docs AS BIGINT)").alias(
            "damage_ppm"
        ),
        F.when(
            100 * F.col("n_docs_affected") > 50 * F.col("n_docs"),
            F.lit("retrain"),
        )
        .otherwise(F.lit("merge"))
        .alias("route"),
    )


def _pagerank_serve_state(spark: SparkSession, sf_dir: str):
    """Deployment-shaped PageRank state: the post-append edge table,
    the batch, and the base trajectory — what the store holds AFTER
    the append lands and BEFORE the rank merge runs."""
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        base_e, delta_e, union_e = _supply_split(spark, sf_dir)
        return {
            "union_edges": union_e,
            "delta_edges": delta_e,
            "history": pagerank_history(base_e, iters=3, damping_pct=85),
        }

    return serve_state(spark, sf_dir, "pagerank", _build)


@register(
    "g_pagerank_serve_merged",
    oracle=_pagerank_oracle_sql(3, 85),
    doc="SERVE-ONLY delta-PageRank (round-12 verdict item 2 — the "
    "sim_*_topk_serve precedent applied to graph maintenance): the "
    "base trajectory, the post-append edge table and the batch are "
    "persisted ONCE per session to scratch parquet (the state a "
    "deployment's store already holds), and the query reads them and "
    "runs ONLY pagerank_incremental's frontier-bounded merge — so "
    "repeated runs measure the deployment-shaped merge cost, where "
    "g_pagerank_incremental's 9-16s is dominated by rebuilding the "
    "split and trajectory it then maintains. Same oracle as the "
    "end-to-end query (from-scratch unrolled build on the union), "
    "same BIGINT exactness — only the measurement boundary moved. "
    "Scale shape per round: one edge probe against a small frontier, "
    "one trajectory-slice lookup, one frontier-bounded groupBy, all "
    "against parquet state reads.",
)
def g_pagerank_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _pagerank_serve_state(spark, sf_dir)
    return pagerank_incremental(
        st["union_edges"], st["delta_edges"], st["history"],
        iters=3, damping_pct=85,
    )


@register(
    "g_cc_serve_merged",
    oracle=_SQL_CC_UNION + "\nSELECT doc_id, component FROM ucomp",
    doc="SERVE-ONLY incremental CC (round-12 verdict item 2): the base "
    "docs' component labels and the late-doc pair batch are persisted "
    "ONCE per session to scratch parquet, and the query reads them "
    "and runs ONLY cc_incremental's label-graph merge — one endpoint "
    "label lookup, CC over at most |batch| label edges, one broadcast "
    "relabel join — so repeated runs measure the merge a deployment "
    "pays per batch, where g_cc_incremental's wall is dominated by "
    "re-finding the corpus's near-dup pairs and re-running corpus CC "
    "to rebuild the state it then maintains. Same oracle as the "
    "end-to-end query (from-scratch transitive closure on the union "
    "pair set).",
)
def g_cc_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        state, new_pairs = _cc_state_and_batch(spark, sf_dir)
        return {"state": state, "new_pairs": new_pairs}

    st = serve_state(spark, sf_dir, "cc", _build)
    return DD.cc_incremental(st["state"], st["new_pairs"])


def _labelprop_union_oracle_sql(rounds: int = 4, where: str = "") -> str:
    """Unrolled synchronous label propagation over the parts
    co-purchase graph (optionally order-filtered), per-node output —
    the from-scratch target the LP merges must hit (same
    rule/conventions as analytics._label_prop_oracle_sql, which
    outputs the histogram)."""
    s = f"""
WITH eraw AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  {where}
),
l0 AS MATERIALIZED (SELECT DISTINCT u AS n, u AS lab FROM eraw)"""
    prev = "l0"
    for r in range(1, rounds + 1):
        s += f""",
c{r} AS (
  SELECT e.u AS n, l.lab, count(*) AS c
  FROM eraw e JOIN {prev} l ON l.n = e.v
  GROUP BY 1, 2
),
p{r} AS (
  SELECT n, lab, row_number() OVER (PARTITION BY n ORDER BY c DESC, lab) AS rn
  FROM c{r}
),
l{r} AS MATERIALIZED (SELECT n, lab FROM p{r} WHERE rn = 1)"""
        prev = f"l{r}"
    s += f"""
SELECT n AS node, lab AS community FROM {prev}"""
    return s


@register(
    "g_labelprop_incremental",
    oracle=_labelprop_union_oracle_sql(4),
    doc="Incremental LABEL-PROPAGATION maintenance (round-12 — the "
    "remaining fixed-round graph analytic gains a maintain path, "
    "round-11 verdict item 5a): the base co-purchase graph (parts "
    "sharing an early order, l_orderkey%10<8) runs 4 rounds of "
    "deterministic synchronous LP with its full per-round label "
    "trajectory persisted (graph.label_prop_history); the late "
    "orders' exclusive edges then merge via label_prop_incremental, "
    "which recomputes ONLY the dirty frontier per round (new nodes, "
    "nodes that gained a neighbor, and nodes within t hops of one — "
    "the same dirty_frontiers recurrence as delta-PageRank, probed "
    "on reversed edges because LP influence flows v→u along (u,v)) "
    "and reads every clean node's label from the stored trajectory. "
    "Oracle = the FROM-SCRATCH 4-round unrolled build on the union "
    "graph — exact because the winner rule (count desc, min label) "
    "is an integer max(struct), orderless. Scale shape per round: "
    "one frontier-bounded edge probe + one O(nodes) slice lookup + "
    "one frontier-bounded (n, lab) count — vs the retrain's "
    "corpus-wide edge-label join per round.",
)
def g_labelprop_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        label_prop_history,
        label_prop_incremental,
    )
    from ..operators.ranks import pin_frame

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    union_e = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=True)
    )
    base_e = pin_frame(
        cooccurrence_edges(
            li.filter(F.col("l_orderkey") % 10 < 8),
            "l_orderkey",
            "l_partkey",
            directed=True,
        )
    )
    delta_e = union_e.join(base_e, ["u", "v"], "left_anti")
    hist = label_prop_history(base_e, rounds=4)
    return label_prop_incremental(union_e, delta_e, hist, rounds=4).select(
        F.col("n").alias("node"), F.col("lab").alias("community")
    )


@register(
    "g_kcore_incremental",
    oracle=_kcore_oracle_sql(3, 8),
    doc="Incremental K-CORE maintenance (round-12 — the third "
    "fixed-round graph analytic gains a maintain path, completing "
    "PageRank / label-prop / k-core symmetry): the base co-purchase "
    "graph (parts sharing an early order, l_orderkey%10<8) is peeled "
    "once with its full per-round ALIVE trajectory persisted "
    "(graph.kcore_history — at most (rounds+1) rows per node, "
    "shrinking); the late orders' exclusive edges then merge via "
    "kcore_incremental, which re-evaluates the alive verdict ONLY "
    "for the dirty frontier per round (endpoints of new edges, new "
    "nodes, and nodes whose neighbor's verdict flipped — peeling is "
    "the 1-hop recurrence alive_r(v) = alive_{r-1}(v) AND "
    "|alive neighbors| >= k, so the same dirty_frontiers recurrence "
    "applies) and serves every clean node's verdict from the stored "
    "trajectory; one final semi-joined degree pass emits the "
    "q_kcore_parts output shape. Oracle = the FROM-SCRATCH 8-round "
    "unrolled peeling on the union graph (q_kcore_parts' exact "
    "registered SQL, one formula source) — exact because verdicts "
    "are set membership and counts are integers. A batch edge can "
    "RESCUE peeled nodes (degree crosses k) and cascade — the "
    "trajectory overlay handles both (pytest-pinned).",
)
def g_kcore_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        kcore_history,
        kcore_incremental,
    )
    from ..operators.ranks import pin_frame

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    union_e = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=False)
    )
    base_e = pin_frame(
        cooccurrence_edges(
            li.filter(F.col("l_orderkey") % 10 < 8),
            "l_orderkey",
            "l_partkey",
            directed=False,
        )
    )
    delta_e = union_e.join(base_e, ["u", "v"], "left_anti")
    hist = kcore_history(base_e, k=3, rounds=8)
    return kcore_incremental(union_e, delta_e, hist, k=3, rounds=8).select(
        F.col("node").alias("part_id"), "core_degree"
    )


@register(
    "g_labelprop_changefeed",
    oracle=_labelprop_union_oracle_sql(4, "WHERE a.l_orderkey % 10 <> 8"),
    doc="MIXED-changefeed label-prop maintenance — completes the LP "
    "symmetry with PageRank/CC/k-core (round-12): the class 0-8 "
    "co-purchase graph is the base state (4-round trajectory "
    "persisted); one batch then RETRACTS the class-8 orders' "
    "exclusive edges and ADDS the class-9 exclusives, and "
    "label_prop_apply_changes serves the post-change communities by "
    "recomputing only the dirty cone — retraction-shrunk neighbor "
    "multisets (winners can flip back) and append-grown ones fall "
    "out of the same reversed-edge dirty_frontiers recurrence probed "
    "over post∪retracted; nodes whose last edge died leave the "
    "frame. Oracle = the FROM-SCRATCH 4-round unrolled build on the "
    "post-change graph (orders with key%10<>8) — exact via the "
    "integer (count desc, min label) winner. Scale shape identical "
    "to g_labelprop_incremental.",
)
def g_labelprop_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        label_prop_apply_changes,
        label_prop_history,
    )
    from ..operators.ranks import pin_frame

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cls = F.col("l_orderkey") % 10

    def _edges(flt):
        return cooccurrence_edges(
            li.filter(flt), "l_orderkey", "l_partkey", directed=True
        )

    base_e = pin_frame(_edges(cls != 9))
    post_e = pin_frame(_edges(cls != 8))
    added_e = post_e.join(base_e, ["u", "v"], "left_anti")
    retracted_e = base_e.join(post_e, ["u", "v"], "left_anti")
    hist = label_prop_history(base_e, rounds=4)
    return label_prop_apply_changes(
        post_e, added_e, retracted_e, hist, rounds=4
    ).select(F.col("n").alias("node"), F.col("lab").alias("community"))


@register(
    "g_kcore_changefeed",
    oracle=_kcore_oracle_sql(3, 8, "WHERE a.l_orderkey % 10 <> 8"),
    doc="MIXED-changefeed k-core maintenance — completes the k-core "
    "symmetry with PageRank/CC/LP (round-12): the class 0-8 "
    "co-purchase graph's alive trajectory is the base state; one "
    "batch then RETRACTS the class-8 orders' exclusive edges (peeled "
    "regions can unravel — degree drops cascade) and ADDS the "
    "class-9 exclusives (peeled nodes can be rescued), and "
    "kcore_apply_changes serves the post-change core by re-evaluating "
    "only the dirty cone, probed over the symmetrized post∪retracted "
    "edges; nodes whose last edge died leave the node set. Oracle = "
    "the FROM-SCRATCH 8-round unrolled peeling on the post-change "
    "graph (q_kcore_parts' SQL with the order filter — one formula "
    "source). Exact via integer degree thresholds and membership "
    "overlays.",
)
def g_kcore_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        kcore_apply_changes,
        kcore_history,
    )
    from ..operators.ranks import pin_frame

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cls = F.col("l_orderkey") % 10

    def _edges(flt):
        return cooccurrence_edges(
            li.filter(flt), "l_orderkey", "l_partkey", directed=False
        )

    base_e = pin_frame(_edges(cls != 9))
    post_e = pin_frame(_edges(cls != 8))
    added_e = post_e.join(base_e, ["u", "v"], "left_anti")
    retracted_e = base_e.join(post_e, ["u", "v"], "left_anti")
    hist = kcore_history(base_e, k=3, rounds=8)
    return kcore_apply_changes(
        post_e, hist, added_edges=added_e, retracted_edges=retracted_e,
        k=3, rounds=8,
    ).select(F.col("node").alias("part_id"), "core_degree")


@register(
    "g_kcore_maintain_route",
    oracle="""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
eb AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey % 10 < 8
),
ed AS (SELECT u, v FROM e0 EXCEPT SELECT u, v FROM eb),
esym AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
dn AS (SELECT u AS n FROM ed UNION SELECT v FROM ed),
bn AS (SELECT u AS n FROM eb UNION SELECT v FROM eb),
newn AS (SELECT n FROM dn EXCEPT SELECT n FROM bn),
d1 AS (
  SELECT n FROM newn
  UNION
  SELECT e.dst FROM esym e JOIN dn s ON s.n = e.src
),
vn AS (SELECT src AS n FROM esym UNION SELECT dst FROM esym),
c AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM d1) AS n_dirty_d1,
         (SELECT CAST(count(*) AS BIGINT) FROM vn) AS n_nodes
)
SELECT n_nodes, n_dirty_d1,
       CAST((n_dirty_d1 * 1000000) // n_nodes AS BIGINT) AS dirty_ppm,
       CASE WHEN 100 * n_dirty_d1 > 50 * n_nodes
            THEN 'retrain' ELSE 'merge' END AS route
FROM c""",
    doc="The kcore_maintain (and, on this symmetric graph, "
    "labelprop_maintain — both probe the same one-hop dirty set here) "
    "routing decision as data — the parts-co-purchase contrast datum "
    "to g_pagerank_maintain_route's supply graph: the one-hop dirty "
    "fraction |D_1|/|V| of the late-order edge batch (symmetrized "
    "probe, since peeling influence is undirected; the dirty-set "
    "seed is all delta endpoints, which on a symmetric edge list "
    "equals dirty_frontiers' src-side seed) and the route at the "
    "default 50% threshold. All router paths return identical "
    "results (pytest-pinned), so this one number IS the decision. "
    "Exact BIGINT counts, ppm by truncating division; probe cost two "
    "bounded jobs.",
)
def g_kcore_maintain_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        _sym,
        cooccurrence_edges,
        dirty_frontiers,
    )
    from ..operators.ranks import pin_frame

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    union_e = pin_frame(
        cooccurrence_edges(li, "l_orderkey", "l_partkey", directed=False)
    )
    base_e = pin_frame(
        cooccurrence_edges(
            li.filter(F.col("l_orderkey") % 10 < 8),
            "l_orderkey",
            "l_partkey",
            directed=False,
        )
    )
    delta_e = union_e.join(base_e, ["u", "v"], "left_anti")
    probe = _sym(union_e)
    delta_sym = _sym(delta_e)
    base_nodes = (
        _sym(base_e).select(F.col("src").alias("node")).distinct()
    )
    d1 = dirty_frontiers(probe, delta_sym, base_nodes, iters=1)[0]
    nd = d1.agg(F.count(F.lit(1)).cast("long").alias("n_dirty_d1"))
    nn = (
        probe.select(F.col("src").alias("node"))
        .unionByName(probe.select(F.col("dst").alias("node")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return nn.crossJoin(nd).select(
        "n_nodes",
        "n_dirty_d1",
        F.expr("CAST((n_dirty_d1 * 1000000) DIV n_nodes AS BIGINT)").alias(
            "dirty_ppm"
        ),
        F.when(
            100 * F.col("n_dirty_d1") > 50 * F.col("n_nodes"), F.lit("retrain")
        )
        .otherwise(F.lit("merge"))
        .alias("route"),
    )


@register(
    "g_labelprop_serve_merged",
    oracle=_labelprop_union_oracle_sql(4),
    doc="SERVE-ONLY label-prop maintenance (round-12, completing the "
    "serve symmetry g_pagerank_serve_merged / g_cc_serve_merged / "
    "t_index_serve_merged started — the LP and k-core maintain legs "
    "landed later in the round without their serve splits): the "
    "union/delta edge tables and the base 4-round label trajectory "
    "are persisted ONCE per session to scratch parquet, and the "
    "query reads them and runs ONLY label_prop_incremental's "
    "frontier-bounded merge, so repeated runs measure the per-batch "
    "merge a deployment pays, where g_labelprop_incremental's wall "
    "is dominated by rebuilding the co-purchase split and trajectory "
    "it then maintains. Same oracle as the end-to-end query (the "
    "from-scratch 4-round unrolled build on the union graph), same "
    "integer-winner exactness — only the measurement boundary moved.",
)
def g_labelprop_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        label_prop_history,
        label_prop_incremental,
    )
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        union_e = cooccurrence_edges(
            li, "l_orderkey", "l_partkey", directed=True
        )
        base_e = cooccurrence_edges(
            li.filter(F.col("l_orderkey") % 10 < 8),
            "l_orderkey",
            "l_partkey",
            directed=True,
        )
        return {
            "union_edges": union_e,
            "delta_edges": union_e.join(base_e, ["u", "v"], "left_anti"),
            "history": label_prop_history(base_e, rounds=4),
        }

    st = serve_state(spark, sf_dir, "labelprop", _build)
    return label_prop_incremental(
        st["union_edges"], st["delta_edges"], st["history"], rounds=4
    ).select(F.col("n").alias("node"), F.col("lab").alias("community"))


@register(
    "g_kcore_serve_merged",
    oracle=_kcore_oracle_sql(3, 8),
    doc="SERVE-ONLY k-core maintenance (round-12, the last serve "
    "split — every maintained family now measures deployment-shaped "
    "merge cost separately from the measurement-as-proof end-to-end "
    "build): the union/delta edge tables and the base 8-round ALIVE "
    "trajectory are persisted ONCE per session to scratch parquet; "
    "the query reads them and runs ONLY kcore_incremental's "
    "dirty-cone overlay plus the final core-degree pass. Same oracle "
    "as g_kcore_incremental (the from-scratch 8-round unrolled "
    "peeling on the union graph), same set-membership exactness — "
    "only the measurement boundary moved.",
)
def g_kcore_serve_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import (
        cooccurrence_edges,
        kcore_history,
        kcore_incremental,
    )
    from ._serve_state import serve_state

    def _build(spark, sf_dir):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        union_e = cooccurrence_edges(
            li, "l_orderkey", "l_partkey", directed=False
        )
        base_e = cooccurrence_edges(
            li.filter(F.col("l_orderkey") % 10 < 8),
            "l_orderkey",
            "l_partkey",
            directed=False,
        )
        return {
            "union_edges": union_e,
            "delta_edges": union_e.join(base_e, ["u", "v"], "left_anti"),
            "history": kcore_history(base_e, k=3, rounds=8),
        }

    st = serve_state(spark, sf_dir, "kcore", _build)
    return kcore_incremental(
        st["union_edges"], st["delta_edges"], st["history"], k=3, rounds=8
    ).select(F.col("node").alias("part_id"), "core_degree")
