"""Evidence bridges for the round-9 streaming batch-replay oracles
(queries/streaming_replay.py): each replay registry query is pinned to
the ACTUAL streaming fold semantics on the same rows, under
adversarial (but time-ordered, for the sessionizer) batchings — the
same contract the HLL/MG replay twins established in round 8."""

from __future__ import annotations

import hashlib
import os

import pytest

SF = "/root/testdata/sf0.001"

# The three real-engine interval-JOIN twins each replay N_BATCHES
# micro-batch triggers through a live Structured Streaming query
# (~70-90s apiece, 231s together — the single biggest block of the
# 30:16 suite wall time that overran the driver's pytest budget, r13
# verdict item 2). The replay-vs-fold pinning of the join semantics
# (test_join_drop_audit_reconciles_with_replay + the oracle-paired
# t_stream_*_join_replay queries) and the cheaper watermark e2e twins
# (tumbling/sliding/session) stay in the default run; the join e2e
# twins run with SPARK_GRAFT_HEAVY_TESTS=1.
_HEAVY = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_HEAVY_TESTS"),
    reason="~75s real-engine join twin; set SPARK_GRAFT_HEAVY_TESTS=1",
)


def _events(spark):
    from files_kraken_spark.sources.tables import load_table

    return load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).collect()


def test_gap_sessions_replay_matches_pure_fold(spark):
    """Replay query rows == the streaming gap-session fold (sorted
    batches, open-session state carried, closed sessions emitted) run
    over the same events in three time-ordered micro-batches per key."""
    from files_kraken_spark.queries.streaming_replay import (
        GAP_US,
        t_streaming_gap_sessions_replay,
    )

    got = {
        (r["key"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in t_streaming_gap_sessions_replay(spark, SF).collect()
    }

    by_key: dict = {}
    for r in _events(spark):
        # replay convention: micros on both engines (ts div 1000)
        by_key.setdefault(str(r["user_id"]), []).append(
            (r["ts"] // 1000, r["event_id"])
        )
    want: dict = {}
    for key, evs in by_key.items():
        evs.sort()
        ts = [t for t, _ in evs]
        # fold in 3 time-ordered chunks, carrying (start, last, n) state
        # across chunk boundaries the way GroupState carries it
        start = last = None
        n = 0
        k = max(1, len(ts) // 3)
        for chunk in (ts[i : i + k] for i in range(0, len(ts), k)):
            for t in sorted(chunk):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last <= GAP_US:
                    last, n = t, n + 1
                else:
                    want[(key, start)] = (last, n)  # closed session
                    start, last, n = t, t, 1
        # the final open session is NOT emitted (still in state)
    assert got == want
    assert len(got) > len(by_key)  # the 1-day gap produced real splits


def test_dedup_replay_matches_pure_fold(spark):
    """Replay digest/count == union of per-batch fresh emissions of the
    streaming seen-set fold, for two different batchings (invariance)."""
    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_dedup_replay,
    )

    got = {r["key"]: r for r in t_streaming_dedup_replay(spark, SF).collect()}
    by_key: dict = {}
    for r in _events(spark):
        by_key.setdefault(r["event_type"], []).append(str(r["user_id"]))
    assert set(got) == set(by_key)
    for key, vals in by_key.items():
        fresh_sets = []
        for nb in (2, 5):  # two adversarial batchings
            seen: set = set()
            fresh: list = []
            k = max(1, len(vals) // nb)
            for chunk in (vals[i : i + k] for i in range(0, len(vals), k)):
                for v in chunk:
                    if v not in seen:
                        seen.add(v)
                        fresh.append(v)
            fresh_sets.append(set(fresh))
        assert fresh_sets[0] == fresh_sets[1] == set(vals)  # invariant
        digest = hashlib.md5(
            ",".join(sorted(fresh_sets[0])).encode()
        ).hexdigest()
        assert got[key]["seen_digest"] == digest
        assert got[key]["n_fresh"] == len(fresh_sets[0])
        assert got[key]["n_rows"] == len(vals)


def test_session_totals_replay_exact_cents(spark):
    """Replay totals == exact integer-cent fold of the same rows; the
    additive fold is batching-invariant by construction."""
    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_session_totals_replay,
    )

    got = {
        r["key"]: (r["events"], r["value_total_cents"])
        for r in t_streaming_session_totals_replay(spark, SF).collect()
    }
    want: dict = {}
    for r in _events(spark):
        ev, cents = want.get(r["event_type"], (0, 0))
        want[r["event_type"]] = (ev + 1, cents + round(r["value"] * 100))
    assert got == want


def test_band_candidates_replay_matches_streaming_fold(spark):
    """(a) No band reaches the default occupancy cap on the test corpus
    (so the replay's over-cap exclusion is vacuous there); (b) the
    replay pair set equals the streaming fold's emissions for two
    arrival orders of each band's members."""
    from files_kraken_spark.operators.dedup import band_keys
    from files_kraken_spark.queries.streaming_replay import (
        BAND_CAP,
        t_streaming_band_candidates_replay,
    )
    from files_kraken_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    bk = band_keys(docs, "doc_id", "text", k_shingle=3, num_hashes=16, bands=4)
    members: dict = {}
    for r in bk.collect():
        members.setdefault(r["band_key"], []).append(int(r["doc_id"]))
    assert max(len(v) for v in members.values()) < BAND_CAP

    got = {
        (r["id_a"], r["id_b"], r["band_key"])
        for r in t_streaming_band_candidates_replay(spark, SF).collect()
    }
    want = set()
    for band, ids in members.items():
        for order in (sorted(ids), sorted(ids, reverse=True)):
            emitted = set()
            stored: list = []
            for nid in order:
                if nid in stored:
                    continue
                for old in stored:
                    emitted.add((min(old, nid), max(old, nid), band))
                stored.append(nid)
            # arrival order must not change the emitted pair set
            assert emitted == {
                (min(a, b), max(a, b), band)
                for i, a in enumerate(ids)
                for b in ids[i + 1 :]
            }
        want |= emitted
    assert got == want


def _stamp_order(paths):
    """Force strictly increasing mtimes: the file source admits files
    in modification-time order, and same-second writes tie-break
    arbitrarily — the gap-session E2E needs batch order to BE the
    event-time order (a real deployment's arrival order), and flaked
    once in a full-suite run when two files landed in the same tick."""
    import os
    import time

    base = time.time() - len(paths) * 10
    for i, p in enumerate(paths):
        os.utime(p, (base + i * 10, base + i * 10))


def _run_stream(spark, tmp_path, out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_gap_sessions_streaming_op_end_to_end_matches_replay(spark, tmp_path):
    """The ACTUAL applyInPandasWithState sessionizer, fed the real
    sf0.001 events in three time-ordered micro-batches (file-source
    batching), emits exactly the closed-session rows the batch-replay
    registry query computes at rest."""
    import json

    from files_kraken_spark.queries.streaming_replay import (
        GAP_US,
        t_streaming_gap_sessions_replay,
    )
    from files_kraken_spark.streaming.stateful import gap_sessions

    rows = sorted(
        (
            # feed the sessionizer micro timestamps (the replay
            # convention); the op itself is unit-agnostic (longs+gap)
            (str(r["user_id"]), int(r["ts"]) // 1000)
            for r in _events(spark)
        ),
        key=lambda kv: kv[1],  # global time order -> time-ordered batches
    )
    src = tmp_path / "src_gap"
    src.mkdir()
    k = (len(rows) + 2) // 3
    for i in range(3):
        (src / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"key": kk, "ts": tt})
                for kk, tt in rows[i * k : (i + 1) * k]
            )
        )
    _stamp_order([src / f"b{i}.json" for i in range(3)])
    stream = (
        spark.readStream.schema("key string, ts long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    got = {
        (r["key"], r["session_start_ns"], r["session_end_ns"], r["n_events"])
        for r in _run_stream(
            spark, tmp_path, gap_sessions(stream.groupBy("key"), gap_ns=GAP_US),
            "gap_e2e",
        )
    }
    want = {
        (r["key"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in t_streaming_gap_sessions_replay(spark, SF).collect()
    }
    assert got == want


def test_streaming_dedup_op_end_to_end_matches_replay(spark, tmp_path):
    """The actual streaming_dedup operator over real events (two
    micro-batches): the union of its fresh emissions digests to
    exactly the replay query's per-key seen_digest / n_fresh."""
    import json

    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_dedup_replay,
    )
    from files_kraken_spark.streaming.stateful import streaming_dedup

    evs = [(r["event_type"], str(r["user_id"])) for r in _events(spark)]
    src = tmp_path / "src_dd"
    src.mkdir()
    k = (len(evs) + 1) // 2
    for i in range(2):
        (src / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"key": kk, "value": vv})
                for kk, vv in evs[i * k : (i + 1) * k]
            )
        )
    _stamp_order([src / f"b{i}.json" for i in range(2)])
    stream = (
        spark.readStream.schema("key string, value string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    fresh: dict = {}
    for r in _run_stream(
        spark, tmp_path, streaming_dedup(stream.groupBy("key")), "dd_e2e"
    ):
        fresh.setdefault(r["key"], []).extend(r["fresh_values"])
    got = {
        k: (len(v), hashlib.md5(",".join(sorted(v)).encode()).hexdigest())
        for k, v in fresh.items()
    }
    want = {
        r["key"]: (r["n_fresh"], r["seen_digest"])
        for r in t_streaming_dedup_replay(spark, SF).collect()
    }
    assert got == want


def test_band_candidates_op_end_to_end_matches_replay(spark, tmp_path):
    """The actual streaming LSH candidate generator over the real
    sf0.001 documents (two micro-batches through the row-wise
    band_keys signature): its emitted pair set equals the replay
    query's at-rest self-join rows."""
    from files_kraken_spark.operators.dedup import band_keys
    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_band_candidates_replay,
    )
    from files_kraken_spark.sources.tables import load_table
    from files_kraken_spark.streaming.stateful import (
        streaming_band_candidates,
    )

    import json

    docs = [
        (int(r["doc_id"]), r["text"])
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    src = tmp_path / "src_band"
    src.mkdir()
    half = len(docs) // 2
    for i, chunk in enumerate((docs[:half], docs[half:])):
        (src / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"doc_id": d, "text": t}) for d, t in chunk
            )
        )
    _stamp_order([src / f"b{i}.json" for i in range(2)])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    bk = band_keys(stream, "doc_id", "text", k_shingle=3, num_hashes=16,
                   bands=4)
    got = {
        (r["id_a"], r["id_b"], r["band_key"])
        for r in _run_stream(
            spark, tmp_path,
            streaming_band_candidates(bk.groupBy("band_key")), "band_e2e",
        )
    }
    want = {
        (r["id_a"], r["id_b"], r["band_key"])
        for r in t_streaming_band_candidates_replay(spark, SF).collect()
    }
    assert got == want


def test_kmv_replay_matches_pure_fold(spark):
    """Replay estimate/size == the streaming KMV fold's converged
    state under two adversarial batchings (min-k invariance)."""
    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_kmv_replay,
    )
    from files_kraken_spark.streaming.stateful import kmv_estimate, kmv_update

    got = {
        r["key"]: (r["kmv_est"], r["sketch_size"])
        for r in t_streaming_kmv_replay(spark, SF).collect()
    }
    by_key: dict = {}
    for r in _events(spark):
        by_key.setdefault(str(r["user_id"]), []).append(r["event_id"])
    assert set(got) == set(by_key)
    for key, vals in by_key.items():
        folds = []
        for nb in (2, 5):
            hashes: list = []
            k = max(1, len(vals) // nb)
            for chunk in (vals[i : i + k] for i in range(0, len(vals), k)):
                hashes = kmv_update(hashes, chunk, k=64)
            folds.append(tuple(hashes))
        assert folds[0] == folds[1]  # batching-invariant state
        assert got[key] == (kmv_estimate(list(folds[0]), k=64), len(folds[0]))


def test_streaming_kmv_op_end_to_end_matches_replay(spark, tmp_path):
    """The actual streaming_kmv_distinct operator over real events in
    two micro-batches: its final per-key emission equals the replay
    query's converged estimate and sketch size."""
    import json

    from files_kraken_spark.queries.streaming_replay import (
        t_streaming_kmv_replay,
    )
    from files_kraken_spark.streaming.stateful import streaming_kmv_distinct

    evs = [(str(r["user_id"]), int(r["event_id"])) for r in _events(spark)]
    src = tmp_path / "src_kmv"
    src.mkdir()
    k = (len(evs) + 1) // 2
    for i in range(2):
        (src / f"b{i}.json").write_text(
            "\n".join(
                json.dumps({"key": kk, "value": vv})
                for kk, vv in evs[i * k : (i + 1) * k]
            )
        )
    _stamp_order([src / f"b{i}.json" for i in range(2)])
    stream = (
        spark.readStream.schema("key string, value long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    last: dict = {}
    for r in _run_stream(
        spark, tmp_path, streaming_kmv_distinct(stream.groupBy("key")), "kmv_e2e"
    ):
        # append mode emits one row per (key, batch). The converged
        # row is the max per key: state hashes only shrink over time,
        # so sketch_size AND the estimate are monotone non-decreasing
        # across batches — no reliance on memory-sink row order.
        cur = (r["sketch_size"], r["kmv_est"])
        if r["key"] not in last or cur > last[r["key"]]:
            last[r["key"]] = cur
    last = {k: (est, size) for k, (size, est) in last.items()}
    want = {
        r["key"]: (r["kmv_est"], r["sketch_size"])
        for r in t_streaming_kmv_replay(spark, SF).collect()
    }
    assert last == want


def test_kmv_estimate_zero_hash_guard():
    """Round-10 ADVICE: a value whose md5 prefix is 00000000 lands
    h=0 in the sketch; once it is the k-th minimum the estimator must
    clamp the divisor instead of raising. The clamp is spelled
    greatest(h_k, 1) identically in the Spark/DuckDB twins, so the
    pure fold here IS the parity pin."""
    from files_kraken_spark.streaming.stateful import kmv_estimate

    # saturated sketch whose k-th minimum is 0 (k zero-or-tiny hashes)
    hashes = list(range(64))  # h_k = hashes[63] = 63 -> normal path
    assert kmv_estimate(hashes, k=64) == 63 * 4294967296 // 63
    degenerate = [0] * 64  # h_k = 0 -> clamped divisor, no raise
    assert kmv_estimate(degenerate, k=64) == 63 * 4294967296
    # unsaturated sketch stays exact regardless of zeros
    assert kmv_estimate([0, 1, 2], k=64) == 3


def _wm_batches(spark):
    """The replay's deterministic Knuth batching over the sf0.001
    events, as (batch -> [(t_us, cents), ...])."""
    from files_kraken_spark.queries.streaming_replay import N_BATCHES

    by_batch: dict[int, list[tuple[int, int]]] = {}
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) % N_BATCHES
        t_us = int(r["ts"]) // 1000
        cents = int(__import__("math").floor(r["value"] * 100 + 0.5))
        by_batch.setdefault(b, []).append((t_us, cents))
    return by_batch


def _run_windowed_stream(spark, tmp_path, name, windowed):
    """Feed the replay's 16 batches to the REAL engine in batch order
    (one json file per batch, mtime-ordered, maxFilesPerTrigger=1) and
    return the append-mode emissions of `windowed(stream_df)`."""
    import json

    from pyspark.sql import functions as F

    src = tmp_path / f"src_{name}"
    src.mkdir()
    by_batch = _wm_batches(spark)
    paths = []
    for b in sorted(by_batch):
        p = src / f"b{b:02d}.json"
        p.write_text(
            "\n".join(
                json.dumps({"t": t, "cents": c}) for t, c in by_batch[b]
            )
        )
        paths.append(p)
    _stamp_order(paths)
    stream = (
        spark.readStream.schema("t long, cents long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("t")))
    )
    return _run_stream(spark, tmp_path, windowed(stream), name)


def test_tumbling_watermark_e2e_matches_replay(spark, tmp_path):
    """The REAL withWatermark('2 days') + window('1 day') engine, fed
    the replay's exact batches in the replay's batch order, emits
    exactly the replay query's closed windows with the replay's
    kept-row aggregates — pinning the modelled semantics (drop iff
    window end <= prior-batch watermark; append-emit iff end <= final
    watermark) to Spark's own."""
    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        t_tumbling_watermark_replay,
    )

    def windowed(stream):
        return (
            stream.withWatermark("ts", "2 days")
            .groupBy(F.window("ts", "1 day"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("value_sum_cents"),
            )
        )

    got = {
        (
            int(r["window"]["start"].timestamp() * 1_000_000),
            r["n_events"],
            r["value_sum_cents"],
        )
        for r in _run_windowed_stream(spark, tmp_path, "tumb_e2e", windowed)
    }
    want = {
        (r["window_start_us"], r["n_events"], r["value_sum_cents"])
        for r in t_tumbling_watermark_replay(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 5  # real windows closed, not a vacuous pass


def test_sliding_watermark_e2e_matches_replay(spark, tmp_path):
    """Sliding twin: window('2 days', '1 day') — the per-window
    eviction nuance (a late row dropped from its older window but
    kept in the newer) must match the replay row-for-row."""
    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        t_sliding_window_replay,
    )

    def windowed(stream):
        return (
            stream.withWatermark("ts", "2 days")
            .groupBy(F.window("ts", "2 days", "1 day"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("value_sum_cents"),
            )
        )

    got = {
        (
            int(r["window"]["start"].timestamp() * 1_000_000),
            r["n_events"],
            r["value_sum_cents"],
        )
        for r in _run_windowed_stream(spark, tmp_path, "slide_e2e", windowed)
    }
    want = {
        (r["window_start_us"], r["n_events"], r["value_sum_cents"])
        for r in t_sliding_window_replay(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 5


def test_kmv_anotb_theta_and_exact_degradation(spark):
    """t_kmv_anotb invariants on the real corpus: under-k pairs
    degrade to EXACT set difference of the full hash sets, and the
    directional estimates are consistent with the sketch counts."""
    from files_kraken_spark.queries.pipeline import t_kmv_anotb

    rows = t_kmv_anotb(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_anotb_hashes"] >= 0 and r["n_bnota_hashes"] >= 0
        assert r["est_anotb"] >= r["n_anotb_hashes"]  # scale factor >= 1
        assert r["est_bnota"] >= r["n_bnota_hashes"]


@_HEAVY
def test_stream_join_e2e_matches_replay(spark, tmp_path):
    """The REAL watermarked stream-stream interval join (impressions ⋈
    clicks on user within 12h, both sides watermarked 2 days, inner/
    append), fed the replay's exact per-source batches in the replay's
    batch order (one file per source per trigger), emits exactly the
    replay query's surviving pairs — pinning the modelled semantics
    (lag-2 min-of-sources watermark W at the later arrival batch;
    pair survives iff imp_t >= W - 12h and clk_t >= W) to Spark's own."""
    import json

    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        JOIN_US,
        N_BATCHES,
        t_stream_join_replay,
    )

    by_batch: dict[int, dict[str, list]] = {
        b: {"imp": [], "clk": []} for b in range(N_BATCHES)
    }
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) // 268435456
        side = "imp" if r["event_id"] % 2 == 0 else "clk"
        by_batch[b][side].append(
            {"uid": int(r["user_id"]), "t": int(r["ts"]) // 1000}
        )

    dirs = {}
    for side in ("imp", "clk"):
        d = tmp_path / side
        d.mkdir()
        paths = []
        for b in range(N_BATCHES):
            p = d / f"b{b:02d}.json"
            p.write_text(
                "\n".join(json.dumps(row) for row in by_batch[b][side])
            )
            paths.append(p)
        _stamp_order(paths)
        dirs[side] = d

    def src(side, prefix):
        return (
            spark.readStream.schema("uid long, t long")
            .option("maxFilesPerTrigger", 1)
            .json(str(dirs[side]))
            .withColumn("ts", F.timestamp_micros(F.col("t")))
            .withWatermark("ts", "2 days")
            .selectExpr(
                f"uid AS {prefix}_uid", f"t AS {prefix}_us", f"ts AS {prefix}_ts"
            )
        )

    joined = src("imp", "i").join(
        src("clk", "c"),
        F.expr(
            f"c_uid = i_uid AND c_us >= i_us AND c_us <= i_us + {JOIN_US} "
            "AND c_ts >= i_ts AND c_ts <= i_ts + interval 12 hours"
        ),
        "inner",
    ).select("i_uid", "i_us", "c_us")

    got = {
        (r["i_uid"], r["i_us"], r["c_us"])
        for r in _run_stream(spark, tmp_path, joined, "join_e2e")
    }
    want = {
        (int(r["user_id"]), r["imp_us"], r["clk_us"])
        for r in t_stream_join_replay(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 5  # real survivors, not a vacuous pass


@_HEAVY
def test_stream_left_join_e2e_matches_replay(spark, tmp_path):
    """The REAL left-outer watermarked interval join: matched pairs
    emit at match time; an unmatched impression's NULL row emits only
    when the watermark proves no future click can match (eviction at
    W - 12h); impressions still in state when availableNow drains
    never emit. The replay must match row-for-row, NULLs included."""
    import json

    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        JOIN_US,
        N_BATCHES,
        t_stream_left_join_replay,
    )

    by_batch: dict[int, dict[str, list]] = {
        b: {"imp": [], "clk": []} for b in range(N_BATCHES)
    }
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) // 268435456
        side = "imp" if r["event_id"] % 2 == 0 else "clk"
        by_batch[b][side].append(
            {"uid": int(r["user_id"]), "t": int(r["ts"]) // 1000}
        )
    dirs = {}
    for side in ("imp", "clk"):
        d = tmp_path / side
        d.mkdir()
        paths = []
        for b in range(N_BATCHES):
            p = d / f"b{b:02d}.json"
            p.write_text(
                "\n".join(json.dumps(row) for row in by_batch[b][side])
            )
            paths.append(p)
        _stamp_order(paths)
        dirs[side] = d

    def src(side, prefix):
        return (
            spark.readStream.schema("uid long, t long")
            .option("maxFilesPerTrigger", 1)
            .json(str(dirs[side]))
            .withColumn("ts", F.timestamp_micros(F.col("t")))
            .withWatermark("ts", "2 days")
            .selectExpr(
                f"uid AS {prefix}_uid", f"t AS {prefix}_us", f"ts AS {prefix}_ts"
            )
        )

    joined = src("imp", "i").join(
        src("clk", "c"),
        F.expr(
            f"c_uid = i_uid AND c_us >= i_us AND c_us <= i_us + {JOIN_US} "
            "AND c_ts >= i_ts AND c_ts <= i_ts + interval 12 hours"
        ),
        "left_outer",
    ).select("i_uid", "i_us", "c_us")

    got = {
        (r["i_uid"], r["i_us"], r["c_us"])
        for r in _run_stream(spark, tmp_path, joined, "ljoin_e2e")
    }
    want = {
        (int(r["user_id"]), r["imp_us"], r["clk_us"])
        for r in t_stream_left_join_replay(spark, SF).collect()
    }
    assert got == want
    n_nulls = sum(1 for (_, _, c) in want if c is None)
    assert n_nulls > 5 and len(want) - n_nulls > 5  # both surfaces real


@_HEAVY
def test_stream_full_join_e2e_matches_replay(spark, tmp_path):
    """Full-outer twin: matched pairs + BOTH eviction-time NULL
    surfaces (left TTL = W - 12h, right TTL = plain W) must match the
    real engine row-for-row."""
    import json

    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        JOIN_US,
        N_BATCHES,
        t_stream_full_join_replay,
    )

    by_batch: dict[int, dict[str, list]] = {
        b: {"imp": [], "clk": []} for b in range(N_BATCHES)
    }
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) // 268435456
        side = "imp" if r["event_id"] % 2 == 0 else "clk"
        by_batch[b][side].append(
            {"uid": int(r["user_id"]), "t": int(r["ts"]) // 1000}
        )
    dirs = {}
    for side in ("imp", "clk"):
        d = tmp_path / side
        d.mkdir()
        paths = []
        for b in range(N_BATCHES):
            p = d / f"b{b:02d}.json"
            p.write_text(
                "\n".join(json.dumps(row) for row in by_batch[b][side])
            )
            paths.append(p)
        _stamp_order(paths)
        dirs[side] = d

    def src(side, prefix):
        return (
            spark.readStream.schema("uid long, t long")
            .option("maxFilesPerTrigger", 1)
            .json(str(dirs[side]))
            .withColumn("ts", F.timestamp_micros(F.col("t")))
            .withWatermark("ts", "2 days")
            .selectExpr(
                f"uid AS {prefix}_uid", f"t AS {prefix}_us", f"ts AS {prefix}_ts"
            )
        )

    joined = src("imp", "i").join(
        src("clk", "c"),
        F.expr(
            f"c_uid = i_uid AND c_us >= i_us AND c_us <= i_us + {JOIN_US} "
            "AND c_ts >= i_ts AND c_ts <= i_ts + interval 12 hours"
        ),
        "full_outer",
    ).select(
        F.coalesce("i_uid", "c_uid").alias("uid"), "i_us", "c_us"
    )

    got = {
        (r["uid"], r["i_us"], r["c_us"])
        for r in _run_stream(spark, tmp_path, joined, "fjoin_e2e")
    }
    want = {
        (int(r["user_id"]), r["imp_us"], r["clk_us"])
        for r in t_stream_full_join_replay(spark, SF).collect()
    }
    assert got == want
    n_ln = sum(1 for (_, i, c) in want if c is None)
    n_rn = sum(1 for (_, i, c) in want if i is None)
    assert n_ln > 5 and n_rn > 5 and len(want) - n_ln - n_rn > 5


def test_join_drop_audit_reconciles_with_replay(spark):
    """The audit's kept-count must equal the replay's emitted rows,
    and its per-batch totals must cover every interval pair."""
    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        t_stream_join_drop_audit,
        t_stream_join_replay,
    )

    audit = t_stream_join_drop_audit(spark, SF).collect()
    n_kept = sum(r["n_kept"] for r in audit)
    n_pairs = sum(r["n_pairs"] for r in audit)
    n_drops = sum(
        r["n_late_imp"] + r["n_late_clk"] + r["n_evicted_imp"] for r in audit
    )
    assert n_kept == t_stream_join_replay(spark, SF).count()
    assert n_kept + n_drops == n_pairs
    assert n_drops > 0  # the corpus genuinely exercises every surface


def test_session_watermark_e2e_matches_replay(spark, tmp_path):
    """The REAL withWatermark('2 days') + session_window('6 hours')
    engine keyed by user, fed the replay's exact batches in the
    replay's batch order, emits exactly the replay's sessions — this
    pins the sequential model's THREE rules to Spark's own: the
    late-drop rule (initial window end t+gap at or below the
    prior-batch watermark), the strict-overlap merge rule, and the
    eviction-split behavior (a late-but-kept event next to an
    already-evicted session starts a NEW session — the output is not
    a pure function of the kept set)."""
    import json

    from pyspark.sql import functions as F

    from files_kraken_spark.queries.streaming_replay import (
        N_BATCHES,
        t_session_watermark_replay,
    )

    by_batch: dict[int, list[tuple[int, int, int]]] = {}
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) % N_BATCHES
        t_us = int(r["ts"]) // 1000
        cents = int(__import__("math").floor(r["value"] * 100 + 0.5))
        by_batch.setdefault(b, []).append((int(r["user_id"]), t_us, cents))

    src = tmp_path / "src_sess_e2e"
    src.mkdir()
    paths = []
    for b in sorted(by_batch):
        p = src / f"b{b:02d}.json"
        p.write_text(
            "\n".join(
                json.dumps({"user_id": u, "t": t, "cents": c})
                for u, t, c in by_batch[b]
            )
        )
        paths.append(p)
    _stamp_order(paths)
    stream = (
        spark.readStream.schema("user_id long, t long, cents long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.timestamp_micros(F.col("t")))
    )
    out = (
        stream.withWatermark("ts", "2 days")
        .groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_sum_cents"),
        )
    )
    got = {
        (
            r["user_id"],
            int(r["session_window"]["start"].timestamp() * 1_000_000),
            int(r["session_window"]["end"].timestamp() * 1_000_000),
            r["n_events"],
            r["value_sum_cents"],
        )
        for r in _run_stream(spark, tmp_path, out, "sess_e2e")
    }
    want = {
        (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["value_sum_cents"],
        )
        for r in t_session_watermark_replay(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 20  # real sessions closed, not a vacuous pass


def test_session_audits_reconcile_with_pure_fold(spark):
    """The session drop audit and split audit must reconcile with a
    pure-python sequential fold of the same events: per-batch dropped
    counts match, the replay's emitted event total equals kept minus
    the never-emitted open-state remainder, and the split count is
    exactly sequential-minus-fromscratch."""
    from files_kraken_spark.queries.streaming_replay import (
        DELAY_US,
        N_BATCHES,
        SESSION_GAP_US,
        t_session_drop_audit,
        t_session_split_audit,
        t_session_watermark_replay,
    )

    gap = SESSION_GAP_US
    by_batch: dict[int, list[tuple[int, int]]] = {}
    for r in _events(spark):
        b = ((r["event_id"] * 2654435761) % 4294967296) % N_BATCHES
        by_batch.setdefault(b, []).append((int(r["user_id"]), int(r["ts"]) // 1000))

    mx = {b: max(t for _, t in rows) for b, rows in by_batch.items()}
    wm = {}
    for b in range(N_BATCHES):
        prior = [mx[x] for x in mx if x <= b - 2]
        if prior:
            wm[b] = max(prior) - DELAY_US
    wf = max(mx.values()) - DELAY_US

    # pure fold
    opens: dict[int, list[list[int]]] = {}
    emitted = []
    dropped = {b: 0 for b in by_batch}
    for b in range(N_BATCHES):
        for u, t in by_batch.get(b, []):
            if b in wm and t + gap <= wm[b]:
                dropped[b] += 1
                continue
            opens.setdefault(u, []).append([t, t + gap, 1])
        for u, ss in opens.items():
            ss.sort()
            merged = []
            for s in ss:
                if merged and s[0] < merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], s[1])
                    merged[-1][2] += s[2]
                else:
                    merged.append(s)
            if b in wm:
                emitted.extend(s for s in merged if s[1] <= wm[b])
                merged = [s for s in merged if s[1] > wm[b]]
            opens[u] = merged
    open_left = [s for ss in opens.values() for s in ss]
    emitted.extend(s for s in open_left if s[1] <= wf)
    open_left = [s for s in open_left if s[1] > wf]

    audit = {
        r["batch"]: (r["n_events"], r["n_late_dropped"], r["n_kept"])
        for r in t_session_drop_audit(spark, SF).collect()
    }
    for b, rows in by_batch.items():
        assert audit[b][0] == len(rows)
        assert audit[b][1] == dropped[b], f"batch {b}"
    kept_sum = sum(a[2] for a in audit.values())

    replay = t_session_watermark_replay(spark, SF).collect()
    emitted_events = sum(r["n_events"] for r in replay)
    assert emitted_events == sum(s[2] for s in emitted)
    open_events = sum(s[2] for s in open_left)
    assert kept_sum == emitted_events + open_events

    split = t_session_split_audit(spark, SF).first()
    assert split["n_sessions_sequential"] == len(replay)
    assert (
        split["n_eviction_splits"]
        == split["n_sessions_sequential"] - split["n_sessions_fromscratch"]
    )
    assert split["n_eviction_splits"] >= 0
