"""DataFrame-driven crawl frontier — the north_rule centerpiece.

Replaces the reference's sequential Scrapy TimeMap walk
(/root/reference/hypercane/identify/archivecrawl.py:103-138: a single
process BFS with an O(n) list seen-set) with an iterative-batch scheduler
where every round is one declarative DataFrame job:

    frontier ──anti-join seen (bloom prefilter + exact backstop)
            ──robots gate (broadcast dim join)
            ──politeness: row_number over (host[, salt]) ordered by
              (priority desc, urim asc) ≤ per-host budget
            ──fetch: broadcast/shuffle join against the web/payload table,
              lineage columns stamped (round, fetch_ts, partition_id)
            ──link extraction: explode(outlinks) → canonicalize (SURT)
            ──dedup vs seen ∪ selected → this round's LINK DELTA, appended
              to the frontier log; the next round's frontier is
              merge-on-read over the log (seed snapshot ∪ deltas)

Determinism contract (BASELINE crawl-order fidelity): the global pop order
is (round asc, priority desc, urim asc) under per-host budget B and depth
limit D — reproduced exactly by the pure-Python oracle
(hypercane_spark/oracle/crawl.py). Politeness salting (for hosts hotter
than one partition) splits a host's queue into ``salt`` sub-queues for
*fetch parallelism* while the budget window stays per-host, so parity is
unaffected.

Scale notes (10^10-URL design):
- frontier and seen never touch the driver, and neither is EVER
  materialized whole: durable state is an append-only delta log (one-time
  seed snapshot + per-round link/seen deltas, O(new rows) written per
  round), and every round's frontier is a constant-depth merge-on-read
  plan over that log — no per-round lineage truncation, no O(|frontier|)
  store. Periodic compaction (CrawlConfig.compact_every) bounds the log's
  file count.
- seen-membership is a sharded bloom prefilter (bit positions computed
  JVM-side) + LEFT ANTI JOIN exact backstop; the anti-join shuffles only
  bloom-positive candidates — at steady state a tiny fraction of the round.
- per-host windows shuffle on host (salted when skewed); AQE handles
  residual skew.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hypercane_spark.functions.urls import surt_key
from hypercane_spark.streaming.bloom import (
    CuckooFilter,
    bloom_might_contain,
    bloom_or,
    build_bloom,
    build_cuckoo,
    build_sharded_bloom,
    cuckoo_add_df,
    cuckoo_might_contain,
    sharded_bloom_might_contain,
    sharded_bloom_or_update,
)
from hypercane_spark.streaming.checkpoint import RoundCheckpoint
from hypercane_spark.streaming.robots import robots_gate

FRONTIER_SCHEMA = (
    "urim string, urir string, host string, priority double, depth int, "
    "discovered_from string"
)

# bloom_shards=None auto-select boundary: a 2 MiB (2^24-bit) bitmap is the
# point where shipping the whole filter as a fresh broadcast every round
# stops being obviously cheap; beyond it the sharded delta-log filter wins
# (and at the 10^10-URL design scale, ~12.5 GB, it is the only shape that
# works at all).
SHARD_AUTO_MIN_BITS = 1 << 24


@dataclass
class CrawlConfig:
    per_host_budget: int = 4
    max_depth: int = 3
    max_rounds: int = 50
    # round_seconds: when set (and a robots table provides crawl_delay),
    # the per-host budget is additionally capped at
    # max(1, floor(round_seconds / crawl_delay)) — a host asking for a 30 s
    # delay gets at most round_seconds/30 fetches per round instead of the
    # full budget. None = budget-only politeness (the reference has neither;
    # robots handling is north_rule-new behavior).
    round_seconds: float | None = None
    salt_hot_hosts: int = 1  # >1 splits hot-host queues for fetch parallelism
    bloom_bits: int = 1 << 20
    bloom_hashes: int = 5
    use_bloom: bool = True
    seen_filter: str = "bloom"  # "bloom" | "cuckoo" (use_bloom=False → exact)
    # >0: the seen-filter is the SHARDED distributed (shard, bits) delta
    # log — shard = pmod(xxhash64(surt), S), bits_per_shard = bloom_bits/S,
    # each shard built/appended/tested by the task owning it; the driver
    # never holds a bitmap and no broadcast is shipped per round. This is
    # the design-scale shape (10^10 URLs → ~12.5 GB of filter → must
    # shard); S also floors the membership stage's parallelism, keep ≥ the
    # executor-core count. 0: monolithic driver array + per-round
    # broadcast — measured 15-20 % faster while the filter is small (no
    # candidate shuffle, no per-round filter IO), a hard driver-memory/
    # broadcast wall once it isn't. None (default): auto — monolith while
    # bloom_bits < SHARD_AUTO_MIN_BITS, sharded at or beyond it (the same
    # size-based engine auto-select as kmeans in plans/dsa.py).
    bloom_shards: int | None = None
    cuckoo_capacity: int = 1 << 18
    # every K checkpointed rounds, fold the delta chain into full
    # frontier/seen snapshots and prune the subsumed delta dirs
    # (RoundCheckpoint.compact): bounds resume-scan file count on long
    # crawls while keeping per-round writes O(new state). None = never.
    compact_every: int | None = None
    verify_payload: bool = False  # phash/PSNR fidelity check at fetch time
    psnr_sample_mod: int = 1  # >1: deep PSNR audit on 1/mod of image ids
    collect_metrics: bool = True  # False drops optional per-round counts


@dataclass
class RoundMetrics:
    round: int = 0
    candidates: int = 0
    allowed: int = 0
    # `selected` is measured as the FETCHED row count (selected ⊆ web ⇒
    # equal for link-derived rows; may undercount when user seeds miss the
    # web table or error rows are skipped) — `fetched` is the honest alias
    selected: int = 0
    fetched: int = 0
    new_links: int = 0
    seen_size: int = 0
    # Spark jobs triggered this round (statusTracker delta) — the per-round
    # driver fixed cost is jobs × (scheduling + commit latency), so this is
    # the number to drive DOWN; see BENCH.md round-5 jobs/round table.
    jobs: int = 0
    timings: dict = field(default_factory=dict)


class CrawlEngine:
    """Iterative-batch crawl over a web table
    ``(urim, urir, host, memento_datetime, damage, priority, image_id,
    outlinks array<string>)`` with an image+caption payload table joined in
    at fetch time (input_hint shape)."""

    def __init__(
        self,
        spark: SparkSession,
        web: DataFrame,
        robots: DataFrame | None = None,
        images: DataFrame | None = None,
        checkpoint_dir: str | None = None,
        config: CrawlConfig | None = None,
        errors_dir: str | None = None,
    ):
        self.spark = spark
        self.web = web
        self.robots = robots
        self.images = images
        self.cfg = config or CrawlConfig()
        self.ckpt = RoundCheckpoint(checkpoint_dir) if checkpoint_dir else None
        # errors_dir switches the fetch stage to the reference's skip-not-
        # abort contract (errors.py:5-38): a payload that fails to decode/
        # verify is recorded (uri, stage, traceback) and dropped; the crawl
        # continues. Requires verify_payload (that's where decode happens).
        if errors_dir:
            from hypercane_spark.errors import ErrorStore

            self.errors: "ErrorStore | None" = ErrorStore(errors_dir)
        else:
            self.errors = None
        self.metrics: list[RoundMetrics] = []
        # incremental seen-filter: OR-updated with each round's newly seen
        # keys (blooms compose under OR), so the per-round build cost is
        # O(new keys), not O(entire seen set); rebuilt from the seen table
        # on resume. seen_filter="cuckoo" swaps in the deletable
        # fingerprint-table filter (same prefilter + exact-backstop shape).
        self._bloom: bytes | None = None
        self._cuckoo = None
        # sharded-filter handle (cfg.bloom_shards > 0): a distributed
        # (shard, bits) table; or_update unpersists the stale one per round
        self._sharded = None
        # monolithic-path broadcast handles created this round; destroyed
        # (ckpt mode) or unpersisted (ckpt-less) at round end so filter
        # broadcasts never accumulate across a long crawl
        self._stale_broadcasts: list = []
        # ckpt-less merge-on-read delta log: seed part + per-round link
        # parts, each localCheckpointed (with a checkpoint dir the log is
        # the on-disk delta files instead)
        self._parts: list[DataFrame] = []

    # -------------------------------------------------------------- seeds

    def seed_frontier(self, seeds: DataFrame) -> DataFrame:
        """seeds: any DataFrame with a urim column; joined against the web
        table for (urir, host, priority), depth 0."""
        return (
            seeds.select("urim")
            .join(self.web.select("urim", "urir", "host", "priority"), "urim")
            .withColumn("depth", F.lit(0))
            .withColumn("discovered_from", F.lit(None).cast("string"))
        )

    def empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame([], "surt string")

    def _shards(self) -> int:
        """Effective shard count: explicit config wins; None = auto-select
        by filter size (monolith below SHARD_AUTO_MIN_BITS, 64 shards at or
        beyond — see CrawlConfig.bloom_shards)."""
        if self.cfg.bloom_shards is not None:
            return self.cfg.bloom_shards
        return 64 if self.cfg.bloom_bits >= SHARD_AUTO_MIN_BITS else 0

    def _bits_per_shard(self) -> int:
        """bloom_bits is the TOTAL filter size; each shard owns its slice."""
        return max(64, self.cfg.bloom_bits // self._shards())

    def _filter_root(self) -> str | None:
        """Where the sharded filter's versioned parquet lives: next to the
        checkpoint (shared storage on a cluster) when one exists, else a
        temp dir (local mode). None → build_sharded_bloom makes a tempdir."""
        if self.ckpt:
            import os

            return os.path.join(self.ckpt.base, "seen_filter")
        return None

    def _drop_stale_broadcasts(self) -> None:
        """Free the monolithic-path filter broadcasts created this round.
        By round end every consumer plan has been evaluated (checkpoint
        mode flushes all round state to disk → destroy; ckpt-less mode
        keeps persisted fetched parts whose recompute could still need the
        handle → unpersist only, which frees executor copies but keeps the
        handle re-shippable)."""
        for b in self._stale_broadcasts:
            try:
                if self.ckpt:
                    b.destroy()
                else:
                    b.unpersist(blocking=False)
            except Exception:
                pass
        self._stale_broadcasts.clear()

    def _union_parts(self) -> DataFrame:
        """ckpt-less frontier log: the in-memory delta parts (seed
        snapshot + per-round link deltas, each localCheckpointed)."""
        raw = self._parts[0]
        for p in self._parts[1:]:
            raw = raw.unionByName(p)
        return raw

    @staticmethod
    def _merge_candidates(cand: DataFrame) -> DataFrame:
        """Fold duplicate discoveries of a urim across the (already
        seen-filtered) log with the engine's associative merge aggregate.
        Runs AFTER _not_seen by design — a manual pushdown of the seen
        anti-join through the aggregate (legal because seen is keyed on
        surt(urim): a urim's copies are all-seen or all-new), so rows
        already fetched never enter the merge shuffle. At steady state
        most log rows ARE seen — without the pushdown the merge would
        shuffle the whole log every round."""
        return cand.groupBy("urim").agg(
            F.first("urir").alias("urir"),
            F.first("host").alias("host"),
            F.max("priority").alias("priority"),
            F.min("depth").alias("depth"),
            F.min("discovered_from").alias("discovered_from"),
            F.first("__surt").alias("__surt"),
        )

    # -------------------------------------------------------------- round

    def _not_seen(self, frontier: DataFrame, seen: DataFrame) -> DataFrame:
        cand = frontier.withColumn("__surt", surt_key(F.col("urim")))
        # A full cuckoo can have FALSE NEGATIVES (failed/evicted inserts) —
        # a seen URL would test "sure new" and skip the exact backstop, so
        # once full the prefilter is permanently distrusted and every
        # candidate takes the exact anti-join path.
        use_cuckoo = (
            self.cfg.use_bloom
            and self.cfg.seen_filter == "cuckoo"
            and self._cuckoo is not None
            and self._cuckoo.count > 0
            and not self._cuckoo.full
        )
        if use_cuckoo:
            flagged = cuckoo_might_contain(
                cand, "__surt", self._cuckoo, out="__in_bloom"
            )
        elif (
            self.cfg.use_bloom
            and self._shards() > 0
            and self._sharded is not None
        ):
            flagged = sharded_bloom_might_contain(
                cand, "__surt", self._sharded, out="__in_bloom"
            )
        elif (
            self.cfg.use_bloom
            and self._shards() == 0
            and self._bloom is not None
        ):
            flagged = bloom_might_contain(
                cand,
                "__surt",
                self._bloom,
                self.cfg.bloom_bits,
                self.cfg.bloom_hashes,
                broadcast_registry=self._stale_broadcasts,
            )
        else:
            return cand.join(seen, cand["__surt"] == seen["surt"], "left_anti")
        sure_new = flagged.where(~F.col("__in_bloom")).drop("__in_bloom")
        maybe = flagged.where(F.col("__in_bloom")).drop("__in_bloom")
        checked = maybe.join(
            seen, maybe["__surt"] == seen["surt"], "left_anti"
        )
        return sure_new.unionByName(checked)

    def _politeness_select(
        self, allowed: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """→ (selected, deferred). Per-host budget window; the SQL-oracle-
        checkable core of the scheduler (see entry_queries politeness
        query).

        Skew: a Zipf-hot host can hold a large share of the frontier, and a
        single ``partitionBy(host)`` window serializes that whole host into
        one task (measured: the hottest synthetic host carries ~28% of rows
        → the window stage's wall time is flat in the core count). With
        ``salt_hot_hosts > 1`` selection runs as an exact two-phase top-k:
        phase 1 ranks within (host, salt=hash(urim)%S) partitions and keeps
        only ``budget`` rows per salted queue — parallel across salts —
        so phase 2's authoritative per-host window sees ≤ budget·S rows per
        host instead of the full queue. Same selected set, same order:
        any row in the true per-host top-budget is in its salt's top-budget.
        Deferred rows (beyond budget) skip phase 1 by construction — they
        are recovered by anti-joining selected against allowed.

        With ``cfg.round_seconds`` set and a ``crawl_delay`` column present
        (robots_gate carries it), the per-host cap becomes
        ``min(budget, max(1, floor(round_seconds / crawl_delay)))`` — the
        crawl-delay directive translated into this engine's round-batched
        schedule (delay ≤ 0 / absent → plain budget; the max(1,…) floor
        guarantees progress). crawl_delay is constant per host, so the cap
        is still a single window filter."""
        budget = F.lit(self.cfg.per_host_budget)
        if self.cfg.round_seconds and "crawl_delay" in allowed.columns:
            by_delay = F.floor(
                F.lit(float(self.cfg.round_seconds)) / F.col("crawl_delay")
            ).cast("int")
            budget = F.when(
                F.col("crawl_delay") > 0,
                F.least(budget, F.greatest(F.lit(1), by_delay)),
            ).otherwise(budget)
        w = Window.partitionBy("host").orderBy(
            F.col("priority").desc(), F.col("urim").asc()
        )
        if self.cfg.salt_hot_hosts > 1:
            salt = F.pmod(F.xxhash64(F.col("urim")), F.lit(self.cfg.salt_hot_hosts))
            w1 = Window.partitionBy("host", "__salt").orderBy(
                F.col("priority").desc(), F.col("urim").asc()
            )
            pruned = (
                allowed.withColumn("__salt", salt)
                .withColumn("__rn1", F.row_number().over(w1))
                .where(F.col("__rn1") <= budget)
                .drop("__rn1", "__salt")
            )
            selected = (
                pruned.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= budget)
                .drop("__rn")
            )
            deferred = allowed.join(
                selected.select("urim"), on="urim", how="left_anti"
            )
            return selected, deferred
        ranked = allowed.withColumn("__rn", F.row_number().over(w))
        selected = ranked.where(F.col("__rn") <= budget).drop("__rn")
        deferred = ranked.where(F.col("__rn") > budget).drop("__rn")
        return selected, deferred

    def _fetch(self, selected: DataFrame, rnd: int) -> DataFrame:
        fetched = selected.join(
            self.web.select(
                "urim", "memento_datetime", "damage", "image_id", "outlinks"
            ),
            "urim",
        )
        if self.images is not None:
            # NOT broadcast: the payload dim carries image bytes (tens of MB
            # per 1k images at sandbox scale, unbounded at 10^10), and a
            # broadcast would be rebuilt from the driver EVERY round. A
            # shuffle join touches only this round's selected rows; callers
            # that persist images pre-partitioned by image_id (bench does)
            # pay no images-side shuffle at all.
            #
            # The explicit fixed-width repartition matters: AQE coalesces
            # post-shuffle partitions by the MAP-side bytes of the selected
            # rows (a few MB of keys), but the join ATTACHES the payload —
            # 20 KB/row — so without it the decode/verify UDF runs on ~5
            # tasks no matter how many cores exist (measured: local[8] ==
            # local[32] wall time). A user-specified partition count is
            # exempt from AQE coalescing and co-locates with the persisted
            # images partitioning.
            par = self.spark.sparkContext.defaultParallelism
            fetched = fetched.repartition(par, "image_id").join(
                self.images.hint("shuffle_hash"), "image_id", "left"
            )
            if self.cfg.verify_payload:
                # input_hint per-row fidelity, computed in the fetch stage
                # itself (Arrow-batched, rides the fetched rows in place)
                from hypercane_spark.operators.multimodal import (
                    payload_verify_udf,
                )

                capture = self.errors is not None
                v = payload_verify_udf(
                    psnr_sample_mod=self.cfg.psnr_sample_mod,
                    capture_errors=capture,
                )(
                    F.col("image_id"), F.col("bytes"), F.col("phash")
                )
                fields = ["__v.phash_ok", "__v.psnr_db"] + (
                    ["__v.err"] if capture else []
                )
                fetched = fetched.withColumn("__v", v).select(
                    "*", *fields
                ).drop("__v")
                if capture:
                    fetched = fetched.withColumnRenamed("err", "fetch_err")
        return (
            fetched.withColumn("round", F.lit(rnd))
            .withColumn("fetch_ts", F.current_timestamp())
            .withColumn("http_status", F.lit(200))
            .withColumn("partition_id", F.spark_partition_id())
        )

    def _extract_links(
        self, fetched: DataFrame, seen: DataFrame, rnd: int
    ) -> DataFrame:
        links = (
            fetched.select(
                F.col("urim").alias("discovered_from"),
                F.col("depth").alias("__pd"),
                F.explode("outlinks").alias("urim"),
            )
            .where(F.col("__pd") + 1 <= self.cfg.max_depth)
            .join(self.web.select("urim", "urir", "host", "priority"), "urim")
            .withColumn("depth", (F.col("__pd") + 1).cast("int"))
            .drop("__pd")
        )
        # collapse duplicate discoveries: max priority, min discoverer
        links = (
            links.withColumn("__surt", surt_key(F.col("urim")))
            .groupBy("urim")
            .agg(
                F.first("urir").alias("urir"),
                F.first("host").alias("host"),
                F.max("priority").alias("priority"),
                F.min("depth").alias("depth"),
                F.min("discovered_from").alias("discovered_from"),
                F.first("__surt").alias("__surt"),
            )
        )
        # drop already-seen
        links = links.join(seen, links["__surt"] == seen["surt"], "left_anti")
        return links.drop("__surt")

    def run(
        self,
        seeds: DataFrame,
        resume: bool = False,
    ) -> DataFrame:
        """Run the crawl; returns the fetched-mementos table (all rounds).
        With a checkpoint dir, each round persists frontier+seen+fetched and
        ``resume=True`` continues from the latest complete round."""
        spark = self.spark
        start_round = 0
        if resume and self.ckpt and self.ckpt.rounds():
            start_round = self.ckpt.rounds()[-1]
            seen = self.ckpt.read_seen(spark, start_round)
            start_round += 1
            if self.cfg.use_bloom and not seen.isEmpty():
                if self.cfg.seen_filter == "cuckoo":
                    # the prefilter must cover the ENTIRE checkpointed seen
                    # set — a fresh filter holding only post-resume keys
                    # would test pre-resume URLs "sure new" and re-fetch
                    # them (skipping the exact backstop)
                    self._cuckoo = build_cuckoo(
                        seen, "surt", capacity=self.cfg.cuckoo_capacity
                    )
                elif self._shards() > 0:
                    self._sharded = build_sharded_bloom(
                        seen,
                        "surt",
                        self._shards(),
                        self._bits_per_shard(),
                        self.cfg.bloom_hashes,
                        root=self._filter_root(),
                    )
                else:
                    self._bloom = build_bloom(
                        seen, "surt", self.cfg.bloom_bits, self.cfg.bloom_hashes
                    )
        else:
            if self.ckpt:
                # one-time seed snapshot — the 'round -1' frontier delta;
                # every round's merge-on-read scan starts from it
                self.ckpt.write_seeds(self.seed_frontier(seeds))
            else:
                self._parts = [self.seed_frontier(seeds).localCheckpoint()]
            seen = self.empty_seen()
            # fresh run: no filter may carry over from a previous run()
            # on this engine — a stale prefilter covering old keys is
            # harmless for bloom (false positives only) but the sharded
            # handle would leak its files and a stale cuckoo could give
            # false negatives on a reseeded crawl
            self._bloom = None
            if self._sharded is not None:
                self._sharded.unpersist()
                self._sharded = None
            self._cuckoo = None

        fetched_parts: list[DataFrame] = []
        tracker = spark.sparkContext.statusTracker()
        for rnd in range(start_round, self.cfg.max_rounds):
            m = RoundMetrics(round=rnd)
            # jobs/round accounting: the engine never sets job groups, so
            # every job (main thread AND checkpoint writer threads) lands in
            # the default group — the before/after delta is this round's
            # job count, the per-round driver fixed-cost driver.
            jobs_before = len(tracker.getJobIdsForGroup(None))
            t0 = time.time()

            # MERGE-ON-READ: the frontier is never materialized as a
            # table. Each round reconstructs it lazily from the append-only
            # delta log — seed snapshot ∪ per-round link deltas (files
            # under the checkpoint; localCheckpointed parts without one) —
            # seen-filtered row-wise, then folded by one associative
            # aggregate (filter first, so fetched rows skip the shuffle). The
            # plan is constant-depth whatever the round count (a multi-path
            # file scan + one shuffle), so no per-round lineage truncation
            # or O(|frontier|) store exists at all. Measured against both
            # prior shapes (full-frontier parquet rewrite; per-round
            # localCheckpoint) this deletes one whole O(|frontier|)
            # materialization job per round, and it is the only shape that
            # survives a 10^10-row frontier — rewriting or caching the
            # frontier per round is O(F)·rounds storage traffic, the delta
            # log is O(new links). Iceberg analog: merge-on-read table,
            # compact() = rewrite_data_files.
            #
            # The seen-dedup is left lazy: its work folds into the
            # schedule/fetch jobs below. selected == 0 subsumes the
            # candidates == 0 stop (selected ⊆ candidates, and a nonzero
            # robots-allowed set always selects ≥ 1 under budget ≥ 1), so
            # no separate count action is needed per round.
            log = (
                self.ckpt.read_frontier_log(spark, rnd - 1)
                if self.ckpt
                else self._union_parts()
            )
            # seen filter FIRST (row-wise bloom/cuckoo prefilter + exact
            # anti-join backstop), merge aggregate SECOND: fetched rows
            # stay out of the merge shuffle (see _merge_candidates)
            cand = self._merge_candidates(self._not_seen(log, seen))
            if self.cfg.collect_metrics:
                m.candidates = cand.count()
            m.timings["dedup"] = time.time() - t0

            t = time.time()
            # crawl_delay must survive until AFTER _politeness_select — the
            # round_seconds cap reads it there (dropping it here made the
            # per-host crawl-delay budget a silent no-op)
            allowed = (
                robots_gate(cand, self.robots, url="urir", host="host")
                if self.robots is not None
                else cand
            )
            # deferred rows need no explicit carry: anything discovered but
            # not selected stays in the delta log and re-surfaces from the
            # next round's merge-on-read scan
            selected, _deferred = self._politeness_select(allowed)
            if "crawl_delay" in selected.columns:
                selected = selected.drop("crawl_delay")
            selected = selected.persist()
            m.timings["schedule"] = time.time() - t

            t = time.time()
            # The selected count rides the fetch job: selected ⊆ web, so
            # |fetched| == |selected| (inner join on urim; payload join is
            # left). One driver action fewer per round — at 10^10 scale the
            # per-round driver round-trips ARE the iterative bottleneck.
            fetched_full = self._fetch(selected.drop("__surt"), rnd)
            obs = None
            if self.ckpt:
                # Production shape: fetch+verify runs ONCE, payload rows
                # land directly in the round's columnar table, and the
                # in-flight view is the disk-backed read — downstream link
                # extraction prunes the `bytes` column at the scan, so
                # ~20 KB/row of pixels never sits in executor memory
                # (persisting them as JVM objects caused round-0 GC storms).
                #
                # The round's fetched count rides the write job as an
                # observe() metric — the separate post-write count job was
                # pure per-round fixed cost (parquet-stats scan, but still
                # a scheduled job).
                from pyspark.sql import Observation

                obs = Observation()
                obs_metrics = [F.count(F.lit(1)).alias("n")]
                if "fetch_err" in fetched_full.columns:
                    obs_metrics.append(
                        F.sum(
                            F.col("fetch_err").isNotNull().cast("long")
                        ).alias("n_err")
                    )
                self.ckpt.write_fetched(
                    rnd, fetched_full.observe(obs, *obs_metrics)
                )
                fetched = self.ckpt.read_fetched(spark, rnd)
            else:
                fetched = fetched_full.persist()
            if self.errors is not None and "fetch_err" in fetched.columns:
                # skip-not-abort: poisoned payloads land in the errors
                # table and drop out of the crawl output; their surts are
                # still marked seen (via selected) so they are never
                # retried — the reference's record-and-skip contract.
                bad = fetched.where(F.col("fetch_err").isNotNull())
                self.errors.record(
                    bad.select(
                        F.col("urim").alias("uri"),
                        F.lit("fetch").alias("stage"),
                        F.col("fetch_err").alias("traceback"),
                    )
                )
                fetched = fetched.where(F.col("fetch_err").isNull()).drop(
                    "fetch_err"
                )
            if obs is not None:
                row = obs.get  # dict of observed metrics
                n_err = int(row.get("n_err") or 0) if self.errors else 0
                m.selected = m.fetched = int(row["n"]) - n_err
            else:
                m.selected = m.fetched = fetched.count()
            m.timings["fetch"] = time.time() - t
            if m.selected == 0:
                # |fetched| == |selected| only when selected ⊆ web (links
                # are inner-joined to web; that invariant does NOT cover
                # user-supplied seeds absent from the web table). Seeds that
                # miss the web give selected > 0, fetched == 0 — those rows
                # must still be marked seen and the deferred rows must keep
                # crawling, so only a genuinely empty selection stops the
                # engine. The isEmpty probe runs only on fetched==0 rounds.
                if selected.isEmpty():
                    selected.unpersist(blocking=False)
                    if not self.ckpt:
                        fetched.unpersist(blocking=False)
                    break

            t = time.time()

            def _update_filter() -> None:
                # O(selected) incremental seen-filter update. Runs
                # CONCURRENTLY with the checkpoint delta writes below —
                # the filter job reads only `selected` (persisted) and is
                # consumed no earlier than next round's _not_seen, while
                # the writes read fetched/seen — independent inputs, so
                # overlapping them collapses two-plus sequential job
                # latencies into one (per-round fixed-cost cut, round 5).
                if self.cfg.use_bloom and self.cfg.seen_filter == "cuckoo":
                    # (fp, bucket) pairs computed partition-wise (JVM hash
                    # + vectorized derive), one batch insert on the driver
                    # — no per-row Python (mirrors the bloom's
                    # per-partition build)
                    if self._cuckoo is None:
                        self._cuckoo = CuckooFilter(
                            capacity=self.cfg.cuckoo_capacity
                        )
                    if not self._cuckoo.full and not cuckoo_add_df(
                        self._cuckoo,
                        selected.select(F.col("__surt").alias("surt")),
                        "surt",
                    ):
                        import warnings

                        warnings.warn(
                            "cuckoo seen-filter is full; disabling the "
                            "prefilter (exact anti-join only) for the rest "
                            "of the crawl — raise cuckoo_capacity",
                            stacklevel=2,
                        )
                elif self.cfg.use_bloom and self._shards() > 0:
                    # incremental OR into the distributed (shard, bits)
                    # table; the stale table is unpersisted inside
                    # or_update so executor storage holds exactly one
                    # filter
                    keys = selected.select(F.col("__surt").alias("surt"))
                    if self._sharded is None:
                        self._sharded = build_sharded_bloom(
                            keys,
                            "surt",
                            self._shards(),
                            self._bits_per_shard(),
                            self.cfg.bloom_hashes,
                            root=self._filter_root(),
                        )
                    else:
                        self._sharded = sharded_bloom_or_update(
                            self._sharded, keys, "surt"
                        )
                elif self.cfg.use_bloom:
                    # OR-composed into the running filter
                    self._bloom = bloom_or(
                        self._bloom,
                        build_bloom(
                            selected.select(F.col("__surt").alias("surt")),
                            "surt",
                            self.cfg.bloom_bits,
                            self.cfg.bloom_hashes,
                        ),
                    )

            # Append-only seen semantics: this round's delta is the selected
            # surts (distinct within the round; disjoint from `seen` by
            # construction — every candidate passed the seen anti-join, and
            # the bloom/cuckoo prefilters have no false negatives on the
            # paths that skip it). The union IS the seen set; nothing is
            # ever rewritten.
            delta = selected.select(F.col("__surt").alias("surt")).distinct()
            new_seen = seen.unionByName(delta)
            links = self._extract_links(fetched, new_seen, rnd)
            m.timings["links"] = time.time() - t

            t = time.time()
            from concurrent.futures import ThreadPoolExecutor

            if self.ckpt:
                # Durable state is APPEND-ONLY on both axes: this round's
                # newly-seen surts AND this round's newly-discovered links
                # (the frontier delta). Nothing else — the merged frontier
                # is never written (or cached) anywhere; the next round's
                # merge-on-read scan consumes these files directly. The
                # filter update overlaps the writes (independent inputs,
                # both joined before anything consumes either).
                with ThreadPoolExecutor(max_workers=2) as ex:
                    fut_f = ex.submit(_update_filter)
                    fut_w = ex.submit(
                        self.ckpt.write,
                        rnd,
                        links,
                        delta,
                        None,  # fetched already written at fetch time
                        {
                            "candidates": m.candidates,
                            "selected": m.selected,
                            "timings": m.timings,
                        },
                    )
                    fut_f.result()
                    fut_w.result()
                if (
                    self.cfg.compact_every
                    and (rnd + 1) % self.cfg.compact_every == 0
                ):
                    # fold the delta chain ≤ rnd into full snapshots and
                    # prune the subsumed delta dirs — bounds the per-round
                    # multi-path scan's file count on long crawls. Safe
                    # in-loop: every state DataFrame is rebuilt from
                    # _axis_paths at its next use, which sees the snapshot.
                    self.ckpt.compact(spark, rnd, prune=True)
                # constant-depth file-backed seen view (no union lineage)
                seen = self.ckpt.read_seen(spark, rnd)
            else:
                # ckpt-less mode: the delta log lives in cluster storage —
                # localCheckpointed parts, same merge-on-read formula, the
                # same three-way overlap
                with ThreadPoolExecutor(max_workers=3) as ex:
                    fut_f = ex.submit(_update_filter)
                    fut_l = ex.submit(links.localCheckpoint)
                    fut_d = ex.submit(delta.localCheckpoint)
                    fut_f.result()
                    self._parts.append(fut_l.result())
                    seen = seen.unionByName(fut_d.result())
            m.timings["checkpoint"] = time.time() - t
            if self.cfg.collect_metrics:
                m.seen_size = seen.count()
            m.jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before
            m.new_links = 0
            if m.selected:
                fetched_parts.append(fetched)
            elif not self.ckpt:
                fetched.unpersist(blocking=False)  # empty seed-miss round
            self.metrics.append(m)
            # round state now lives in the checkpoint (or the fetched
            # cache); dropping the per-round selected cache keeps storage
            # memory flat across max_rounds rounds
            selected.unpersist(blocking=False)
            self._drop_stale_broadcasts()

        self._drop_stale_broadcasts()  # covers the break-on-empty path
        if not fetched_parts:
            return spark.createDataFrame([], FRONTIER_SCHEMA + ", round int")
        out = fetched_parts[0]
        for p in fetched_parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out

    # ------------------------------------------------------------ contract

    def pop_order(self, fetched: DataFrame) -> list[str]:
        """The crawl-order fidelity contract: global pop order =
        (round asc, priority desc, urim asc)."""
        return [
            r["urim"]
            for r in fetched.select("round", "priority", "urim")
            .orderBy(F.col("round").asc(), F.col("priority").desc(), F.col("urim").asc())
            .collect()
        ]
