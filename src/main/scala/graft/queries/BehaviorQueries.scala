package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType,
  LongType}

import graft.core.{QueryDef, QueryModule, Tables}
import graft.operators.PrefixSum

/** Behavioral / event-stream analytics over the `events` table: ordered
  * funnel conversion, weekly cohort retention, interval max-concurrency
  * (via the distributed two-phase prefix-sum scan), Markov event
  * transitions, and an SCD type-2 history build over `orders`.
  *
  * These extend the reference's batch-analytics surface (the notebook's
  * per-class histograms and time slicing, network-traffic-analysis.ipynb
  * cells 36-43) with the product-analytics operators a telemetry or
  * training-data pipeline runs over event logs. Scale themes:
  *
  *   - everything per-user runs under a `Window.partitionBy(user_id)` —
  *     parallelism = |users|, state = one user's events, no global sort;
  *   - the only genuinely global ordered computation (the concurrency
  *     sweep) goes through [[graft.operators.PrefixSum]], the two-phase
  *     scan, instead of a single-partition global window;
  *   - all time arithmetic is integral microseconds (`ts` is normalized
  *     to canonical µs by Tables.load), so every intermediate is exact
  *     and partitioning-independent — the QueryDef determinism contract.
  */
object BehaviorQueries extends QueryModule {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** 30-minute session gap in integral microseconds. */
  private val GapUs = 30L * 60 * 1000000L

  /** Microseconds per epoch-anchored week. */
  private val WeekUs = 7L * 86400 * 1000000L

  /** Gap-sessionized intervals, end-exclusive:
    * (user_id, __sess, s0 = min tu, e0 = max tu + 1), with `tu` the event
    * timestamp in integral MICROseconds — the canonical unit Tables.load
    * normalizes `ts` to, and exactly what DuckDB's epoch_us(ts) yields on
    * the oracle side, so instants can be EXPOSED by a gate without any
    * sub-µs digits to disagree on. Same lag+cumsum construction as
    * q_sessionize_batch (EtlQueries), factored here for the interval
    * consumers.
    */
  private def sessionIntervals(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tu"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, 0)
    ev.select(col("user_id"), col("ts").as("tu"), col("event_id"))
      .withColumn("__new",
        when(lag(col("tu"), 1).over(byUser).isNull ||
          col("tu") - lag(col("tu"), 1).over(byUser) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(running))
      .groupBy(col("user_id"), col("__sess"))
      .agg(min(col("tu")).as("s0"), (max(col("tu")) + 1).as("e0"))
  }

  /** Session-cached sessionIntervals over a directory's events table:
    * the per-user window pass + interval reduce is a common subplan of
    * the sessionization consumers (q_max_concurrency here,
    * q_sessionize_batch in EtlQueries), so it is materialized once per
    * (session, dir) via [[graft.core.FrameCache]] and shared — one
    * events shuffle total instead of one per consumer.
    */
  private[queries] def cachedSessionIntervals(
      s: SparkSession, dir: String): DataFrame =
    graft.core.FrameCache.cached(s, s"session_intervals:$GapUs:$dir") {
      sessionIntervals(T(s, dir, "events"))
    }

  /** Stage a read-only source file into a streaming gate's temp dir as a
    * HARD LINK (same-filesystem: instant, zero bytes moved) with a copy
    * fallback for cross-device setups. Round-14: the streaming gates'
    * `Files.copy` of events.parquet ran INSIDE the timed region and its
    * cost scales with input size (a full serial byte copy of the fact at
    * sf10) while contributing nothing to the measured operator — the
    * link preserves the isolation the temp dir exists for (deleting the
    * link never touches the source) and the stream still reads every
    * byte from parquet.
    */
  private def linkOrCopy(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit =
    try { java.nio.file.Files.createLink(dst, src); () }
    catch { case _: Exception =>
      java.nio.file.Files.copy(src, dst); ()
    }

  def defs: Map[String, QueryDef] = Map(

    "q_funnel_conversion" -> QueryDef(
      (s, dir) => {
        // ordered funnel view -> click -> purchase with STEPWISE
        // semantics: a user converts a step only with an event strictly
        // after their previous step's first qualifying event (min-ts
        // chaining, not independent mins — the independent-min funnel
        // overcounts users whose only click precedes their first view).
        // Three keyed aggregations + two user_id equi-joins, all
        // co-partitioned on user_id — no global ordering anywhere.
        val ev = T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("v_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("c_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        ev.agg(countDistinct(col("user_id")).as("n_users"))
          .crossJoin(v.agg(count(lit(1)).as("n_view")))
          .crossJoin(c.agg(count(lit(1)).as("n_click")))
          .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
          .select(col("n_users"), col("n_view"), col("n_click"),
            col("n_purchase"),
            round(col("n_click").cast(DoubleType) / col("n_view"), 6)
              .as("view_to_click"),
            round(col("n_purchase").cast(DoubleType) / col("n_click"), 6)
              .as("click_to_purchase"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS v_ts
             |   FROM events WHERE event_type = 'view' GROUP BY user_id),
             | c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_ts
             |   FROM events e JOIN v ON e.user_id = v.user_id
             |   WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_ts
             |   GROUP BY e.user_id),
             | p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
             |   FROM events e JOIN c ON e.user_id = c.user_id
             |   WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_ts
             |   GROUP BY e.user_id)
             | SELECT
             |   (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
             |   (SELECT COUNT(*) FROM v) AS n_view,
             |   (SELECT COUNT(*) FROM c) AS n_click,
             |   (SELECT COUNT(*) FROM p) AS n_purchase,
             |   ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
             |     / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
             |   ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             |     / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase"""
        .stripMargin),
      "ordered funnel (view->click->purchase), stepwise min-ts chaining"),

    "q_cohort_retention" -> QueryDef(
      (s, dir) => {
        // weekly cohort retention matrix: cohort = a user's first active
        // epoch-week; one row per (cohort, week offset) with distinct
        // active users and the retention fraction. Week index is integral
        // µs `div` — exact, tz-free.
        //
        // Round-13 shape: ONE wide exchange over raw events instead of
        // three. collect_set(w) per user dedups (user, week) AND yields
        // the cohort (array_min) in the same keyed agg — the set union
        // runs map-side, so the exchange carries partially-collapsed
        // per-user week sets, never the raw event stream. Exploding the
        // per-user set back out gives exactly one row per distinct
        // (user, week), so n_active is a plain count — the previous
        // distinct() → groupBy(user) → self-join → countDistinct chain
        // (two event-scale exchanges + an Expand) collapses to
        // set-agg → explode → grid count. Week sets are bounded by the
        // corpus time range (weeks, not events), so the per-user state
        // is small at any scale. Identical counts: same distinct
        // (user, week) universe, same min-week cohorts.
        //
        // cohort_size needs no second pass either: every user is active
        // in their own cohort week (cw = array_min(ws) ∈ ws), so the
        // grid's week_offset=0 row counts the whole cohort exactly once.
        // It attaches as a window over the cohort-week partition of the
        // GRID (≤ weeks² rows) — not a join: a grid self-join re-ran the
        // whole events pipeline a second time (Catalyst pushes the
        // offset=0 filter below the partial agg, so the two branches
        // stop being one canonical subtree and exchange reuse never
        // fires — verified in the executed plan).
        // null-ts policy, explicit (round-13 advice): events.ts is
        // preserved as NULL by the loader's guarded cast; collect_set
        // would silently drop null weeks, and an all-null-ts user would
        // otherwise emit ws=[] (array_min=null cohort). The filter makes
        // "null timestamps never enter the retention matrix" a stated
        // rule rather than a set-semantics accident — same plan (the
        // predicate pushes into the scan), identical rows on non-null
        // data. NOTE: the pre-r13 distinct/join form emitted null-week
        // rows instead; the policy changed WITH the r13 rewrite.
        val perUser = T(s, dir, "events")
          .select(col("user_id"), expr(s"ts div ${WeekUs}L").as("w"))
          .filter(col("w").isNotNull)
          .groupBy(col("user_id"))
          .agg(collect_set(col("w")).as("ws"))
          .select(array_min(col("ws")).as("cw"), col("ws"))
        val act = perUser.select(col("cw"), explode(col("ws")).as("w"))
          .groupBy(col("cw"), (col("w") - col("cw")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
        act.withColumn("cohort_size",
            max(when(col("week_offset") === 0, col("n_active")))
              .over(Window.partitionBy(col("cw"))))
          .select(col("cw").as("cohort_week"), col("cohort_size"),
            col("week_offset"), col("n_active"),
            round(col("n_active").cast(DoubleType) / col("cohort_size"), 6)
              .as("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
             |     epoch_us(ts) // 604800000000 AS w FROM events),
             | cohort AS (SELECT user_id, MIN(w) AS cw FROM uw
             |   GROUP BY user_id),
             | sizes AS (SELECT cw, COUNT(*) AS cohort_size FROM cohort
             |   GROUP BY cw),
             | act AS (SELECT c.cw, uw.w - c.cw AS week_offset,
             |     COUNT(DISTINCT uw.user_id) AS n_active
             |   FROM uw JOIN cohort c ON uw.user_id = c.user_id
             |   GROUP BY c.cw, uw.w - c.cw)
             | SELECT a.cw AS cohort_week, s.cohort_size, a.week_offset,
             |   a.n_active,
             |   ROUND(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6)
             |     AS retention
             | FROM act a JOIN sizes s ON a.cw = s.cw
             | ORDER BY cohort_week, week_offset""".stripMargin),
      "weekly cohort retention matrix (first-active-week cohorts)"),

    "q_max_concurrency" -> QueryDef(
      (s, dir) => {
        // interval max-concurrency sweep: sessionize -> end-exclusive
        // intervals -> +1/-1 boundary deltas -> net delta per distinct
        // instant -> GLOBAL running sum -> max + earliest instant
        // achieving it. The running sum is the scale crux: a plain
        // Window.orderBy(t) serializes onto one task, so it runs through
        // PrefixSum.runningTotal (range-partition + two-phase scan; see
        // that scaladoc). Input to the scan is |distinct boundary
        // instants| rows — already collapsed by the groupBy.
        val iv = cachedSessionIntervals(s, dir)
        val nets = iv.select(col("s0").as("t"), lit(1L).as("d"))
          .unionByName(iv.select(col("e0").as("t"), lit(-1L).as("d")))
          .groupBy(col("t")).agg(sum(col("d")).as("net"))
        // round-14: the query consumes only an AGGREGATE of the prefix
        // stream (its max + earliest witness), so it rides the scan's
        // bucket-combine form — one grain exchange, the per-bucket
        // reduce runs directly above the local window, and the
        // cross-bucket max/argmax assembles on the B-row bucket frame
        // (no bucket-offset join-back onto grain rows; identical to the
        // old global scan + max + equality-join + min(t) chain, see the
        // runningTotalMaxArg scaladoc for the argmax equivalence).
        // bucket bounds come from the CACHED interval frame (min start /
        // max end+1 cover every boundary instant) — the scan's default
        // self-aggregate branch would re-run the nets aggregation
        // key-only (Catalyst prunes it off the shared exchange)
        val bounds = iv.agg(min(col("s0")).as("__kmin"),
          max(col("e0")).as("__kmax"))
        val mx = PrefixSum.runningTotalMaxArg(nets, "t", "net",
          "max_concurrency", "at_t", bounds = Some(bounds))
        iv.agg(count(lit(1)).as("n_sessions"))
          .crossJoin(broadcast(mx))
          .select(col("n_sessions"), col("max_concurrency"), col("at_t"))
      },
      Some("""WITH m AS (SELECT user_id, epoch_us(ts) AS tu,
             |     event_id,
             |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |     OR epoch_us(ts) - lag(epoch_us(ts))
             |        OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |   FROM events
             |   WINDOW w AS (PARTITION BY user_id
             |     ORDER BY epoch_us(ts), event_id)),
             | s AS (SELECT user_id, tu,
             |   SUM(new_sess) OVER (PARTITION BY user_id
             |     ORDER BY tu, event_id
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     AS sess FROM m),
             | iv AS (SELECT user_id, sess, MIN(tu) AS s0,
             |     MAX(tu) + 1 AS e0
             |   FROM s GROUP BY user_id, sess),
             | b AS (SELECT s0 AS t, 1 AS d FROM iv
             |   UNION ALL SELECT e0, -1 FROM iv),
             | n AS (SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM b
             |   GROUP BY t),
             | r AS (SELECT t, CAST(SUM(net) OVER (ORDER BY t
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     AS BIGINT) AS conc FROM n)
             | SELECT (SELECT COUNT(*) FROM iv) AS n_sessions,
             |   (SELECT MAX(conc) FROM r) AS max_concurrency,
             |   (SELECT MIN(t) FROM r
             |     WHERE conc = (SELECT MAX(conc) FROM r)) AS at_t"""
        .stripMargin),
      "interval max-concurrency sweep via distributed two-phase " +
        "prefix-sum scan (PrefixSum.runningTotal)"),

    "q_event_transitions" -> QueryDef(
      (s, dir) => {
        // Markov transition matrix over event types: lead() within each
        // user's ts-ordered stream, pair counts, and the per-source
        // transition probability (exact counts, divided once, rounded
        // once). Per-user window + two keyed aggs — parallelism = |users|
        // then |type pairs|.
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = pairs.groupBy(col("from_type"))
          .agg(sum(col("n")).as("__tot"))
        pairs.join(totals, "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n").cast(DoubleType) / col("__tot"), 6).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH nx AS (SELECT event_type AS from_type,
             |     lead(event_type) OVER (PARTITION BY user_id
             |       ORDER BY epoch_us(ts), event_id) AS to_type
             |   FROM events),
             | pairs AS (SELECT from_type, to_type, COUNT(*) AS n
             |   FROM nx WHERE to_type IS NOT NULL
             |   GROUP BY from_type, to_type),
             | tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS t
             |   FROM pairs GROUP BY from_type)
             | SELECT p.from_type, p.to_type, p.n,
             |   ROUND(CAST(p.n AS DOUBLE) / tot.t, 6) AS p
             | FROM pairs p JOIN tot ON p.from_type = tot.from_type
             | ORDER BY p.from_type, p.to_type""".stripMargin),
      "Markov event-transition matrix: lead() pairs + per-source " +
        "probabilities"),

    "q_scd2_history" -> QueryDef(
      (s, dir) => {
        // SCD type-2 dimension build: collapse each customer's
        // date-ordered order-status observations into validity intervals
        // [valid_from, valid_to) — change detection via lag, interval id
        // via cumsum, valid_to via lead over the collapsed intervals,
        // NULL valid_to marking the current version. The canonical
        // warehouse history-build; every window is partitioned by
        // custkey, so state is one customer's rows.
        val byCust = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val versioned = T(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            col("o_orderstatus"))
          .withColumn("__chg",
            when(lag(col("o_orderstatus"), 1).over(byCust).isNull ||
              lag(col("o_orderstatus"), 1).over(byCust) =!=
                col("o_orderstatus"), 1L)
              .otherwise(0L))
          .withColumn("version", sum(col("__chg"))
            .over(byCust.rowsBetween(Window.unboundedPreceding, 0)))
        val iv = versioned
          .groupBy(col("o_custkey"), col("version"))
          .agg(max(col("o_orderstatus")).as("status"),
            min(col("o_orderdate")).cast(DateType).as("valid_from"),
            count(lit(1)).as("n_orders"))
        val byVer = Window.partitionBy(col("o_custkey"))
          .orderBy(col("version"))
        iv.withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
          .select(col("o_custkey"), col("version"), col("status"),
            col("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"), col("n_orders"))
          .orderBy(col("o_custkey"), col("version"))
      },
      Some("""WITH obs AS (SELECT o_custkey, o_orderdate, o_orderkey,
             |     o_orderstatus,
             |     CASE WHEN lag(o_orderstatus) OVER w IS NULL
             |       OR lag(o_orderstatus) OVER w <> o_orderstatus
             |       THEN 1 ELSE 0 END AS chg
             |   FROM orders WHERE o_custkey < 100
             |   WINDOW w AS (PARTITION BY o_custkey
             |     ORDER BY o_orderdate, o_orderkey)),
             | ver AS (SELECT o_custkey, o_orderstatus, o_orderdate,
             |   SUM(chg) OVER (PARTITION BY o_custkey
             |     ORDER BY o_orderdate, o_orderkey
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     AS version FROM obs),
             | iv AS (SELECT o_custkey, CAST(version AS BIGINT) AS version,
             |     MAX(o_orderstatus) AS status,
             |     CAST(MIN(o_orderdate) AS DATE) AS valid_from,
             |     COUNT(*) AS n_orders
             |   FROM ver GROUP BY o_custkey, version)
             | SELECT o_custkey, version, status, valid_from,
             |   lead(valid_from) OVER (PARTITION BY o_custkey
             |     ORDER BY version) AS valid_to,
             |   lead(valid_from) OVER (PARTITION BY o_custkey
             |     ORDER BY version) IS NULL AS is_current,
             |   n_orders
             | FROM iv ORDER BY o_custkey, version""".stripMargin),
      "SCD type-2 history build: lag-change detection, cumsum versions, " +
        "lead valid_to intervals"),

    "q_rolling_dau" -> QueryDef(
      (s, dir) => {
        // 7-day rolling distinct users per day WITHOUT a distinct-over-
        // range window (neither engine has one) and WITHOUT a day-range
        // self-join: dedup to (user, day) grain first, then each user-day
        // contributes to exactly the 7 window-end days it can influence
        // via a map-side sequence+explode (bounded 7x blowup of the
        // DEDUPED grain), and one grouped exact distinct per window-end
        // day finishes it. At 100 TB the 7x expansion of user-day rows is
        // far cheaper than a range join against the raw event log, and
        // both shuffles key on small-domain columns (day).
        val ud = T(s, dir, "events")
          .select(expr("ts div 86400000000").as("day"), col("user_id"))
          .distinct()
        val bounds = ud.agg(max(col("day")).as("maxd"))
        ud.select(explode(sequence(col("day"), col("day") + 6))
            .as("wday"), col("user_id"))
          .crossJoin(broadcast(bounds))
          .filter(col("wday") <= col("maxd"))
          .groupBy(col("wday"))
          .agg(countDistinct(col("user_id")).as("dau7"))
          .orderBy(col("wday"))
      },
      Some("""WITH ud AS (SELECT DISTINCT
             |     epoch_us(ts) // 86400000000 AS day, user_id
             |   FROM events),
             | ex AS (SELECT ud.day + g.g AS wday, ud.user_id
             |   FROM ud CROSS JOIN (SELECT UNNEST(range(0,7)) AS g) g),
             | b AS (SELECT MAX(day) AS maxd FROM ud)
             | SELECT wday, COUNT(DISTINCT user_id) AS dau7
             | FROM ex, b WHERE wday <= b.maxd
             | GROUP BY wday ORDER BY wday""".stripMargin),
      "7-day rolling distinct users: dedup to user-day grain, bounded " +
        "7x contribution explode, exact distinct per window-end day"),

    "q_interval_union" -> QueryDef(
      (s, dir) => {
        // total covered time per user after merging overlapping usage
        // intervals [ts, ts + value minutes] — the classic interval-union
        // sweep, run entirely under per-user windows: a running max of
        // prior interval ends marks island starts, a running sum numbers
        // the islands, and each island reduces to (min start, max end).
        // Start-tied intervals land in one island whatever their
        // intra-tie order, so the result is partitioning-independent.
        // All arithmetic in exact integral microseconds; parallelism =
        // |users|, per-user state = one user's intervals.
        val iv = T(s, dir, "events").select(col("user_id"),
          col("event_id"), col("ts").as("s"),
          (col("ts") + floor(col("value") * 60).cast(LongType) * 1000000L)
            .as("e"))
        val byU = Window.partitionBy(col("user_id"))
          .orderBy(col("s"), col("e"), col("event_id"))
        val prior = byU.rowsBetween(Window.unboundedPreceding, -1)
        val run = byU.rowsBetween(Window.unboundedPreceding, 0)
        iv.withColumn("pm", max(col("e")).over(prior))
          .withColumn("nw",
            when(col("pm").isNull || col("s") > col("pm"), 1L)
              .otherwise(0L))
          .withColumn("island", sum(col("nw")).over(run))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("s")).as("s0"), max(col("e")).as("e0"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"),
            sum(col("e0") - col("s0")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (SELECT user_id, event_id,
             |     epoch_us(ts) AS s,
             |     epoch_us(ts) + CAST(FLOOR(value*60) AS BIGINT)*1000000
             |       AS e
             |   FROM events),
             | m AS (SELECT *, MAX(e) OVER (PARTITION BY user_id
             |     ORDER BY s, e, event_id
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |     AS pm FROM iv),
             | isl AS (SELECT *,
             |     SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
             |     OVER (PARTITION BY user_id ORDER BY s, e, event_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |     AS island FROM m),
             | g AS (SELECT user_id, island, MIN(s) AS s0, MAX(e) AS e0
             |   FROM isl GROUP BY 1, 2)
             | SELECT user_id, COUNT(*) AS n_islands,
             |   CAST(SUM(e0 - s0) AS BIGINT) AS covered_us
             | FROM g GROUP BY 1 ORDER BY 1""".stripMargin),
      "interval-union sweep per user: running-max island detection, " +
        "exact covered-time totals, no global sort"),

    "q_pattern_match" -> QueryDef(
      (s, dir) => {
        // MATCH_RECOGNIZE-style sequence pattern detection: each user's
        // events collapse (per user — never a global sort) into a journey
        // string of event-type initials ordered by (ts, event_id), and a
        // regex counts non-overlapping view->clicks->purchase runs
        // ('vc*p'). Java and RE2 regexes agree on greedy non-overlapping
        // left-to-right scans of this pattern class. Per-user state is
        // one journey string, bounded by that user's activity — the same
        // contract as sessionization; hot users chunk the same way.
        val j = T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("ch"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            concat_ws("", transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("ch")))),
              x => x.getField("ch"))).as("journey"))
        // regex ABOVE the sort (round-13 audit): the sort's sampling
        // pass re-executes its child; with the journey regex below the
        // sort it ran twice (the child's shuffle is reused, the final
        // agg + regex are not). 2.28 -> 1.99 s at sf10, pat_diff [0,0].
        j.orderBy(col("user_id"))
          .select(col("user_id"), col("n_events"),
            size(expr("regexp_extract_all(journey, 'vc*p', 0)"))
              .cast(LongType).as("n_matches"),
            (size(expr("regexp_extract_all(journey, 'vc*p', 0)")) > 0)
              .as("converted"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id,
             |     substr(event_type, 1, 1) AS ch FROM events),
             | j AS (SELECT user_id, COUNT(*) AS n_events,
             |     string_agg(ch, '' ORDER BY tu, event_id) AS journey
             |   FROM e GROUP BY user_id)
             | SELECT user_id, n_events,
             |   CAST(len(regexp_extract_all(journey, 'vc*p')) AS BIGINT)
             |     AS n_matches,
             |   len(regexp_extract_all(journey, 'vc*p')) > 0 AS converted
             | FROM j ORDER BY user_id""".stripMargin),
      "sequence pattern match (MATCH_RECOGNIZE shape): per-user ordered " +
        "journey strings, regex-counted view->click*->purchase runs"),

    "q_sliding_hll" -> QueryDef(
      (s, dir) => {
        // the 100 TB scale path for q_rolling_dau: per-day mergeable HLL
        // sketches of the user set, then each day's SKETCH (not its
        // rows) fans out to the 7 window-end days it influences and the
        // per-window union estimates the rolling distinct count. Daily
        // sketch state is ~KB regardless of row count, the fan-out
        // carries 7x|days| sketches, and history never re-scans —
        // day N+1 needs only day N+1's sketch. Gate: exact rolling
        // counts (oracle-recomputed) + a 5% error band on the estimate
        // (at sf cardinalities the sparse-mode sketch is exact).
        val ev = T(s, dir, "events")
        val daily = ev
          .select(expr("ts div 86400000000").as("day"), col("user_id"))
          .groupBy(col("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val bounds = daily.agg(max(col("day")).as("maxd"))
        val est = daily
          .select(explode(sequence(col("day"), col("day") + 6))
            .as("wday"), col("sk"))
          .crossJoin(broadcast(bounds))
          .filter(col("wday") <= col("maxd"))
          .groupBy(col("wday"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est7"))
        val exact = ev
          .select(expr("ts div 86400000000").as("day"), col("user_id"))
          .distinct()
          .select(explode(sequence(col("day"), col("day") + 6))
            .as("wday"), col("user_id"))
          .crossJoin(broadcast(bounds))
          .filter(col("wday") <= col("maxd"))
          .groupBy(col("wday"))
          .agg(countDistinct(col("user_id")).as("exact7"))
        exact.join(est, "wday")
          .select(col("wday"), col("exact7"),
            (abs(col("est7") - col("exact7")).cast(DoubleType) /
              col("exact7") <= 0.05).as("est_ok"))
          .orderBy(col("wday"))
      },
      Some("""WITH ud AS (SELECT DISTINCT
             |     epoch_us(ts) // 86400000000 AS day, user_id
             |   FROM events),
             | ex AS (SELECT ud.day + g.g AS wday, ud.user_id
             |   FROM ud CROSS JOIN (SELECT UNNEST(range(0,7)) AS g) g),
             | b AS (SELECT MAX(day) AS maxd FROM ud)
             | SELECT wday, COUNT(DISTINCT user_id) AS exact7,
             |   TRUE AS est_ok
             | FROM ex, b WHERE wday <= b.maxd
             | GROUP BY wday ORDER BY wday""".stripMargin),
      "sliding-window cardinality via mergeable per-day HLL sketches " +
        "(sketch fan-out + window union), error-banded vs exact"),

    "q_cusum_drift" -> QueryDef(
      (s, dir) => {
        // CUSUM changepoint detection over the daily value series (the
        // ingest-drift screen: where does the cumulative deviation from
        // the series mean peak?). The float-free trick: cusum_t =
        // S_t − t·mean has the same argmax as C_t = n·S_t − t·S_total
        // (multiplied through by n>0), and C_t is EXACT integer cents —
        // no mean rounding to disagree on. The ordered window runs over
        // the day grain (|days| rows, 30 here), never raw events.
        val daily = T(s, dir, "events")
          .groupBy(expr("ts div 86400000000").as("day"))
          .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
            .cast(LongType).as("cents"))
        val w = Window.orderBy(col("day"))
        val run = w.rowsBetween(Window.unboundedPreceding, 0)
        val c = daily
          .withColumn("st", sum(col("cents")).over(run))
          .withColumn("t", row_number().over(w))
          .crossJoin(broadcast(daily.agg(
            sum(col("cents")).as("tot"), count(lit(1)).as("n"))))
          .select(col("day"), (col("n") * col("st") -
            col("t") * col("tot")).as("ct"))
        val mx = c.agg(max(abs(col("ct"))).as("max_abs_c"))
        c.agg(count(lit(1)).as("n_days"))
          .crossJoin(broadcast(mx))
          .crossJoin(broadcast(c.crossJoin(broadcast(mx))
            .filter(abs(col("ct")) === col("max_abs_c"))
            .agg(min(col("day")).as("change_day"))))
      },
      Some("""WITH d AS (SELECT epoch_us(ts)//86400000000 AS day,
             |     CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
             |       AS BIGINT) AS cents
             |   FROM events GROUP BY 1),
             | w AS (SELECT day, cents,
             |     SUM(cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND CURRENT ROW) AS st,
             |     ROW_NUMBER() OVER (ORDER BY day) AS t,
             |     SUM(cents) OVER () AS tot, COUNT(*) OVER () AS n
             |   FROM d),
             | c AS (SELECT day, n*st - t*tot AS ct FROM w)
             | SELECT (SELECT COUNT(*) FROM c) AS n_days,
             |   (SELECT CAST(MAX(ABS(ct)) AS BIGINT) FROM c)
             |     AS max_abs_c,
             |   (SELECT MIN(day) FROM c WHERE ABS(ct) =
             |     (SELECT MAX(ABS(ct)) FROM c)) AS change_day"""
        .stripMargin),
      "CUSUM changepoint over daily totals: integer-exact n*S_t - " +
        "t*S_total deviation, bounded day-grain window"),

    "q_dow_profile" -> QueryDef(
      (s, dir) => {
        // day-of-week x hour activity heatmap — the calendar profile
        // behind load shaping and anomaly baselines. Pure integral
        // µs arithmetic (epoch day 0 = Thursday, so (day+3) % 7 makes
        // 0 = Monday; hour = µs-of-day div 3600e6) — no timezone or
        // date-library semantics to disagree on. Map + one keyed agg
        // into a bounded 168-cell result.
        T(s, dir, "events")
          .groupBy(
            expr("(ts div 86400000000 + 3) % 7").as("dow"),
            expr("(ts % 86400000000) div 3600000000").as("hour"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .orderBy(col("dow"), col("hour"))
      },
      Some("""SELECT (epoch_us(ts)//86400000000 + 3) % 7 AS dow,
             |   (epoch_us(ts) % 86400000000) // 3600000000 AS hour,
             |   COUNT(*) AS n,
             |   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             |     AS total
             | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      "day-of-week x hour activity heatmap: integral calendar " +
        "bucketing, one keyed agg, bounded 168-cell output"),

    "q_top_paths" -> QueryDef(
      (s, dir) => {
        // top event paths: the most frequent length-3 event-type
        // sequences across all users (the product-analytics "common
        // journeys" view). lead() under per-user windows emits each
        // trigram locally, one keyed count reduces, and the global
        // top-k rides TakeOrderedAndProject — never a full sort.
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("t"))
          .withColumn("t2", lead(col("t"), 1).over(byUser))
          .withColumn("t3", lead(col("t"), 2).over(byUser))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("t"), col("t2"), col("t3"))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("path")).limit(15)
      },
      Some("""WITH e AS (SELECT user_id, event_type AS t,
             |     epoch_us(ts) AS tu, event_id FROM events),
             | w AS (SELECT user_id, t,
             |     lead(t, 1) OVER (PARTITION BY user_id
             |       ORDER BY tu, event_id) AS t2,
             |     lead(t, 2) OVER (PARTITION BY user_id
             |       ORDER BY tu, event_id) AS t3
             |   FROM e)
             | SELECT t || '>' || t2 || '>' || t3 AS path,
             |   COUNT(*) AS n
             | FROM w WHERE t3 IS NOT NULL
             | GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin),
      "top event paths: per-user lead() trigrams, keyed counts, " +
        "deterministic global top-k"),

    "q_funnel_latency" -> QueryDef(
      (s, dir) => {
        // funnel time-to-convert distribution: per converting user the
        // delay from first view to first subsequent purchase, then
        // exact discrete percentiles with an EXPLICIT crossing rule
        // (smallest delay with 100*cum >= q*n) evaluated identically on
        // both engines — no engine-specific quantile semantics in the
        // gate. Delays quantize to seconds first (one keyed agg to the
        // delay-seconds grain), but unlike the other global-window
        // grains (cents ≤1e4, days ≤30, deciles) distinct delay-seconds
        // GROWS with the observation span (~2.6M for a month), so the
        // cumulative count rides PrefixSum.runningTotal — the two-phase
        // scan, no single-task window — exactly the q_ks_drift recipe.
        val ev = T(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_type"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(v, "user_id").filter(col("ts") > col("v_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        val g = p.join(v, "user_id")
          .select(expr("(p_ts - v_ts) div 1000000").as("delay_s"))
          .groupBy(col("delay_s")).agg(count(lit(1)).as("c"))
        // ONE consumption of the scan (the SQL-native PrefixSum result
        // is not checkpointed): the grand total equals sum(c) over the
        // grain (== max(cum), counts are positive), so it comes from
        // the same tiny aggregate as min/max, and BOTH percentile
        // crossings fuse into one conditional-min pass over the scan —
        // the old form consumed `scanned` three times (total + p50 +
        // p90), re-executing the two-phase scan per consumer. The same
        // aggregate doubles as the scan's bucket bounds (min_s/max_s
        // ARE the key range), referencing all of `stats`' columns so
        // the bounds branch keeps sharing g's exchange instead of
        // re-running the funnel joins key-only (the localScan bounds
        // contract).
        val stats = g.agg(sum(col("c")).as("n_converted"),
          min(col("delay_s")).as("min_s"), max(col("delay_s")).as("max_s"))
        val scanned = PrefixSum.runningTotal(g, "delay_s", "c", "cum",
          bounds = Some(stats.select(col("min_s").as("__kmin"),
            col("max_s").as("__kmax"), col("n_converted").as("__n"))))
        // __n rides the scan as a carried bounds extra — consuming it
        // here (not via a second stats crossJoin) is what keeps the
        // bounds branch un-prunable and the g exchange shared
        val pct = scanned
          .agg(min(when(col("cum") * 100 >= col("__n") * 50,
            col("delay_s"))).as("p50_s"),
            min(when(col("cum") * 100 >= col("__n") * 90,
              col("delay_s"))).as("p90_s"))
        stats.crossJoin(broadcast(pct))
          .select(col("n_converted"), col("min_s"), col("p50_s"),
            col("p90_s"), col("max_s"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS v_ts
             |   FROM events WHERE event_type = 'view' GROUP BY user_id),
             | p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_ts
             |   FROM events e JOIN v ON e.user_id = v.user_id
             |   WHERE e.event_type = 'purchase'
             |     AND epoch_us(e.ts) > v.v_ts
             |   GROUP BY e.user_id),
             | d AS (SELECT (p.p_ts - v.v_ts) // 1000000 AS delay_s
             |   FROM p JOIN v USING (user_id)),
             | g AS (SELECT delay_s, COUNT(*) AS c FROM d GROUP BY 1),
             | w AS (SELECT delay_s, c,
             |     SUM(c) OVER (ORDER BY delay_s ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND CURRENT ROW) AS cum,
             |     SUM(c) OVER () AS n FROM g)
             | SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM g)
             |     AS n_converted,
             |   (SELECT MIN(delay_s) FROM g) AS min_s,
             |   (SELECT MIN(delay_s) FROM w WHERE cum*100 >= n*50)
             |     AS p50_s,
             |   (SELECT MIN(delay_s) FROM w WHERE cum*100 >= n*90)
             |     AS p90_s,
             |   (SELECT MAX(delay_s) FROM g) AS max_s""".stripMargin),
      "funnel time-to-convert percentiles: explicit crossing rule over " +
        "the bounded delay-seconds grain, identical on both engines"),

    "q_stream_sessionize" -> QueryDef(
      (s, dir) => {
        // §2.10 promoted from spec-covered to ORACLE-covered: a REAL
        // Structured Streaming run — file-source micro-batches,
        // `session_window` + event-time watermark in APPEND mode,
        // Trigger.AvailableNow termination — whose final sink output is
        // hash-compared to a batch-SQL oracle. Append-mode semantics are
        // part of the gate: a session is released only once the final
        // watermark (max event time, ms-truncated, minus 10 min) passes
        // its end, so the oracle recomputes batch sessionization AND the
        // retention rule. Scale shape: the session state store holds one
        // merging window per open session (bounded by active users, not
        // event volume), evicted by the watermark; swap the file source
        // for Kafka and this query runs unchanged on a cluster. The sink
        // is PARQUET — the documented production path (spec-covered
        // restart-exactly-once in EventStreamSpec): emitted sessions are
        // written executor-side per micro-batch and never funnel through
        // the driver. (Round 12 used a memory sink here; at sf10 its
        // driver-side collect of every session row was 43 s of the
        // query's 49 s — the operator itself, measured by the twin gate
        // q_session_stats, runs ~6 s.)
        val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
        // every invocation cleans up after itself (round-7 advice: bench
        // reps and determinism sweeps multiplied the leaked temp copies):
        // localCheckpoint detaches the result from the sink files AND the
        // source files, so both can go
        try {
          linkOrCopy(
            java.nio.file.Paths.get(s"$dir/events.parquet"),
            tmp.resolve("events.parquet"))
          val events = graft.streaming.EventStream.readEvents(s, tmp.toString)
          val sess = graft.streaming.EventStream.sessionWindows(
            events.withWatermark("event_time", "10 minutes"), "30 minutes")
          val out = tmp.resolve("sessions").toString
          val q = sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", tmp.resolve("ckpt").toString)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          require(q.awaitTermination(300000),
            "q_stream_sessionize: streaming query did not terminate")
          s.read.parquet(out)
            .select(col("user_id"),
              unix_micros(col("session_start")).as("start_us"),
              unix_micros(col("session_end")).as("end_us"),
              col("n_events"))
            .orderBy(col("user_id"), col("start_us"))
            .localCheckpoint()
        } finally {
          // the checkpointed frame no longer reads these files
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      },
      // break on gaps STRICTLY GREATER than the 30-min gap: an event
      // exactly gap after its predecessor MERGES into the session
      // (session_window's closed-interval rule, pinned by the
      // EventStreamSpec retention property — the >= form diverges on
      // boundary-separated events)
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
             | x AS (SELECT user_id, tu,
             |     CASE WHEN LAG(tu) OVER (PARTITION BY user_id
             |         ORDER BY tu) IS NULL
             |       OR tu - LAG(tu) OVER (PARTITION BY user_id
             |         ORDER BY tu) > 1800000000
             |       THEN 1 ELSE 0 END AS brk
             |   FROM e),
             | sgrp AS (SELECT user_id, tu,
             |     SUM(brk) OVER (PARTITION BY user_id ORDER BY tu
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       AS sid
             |   FROM x),
             | sess AS (SELECT user_id, MIN(tu) AS start_us,
             |     MAX(tu) + 1800000000 AS end_us,
             |     COUNT(*) AS n_events
             |   FROM sgrp GROUP BY user_id, sid),
             | wm AS (SELECT ((MAX(tu) // 1000) - 600000) * 1000 AS wm_us
             |   FROM e)
             | SELECT user_id, start_us, end_us,
             |   CAST(n_events AS BIGINT) AS n_events
             | FROM sess, wm WHERE end_us <= wm_us
             | ORDER BY user_id, start_us""".stripMargin),
      "streaming sessionization gate: session_window + watermark in " +
        "append mode over file-source micro-batches, oracle recomputes " +
        "sessions AND the watermark retention rule"),

    "q_session_stats" -> QueryDef(
      (s, dir) => {
        // Bounded streaming gate (round-10): the SAME session_window +
        // watermark + append-mode pipeline as q_stream_sessionize, but
        // the sessions are reduced to a duration histogram INSIDE the
        // stream (foreachBatch: distributed per-batch aggregate, driver
        // merges ≤ a-few-bucket rows per batch) — so this gate measures
        // the sessionization OPERATOR, not the sink materializing every
        // emitted session row (q_stream_sessionize's sf10 8.1× was
        // memory-sink output growth, not operator cost). At 100 TB the
        // sink-side state here is O(histogram buckets), invariant to
        // event volume; the operator state stays one merging window per
        // open session, watermark-evicted.
        val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
        try {
          linkOrCopy(
            java.nio.file.Paths.get(s"$dir/events.parquet"),
            tmp.resolve("events.parquet"))
          val events = graft.streaming.EventStream.readEvents(s, tmp.toString)
          val sess = graft.streaming.EventStream.sessionWindows(
            events.withWatermark("event_time", "10 minutes"), "30 minutes")
          // bucket -> (n_sessions, n_events); plain map + synchronized:
          // micro-batches execute sequentially, merge cost is |buckets|
          val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
          val q = sess.writeStream
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch { (batch: org.apache.spark.sql.Dataset[
                org.apache.spark.sql.Row], _: Long) =>
              // 10-minute duration buckets over the closed sessions this
              // batch released; the aggregate runs on the executors, only
              // the bucket rows reach the driver
              // integral `div` end to end — Spark's `/` on longs is
              // DOUBLE division, and the determinism contract forbids
              // float rounding between the engines
              val rows = batch
                .select(expr("(unix_micros(session_end) - " +
                  "unix_micros(session_start)) div 1000000").as("dur_s"),
                  col("n_events"))
                .groupBy(expr("dur_s div 600").as("dur_bucket"))
                .agg(count(lit(1)).as("ns"), sum(col("n_events")).as("ne"))
                .collect()
              acc.synchronized {
                rows.foreach { r =>
                  val k = r.getLong(0)
                  val (ns0, ne0) = acc.getOrElse(k, (0L, 0L))
                  acc(k) = (ns0 + r.getLong(1), ne0 + r.getLong(2))
                }
              }
            }
            .start()
          require(q.awaitTermination(300000),
            "q_session_stats: streaming query did not terminate")
          import s.implicits._
          acc.toSeq.map { case (b, (ns, ne)) => (b, ns, ne) }
            .toDF("dur_bucket", "n_sessions", "n_events")
            .orderBy(col("dur_bucket"))
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(tmp).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      },
      // oracle: batch sessionization + the SAME append-mode retention
      // rule as q_stream_sessionize (sessions whose watermark-extended
      // end has passed the final watermark), aggregated to the identical
      // 10-minute duration histogram. Duration uses session_window's
      // [start, last_event + gap) interval, so end_us carries the +gap.
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
             | x AS (SELECT user_id, tu,
             |     CASE WHEN LAG(tu) OVER (PARTITION BY user_id
             |         ORDER BY tu) IS NULL
             |       OR tu - LAG(tu) OVER (PARTITION BY user_id
             |         ORDER BY tu) > 1800000000
             |       THEN 1 ELSE 0 END AS brk
             |   FROM e),
             | sgrp AS (SELECT user_id, tu,
             |     SUM(brk) OVER (PARTITION BY user_id ORDER BY tu
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       AS sid
             |   FROM x),
             | sess AS (SELECT user_id, MIN(tu) AS start_us,
             |     MAX(tu) + 1800000000 AS end_us,
             |     COUNT(*) AS n_events
             |   FROM sgrp GROUP BY user_id, sid),
             | wm AS (SELECT ((MAX(tu) // 1000) - 600000) * 1000 AS wm_us
             |   FROM e)
             | SELECT (end_us - start_us) // 1000000 // 600 AS dur_bucket,
             |   CAST(COUNT(*) AS BIGINT) AS n_sessions,
             |   CAST(SUM(n_events) AS BIGINT) AS n_events
             | FROM sess, wm WHERE end_us <= wm_us
             | GROUP BY 1 ORDER BY 1""".stripMargin),
      "bounded streaming gate: sessionization reduced to a duration " +
        "histogram in-stream (foreachBatch distributed aggregate), so " +
        "the measurement is the operator, never the emitted-row volume"))
}
