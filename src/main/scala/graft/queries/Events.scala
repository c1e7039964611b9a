package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dashboard-parity analytics over the driver's `events` table, whose
  * `event_type` / `ts` / `user_id` / `props` columns mirror the reference's
  * `status` / `timestamp` / `device_id` / `readings` roles (FIXTURES.md §B).
  *
  * Reference operators covered: P1 nested extraction (`iot_dashboard.py:117-130`,
  * here via JSON props), P3 equality filter (`:147-150`), P4/P5 null handling
  * (`:156-185`), A1 value_counts (`:196-197`), A2 distinct+sort (`:144`),
  * O1 sort (`:112`), O2 limit (`:138`), T5/T6 batch analogs of the streaming
  * windows (true streaming versions live in graft.streaming).
  *
  * Determinism note: events.ts carries nanosecond precision in parquet while
  * Spark truncates to microseconds — so no query here outputs a raw ts or
  * orders by ts without a unique tie-break key; time buckets are formatted to
  * second-or-coarser strings, identical across engines.
  */
object Events {

  private def t(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val all: Seq[Q] = Seq(

    // ---- A1: value_counts of event_type (iot_dashboard.py:196-197)
    Q("q_events_type_count",
      (s, dir) =>
        t(s, dir).groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("event_type")),
      Some("""SELECT event_type, COUNT(*) AS n FROM events
             |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin)),

    // ---- A2: distinct + sort (device selector, iot_dashboard.py:144)
    Q("q_events_distinct_users",
      (s, dir) =>
        t(s, dir).select("user_id").distinct().orderBy("user_id"),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id")),

    // ---- P1/F6: nested JSON extraction (readings[sensor]['value'] analog,
    // iot_dashboard.py:117-121); missing key -> null -> COALESCE default (P6)
    Q("q_events_json_extract",
      (s, dir) =>
        t(s, dir).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          coalesce(get_json_object(col("props"), "$.missing").cast("long"), lit(-1L))
            .as("k_missing"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  COALESCE(CAST(json_extract_string(props, '$.missing') AS BIGINT), -1) AS k_missing
             |FROM events ORDER BY event_id""".stripMargin)),

    // ---- P3 + P4: equality filter on key + null-safe value filter + sort/limit
    Q("q_events_filter",
      (s, dir) =>
        t(s, dir)
          .filter(col("event_type") === "error" && col("value").isNotNull && col("value") > 100.0)
          .select("event_id", "user_id", "value")
          .orderBy("event_id")
          .limit(500),
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type='error' AND value IS NOT NULL AND value > 100
             |ORDER BY event_id LIMIT 500""".stripMargin)),

    // ---- A4: per-user stats (the dashboard's per-device panel, relationally)
    Q("q_events_user_stats",
      (s, dir) =>
        t(s, dir).groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          sum("value").as("s"),
          round(min("value"), 2).as("min_value"),
          round(max("value"), 2).as("max_value"))
          // avg via exact integer floor-division: sum is 2-decimal-granular,
          // so cents are exact longs; ROUND(quotient, 4) is NOT cross-engine
          // stable because quotients like k/3200 land exactly on x.xxxx5 and
          // the engines break the tie differently (found at sf0.1)
          .select(col("user_id"), col("n_events"),
            round(col("s"), 2).as("sum_value"),
            (expr("CAST(ROUND(s*100) AS BIGINT) * 100 div n_events").cast("double")
              / 10000.0).as("avg_value"),
            col("min_value"), col("max_value"))
          .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  ROUND(SUM(value),2) AS sum_value,
             |  CAST((CAST(ROUND(SUM(value)*100) AS BIGINT) * 100) // COUNT(*) AS DOUBLE)/10000
             |    AS avg_value,
             |  ROUND(MIN(value),2) AS min_value, ROUND(MAX(value),2) AS max_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- T6 batch analog: tumbling hourly window per type (streaming twin in
    // graft.streaming.Streams uses window($"ts","1 hour") + watermark)
    Q("q_events_hourly",
      (s, dir) =>
        t(s, dir)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("value").as("s"))
          // integer floor-division avg — see q_events_user_stats note
          .select(col("hour"), col("event_type"), col("n"),
            (expr("CAST(ROUND(s*100) AS BIGINT) * 100 div n").cast("double")
              / 10000.0).as("avg_value"))
          .orderBy("hour", "event_type"),
      Some("""SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
             |  COUNT(*) AS n,
             |  CAST((CAST(ROUND(SUM(value)*100) AS BIGINT) * 100) // COUNT(*) AS DOUBLE)/10000
             |    AS avg_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin)),

    // ---- O3/W1: latest event per user (top-1 per key ranking window)
    Q("q_events_latest_per_user",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
        t(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"), col("event_type"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ---- T5 batch analog: sessionization (1-hour inactivity gap) via
    // gaps-and-islands windows; streaming twin uses session_window()
    Q("q_events_sessions",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapSec = 3600L
        t(s, dir)
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          .withColumn("brk",
            when(col("prev_ts").isNull ||
                 col("ts").cast("long") - col("prev_ts").cast("long") > gapSec, 1L)
              .otherwise(0L))
          .withColumn("sess", sum("brk").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sess")
          .agg(count(lit(1)).as("n_events"),
               date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("start_ts"))
          .orderBy("user_id", "sess")
      },
      // DuckDB: epoch() on the interval difference mirrors the epoch-seconds
      // comparison (second granularity, immune to the ns-vs-us difference)
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN LAG(ts) OVER w IS NULL
             |           OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 3600
             |         THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), s AS (
             |  SELECT user_id, ts, CAST(SUM(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
             |  FROM g
             |)
             |SELECT user_id, sess, COUNT(*) AS n_events,
             |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_ts
             |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin)),

    // ---- SCD TYPE-2 history build (gaps-and-islands): collapse each user's
    // consecutive runs of the same event_type into validity intervals
    // [valid_from, valid_to) with an is_current flag — the standard
    // slowly-changing-dimension shape a warehouse derives from a change
    // stream (KeyedUpsert is the Type-1 latest-wins twin). Run boundaries
    // via lag()+prefix-sum, both windows partitioned by user_id (never
    // global); the whole query is ONE shuffle on user_id reused by every
    // window and the run aggregation. Boundaries output as epoch seconds
    // (second granularity is immune to the parquet ns-vs-us difference —
    // the file-wide determinism note above).
    Q("q_events_scd2",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val runs = t(s, dir)
          .withColumn("prev", lag("event_type", 1).over(byUser))
          .withColumn("chg",
            when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("run_id", sum("chg").over(
            byUser.rowsBetween(Window.unboundedPreceding, 0)))
        val byRun = Window.partitionBy("user_id").orderBy("run_id")
        runs.groupBy("user_id", "run_id")
          .agg(max("event_type").as("event_type"), // constant within a run
            min(col("ts").cast("long")).as("valid_from_s"),
            count(lit(1)).as("n_events"))
          .withColumn("valid_to_s", lead("valid_from_s", 1).over(byRun))
          .withColumn("is_current", col("valid_to_s").isNull)
          .orderBy("user_id", "run_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, event_type,
             |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |r AS (
             |  SELECT user_id, ts, event_type,
             |    CAST(SUM(CASE WHEN prev IS NULL OR prev != event_type THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
             |  FROM e),
             |g AS (
             |  SELECT user_id, run_id, MAX(event_type) AS event_type,
             |    MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS valid_from_s,
             |    COUNT(*) AS n_events
             |  FROM r GROUP BY 1, 2)
             |SELECT user_id, run_id, event_type, valid_from_s,
             |  LEAD(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to_s,
             |  n_events,
             |  LEAD(valid_from_s) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
             |    AS is_current
             |FROM g ORDER BY user_id, run_id""".stripMargin)),

    // ---- J5 as-of join: for each error event, the most recent purchase by the
    // same user at-or-before it. Implemented scalably as union + last() window
    // (one shuffle by user_id, no per-row range scan).
    Q("q_events_asof",
      (s, dir) => {
        val ev = t(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select("user_id", "ts", "event_id")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("ts").as("p_ts"))
        graft.operators.AsOfJoin(errors, purchases,
          key = "user_id", leftTime = "ts", rightTime = "ts",
          rightVals = Seq("p_ts"))
          .select(col("event_id"), col("user_id"),
            date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("last_purchase_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id,
             |  strftime((SELECT MAX(p.ts) FROM events p
             |            WHERE p.user_id = e.user_id AND p.event_type='purchase'
             |              AND p.ts <= e.ts), '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
             |FROM events e WHERE e.event_type='error' ORDER BY e.event_id""".stripMargin)),

    // ---- J5 range join: clicks within 5 minutes after each view, same user.
    // Equi key user_id keeps it a hash/sort-merge join; the range is a post-
    // condition, so it scales as sum(per-user view x click), not |V| x |C|.
    Q("q_events_range_join",
      (s, dir) => {
        val ev = t(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
        views.join(clicks,
            col("c_user") === col("v_user") &&
            col("c_ts") > col("v_ts") &&
            col("c_ts") <= col("v_ts") + expr("INTERVAL 5 MINUTES"),
            "left_outer")
          .groupBy("view_id")
          .agg(count(col("click_id")).as("n_clicks"))
          .orderBy("view_id")
      },
      Some("""SELECT v.event_id AS view_id, COUNT(c.event_id) AS n_clicks
             |FROM events v LEFT JOIN events c
             |  ON c.user_id = v.user_id AND c.event_type='click'
             | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 5 MINUTE
             |WHERE v.event_type='view'
             |GROUP BY v.event_id ORDER BY view_id""".stripMargin)),

    // ---- funnel: users whose first view precedes their first click precedes
    // their first purchase — conversion analysis as one hash aggregation
    // (conditional MIN per stage), no self-joins
    Q("q_events_funnel",
      (s, dir) => {
        val ev = t(s, dir)
        val stages = ev.groupBy("user_id").agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        stages.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("tv").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
          sum(when(col("tv") < col("tc"), 1L).otherwise(0L)).as("n_clicked_after_view"),
          sum(when(col("tv") < col("tc") && col("tc") < col("tp"), 1L).otherwise(0L))
            .as("n_full_funnel"))
      },
      Some("""SELECT COUNT(*) AS n_users,
             |  CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
             |  CAST(SUM(CASE WHEN tv < tc THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
             |  CAST(SUM(CASE WHEN tv < tc AND tc < tp THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
             |FROM (SELECT user_id,
             |        MIN(CASE WHEN event_type='view' THEN date_trunc('microseconds', ts) END) AS tv,
             |        MIN(CASE WHEN event_type='click' THEN date_trunc('microseconds', ts) END) AS tc,
             |        MIN(CASE WHEN event_type='purchase' THEN date_trunc('microseconds', ts) END) AS tp
             |      FROM events GROUP BY user_id)""".stripMargin)),

    // ---- W3 rangeBetween: trailing-1-hour activity per user, a true RANGE
    // frame over epoch seconds (not a row frame). Only order-insensitive
    // aggregates (count/max) so float summation order can't diverge engines;
    // equal-epoch rows share a frame in both engines by RANGE semantics.
    Q("q_events_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("epoch")
          .rangeBetween(-3600, 0)
        t(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("epoch"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("max_1h", round(max("value").over(w), 2))
          .select("event_id", "user_id", "n_1h", "max_1h")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  COUNT(*) OVER w AS n_1h,
             |  ROUND(MAX(value) OVER w, 2) AS max_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |             ORDER BY epoch(date_trunc('second', ts))
             |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ---- cohort retention matrix: cohort = each user's first-seen date,
    // cell (cohort, day_offset) = distinct users of that cohort active that
    // many days later — the product-analytics staple the reference's
    // dashboard gestures at with its time-series panels
    // (iot_dashboard.py:153-191). Scale shape: one partial-aggregated
    // first-seen pass, an equi-key join back on user_id (both sides
    // key-partitioned the same way), then the exact distinct count's
    // two-phase dedup-and-count exchanges — all partial-aggregated, no
    // window, no driver state; at 100 TB the first-seen frame is |users|
    // rows and every exchange is keyed.
    Q("q_events_retention",
      (s, dir) => {
        val ev = t(s, dir).select(col("user_id"), to_date(col("ts")).as("d"))
        val first = ev.groupBy("user_id").agg(min("d").as("cohort0"))
        ev.join(first, "user_id")
          .withColumn("day_offset", datediff(col("d"), col("cohort0")).cast("long"))
          .groupBy("cohort0", "day_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .select(date_format(col("cohort0"), "yyyy-MM-dd").as("cohort"),
            col("day_offset"), col("n_users"))
          .orderBy("cohort", "day_offset")
      },
      Some("""WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort0
             |           FROM events GROUP BY user_id)
             |SELECT strftime(f.cohort0, '%Y-%m-%d') AS cohort,
             |  CAST(date_diff('day', f.cohort0, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
             |  COUNT(DISTINCT e.user_id) AS n_users
             |FROM events e JOIN f USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin)),

    // ---- z-score anomaly detection: flag events whose value sits >2
    // sample standard deviations from its event_type's mean — the
    // relational form of the reference generator's anomaly injection
    // (iot-data-stream.py:185-193, which multiplies a reading far outside
    // its usual range). Stats frame is |event_type| rows (broadcast); the
    // fact side never shuffles — at 100 TB this is one partial-agg pass
    // plus a map-side join, the cheapest possible two-scan shape.
    Q("q_events_zscore",
      (s, dir) => {
        val ev = t(s, dir)
        val stats = ev.groupBy("event_type")
          .agg(avg("value").as("mu"), stddev_samp("value").as("sd"))
        // outputs AND the threshold both live in integer mills (the repo's
        // tie-avoidance convention, q_events_percentiles): the filter reads
        // the same rounded integer both engines emit, so a boundary row can
        // only flip inclusion if its output value differs too — one boundary
        // definition instead of a separate float `> 2.0` cut whose
        // mu/sd-summation-noise flips would be invisible in the output
        ev.join(broadcast(stats), "event_type")
          .withColumn("z_mills",
            round((col("value") - col("mu")) / col("sd") * 1000).cast("long"))
          .filter(abs(col("z_mills")) > 2000)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 1000).cast("long").as("value_mills"),
            col("z_mills"))
          .orderBy("event_id")
      },
      Some("""WITH st AS (SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
             |            FROM events GROUP BY event_type),
             |z AS (SELECT e.event_id, e.event_type,
             |        CAST(ROUND(e.value * 1000) AS BIGINT) AS value_mills,
             |        CAST(ROUND((e.value - st.mu) / st.sd * 1000) AS BIGINT) AS z_mills
             |      FROM events e JOIN st USING (event_type))
             |SELECT event_id, event_type, value_mills, z_mills FROM z
             |WHERE ABS(z_mills) > 2000
             |ORDER BY event_id""".stripMargin)),

    // ---- exact p50/p90/p99 per event_type — the latency-SLA percentile
    // report. Spark's exact `percentile` and DuckDB's `quantile_cont` share
    // the linear-interpolation definition; outputs in integer mills
    // (q_stats_funcs pattern: interpolated midpoints of 2-decimal data can
    // land exactly on a .005 rounding tie, ×1000 cannot). At scale the
    // exact percentile is a per-group sort — acceptable per event_type;
    // the approx_percentile twin (q_stats_funcs) is the sketch path.
    Q("q_events_percentiles",
      (s, dir) =>
        t(s, dir).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)") * 1000).cast("long").as("p50_mills"),
          round(expr("percentile(value, 0.9)") * 1000).cast("long").as("p90_mills"),
          round(expr("percentile(value, 0.99)") * 1000).cast("long").as("p99_mills"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(ROUND(quantile_cont(value, 0.5)*1000) AS BIGINT) AS p50_mills,
             |  CAST(ROUND(quantile_cont(value, 0.9)*1000) AS BIGINT) AS p90_mills,
             |  CAST(ROUND(quantile_cont(value, 0.99)*1000) AS BIGINT) AS p99_mills
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- robust outlier report: median + MAD (median absolute deviation)
    // per event_type — the z-score twin that a heavy-tailed value column
    // needs (mean/stddev are themselves dragged by the outliers they are
    // supposed to flag; the median/MAD pair is 50%-breakdown robust).
    // Two exact-percentile passes (median, then median of |value-median|),
    // both interpolation-identical across engines (q_events_percentiles),
    // then the same integer-mills boundary convention as q_events_zscore:
    // the filter reads the rounded integer both engines emit
    // (robust z = (value-med)/(1.4826*mad), the normal-consistent scaling).
    // Scale: two scans + one broadcast of a per-type 2-column stats table —
    // the per-group exact median is a per-group sort, same budget as the
    // percentile SLA report; the sketch path swaps in approx_percentile.
    Q("q_events_mad",
      (s, dir) => {
        val ev = t(s, dir)
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val mad = ev.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(first("med").as("med"),
               expr("percentile(abs(value - med), 0.5)").as("mad"))
        ev.join(broadcast(mad), "event_type")
          .filter(col("mad") > 0)
          .withColumn("rz_mills",
            round((col("value") - col("med")) / (col("mad") * 1.4826) * 1000)
              .cast("long"))
          .filter(abs(col("rz_mills")) > 3000)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 1000).cast("long").as("value_mills"),
            col("rz_mills"))
          .orderBy("event_id")
      },
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             |             FROM events GROUP BY event_type),
             |mad AS (SELECT e.event_type, ANY_VALUE(m.med) AS med,
             |          quantile_cont(ABS(e.value - m.med), 0.5) AS mad
             |        FROM events e JOIN med m USING (event_type)
             |        GROUP BY e.event_type),
             |z AS (SELECT e.event_id, e.event_type,
             |        CAST(ROUND(e.value * 1000) AS BIGINT) AS value_mills,
             |        CAST(ROUND((e.value - s.med) / (s.mad * 1.4826) * 1000) AS BIGINT)
             |          AS rz_mills
             |      FROM events e JOIN mad s USING (event_type) WHERE s.mad > 0)
             |SELECT event_id, event_type, value_mills, rz_mills FROM z
             |WHERE ABS(rz_mills) > 3000 ORDER BY event_id""".stripMargin)),

    // ---- trailing 7-day rolling distinct users per day (the DAU→WAU
    // rollup). A sliding DISTINCT cannot be a window frame (COUNT(DISTINCT)
    // over RANGE is unsupported in both engines, and would be a per-row
    // set-union anyway) — the scalable shape is: shrink to distinct
    // (user, day) pairs FIRST (bounds everything downstream by active
    // user-days, not raw events), then explode each user-day into the ≤7
    // observed report days it contributes to (a fixed ×7 expansion — at
    // 100 TB that constant beats the range-join alternative whose per-day
    // probe re-reads the fact), then one distinct-count per day. Report days
    // are the days observed in the data, semi-joined before the count so
    // the expansion never manufactures rows for absent days.
    Q("q_events_sliding_dau",
      (s, dir) => {
        val ev = t(s, dir)
        val ud = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val days = ev.select(to_date(col("ts")).as("day_w")).distinct()
        ud.select(explode(expr("sequence(day, date_add(day, 6))")).as("day_w"),
                  col("user_id"))
          .join(days, "day_w")
          .groupBy("day_w")
          .agg(countDistinct("user_id").as("wau"))
          .select(date_format(col("day_w"), "yyyy-MM-dd").as("day"), col("wau"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
             |SELECT strftime(d.day, '%Y-%m-%d') AS day,
             |  COUNT(DISTINCT u.user_id) AS wau
             |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
             |GROUP BY d.day ORDER BY day""".stripMargin)),

    // ---- differentially-private count release (the governance twin of
    // sources.Forget): per-type event counts plus two-sided-geometric noise
    // (the discrete Laplace mechanism, ε=0.5) — noise = G1 − G2 with
    // G = floor(−2·ln(U)), U drawn from a PORTABLE seeded LCG on the
    // group key's mod-prime hash, so the "randomness" is replayable and
    // both engines release identical values (ln on identical doubles is
    // cross-engine stable — the x4_lm_score precedent). The raw count
    // rides along as the VERIFICATION surface (like q_approx_distinct's
    // exact twin); a production release publishes only the noised column.
    // One count shuffle; the noise is per-group scalar arithmetic.
    Q("q_dp_counts",
      (s, dir) =>
        t(s, dir).groupBy("event_type").agg(count(lit(1)).as("n"))
          .withColumn("h", expr(
            """aggregate(transform(split(event_type, ''),
              |  c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT),
              |  (a, x) -> (a * 31 + x) % 1000000007)""".stripMargin))
          .withColumn("u1", expr(
            "(CAST((h * 2654435761 + 12345) % 2147483647 AS DOUBLE) + 1.0) / 2147483648.0"))
          .withColumn("u2", expr(
            "(CAST((h * 40503 + 17) % 2147483647 AS DOUBLE) + 1.0) / 2147483648.0"))
          .withColumn("noise", expr(
            "CAST(floor(-2.0 * ln(u1)) - floor(-2.0 * ln(u2)) AS BIGINT)"))
          .select(col("event_type"), col("n"),
            (col("n") + col("noise")).as("released"))
          .orderBy("event_type"),
      Some("""WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
             |h AS (SELECT event_type, n,
             |    list_reduce([CAST(0 AS BIGINT)] ||
             |      [CAST(unicode(x) AS BIGINT) FOR x IN string_split(event_type, '')],
             |      (a, b) -> (a * 31 + b) % 1000000007) AS hv
             |  FROM c),
             |u AS (SELECT event_type, n,
             |    (CAST((hv * 2654435761 + 12345) % 2147483647 AS DOUBLE) + 1.0)
             |      / 2147483648.0 AS u1,
             |    (CAST((hv * 40503 + 17) % 2147483647 AS DOUBLE) + 1.0)
             |      / 2147483648.0 AS u2
             |  FROM h)
             |SELECT event_type, n,
             |  n + CAST(floor(-2.0 * ln(u1)) - floor(-2.0 * ln(u2)) AS BIGINT)
             |    AS released
             |FROM u ORDER BY event_type""".stripMargin)),

    // ---- behavioral transition matrix (the first-order Markov summary of
    // user journeys): per user, each event's successor via lead() over
    // (ts, event_id) — the repo's total-order tie-break convention — then
    // transition counts and per-source-row probabilities in exact integer
    // e4 units (n·10⁴ div row-total, no float division). One user_id
    // window shuffle + one (from,to)-keyed count; the 25-row transition
    // matrix broadcasts back for the probability join. At 100 TB the lead
    // window rides the same user_id partitioning as sessions/retention.
    Q("q_events_markov",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val trans = t(s, dir)
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val rowTot = trans.groupBy("from_type").agg(sum("n").as("row_n"))
        trans.join(broadcast(rowTot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("n * 10000 div row_n").as("p_e4"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH e AS (SELECT user_id, event_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |t AS (SELECT event_type AS from_type, next_type AS to_type,
             |    COUNT(*) AS n
             |  FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_n
             |  FROM t GROUP BY 1)
             |SELECT t.from_type, t.to_type, t.n, t.n * 10000 // r.row_n AS p_e4
             |FROM t JOIN r USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- engagement stickiness (DAU/WAU): daily active users over the
    // trailing-7-day active users, the standard engagement ratio — built
    // from the SAME distinct-shrunk (user, day) frame as the sliding
    // rollup (one distinct pass feeds both legs), ratio in exact integer
    // e4 units (dau·10⁴ div wau, no float division).
    Q("q_events_stickiness",
      (s, dir) => {
        val ev = t(s, dir)
        val ud = graft.Caches.persist(
          ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct())
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val days = ud.select(col("day").as("day_w")).distinct()
        val wau = ud
          .select(explode(expr("sequence(day, date_add(day, 6))")).as("day_w"),
            col("user_id"))
          .join(days, "day_w")
          .groupBy("day_w")
          .agg(countDistinct("user_id").as("wau"))
        dau.join(wau, col("day") === col("day_w"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau"),
            expr("dau * 10000 div wau").as("stickiness_e4"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
             |dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
             |days AS (SELECT DISTINCT day FROM ud),
             |wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
             |  FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
             |  GROUP BY d.day)
             |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
             |  dau.dau * 10000 // wau.wau AS stickiness_e4
             |FROM dau JOIN wau ON dau.day = wau.day
             |ORDER BY day""".stripMargin)),

    // ---- time-series gap fill + forward fill: the hourly rollup re-gridded
    // onto a dense per-type hour axis (the driver's events are sparse: ~175
    // of 713 hours observed per type at sf0.001), missing hours carry the
    // last observed value forward (`last(_, ignoreNulls)` over an unbounded-
    // preceding frame — the LOCF resample every monitoring store performs
    // before charting). The grid is sequence()-exploded from each type's
    // [min,max] hour — bounded by calendar span, never by fact cardinality;
    // the ffill window partitions by type so at scale it shuffles once on
    // the same key as the rollup. avg uses the exact integer-div convention
    // (q_events_hourly) so carried values are tie-safe; is_filled marks
    // manufactured rows.
    Q("q_events_gap_fill",
      (s, dir) => {
        val hourly = t(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
          .select(col("event_type"), col("hr"),
            (expr("CAST(ROUND(sv*100) AS BIGINT) * 100 div n").cast("double")
              / 10000.0).as("avg_value"))
        val grid = hourly.groupBy("event_type")
          .agg(min("hr").as("mn"), max("hr").as("mx"))
          .select(col("event_type"),
            explode(expr("sequence(mn, mx, interval 1 hour)")).as("hr"))
        val w = Window.partitionBy("event_type").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("event_type", "hr"), "left")
          .select(col("event_type"),
            date_format(col("hr"), "yyyy-MM-dd HH").as("hour"),
            last(col("avg_value"), ignoreNulls = true).over(w).as("value_ffill"),
            col("avg_value").isNull.cast("int").as("is_filled"))
          .orderBy("event_type", "hour")
      },
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
             |    CAST((CAST(ROUND(SUM(value)*100) AS BIGINT) * 100) // COUNT(*) AS DOUBLE)/10000
             |      AS avg_value
             |  FROM events GROUP BY 1, 2),
             |b AS (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx FROM h GROUP BY 1),
             |grid AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
             |         FROM b),
             |j AS (SELECT g.event_type, g.hr, h.avg_value
             |      FROM grid g LEFT JOIN h ON g.event_type = h.event_type AND g.hr = h.hr)
             |SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hour,
             |  LAST_VALUE(avg_value IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hr
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
             |  CASE WHEN avg_value IS NULL THEN 1 ELSE 0 END AS is_filled
             |FROM j ORDER BY event_type, hour""".stripMargin))
  )
}
