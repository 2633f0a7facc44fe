package graft

/** DuckDB oracle SQL, one per [[SparkEntry.queries]] key. The driver runs
  * these against the same parquet tables (registered under their bare
  * names) and hash-compares with the Spark results after sorting columns
  * by name — so aliases here must match the Spark column names exactly.
  *
  * Dialect parity notes: `epoch(ts)` == Spark `cast(ts as double)` (both
  * truncate ns → µs); DuckDB `median` == Spark `percentile(x, 0.5)`
  * (interpolated); integer sums are cast to BIGINT (DuckDB widens to
  * HUGEINT); all floating aggregates rounded identically on both sides.
  */
object Oracles {

  /** Round-trip double literal for SQL (scientific notation parses as
    * DOUBLE in DuckDB; plain decimals would parse as DECIMAL). */
  private def d(v: Double): String = String.format("%.17e", Double.box(v))

  /** M8 oracle: same fold order as [[graft.model.TpsMapModel.tpsCol]] —
    * ((a0 + a1·px) + a2·py) + ((0 + t0) + t1)…, t_i = ((w·r)·r)·ln(r+1e-6). */
  private def tpsSql: String = {
    val anchors = graft.Queries.m8Anchors
    val theta = graft.Queries.m8Theta
    val n = anchors.length
    val warp = anchors.zipWithIndex.foldLeft(d(0.0)) { case (acc, (a, i)) =>
      val r = s"sqrt(((px - ${d(a(0))}) * (px - ${d(a(0))})) + " +
        s"((py - ${d(a(1))}) * (py - ${d(a(1))})))"
      s"($acc + (((${d(theta(i))} * $r) * $r) * ln($r + ${d(1e-6)})))"
    }
    val affine = s"((${d(theta(n))} + (${d(theta(n + 1))} * px)) + " +
      s"(${d(theta(n + 2))} * py))"
    s"""WITH s AS (SELECT event_id, value/200.0 AS px,
       |  (user_id % 20)/20.0 AS py FROM events)
       |SELECT event_id, round($affine + $warp, 6) AS gaze_x FROM s""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "m4_poly_apply" ->
      """WITH s AS (SELECT event_id, value/200.0 AS x,
        |  (user_id % 20)/20.0 AS y FROM events)
        |SELECT event_id,
        |  x*0.9 + y*0.1 + x*x*0.05 + y*y*-0.02 + x*y*0.03
        |    + x*x*y*y*0.01 + 1.0*0.02 AS gaze_x,
        |  x*-0.1 + y*1.1 + x*x*0.02 + y*y*0.06 + x*y*-0.04
        |    + x*x*y*y*0.02 + 1.0*-0.01 AS gaze_y
        |FROM s""".stripMargin,

    "m8_tps_apply" -> tpsSql,

    "s3_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,

    "p1_normalize" ->
      """SELECT event_id, value*20/2048.0 AS norm_x,
        |  1.0 - value*20/1536.0 AS norm_y FROM events""".stripMargin,

    "p2_conf_filter" ->
      """SELECT event_id, user_id, value FROM events WHERE value >= 75.0""",

    "p6_zscore_filter" ->
      """WITH s AS (
        |  SELECT event_id, event_type, value,
        |    avg(value) OVER (PARTITION BY event_type) AS mu,
        |    stddev_samp(value) OVER (PARTITION BY event_type) AS sd
        |  FROM events)
        |SELECT event_id, event_type FROM s
        |WHERE sd IS NULL OR abs(value - mu) <= 2.0 * sd""".stripMargin,

    "p9_unit_convert" ->
      """SELECT event_id, round(value * 2.23694, 6) AS mph FROM events""",

    "p10_median_detrend" ->
      """SELECT event_id, round(value - median(value) OVER (
        |  PARTITION BY user_id ORDER BY epoch(ts), event_id
        |  ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING), 6) AS detrended
        |FROM events""".stripMargin,

    "j1_asof_window_agg" ->
      """SELECT l.event_id, l.user_id, count(*) AS n_right,
        |  round(avg(r.value), 6) AS avg_value,
        |  round(median(r.value), 6) AS med_value
        |FROM (SELECT event_id, user_id, epoch(ts) AS t FROM events
        |      WHERE event_type = 'click') l
        |JOIN (SELECT user_id, epoch(ts) AS t, value FROM events
        |      WHERE event_type = 'purchase') r ON l.user_id = r.user_id
        |WHERE abs(r.t - l.t) <= 600.0
        |GROUP BY l.event_id, l.user_id""".stripMargin,

    "j2_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, epoch(ts) AS t FROM events
        |           WHERE event_type = 'click'),
        |r AS (SELECT event_id AS match_id, user_id, epoch(ts) AS rt
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT l.event_id, r.match_id, abs(r.rt - l.t) AS dt, r.rt
        |      FROM l JOIN r ON l.user_id = r.user_id
        |      QUALIFY row_number() OVER (PARTITION BY l.event_id
        |        ORDER BY abs(r.rt - l.t), r.rt) = 1)
        |SELECT event_id, match_id, round(dt, 6) AS dt FROM j
        |WHERE dt <= 300.0""".stripMargin,

    "join_agg_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "a1_dedup_ts" ->
      """SELECT event_id FROM (
        |  SELECT event_id, count(*) OVER (
        |    PARTITION BY user_id, CAST(floor(epoch(ts)/60) AS BIGINT)) AS c
        |  FROM events) WHERE c = 1""".stripMargin,

    "a2_cluster_stats" ->
      """SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value,
        |  round(median(value), 6) AS med_value,
        |  round(max(value) - min(value), 6) AS ptp_value,
        |  round(stddev_samp(value), 6) AS sd_value
        |FROM events GROUP BY event_type""".stripMargin,

    "a4_hist2d" ->
      """SELECT CAST(floor(value/10) AS BIGINT) AS bx,
        |  CAST(floor(user_id/5) AS BIGINT) AS by, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "a8_sliding_rate" ->
      """SELECT event_id, count(*) OVER (
        |  PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 300000000 PRECEDING AND 300000000 FOLLOWING) AS rate
        |FROM events""".stripMargin,

    "w1_rle_segments" ->
      """WITH s AS (SELECT user_id, epoch(ts) AS t,
        |    CASE WHEN value > 80 THEN 1 ELSE 0 END AS onf FROM events),
        |e AS (SELECT *, CASE WHEN onf <> coalesce(lag(onf) OVER
        |    (PARTITION BY user_id ORDER BY t), 0) THEN 1 ELSE 0 END AS edge
        |  FROM s),
        |r AS (SELECT *, sum(edge) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS run FROM e)
        |SELECT user_id, round(min(t), 6) AS onset, round(max(t), 6) AS offset,
        |  round(max(t) - min(t), 6) AS duration, count(*) AS n_rows
        |FROM r WHERE onf = 1 GROUP BY user_id, run""".stripMargin,

    "w2_sessionize" ->
      """WITH s AS (SELECT user_id, epoch(ts) AS t, value FROM events),
        |d AS (SELECT *, CASE WHEN t - lag(t) OVER
        |    (PARTITION BY user_id ORDER BY t) > 900.0 THEN 1 ELSE 0 END AS brk
        |  FROM s),
        |r AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM d)
        |SELECT user_id, session_id, count(*) AS n,
        |  round(max(t) - min(t), 6) AS duration,
        |  round(avg(value), 6) AS avg_value
        |FROM r GROUP BY user_id, session_id""".stripMargin,

    "w4_gradient" ->
      """WITH s AS (SELECT event_id, user_id, epoch(ts) AS t, value FROM events),
        |d AS (SELECT *,
        |    lag(t) OVER w AS tp, lead(t) OVER w AS tn,
        |    lag(value) OVER w AS vp, lead(value) OVER w AS vn
        |  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY t))
        |SELECT event_id, round(CASE
        |    WHEN tp IS NULL AND tn IS NULL THEN NULL
        |    WHEN tp IS NULL THEN (vn - value) / (tn - t)
        |    WHEN tn IS NULL THEN (value - vp) / (t - tp)
        |    ELSE (vn - vp) / (tn - tp) END * 1e6, 6) AS velocity_u
        |FROM d""".stripMargin,

    "o2_union_stats" ->
      """WITH u AS (
        |  SELECT user_id, value FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, value FROM events WHERE event_type = 'error')
        |SELECT user_id, count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM u GROUP BY user_id""".stripMargin,

    "o5_distinct" ->
      """SELECT DISTINCT user_id, event_type FROM events""",

    "m2_linreg" ->
      """WITH s AS (SELECT event_type, epoch(ts) - 1704067200.0 AS x, value AS y
        |  FROM events)
        |SELECT event_type,
        |  round(regr_slope(y, x) * 1e9, 4) AS slope_n,
        |  round(regr_intercept(y, x), 6) AS intercept
        |FROM s GROUP BY event_type""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "text_stats" ->
      """WITH s AS (SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id, len(toks) AS n_tokens,
        |  round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
        |    / len(toks), 6) AS avg_token_len,
        |  round(CAST(len(list_filter(toks, x -> x IN
        |    ('the','a','of','and','to','in'))) AS DOUBLE) / len(toks), 6)
        |    AS stopword_ratio
        |FROM s""".stripMargin,

    "sim_brute_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
        |scored AS (SELECT q.q_id, e.vec_id,
        |    list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> qv[i] * v[i]))
        |    / (sqrt(list_sum(list_transform(qv, x -> x * x)))
        |       * sqrt(list_sum(list_transform(v, x -> x * x)))) AS sim
        |  FROM q JOIN e ON q.q_id <> e.vec_id)
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rank,
        |  vec_id AS neighbor_id
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
  )
}
