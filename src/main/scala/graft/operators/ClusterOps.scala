package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-level operators over a label column.
  *
  * Reference (file:line relative to /root/reference/vedb_gaze):
  *  - clusterStats:          `marker_cluster_stat` marker_parsing.py:261-297 (A2)
  *  - clusterRepresentative: `marker_cluster_stat(return_all_fields=True)`
  *                           marker_parsing.py:287-295 (J4)
  *  - clusterGate:           marker_parsing.py:412-467 (A3)
  *  - dbscan:                `cluster_marker_points` marker_parsing.py:299-410 (A7)
  *  - bimodalitySplit:       `_bimodality_check` marker_parsing.py:31-50 (A6)
  */
object ClusterOps {

  /** A2: per-cluster aggregate of the given columns (plain groupBy — Catalyst
    * plans partial+final aggregation with map-side combine for free).
    */
  def clusterStats(df: DataFrame, clusterCol: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)

  /** J4: per cluster, return the single full original row nearest to the
    * cluster centroid of `featureCols` (argmin of mean |x - centroid_x|;
    * first row wins ties by (distance, tsCol) ordering — numpy argmin takes
    * the first minimum). Window-based: centroid via window avg, then
    * row_number = 1 over the distance ordering. One shuffle on the cluster
    * key, no join-back.
    */
  def clusterRepresentative(df: DataFrame, clusterCol: String,
                            featureCols: Seq[String], tieBreak: String,
                            quantize: Option[Int] = None): DataFrame = {
    val w = Window.partitionBy(col(clusterCol))
    // centroid = per-cluster exact MEDIAN (the reference reduces with
    // np.nanmedian by default, marker_parsing.py:261-295), not the mean
    val rawDist = featureCols.map { c =>
      abs(col(c).cast("double") -
        expr(s"percentile($c, 0.5)").over(w))
    }.reduce(_ + _) / featureCols.length
    // quantize: the centroid mean carries summation-order noise in the last
    // ulp; rounding the ordering metric makes exact-in-the-reals distance
    // ties actual ties (then broken by tieBreak) instead of noise races —
    // required for cross-engine reproducibility
    val dist = quantize.map(dg => round(rawDist, dg)).getOrElse(rawDist)
    val wOrd = w.orderBy(dist.asc, col(tieBreak).asc)
    df.withColumn("_rn", row_number().over(wOrd)).filter(col("_rn") === 1).drop("_rn")
  }

  /** A3 cluster-quality gating: keep rows of clusters that pass all gates:
    * duration in [minDur, maxDur], label != -1 (noise), and any caller
    * predicates over cluster aggregates. Requires >= minClusters surviving
    * clusters or the result is empty (reference returns None,
    * marker_parsing.py:459-465).
    *
    * `gatePredicates` are Columns over the aggregated frame (which carries
    * `_dur` plus `extraAggs`).
    */
  def clusterGate(df: DataFrame, clusterCol: String, tsCol: String,
                  minDur: Double, maxDur: Double,
                  extraAggs: Seq[Column] = Nil,
                  gatePredicates: Seq[Column] = Nil,
                  minClusters: Int = 1): DataFrame = {
    val baseAggs = Seq(
      (max(col(tsCol).cast("double")) - min(col(tsCol).cast("double"))).as("_dur")) ++ extraAggs
    val stats = df.filter(col(clusterCol) =!= -1)
      .groupBy(col(clusterCol)).agg(baseAggs.head, baseAggs.tail: _*)
    // strict bounds: the reference gates with > and < (marker_parsing.py:422-425)
    // persisted: the min-clusters gate (count) and the semi-join both read
    // this tiny frame — without the persist the whole upstream aggregation
    // lineage would execute twice
    val gated = gatePredicates.foldLeft(
      stats.filter(col("_dur") > minDur && col("_dur") < maxDur))(_ filter _)
      .transform(graft.CacheRegistry.persistTracked(_))
    val n = gated.count()
    if (n < minClusters) df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.emptyRDD[Row], df.schema)
    else df.join(broadcast(gated.select(clusterCol)), Seq(clusterCol), "left_semi")
  }

  /** A7: DBSCAN per group. Epochs are minutes of data (10^3-10^4 rows), so
    * each group's clustering runs locally inside `flatMapGroups` — the
    * distributed axis is the number of groups (sessions × epochs), matching
    * the reference's per-epoch loop (marker_parsing.py:299-410).
    *
    * Features: caller-provided numeric columns (already scaled). eps /
    * minPoints follow sklearn defaults used by the reference (eps=0.05,
    * min_samples=5). Output: input rows + `clusterCol` label (-1 = noise).
    * Labels are assigned in order of first-core-point discovery over the
    * row order sorted by `orderCol` — deterministic, and cluster-label
    * permutations never affect downstream gates (they group, not compare).
    */
  def dbscan(df: DataFrame, groupCols: Seq[String], featureCols: Seq[String],
             orderCol: String, eps: Double, minPoints: Int,
             clusterCol: String = "cluster_id"): DataFrame = {
    val outSchema = df.schema.add(clusterCol, org.apache.spark.sql.types.LongType)
    val fIdx = featureCols.map(df.schema.fieldIndex)
    val oIdx = df.schema.fieldIndex(orderCol)
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val dgIdx = groupCols.map(df.schema.fieldIndex)
    val kv = df.groupByKey { r: Row => GroupKeys.of(r, dgIdx) }(
      org.apache.spark.sql.Encoders.STRING)
    kv.flatMapGroups { (_, it) =>
      val rows = it.toArray.sortBy(r => r.get(oIdx) match {
        case d: java.lang.Double => d.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case t: java.sql.Timestamp => t.getTime.toDouble
        case x => String.valueOf(x).hashCode.toDouble
      })
      val feats = rows.map(r => fIdx.map(i => r.getAs[Any](i) match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case i2: java.lang.Integer => i2.doubleValue()
        case _ => Double.NaN
      }).toArray)
      val labels = LocalDbscan.fit(feats, eps, minPoints)
      rows.iterator.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ labels(i).toLong)
      }
    }
  }

  /** A6 bimodality split: 2-means (k=2, 1-D) on `valueCol`; bimodal iff the
    * cluster means are separated by more than `sigmas` × the PER-CLUSTER
    * stds on each side — (c_hi − k·σ_hi) > (c_lo + k·σ_lo), the reference's
    * exact criterion (_bimodality_check, marker_parsing.py:31-50) — in
    * which case only rows of the larger-mean mode are kept (the 1-D k-means
    * assignment boundary is the midpoint of the two means).
    *
    * Driver-collect form — fit-small paths only (collects the value column
    * at plan-build time). Every shipped path routes through
    * [[bimodalitySplitGrouped]] / [[bimodalKeepFlag]], which run the same
    * kernel inside `flatMapGroups`.
    */
  def bimodalitySplit(df: DataFrame, valueCol: String, sigmas: Double = 2.5): DataFrame = {
    val vals = df.select(col(valueCol).cast("double")).na.drop()
      .collect().map(_.getDouble(0))
    LocalDbscan.bimodalCut(vals, sigmas) match {
      case Some(cut) => df.filter(col(valueCol).cast("double") >= cut)
      case None => df
    }
  }

  /** A6 bimodality split, grouped form — the scale shape: the reference
    * applies the check per session's marker set, so at corpus scale the
    * 2-means fit runs INSIDE `flatMapGroups` per (session/epoch) group —
    * same distribution axis as [[dbscan]] — instead of collecting the
    * whole corpus' value column to the driver. Criterion and cut are
    * identical to [[bimodalitySplit]] (shared [[LocalDbscan.bimodalCut]]);
    * a single-group input reproduces the driver form exactly. */
  def bimodalitySplitGrouped(df: DataFrame, groupCols: Seq[String],
                             valueCol: String, sigmas: Double = 2.5): DataFrame =
    bimodalKeepFlag(df, groupCols, valueCol, sigmas)
      .filter(col("_bimodal_keep")).drop("_bimodal_keep")

  /** Per-group 2-means cut table: one row per group, `_cut` null when the
    * group is not bimodal. Only (groupCols, value) is shuffled into the
    * per-group fit — the iterative 2-means needs the group's raw values
    * in memory (the same arrays the reference's in-process fit holds,
    * marker_parsing.py:31-50), but never the full rows, so wide columns
    * (corner grids, embeddings) stay out of the single fit task. */
  private def bimodalCuts(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, sigmas: Double): DataFrame = {
    val slim = df.select(
      (groupCols.map(col) :+ col(valueCol).cast("double").as("_v")): _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      groupCols.map(slim.schema(_)) :+
        org.apache.spark.sql.types.StructField(
          "_cut", org.apache.spark.sql.types.DoubleType, nullable = true))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val gIdx = groupCols.indices
    slim.groupByKey { r: Row => GroupKeys.of(r, gIdx) }(
        org.apache.spark.sql.Encoders.STRING)
      .mapGroups { (_, it) =>
        val rows = it.toArray
        val vals = rows.map(valOf(_, gIdx.length)).filterNot(_.isNaN)
        val cut = LocalDbscan.bimodalCut(vals, sigmas)
        Row.fromSeq(gIdx.map(rows(0).get(_)) :+ cut.map(Double.box).orNull)
      }
  }

  /** A6 as a keep-FLAG column instead of a filter: emits every input row
    * plus boolean `flagCol` (true = row survives the bimodality gate of
    * its group). The P7 conjunctive-mask composition needs this form —
    * the bimodality mask must be computed over the FULL marker set and
    * intersected with the size/aspect masks (marker_parsing.py:157-175),
    * so a filtering operator cannot be used there.
    *
    * Shape: [[bimodalCuts]] fits one cut per group over the value column
    * only, then the tiny cut table broadcast-joins back and the flag is a
    * codegen'd Column predicate — full rows never enter the fit task.
    * `groupCols = Nil` = one global group (the per-session marker-table
    * case). Gate semantics match the driver form's `sz >= cut` Spark
    * predicate exactly: when bimodal, NaN survives (Spark orders NaN above
    * every value) and NULL drops (three-valued comparison); when not
    * bimodal, every row survives. */
  def bimodalKeepFlag(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      sigmas: Double = 2.5,
                      flagCol: String = "_bimodal_keep"): DataFrame = {
    val cuts = bimodalCuts(df, groupCols, valueCol, sigmas)
    // null-safe key equality: a NULL group key is a real group (the
    // fit sees it via the string-encoded key), so its rows must meet
    // their cut — a plain equi-join would never match them and the gate
    // would silently pass every null-key row. NOTE: the input lineage is
    // read twice (cut fit + join probe side); callers with an expensive
    // upstream should persist it (removeSmallDetections does).
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(cuts))
      else {
        val c = broadcast(cuts)
        val cond = groupCols.map(k => df(k) <=> c(k)).reduce(_ && _)
        groupCols.foldLeft(df.join(c, cond, "left"))((j, k) => j.drop(c(k)))
      }
    val v = col(valueCol).cast("double")
    joined.withColumn(flagCol,
        when(col("_cut").isNull, lit(true))
          .otherwise(coalesce(isnan(v) || (v >= col("_cut")), lit(false))))
      .drop("_cut")
  }

  private def valOf(r: Row, vIdx: Int): Double = r.get(vIdx) match {
    case null => Double.NaN
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case l: java.lang.Long => l.doubleValue()
    case i: java.lang.Integer => i.doubleValue()
    case b: java.math.BigDecimal => b.doubleValue()
    case _ => Double.NaN
  }
}

/** Collision-free string group keys for Row-typed groupByKey: each key
  * component is escaped before joining, so values containing the
  * separator cannot alias another key tuple ("x|y","z" vs "x","y|z"). */
object GroupKeys {
  def of(r: org.apache.spark.sql.Row, idxs: Seq[Int]): String =
    idxs.map { i =>
      String.valueOf(r.get(i))
        .replace("\\", "\\\\").replace("|", "\\|")
    }.mkString("|")
}

/** Small local kernels used inside flatMapGroups / on the driver. */
object LocalDbscan {
  /** Plain DBSCAN over a small in-memory feature matrix (euclidean).
    * O(n^2) neighbor search — groups are epoch-sized (<= 10^4). Returns
    * labels; -1 = noise. Cluster ids assigned in discovery order.
    */
  def fit(feats: Array[Array[Double]], eps: Double, minPoints: Int): Array[Int] = {
    val n = feats.length
    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    val eps2 = eps * eps
    def neighbors(i: Int): Array[Int] = {
      val out = Array.newBuilder[Int]
      var j = 0
      while (j < n) {
        var d = 0.0; var k = 0
        val a = feats(i); val b = feats(j)
        while (k < a.length) { val t = a(k) - b(k); d += t * t; k += 1 }
        if (d <= eps2) out += j
        j += 1
      }
      out.result()
    }
    var cluster = 0
    var i = 0
    while (i < n) {
      if (labels(i) == -2) {
        val nbrs = neighbors(i)
        if (nbrs.length < minPoints) labels(i) = -1
        else {
          labels(i) = cluster
          val queue = scala.collection.mutable.Queue(nbrs.toIndexedSeq: _*)
          while (queue.nonEmpty) {
            val q = queue.dequeue()
            if (labels(q) == -1) labels(q) = cluster
            if (labels(q) == -2) {
              labels(q) = cluster
              val qn = neighbors(q)
              if (qn.length >= minPoints) queue ++= qn
            }
          }
          cluster += 1
        }
      }
      i += 1
    }
    labels
  }

  /** The A6 bimodality criterion over an in-memory value array: 2-means,
    * bimodal iff (c_hi − k·σ_hi) > (c_lo + k·σ_lo) with per-cluster np.std
    * (_bimodality_check, marker_parsing.py:31-50). Returns Some(cut) — the
    * midpoint assignment boundary, keep values >= cut — when bimodal. */
  def bimodalCut(vals: Array[Double], sigmas: Double = 2.5): Option[Double] = {
    if (vals.length < 4) return None
    val (m1, m2) = twoMeans(vals)
    val cut = (m1 + m2) / 2.0
    def stdOf(xs: Array[Double]): Double =
      if (xs.isEmpty) 0.0
      else {
        val mu = xs.sum / xs.length
        math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length) // np.std
      }
    val lo = vals.filter(_ < cut); val hi = vals.filter(_ >= cut)
    val (cLo, cHi) = (math.min(m1, m2), math.max(m1, m2))
    if ((cHi - sigmas * stdOf(hi)) > (cLo + sigmas * stdOf(lo))) Some(cut)
    else None
  }

  /** 1-D 2-means with deterministic (min, max) init; returns the two means
    * sorted ascending. */
  def twoMeans(vals: Array[Double]): (Double, Double) = {
    var c1 = vals.min; var c2 = vals.max
    var iter = 0
    while (iter < 50) {
      var s1 = 0.0; var n1 = 0; var s2 = 0.0; var n2 = 0
      vals.foreach { v =>
        if (math.abs(v - c1) <= math.abs(v - c2)) { s1 += v; n1 += 1 }
        else { s2 += v; n2 += 1 }
      }
      val nc1 = if (n1 > 0) s1 / n1 else c1
      val nc2 = if (n2 > 0) s2 / n2 else c2
      if (nc1 == c1 && nc2 == c2) iter = 50 else { c1 = nc1; c2 = nc2 }
      iter += 1
    }
    if (c1 <= c2) (c1, c2) else (c2, c1)
  }
}
