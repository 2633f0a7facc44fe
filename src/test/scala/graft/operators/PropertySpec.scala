package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY §5.4 property-based contracts, run over many seeded random
  * inputs (plain seeded loops — deterministic, no generator dependency).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("canonical DBSCAN labels are input-order invariant (seeded sweeps)") {
    // the shipped a7 relabeling (min member id per cluster) must be a pure
    // function of the point SET: shuffling the input rows may not change
    // any label — this is what makes the query hash-checkable against the
    // order-free connected-components oracle
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val pts = (0 until 300).map { i =>
        // a few dense blobs + uniform noise
        val blob = i % 4
        val (cx, cy) = (0.2 + 0.2 * blob, 0.3 + 0.1 * blob)
        if (i % 5 == 0) (i.toLong, rng.nextDouble(), rng.nextDouble())
        else (i.toLong, cx + rng.nextGaussian() * 0.01,
          cy + rng.nextGaussian() * 0.01)
      }
      def run(rows: Seq[(Long, Double, Double)]): Map[Long, Long] = {
        val df = rows.toDF("id", "fx", "fy").withColumn("g", lit(1))
        val labeled = ClusterOps.dbscan(df, Seq("g"), Seq("fx", "fy"),
          "id", eps = 0.05, minPoints = 5)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g"), col("cluster_id"))
        labeled.withColumn("canon",
            when(col("cluster_id") === -1, lit(-1L))
              .otherwise(min(col("id")).over(w)))
          .select("id", "canon").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val a = run(pts)
      val b = run(rng.shuffle(pts))
      assert(a == b, s"seed $seed: canonical labels depend on input order")
      assert(a.values.exists(_ >= 0), s"seed $seed: no clusters formed")
    }
  }

  test("RLE ∘ inverse identity: segments reconstruct the on-mask") {
    for (seed <- 1 to 15) {
      val rng = new scala.util.Random(seed)
      val n = 30 + rng.nextInt(60)
      val mask = Array.fill(n)(rng.nextBoolean())
      val df = mask.zipWithIndex.map { case (m, i) => (i.toDouble, m) }
        .toSeq.toDF("t", "on")
      val segs = TimeSeriesOps.rleSegments(df, "t", col("on"), Nil).collect()
      // inverse: a time point is on iff it falls inside some segment
      val rebuilt = Array.fill(n)(false)
      segs.foreach { s =>
        val a = s.getAs[Double]("onset").toInt
        val b = s.getAs[Double]("offset").toInt
        (a to b).foreach(rebuilt(_) = true)
      }
      assert(rebuilt.sameElements(mask), s"seed=$seed")
      // segment row counts sum to the number of on rows
      assert(segs.map(_.getAs[Long]("n_rows")).sum == mask.count(identity))
    }
  }

  test("sessionize partitions cover the input; gaps only between sessions") {
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(100 + seed)
      var t = 0.0
      val ts = Seq.fill(80) {
        t += (if (rng.nextDouble() < 0.15) 20.0 + rng.nextDouble() * 10
              else rng.nextDouble() * 5)
        t
      }
      val df = ts.map(("k", _)).toDF("k", "t")
      val out = TimeSeriesOps.sessionize(df, "t", Seq("k"), 15.0)
        .orderBy("t").collect()
      assert(out.length == ts.length) // covering: no row lost
      // within a session all gaps <= 15; across consecutive sessions > 15
      out.sliding(2).foreach { w =>
        val gap = w(1).getAs[Double]("t") - w(0).getAs[Double]("t")
        val same = w(1).getAs[Long]("session_id") == w(0).getAs[Long]("session_id")
        if (same) assert(gap <= 15.0) else assert(gap > 15.0)
      }
      // ids are consecutive from 0
      val ids = out.map(_.getAs[Long]("session_id")).distinct
      assert(ids.sameElements(0L until ids.length))
    }
  }

  test("windowAgg equals brute-force theta join on random data") {
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(200 + seed)
      val left = Seq.tabulate(30)(i => (i, rng.nextDouble() * 50)).toDF("lid", "ts")
      val right = Seq.tabulate(120)(i => (rng.nextDouble() * 50, rng.nextDouble()))
        .toDF("ts", "v")
      val w = 1.0 + rng.nextDouble() * 8
      val got = AsOfJoin.windowAgg(left, right, "ts", "ts", Nil, w,
          Seq(count(lit(1)).as("n"))).select("lid", "n")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val brute = left.as("l").join(right.as("r"),
          abs(col("r.ts") - col("l.ts")) <= w)
        .groupBy("l.lid").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == brute, s"seed=$seed w=$w")
    }
  }

  test("resample output is monotone and inside the sample span") {
    for (seed <- 1 to 8) {
      val rng = new scala.util.Random(300 + seed)
      var t = 0.0
      val rows = Seq.fill(40) { t += rng.nextDouble() * 3; (t, rng.nextDouble()) }
      val df = rows.toDF("t", "v")
      val out = TimeSeriesOps.resampleLinear(df, "t", Seq("v"), Nil, 0.7)
        .orderBy("t").collect()
      val ts = out.map(_.getAs[Double]("t"))
      assert(ts.sameElements(ts.sorted))
      assert(ts.head >= rows.head._1 - 1e-9 && ts.last <= rows.last._1 + 1e-9)
      // interpolated values stay within the global value envelope
      val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
      out.foreach(r => assert(r.getAs[Double]("v") >= lo - 1e-9 &&
        r.getAs[Double]("v") <= hi + 1e-9))
    }
  }

  test("dropDuplicateTimestamps removes exactly the duplicated groups") {
    for (seed <- 1 to 10) {
      val rng = new scala.util.Random(400 + seed)
      val ts = Seq.fill(60)(rng.nextInt(40).toDouble)
      val df = ts.zipWithIndex.map { case (t, i) => (t, i) }.toDF("ts", "id")
      val out = TimeSeriesOps.dropDuplicateTimestamps(df, "ts").collect()
      val counts = ts.groupBy(identity).view.mapValues(_.size).toMap
      assert(out.length == ts.count(t => counts(t) == 1))
      out.foreach(r => assert(counts(r.getDouble(0)) == 1))
    }
  }

  test("LSH-gated near-dup is a subset of brute with identical sims (seeded sweeps)") {
    for (seed <- Seq(3, 11, 42)) {
      val rng = new scala.util.Random(seed)
      val vecs = Seq.tabulate(60)(i =>
        (i.toLong, Array.fill(8)(rng.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val brute = VectorOps.nearDupPairs(vecs, "vec_id", "embedding", 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      val gated = VectorOps.nearDupPairsLsh(vecs, "vec_id", "embedding",
          col("vec_id") < 16, bands = 4, rowsPerBand = 4, 0.4, multiProbe = true)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      gated.foreach { case (k, v) =>
        assert(brute.contains(k) && brute(k) == v, s"seed $seed pair $k")
      }
    }
  }

  test("spline resample: grid bounded by the sample span, knots interpolated") {
    for (seed <- Seq(5, 19)) {
      val rng = new scala.util.Random(seed)
      val n = 6 + rng.nextInt(10)
      val xs = Array.iterate(0.0, n)(_ + 0.5 + rng.nextDouble()).map(x => x)
      val ys = Array.fill(n)(rng.nextGaussian())
      // cubic interpolates its knots exactly
      val atKnots = SplineOps.cubicInterp(xs, ys, xs)
      atKnots.zip(ys).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
      // distributed grid stays inside [t0, t1)
      val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toSeq
        .toDF("s", "ts", "v")
      val out = SplineOps.resampleSpline(df, "ts", "v", Seq("s"), fps = 3.0)
        .collect().map(_.getDouble(1))
      assert(out.nonEmpty && out.forall(t => t >= xs.head && t < xs.last))
    }
  }

  test("hier cell assignment: Column path == driver twin on random data") {
    // the invariant every hier oracle leans on: the distributed two-level
    // argmin (matrix-literal HOF columns) must agree with the model's
    // driver-side nearestCell for ALL vectors, including ones far from
    // any sample point and at ragged (short-children) supers
    import org.apache.spark.sql.functions._
    for (seed <- Seq(11, 23, 31)) {
      val rng = new scala.util.Random(seed)
      val sample = Array.fill(60)(Array.fill(6)(rng.nextGaussian() * 2))
      val model = VectorOps.hierKmeans(sample, k1 = 5, k2 = 3)
      val probe = Array.fill(200)(Array.fill(6)(rng.nextGaussian() * 3))
      val df = probe.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq.toDF("v_id", "vn")
      val got = VectorOps.assignHierCells(df, "vn", model)
        .select("v_id", "scid", "ccid", "cid").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
        .toMap
      probe.zipWithIndex.foreach { case (v, i) =>
        val hm = VectorOps.IvfPqHierModel(model,
          Array(Array(Array.empty[Double])))
        val (sc, cc) = hm.nearestCell(v)
        assert(got(i.toLong) == ((sc, cc, sc * model.stride + cc)),
          s"seed $seed vector $i: column ${got(i.toLong)} != driver ($sc, $cc)")
      }
    }
  }

  test("medfilt detrend: interior of a constant series detrends to the impute") {
    for (impute <- Seq(None, Some(0.5))) {
      val df = (0 until 40).map(i => ("s", i.toDouble, 3.0)).toDF("s", "ts", "v")
      val out = TimeSeriesOps.medfiltDetrend(df, "ts", "v", Seq("s"),
          kernelSize = 5, impute = impute)
        .collect().map(r => r.getDouble(1) -> r.getAs[Double]("detrended")).toMap
      val base = impute.getOrElse(0.0)
      // interior rows (full windows, no zero pad): v − median(v…) = 0
      (2 to 37).foreach(i => assert(out(i.toDouble) == base))
      // edge rows feel the scipy zero padding: median of {0,0,3,3,3} = 3 at
      // offset 1, but {0,0,3,3,3} sorted mid is 3 → row 1 is base too;
      // row 0 has pad {0,0,3,3,3} → median 3 → base as well for k=5; the
      // property that matters: no NaNs and group-local output size
      assert(out.size == 40 && out.values.forall(!_.isNaN))
    }
  }

  test("containment bounds and the jaccard ≤ min-containment law (seeded)") {
    // For any pair: 0 < cont ≤ 1, and jaccard = c/(na+nb−c) ≤
    // c/max(na,nb) = min(cont_a, cont_b) — pins the two set-overlap
    // operators to each other on random corpora
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val docs = (0 until 40).map { i =>
        val n = 5 + rng.nextInt(20)
        (i.toLong, Seq.fill(n)(vocab(rng.nextInt(vocab.length)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val cont = TextOps.containmentPairs(docs, "doc_id", "text",
          minContainment = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      val jac = TextOps.ngramJaccardPairs(docs, "doc_id", "text",
          minJaccard = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getDouble(2)).toMap
      graft.CacheRegistry.releaseAll()
      assert(cont.nonEmpty && cont.keySet == jac.keySet,
        "same candidate pair set at threshold 0")
      for ((pair, (ca, cb)) <- cont) {
        assert(ca > 0.0 && ca <= 1.0 && cb > 0.0 && cb <= 1.0,
          s"$pair containment out of bounds: $ca, $cb")
        assert(jac(pair) <= math.min(ca, cb) + 1e-12,
          s"$pair: jaccard ${jac(pair)} > min containment ${math.min(ca, cb)}")
      }
    }
  }
}
