package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ index persistence — build once, search many times.
  *
  * The reference materializes every fitted model as an artifact
  * (calibration.py:675-690 saves `map_params` + inputs as .npz) and
  * reloads it for downstream stages; the gaze tier here already does the
  * same through [[graft.model.GazeModelIO]]. This applies that discipline
  * to the ANN tier, where it matters most at scale: encoding a 100 TB
  * corpus against the quantizer is THE expensive pass, so it must happen
  * once — a per-query refit/re-encode (the inline
  * [[VectorOps.ivfPqTopK]]) is a correctness baseline, not a deployment
  * shape.
  *
  * Layout under `path/` (all typed Parquet, no opaque blobs):
  *  - `quantizer/` — rows (kind, i, j, vec):
  *      kind='coarse': i = cell id,  j = 0,            vec = centroid
  *      kind='book'  : i = subspace, j = centroid idx, vec = residual centroid
  *  - `index/` — the `(v_id, cid, codes)` table from
  *    [[VectorOps.ivfPqEncode]]. FLAT indexes partition it by coarse
  *    cell, so a search probing `nprobe` of `nCells` cells prunes the
  *    rest of the corpus at the file-listing level (partition pruning on
  *    `cid`). HIER indexes partition by SUPER cell (`sid` = cid DIV k2,
  *    k1 directories) with rows sorted by (sid, cid) inside each file —
  *    10⁴ global cells as 10⁴ directories is a tiny-file pathology at
  *    every corpus size below enormous, and the probed-cell pruning the
  *    layout exists for is preserved by the sid partition filter plus a
  *    `cid IN` row-group pushdown over the within-file sort
  *    (see [[CidPushdownLimit]]).
  */
object AnnIndexIO {

  /** Quantizer-kind sidecar (`path/_KIND`, ASCII "flat" | "hier"),
    * written at build time so [[searchAuto]] dispatches with a pure
    * driver-side metadata read — the former probe (`filter(kind ===
    * "super").limit(1).count()`) cost a Spark job on EVERY search
    * against the index. Hadoop FS API, so the sidecar follows the index
    * onto whatever filesystem the Parquet goes to. */
  private def kindPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_KIND")

  private def writeKind(spark: SparkSession, path: String,
                        kind: String): Unit = {
    val p = kindPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(kind.getBytes("UTF-8")) finally out.close()
  }

  private def readKind(spark: SparkSession, path: String): Option[String] =
    ArtifactSwap.readSmall(spark, kindPath(path)).map(_.trim)

  /** Heal BOTH crash windows this artifact family can be left in: the
    * whole-dir swap root (`path` — what [[retrain]]/[[rebuildOpq]]
    * promote) AND the encoded-table swap root (`path/index` — what
    * [[compact]] promotes via [[ArtifactSwap.compactTable]]). Every
    * entry point that reads or appends the artifact must recover both:
    * an append landing in compact's window would `mode('append')`-create
    * a fresh batch-only `index/` dir, and the NEXT compact's swap would
    * then delete the stranded real table under `index_prev` — permanent
    * data loss with no error. Order matters: the whole-dir root first
    * (when `path` itself is stranded, `path/index` does not exist to
    * recover). Two driver-side FS existence checks — free. */
  private def recoverRoots(spark: SparkSession, path: String): Unit = {
    ArtifactSwap.recover(spark, path)
    ArtifactSwap.recover(spark, s"$path/index")
  }

  /** Requested-configuration sidecar (`path/_CONF`, space-separated
    * ASCII integers; the kind comes from `_KIND`, never repeated here —
    * flat: "nCells m codebookK"; hier: "k1 k2 m codebookK";
    * opq: "m codebookK altIters"; opq_ivf: "nCells m codebookK
    * altIters"), written at build time so maintenance ([[retrain]],
    * [[rebuildOpq]]) preserves the operating point the caller REQUESTED
    * rather than re-deriving it from fitted rows — fitted arity can
    * silently narrow on sample-bounded builds (a hier child list is
    * ragged when few sample points land in a super), and the OPQ
    * families' `altIters` leaves no trace in the artifact at all.
    * Pre-sidecar (or unparseable) artifacts fall back to the fitted-row
    * derivation in [[persistedConfig]]/[[derivedBookConf]]. */
  private def confPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_CONF")

  private def writeConf(spark: SparkSession, path: String,
                        fields: Seq[Int]): Unit = {
    val p = confPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fields.mkString(" ").getBytes("UTF-8"))
    finally out.close()
  }

  private def readConfFields(spark: SparkSession,
                             path: String): Option[Array[Int]] =
    ArtifactSwap.readSmall(spark, confPath(path)).flatMap { s =>
      // a non-integer token (corrupt/foreign file) means NO usable conf,
      // not a NumberFormatException — the callers' fitted-row derivation
      // fallback must stay reachable for exactly these files
      scala.util.Try(s.trim.split("\\s+").map(_.toInt)).toOption
    }

  /** Fitted-row derivation of (nCells-if-coarse, m, codebookK) for the
    * OPQ families — the pre-sidecar fallback [[rebuildOpq]] uses so a
    * rebuild never silently changes an artifact's operating point to
    * compile-time defaults (only `altIters` is genuinely untraceable
    * from fitted rows). One model-sized driver collect, the
    * [[persistedConfig]] discipline. */
  private def derivedBookConf(spark: SparkSession,
                              path: String): (Option[Int], Int, Int) = {
    val rows = spark.read.parquet(s"$path/quantizer")
      .groupBy("kind", "i").agg(count(lit(1)).as("n")).collect()
    val byKind = rows.groupBy(_.getAs[String]("kind"))
    val m = byKind.get("book").map(_.length).getOrElse(8)
    val codebookK = byKind.get("book")
      .map(_.head.getAs[Long]("n").toInt).getOrElse(16)
    (byKind.get("coarse").map(_.length), m, codebookK)
  }

  /** Quantizer → typed Parquet rows (the persisted layout). */
  def modelToDF(spark: SparkSession, model: VectorOps.IvfPqModel): DataFrame = {
    import spark.implicits._
    val coarse = model.cents.zipWithIndex.toSeq.map { case (c, i) =>
      ("coarse", i, 0, c.toSeq)
    }
    val books = for {
      (book, s) <- model.books.zipWithIndex.toSeq
      (c, j) <- book.zipWithIndex
    } yield ("book", s, j, c.toSeq)
    (coarse ++ books).toDF("kind", "i", "j", "vec")
  }

  /** Reconstruct the quantizer from the persisted layout. */
  def modelFromDF(df: DataFrame): VectorOps.IvfPqModel = {
    val rows = df.collect()
    def vec(r: Row): Array[Double] =
      r.getAs[scala.collection.Seq[Double]]("vec").toArray
    val cents = rows.filter(_.getAs[String]("kind") == "coarse")
      .sortBy(_.getAs[Int]("i")).map(vec)
    val books = rows.filter(_.getAs[String]("kind") == "book")
      .groupBy(_.getAs[Int]("i")).toArray.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getAs[Int]("j")).map(vec) }
    VectorOps.IvfPqModel(cents, books)
  }

  def saveModel(spark: SparkSession, model: VectorOps.IvfPqModel,
                path: String): Unit =
    modelToDF(spark, model).write.mode("overwrite")
      .parquet(s"$path/quantizer")

  def loadModel(spark: SparkSession, path: String): VectorOps.IvfPqModel =
    modelFromDF(spark.read.parquet(s"$path/quantizer"))

  /** Build the index: fit the quantizer on a deterministic corpus sample,
    * persist it, and write the encoded `(v_id, cid, codes)` table
    * cell-partitioned. One full pass over the corpus; returns the fitted
    * model (None — and nothing written — on an empty corpus). */
  def build(vecs: DataFrame, idCol: String, vecCol: String, path: String,
            nCells: Int = 16, m: Int = 8, codebookK: Int = 16,
            sampleN: Int = 10000): Option[VectorOps.IvfPqModel] =
    VectorOps.ivfPqTrain(vecs, idCol, vecCol, nCells, m, codebookK, sampleN)
      .map { model =>
        saveModel(vecs.sparkSession, model, path)
        VectorOps.ivfPqEncode(vecs, idCol, vecCol, model)
          .write.mode("overwrite").partitionBy("cid")
          .parquet(s"$path/index")
        writeKind(vecs.sparkSession, path, "flat")
        writeConf(vecs.sparkSession, path, Seq(nCells, m, codebookK))
        model
      }

  /** Load the persisted (quantizer, index-table) pair. Heals a
    * stranded-prev crash state first ([[retrain]]/[[rebuildOpq]] swap
    * the WHOLE artifact dir, so their crash window leaves `path` absent
    * with the old generation under `_prev`) — a serving read during the
    * window must see the retired generation, not a missing-path error. */
  def load(spark: SparkSession, path: String): (VectorOps.IvfPqModel, DataFrame) = {
    recoverRoots(spark, path)
    (loadModel(spark, path), spark.read.parquet(s"$path/index"))
  }

  /** Search a prebuilt index: bit-identical to the inline
    * [[VectorOps.ivfPqTopK]] on the same corpus (spec-proven), minus the
    * refit and the corpus re-encode. */
  def search(spark: SparkSession, path: String, corpus: DataFrame,
             idCol: String, vecCol: String, queryPred: Column, k: Int,
             nprobe: Int = 4, rerank: Int = 100): DataFrame = {
    val (model, index) = load(spark, path)
    VectorOps.ivfPqSearch(model, index, corpus, idCol, vecCol, queryPred,
      k, nprobe, rerank)
  }

  // -------------------------------------------- two-level (hier) layout

  /** Hier quantizer → typed Parquet rows: kind='super' (i = super id),
    * kind='child' (i = super id, j = child id), kind='book' as the flat
    * layout. Same artifact discipline, one extra kind. */
  def hierModelToDF(spark: SparkSession,
                    model: VectorOps.IvfPqHierModel): DataFrame = {
    import spark.implicits._
    val supers = model.coarse.supers.zipWithIndex.toSeq.map { case (c, i) =>
      ("super", i, 0, c.toSeq)
    }
    val children = for {
      (kids, sc) <- model.coarse.children.zipWithIndex.toSeq
      (c, cc) <- kids.zipWithIndex
    } yield ("child", sc, cc, c.toSeq)
    val books = for {
      (book, s) <- model.books.zipWithIndex.toSeq
      (c, j) <- book.zipWithIndex
    } yield ("book", s, j, c.toSeq)
    (supers ++ children ++ books).toDF("kind", "i", "j", "vec")
  }

  def hierModelFromDF(df: DataFrame): VectorOps.IvfPqHierModel = {
    val rows = df.collect()
    def vec(r: Row): Array[Double] =
      r.getAs[scala.collection.Seq[Double]]("vec").toArray
    def ofKind(k: String) = rows.filter(_.getAs[String]("kind") == k)
    val supers = ofKind("super").sortBy(_.getAs[Int]("i")).map(vec)
    val children = ofKind("child").groupBy(_.getAs[Int]("i")).toArray
      .sortBy(_._1).map { case (_, rs) => rs.sortBy(_.getAs[Int]("j")).map(vec) }
    val books = ofKind("book").groupBy(_.getAs[Int]("i")).toArray
      .sortBy(_._1).map { case (_, rs) => rs.sortBy(_.getAs[Int]("j")).map(vec) }
    VectorOps.IvfPqHierModel(VectorOps.HierKmeansModel(supers, children), books)
  }

  /** Build the TWO-LEVEL index: fit hier quantizer + residual codebooks
    * on the deterministic sample, persist, write the encoded
    * `(v_id, cid, codes)` table cell-partitioned — one corpus pass. */
  def buildHier(vecs: DataFrame, idCol: String, vecCol: String, path: String,
                k1: Int = 16, k2: Int = 16, m: Int = 8, codebookK: Int = 16,
                sampleN: Int = 10000): Option[VectorOps.IvfPqHierModel] = {
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(vecs, idCol, vecCol)
        .select(org.apache.spark.sql.functions.col(idCol).as("v_id"),
          org.apache.spark.sql.functions.col("vn")))
    VectorOps.ivfPqTrainHierNormalized(v, k1, k2, m, codebookK, sampleN)
      .map { model =>
        hierModelToDF(vecs.sparkSession, model).write.mode("overwrite")
          .parquet(s"$path/quantizer")
        // Directory layout: partition by SUPER cell (`sid`, k1 dirs) with
        // rows range-placed and sorted by (sid, cid) inside each file —
        // NOT by the k1·k2 global cell id. cid-partitioning at 10⁴ cells
        // means 10⁴ directories of near-empty files until the corpus is
        // enormous: the listing alone cost ~4.5 s/query at sf0.1 and
        // every open pays a footer read. k1 dirs keep partition pruning
        // on the probed supers, the within-file cid sort keeps row-group
        // stats tight for the cid pushdown, and each writer task covers
        // a contiguous (sid, cid) range so a dir gets few files — the
        // same layout discipline a 100 TB deployment wants (file counts
        // bounded by writer parallelism, not by quantizer arity).
        val stride = model.coarse.stride
        VectorOps.ivfPqEncodeHierNormalized(v, model)
          .withColumn("sid", expr(s"cid DIV $stride").cast("int"))
          .repartitionByRange(col("sid"), col("cid"))
          .sortWithinPartitions("sid", "cid")
          .write.mode("overwrite").partitionBy("sid")
          .parquet(s"$path/index")
        writeKind(vecs.sparkSession, path, "hier")
        writeConf(vecs.sparkSession, path, Seq(k1, k2, m, codebookK))
        model
      }
  }

  /** Cap on the number of probed cell ids folded into the index scan as
    * a literal `cid IN (...)` pushdown — beyond it (a probe set
    * approaching every cell) the filter buys nothing and a 10⁴-term OR
    * chain costs the parquet stats evaluator; the sid partition filter
    * alone carries the pruning. */
  val CidPushdownLimit = 2048

  /** The hier index scan pruned to the queries' probed cells: the probe
    * set is computed ONCE driver-side (one tiny job over the FILTERED
    * query rows — bounded by total cells, ≤ 40 KB at 10⁴ cells, so the
    * collect is safe at any query-batch size) and folded into the scan
    * as STATIC filters: `sid IN` prunes partitions at file-listing
    * level, `cid IN` prunes row groups via the within-file sort. Pure IO
    * pruning — the cid equi-join downstream already restricts to probed
    * cells, so results are bit-identical with or without it (spec).
    * Legacy cid-partitioned indexes (no `sid` column) pass through to
    * the DPP join path unchanged. */
  private def prunedHierIndex(spark: SparkSession, path: String,
                              model: VectorOps.IvfPqHierModel,
                              queries: DataFrame, probeSupers: Int,
                              nprobe: Int): DataFrame = {
    val index = spark.read.parquet(s"$path/index")
    if (!index.columns.contains("sid")) index
    else {
      val cids = VectorOps.probeCidFrame(queries, model.coarse,
          probeSupers, nprobe)
        .collect().map(_.getInt(0)).sorted
      val stride = model.coarse.stride
      val sids = cids.map(_ / stride).distinct.toSeq
      val bySid = index.filter(col("sid").isin(sids: _*))
      if (cids.length <= CidPushdownLimit)
        bySid.filter(col("cid").isin(cids.toSeq: _*))
      else bySid
    }
  }

  /** Search a prebuilt hier index — bit-identical to the inline
    * [[VectorOps.ivfPqHierTopK]] on the same corpus (spec-proven). */
  def searchHier(spark: SparkSession, path: String, corpus: DataFrame,
                 idCol: String, vecCol: String, queryPred: Column, k: Int,
                 probeSupers: Int = 4, nprobe: Int = 16,
                 rerank: Int = 100): DataFrame = {
    recoverRoots(spark, path) // serve through a maintenance crash
    val model = hierModelFromDF(spark.read.parquet(s"$path/quantizer"))
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(corpus, idCol, vecCol)
        .select(org.apache.spark.sql.functions.col(idCol).as("v_id"),
          org.apache.spark.sql.functions.col("vn")))
    val index = prunedHierIndex(spark, path, model, v.filter(queryPred),
      probeSupers, nprobe)
    VectorOps.ivfPqSearchHierNormalized(model, index, v,
      queryPred, k, probeSupers, nprobe, rerank)
  }

  // ------------------------------------------------- OPQ artifact tier

  def opqModelToDF(spark: SparkSession, rot: Array[Array[Double]],
                   books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    val rotRows = rot.zipWithIndex.toSeq.map { case (r, i) =>
      ("rot", i, 0, r.toSeq)
    }
    val bookRows = for {
      (book, s) <- books.zipWithIndex.toSeq
      (c, j) <- book.zipWithIndex
    } yield ("book", s, j, c.toSeq)
    (rotRows ++ bookRows).toDF("kind", "i", "j", "vec")
  }

  def opqModelFromDF(df: DataFrame)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val rows = df.collect()
    def vec(r: Row): Array[Double] =
      r.getAs[scala.collection.Seq[Double]]("vec").toArray
    val rot = rows.filter(_.getAs[String]("kind") == "rot")
      .sortBy(_.getAs[Int]("i")).map(vec)
    val books = rows.filter(_.getAs[String]("kind") == "book")
      .groupBy(_.getAs[Int]("i")).toArray.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_.getAs[Int]("j")).map(vec) }
    (rot, books)
  }

  /** Build the OPQ index: learned-rotation PQ fitted on the
    * deterministic sample, persisted as (rotation rows + codebooks) and
    * the `(v_id, codes)` table. The CELL-LESS tier of the artifact
    * family — every search scans all codes asymmetrically (no probe
    * pruning), which is the right trade when the corpus fits a scan but
    * the 8-byte codes must replace the raw vectors; the probe-pruned
    * regimes are [[build]]/[[buildHier]]. Returns false on an empty
    * corpus. */
  def buildOpq(vecs: DataFrame, idCol: String, vecCol: String, path: String,
               m: Int = 8, codebookK: Int = 16, altIters: Int = 5,
               sampleN: Int = 10000): Boolean = {
    val spark = vecs.sparkSession
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(vecs, idCol, vecCol)
        .select(col(idCol).as("v_id"), col("vn")))
    val sample = v.orderBy("v_id").limit(sampleN).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("vn").toArray)
    if (sample.isEmpty) false
    else {
      val (rot, books) = VectorOps.opqTrain(sample, m, codebookK, altIters)
      opqModelToDF(spark, rot, books).write.mode("overwrite")
        .parquet(s"$path/quantizer")
      // build-time quantization-error baseline (the objective opqTrain
      // descends, on its own training sample) — [[quantDrift]]'s
      // self-calibrating reference
      writeQerr(spark, path, VectorOps.pqMse(sample, rot, books))
      VectorOps.opqEncode(vecs, idCol, vecCol, rot, books)
        .select(col("v_id"), col("codes"))
        .write.mode("overwrite").parquet(s"$path/index")
      writeKind(spark, path, "opq")
      writeConf(spark, path, Seq(m, codebookK, altIters))
      true
    }
  }

  /** Search a prebuilt OPQ index — bit-identical to the inline
    * [[VectorOps.opqTopK]] on the same corpus (spec-pinned): the
    * deterministic sample yields the same rotation and codebooks, and
    * the on-the-fly query rotation is the same arithmetic the encode
    * ran. */
  def searchOpq(spark: SparkSession, path: String, corpus: DataFrame,
                idCol: String, vecCol: String, queryPred: Column, k: Int,
                rerank: Int = 100): DataFrame = {
    recoverRoots(spark, path) // serve through a maintenance crash
    val (rot, books) = opqModelFromDF(spark.read.parquet(s"$path/quantizer"))
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(corpus, idCol, vecCol)
        .select(col(idCol).as("v_id"), col("vn")))
    VectorOps.opqSearchNormalized(rot, books,
      spark.read.parquet(s"$path/index"), v, queryPred, k, rerank)
  }

  // -------------------------------------------- OPQ × IVF artifact tier

  /** OPQ+IVF quantizer → typed Parquet rows: kind='rot' (rotation rows)
    * + the flat layout's 'coarse'/'book' rows — one artifact, three
    * kinds. */
  def opqIvfModelToDF(spark: SparkSession, rot: Array[Array[Double]],
                      model: VectorOps.IvfPqModel): DataFrame = {
    import spark.implicits._
    val rotRows = rot.zipWithIndex.toSeq.map { case (r, i) =>
      ("rot", i, 0, r.toSeq)
    }
    rotRows.toDF("kind", "i", "j", "vec")
      .unionByName(modelToDF(spark, model))
  }

  def opqIvfModelFromDF(df: DataFrame)
      : (Array[Array[Double]], VectorOps.IvfPqModel) = {
    val rot = df.filter(col("kind") === "rot").collect()
      .sortBy(_.getAs[Int]("i"))
      .map(_.getAs[scala.collection.Seq[Double]]("vec").toArray)
    (rot, modelFromDF(df.filter(col("kind") =!= "rot")))
  }

  /** Build the PROBE-PRUNED OPQ index ([[VectorOps
    * .opqIvfTrainNormalized]]): the learned rotation rides the flat IVF
    * layout — quantizer rows (rot + coarse + books) and the
    * `(v_id, cid, codes)` table CELL-PARTITIONED, so a search probing
    * `nprobe` of `nCells` cells prunes the rest at the file-listing
    * level exactly like [[build]]. This closes [[buildOpq]]'s documented
    * gap (the cell-less tier scans every code); OPQ's accuracy now rides
    * the pruned regime. Returns false on an empty corpus. */
  def buildOpqIvf(vecs: DataFrame, idCol: String, vecCol: String,
                  path: String, nCells: Int = 16, m: Int = 8,
                  codebookK: Int = 16, altIters: Int = 5,
                  sampleN: Int = 10000): Boolean = {
    val spark = vecs.sparkSession
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(vecs, idCol, vecCol)
        .select(col(idCol).as("v_id"), col("vn")))
    VectorOps.opqIvfTrainNormalized(v, nCells, m, codebookK, altIters,
        sampleN) match {
      case None => false
      case Some((rot, model)) =>
        opqIvfModelToDF(spark, rot, model).write.mode("overwrite")
          .parquet(s"$path/quantizer")
        VectorOps.opqIvfEncodeNormalized(v, rot, model)
          .write.mode("overwrite").partitionBy("cid")
          .parquet(s"$path/index")
        writeKind(spark, path, "opq_ivf")
        writeConf(spark, path, Seq(nCells, m, codebookK, altIters))
        true
    }
  }

  /** Search a prebuilt OPQ+IVF index: rotated probe + asymmetric rank,
    * exact re-rank on the original vectors ([[VectorOps
    * .opqIvfSearchNormalized]]). The scan reads only the probed `cid=`
    * partitions (the probe set folds in as a static `cid IN` filter —
    * computed from the queries EXACTLY as the search's own probe
    * explode, so results are bit-identical with or without the pruning;
    * plan-audited). */
  def searchOpqIvf(spark: SparkSession, path: String, corpus: DataFrame,
                   idCol: String, vecCol: String, queryPred: Column, k: Int,
                   nprobe: Int = 4, rerank: Int = 100): DataFrame = {
    recoverRoots(spark, path) // serve through a maintenance crash
    val (rot, model) = opqIvfModelFromDF(
      spark.read.parquet(s"$path/quantizer"))
    val v = graft.CacheRegistry.persistTracked(
      VectorOps.normalized(corpus, idCol, vecCol)
        .select(col(idCol).as("v_id"), col("vn")))
    val cids = VectorOps.opqIvfProbeCids(v.filter(queryPred), rot, model,
      nprobe)
    val index0 = spark.read.parquet(s"$path/index")
    val index =
      if (cids.length <= CidPushdownLimit)
        index0.filter(col("cid").isin(cids.toSeq: _*))
      else index0
    VectorOps.opqIvfSearchNormalized(rot, model, index, v, queryPred, k,
      nprobe, rerank)
  }

  // ------------------------------------- arity-dispatched default entry

  /** Arity-dispatched build — the DEFAULT index entry point: FLAT coarse
    * quantizer below `hierThreshold` cells (bit-identical to [[build]]),
    * TWO-LEVEL (k1 = k2 = ⌈√nCells⌉, [[VectorOps.hierArity]]) at or
    * above it, where the flat per-row assignment cost O(nCells·dim)
    * stops being defensible. Both paths persist the same
    * `quantizer/` + cell-partitioned `index/` layout; the quantizer's
    * `kind` rows record which was fitted, so [[searchAuto]] needs no
    * caller-side flag. Returns whether anything was built (false only on
    * an empty corpus). */
  def buildAuto(vecs: DataFrame, idCol: String, vecCol: String, path: String,
                nCells: Int = 16, m: Int = 8, codebookK: Int = 16,
                sampleN: Int = 10000,
                hierThreshold: Int = VectorOps.HierCellThreshold): Boolean =
    if (nCells < hierThreshold)
      build(vecs, idCol, vecCol, path, nCells, m, codebookK, sampleN).nonEmpty
    else {
      val k12 = VectorOps.hierArity(nCells)
      buildHier(vecs, idCol, vecCol, path, k12, k12, m, codebookK,
        sampleN).nonEmpty
    }

  /** INCREMENTAL append — index maintenance without a quantizer retrain:
    * encode `newVecs` against the PERSISTED quantizer (flat or hier, from
    * the `_KIND` sidecar) and append the encoded rows to the
    * cell-partitioned `index/` table. Cell-partitioned parquet makes this
    * cheap at any scale: an append only ADDS files under the touched
    * `cid=` directories — no rewrite, no shuffle of the existing corpus,
    * and a concurrent [[searchAuto]] keeps partition-pruning correctly.
    *
    * This is the daily-ingest shape for a served 100 TB index: the
    * expensive pass (quantizer fit) amortizes across appends, encode is
    * one map-only pass over the NEW batch. The price is quantizer drift —
    * appended vectors from a shifted distribution crowd into few cells,
    * degrading probe recall — which is what [[occupancyStats]] watches;
    * when it recommends a retrain, [[buildAuto]] rebuilds from the full
    * corpus. Searching appended rows is bit-identical to a fresh encode
    * of the union with the SAME model (spec-pinned): search correctness
    * never depends on WHEN a row was encoded, only on the model version.
    */
  def appendAuto(spark: SparkSession, path: String, newVecs: DataFrame,
                 idCol: String, vecCol: String): Unit = {
    // heal a stranded-prev crash state BEFORE the mode('append') write
    // (the LshIndexIO.append rationale: an append into the window would
    // otherwise create a fresh batch-only index dir and strand the
    // corpus under _prev forever)
    recoverRoots(spark, path)
    // refuse the OPQ families (their admission valve is [[appendOpq]]):
    // treating an opq artifact as flat here would reconstruct an EMPTY
    // coarse quantizer from the rot-rows-only table and write garbage
    // encodings with no error — the silent family mix-up the retrain
    // guard closed on the maintenance side
    val kind0 = readKind(spark, path)
    val hasRot = kind0.isEmpty &&
      spark.read.parquet(s"$path/quantizer")
        .filter(col("kind") === "rot").limit(1).count() > 0
    require(kind0.forall(k => k == "flat" || k == "hier") && !hasRot,
      s"appendAuto supports flat/hier indexes only; $path is " +
        s"'${kind0.getOrElse("opq-family (rot rows present)")}' — use " +
        "appendOpq instead")
    val isHier = kind0 match {
      case Some(kind) => kind == "hier"
      case None => spark.read.parquet(s"$path/quantizer")
        .filter(col("kind") === "super").limit(1).count() > 0
    }
    if (isHier) {
      val model = hierModelFromDF(spark.read.parquet(s"$path/quantizer"))
      val encoded = VectorOps.ivfPqEncodeHierNormalized(
        VectorOps.normalized(newVecs, idCol, vecCol)
          .select(col(idCol).as("v_id"), col("vn")), model)
      // match the existing directory layout: sid-partitioned for indexes
      // written by the current buildHier, legacy cid-partitioned otherwise
      if (spark.read.parquet(s"$path/index").columns.contains("sid")) {
        val stride = model.coarse.stride
        encoded.withColumn("sid", expr(s"cid DIV $stride").cast("int"))
          .repartitionByRange(col("sid"), col("cid"))
          .sortWithinPartitions("sid", "cid")
          .write.mode("append").partitionBy("sid").parquet(s"$path/index")
      } else
        encoded.write.mode("append").partitionBy("cid").parquet(s"$path/index")
    } else {
      val model = modelFromDF(spark.read.parquet(s"$path/quantizer"))
      VectorOps.ivfPqEncode(newVecs, idCol, vecCol, model)
        .write.mode("append").partitionBy("cid").parquet(s"$path/index")
    }
  }

  /** INCREMENTAL append for the OPQ families — [[appendAuto]]'s
    * discipline on the two kinds it refuses: encode `newVecs` against
    * the PERSISTED rotation + codebooks (and, for `opq_ivf`, the
    * persisted coarse quantizer) and append the encoded rows to the
    * index table (cell-partitioned for `opq_ivf` — only the touched
    * `cid=` dirs gain files; plain for the cell-less `opq`). The model
    * is FROZEN: the rotation/codebooks never change under append, so
    * searching appended rows is bit-identical to a fresh encode of the
    * union under the same model (spec-pinned), and the drift the frozen
    * rotation accrues is exactly what [[occupancyStats]] watches
    * (`opq_ivf`) and [[rebuildOpq]] heals. With this, all four
    * persisted families carry the full lifecycle:
    * build → append → monitor → maintain. */
  def appendOpq(spark: SparkSession, path: String, newVecs: DataFrame,
                idCol: String, vecCol: String): Unit = {
    recoverRoots(spark, path) // heal a stranded-prev crash state
    val kind = readKind(spark, path).getOrElse {
      val q = spark.read.parquet(s"$path/quantizer")
      require(q.filter(col("kind") === "rot").limit(1).count() > 0,
        s"appendOpq supports the OPQ families only; $path has no " +
          "rotation — use appendAuto instead")
      if (q.filter(col("kind") === "coarse").limit(1).count() > 0) "opq_ivf"
      else "opq"
    }
    require(kind == "opq" || kind == "opq_ivf",
      s"appendOpq supports the OPQ families only; $path is '$kind' — " +
        "use appendAuto instead")
    if (kind == "opq") {
      val (rot, books) = opqModelFromDF(
        spark.read.parquet(s"$path/quantizer"))
      VectorOps.opqEncode(newVecs, idCol, vecCol, rot, books)
        .select(col("v_id"), col("codes"))
        .write.mode("append").parquet(s"$path/index")
    } else {
      val (rot, model) = opqIvfModelFromDF(
        spark.read.parquet(s"$path/quantizer"))
      val v = VectorOps.normalized(newVecs, idCol, vecCol)
        .select(col(idCol).as("v_id"), col("vn"))
      VectorOps.opqIvfEncodeNormalized(v, rot, model)
        .write.mode("append").partitionBy("cid").parquet(s"$path/index")
    }
  }

  /** The persisted quantizer's configuration — flat: coarse-cell count;
    * hier: (k1 supers, k2 children per super); both: (m subspaces,
    * codebookK entries). Read from the `_CONF` sidecar when present
    * (the configuration the caller REQUESTED at build time — exact even
    * when sample-bounded fitting narrowed the fitted arity); pre-sidecar
    * artifacts fall back to one small driver collect over the quantizer
    * table (model-sized, the same rows [[modelFromDF]] collects). Lets
    * [[retrain]] preserve the built configuration without the caller
    * re-stating it — maintenance must not silently change the index's
    * operating point. */
  private case class PersistedConfig(isHier: Boolean, k1: Int, k2: Int,
                                     nCells: Int, m: Int, codebookK: Int)

  private def persistedConfig(spark: SparkSession,
                              path: String): PersistedConfig = {
    // the sidecar layout is kind-specific (the OPQ kinds persist
    // altIters too), so the fast path dispatches on the _KIND sidecar —
    // never on field count alone
    (readKind(spark, path), readConfFields(spark, path)) match {
      case (Some("hier"), Some(Array(k1, k2, m, codebookK))) =>
        return PersistedConfig(isHier = true, k1, k2, k1 * k2, m, codebookK)
      case (Some("flat"), Some(Array(nCells, m, codebookK))) =>
        return PersistedConfig(isHier = false, 0, 0, nCells, m, codebookK)
      case _ => // pre-sidecar artifact (or a foreign layout): derive
    }
    val rows = spark.read.parquet(s"$path/quantizer")
      .groupBy("kind", "i").agg(count(lit(1)).as("n")).collect()
    val byKind = rows.groupBy(_.getAs[String]("kind"))
    val m = byKind.get("book").map(_.length).getOrElse(0)
    val codebookK = byKind.get("book")
      .map(_.head.getAs[Long]("n").toInt).getOrElse(16)
    byKind.get("super") match {
      case Some(supers) =>
        val k1 = supers.length
        // a hier quantizer with super rows but NO child rows is not a
        // fittable artifact — fail with the cause, not a key miss
        require(byKind.contains("child"),
          s"$path/quantizer has ${k1} super rows but no child rows — " +
            "degenerate hier artifact; rebuild it with buildHier")
        // children can be RAGGED (fitted children are sample-bounded per
        // super), so the requested arity is the widest fitted one
        val k2 = byKind("child").map(_.getAs[Long]("n").toInt).max
        PersistedConfig(isHier = true, k1, k2, k1 * k2, m, codebookK)
      case None =>
        val nCells = byKind.get("coarse").map(_.length).getOrElse(16)
        PersistedConfig(isHier = false, 0, 0, nCells, m, codebookK)
    }
  }

  /** RETRAIN the index from the accumulated corpus — the actuator
    * [[occupancyStats]]'s `recommend_retrain` flag demands (the gauge
    * shipped earlier; this is the valve): an [[appendAuto]] chain admits
    * every batch through the FROZEN quantizer, so a shifted ingest
    * distribution crowds new vectors into few cells — probe recall
    * degrades first, then the hot cell serializes its scan. Retrain
    * refits quantizer + codebooks on the CURRENT corpus at the
    * persisted configuration (arity/m/codebookK read back from the
    * artifact — maintenance preserves the operating point), re-encodes
    * everything, and promotes the new generation with one atomic
    * directory swap ([[ArtifactSwap]]): searches keep serving the old
    * generation until the new one is complete, and the promoted index
    * is indistinguishable from a from-scratch [[buildAuto]] over the
    * same corpus (oracle-pinned VERBATIM). Flat/hier tiers only — the
    * kinds [[appendAuto]] admits into, hence the kinds that drift.
    * Returns false (nothing changed) on an empty corpus. */
  def retrain(vecs: DataFrame, idCol: String, vecCol: String,
              path: String, sampleN: Int = 10000): Boolean = {
    val spark = vecs.sparkSession
    recoverRoots(spark, path) // heal a stranded-prev crash state
    // refuse the OPQ families outright: their learned rotation is not
    // part of this fit path, so "retraining" one here would overwrite
    // the quantizer WITHOUT rot rows and flatten the artifact —
    // precisely the silent family change maintenance must never make.
    // (Detected via the _KIND sidecar, falling back to the rot rows for
    // pre-sidecar artifacts.) The OPQ families' maintenance valve is
    // [[rebuildOpq]].
    val kind = readKind(spark, path)
    val hasRot = kind.isEmpty &&
      spark.read.parquet(s"$path/quantizer")
        .filter(col("kind") === "rot").limit(1).count() > 0
    require(kind.forall(k => k == "flat" || k == "hier") && !hasRot,
      s"retrain supports flat/hier indexes only; $path is " +
        s"'${kind.getOrElse("opq-family (rot rows present)")}' — use " +
        "rebuildOpq (or buildOpq/buildOpqIvf) instead")
    val cfg = persistedConfig(spark, path)
    val next = s"${path}_next"
    ArtifactSwap.clearStale(spark, next)
    // dispatch on the PERSISTED kind, not the arity threshold: a hier
    // index must retrain hier at its own (k1, k2) even where buildAuto
    // would pick flat — maintenance preserves the family, not just the
    // cell count
    val built =
      if (cfg.isHier)
        buildHier(vecs, idCol, vecCol, next, cfg.k1, cfg.k2, cfg.m,
          cfg.codebookK, sampleN).nonEmpty
      else
        build(vecs, idCol, vecCol, next, cfg.nCells, cfg.m, cfg.codebookK,
          sampleN).nonEmpty
    if (built) ArtifactSwap.swap(spark, path, next)
    else ArtifactSwap.clearStale(spark, next)
    built
  }

  /** Drift-gated maintenance: read the [[occupancyStats]] monitor and
    * [[retrain]] only when it recommends to — the closed loop a snapshot
    * chain runs after each [[appendAuto]] batch. Returns true iff a
    * retrain happened. The monitor read is one tiny aggregate job; the
    * skew threshold is the monitor's (see its toy-arity note).
    *
    * NOTE the skew gauge measures cell CONCENTRATION, which retrain
    * cures only when the cause is a stale quantizer (codebooks that
    * cannot resolve the drifted region — the damage the spec measures
    * as code-word collapse). A corpus whose mass is GENUINELY
    * concentrated keeps a high skew after a perfect retrain, so a
    * deployment driving this in a loop should re-arm on skew INCREASE
    * since the last retrain (one stored number next to the artifact)
    * rather than on the absolute flag, or it will retrain every
    * batch. */
  def retrainIfDrifted(spark: SparkSession, path: String, vecs: DataFrame,
                       idCol: String, vecCol: String,
                       skewThreshold: Double = 8.0,
                       sampleN: Int = 10000): Boolean = {
    val drifted = occupancyStats(spark, path, skewThreshold)
      .select("recommend_retrain").head().getBoolean(0)
    drifted && retrain(vecs, idCol, vecCol, path, sampleN)
  }

  /** REBUILD an OPQ-family index from the accumulated corpus — the
    * retrain valve for the two kinds [[retrain]] rightly refuses: an OPQ
    * artifact's accuracy lives in the LEARNED ROTATION (the alternating
    * Procrustes fit), so healing drift means re-learning rotation AND
    * codebooks (and, for `opq_ivf`, the coarse quantizer) from the
    * current corpus, then re-encoding everything — a flat refit would
    * silently destroy the rotation (the guard the r14 round added; this
    * is the action it pointed at). Preserves the persisted operating
    * point (`_CONF`: nCells/m/codebookK/altIters as requested at build
    * time) and promotes with the same [[ArtifactSwap]] atomic
    * generation swap as [[retrain]]: searches serve the old generation
    * until the new one is complete, and the promoted artifact is
    * indistinguishable from a from-scratch [[buildOpq]]/[[buildOpqIvf]]
    * over the same corpus (the deterministic sample makes the fit
    * replayable — oracle-pinned VERBATIM against the from-scratch SQL).
    * With this, all four persisted index kinds have an actionable
    * maintenance valve for the occupancy monitor's drift signal.
    * Returns false (nothing changed) on an empty corpus. */
  def rebuildOpq(vecs: DataFrame, idCol: String, vecCol: String,
                 path: String, sampleN: Int = 10000): Boolean = {
    val spark = vecs.sparkSession
    recoverRoots(spark, path) // heal a stranded-prev crash state
    val kind = readKind(spark, path).getOrElse {
      // pre-sidecar artifact: the rot rows identify the family, the
      // coarse rows split opq_ivf from the cell-less opq
      val q = spark.read.parquet(s"$path/quantizer")
      require(q.filter(col("kind") === "rot").limit(1).count() > 0,
        s"rebuildOpq supports the OPQ families only; $path has no " +
          "rotation — use retrain instead")
      if (q.filter(col("kind") === "coarse").limit(1).count() > 0) "opq_ivf"
      else "opq"
    }
    require(kind == "opq" || kind == "opq_ivf",
      s"rebuildOpq supports the OPQ families only; $path is '$kind' — " +
        "use retrain instead")
    val next = s"${path}_next"
    ArtifactSwap.clearStale(spark, next)
    val built = (kind, readConfFields(spark, path)) match {
      case ("opq", Some(c)) if c.length == 3 =>
        buildOpq(vecs, idCol, vecCol, next, c(0), c(1), c(2), sampleN)
      case ("opq", _) =>
        // pre-sidecar artifact: derive m/codebookK from the fitted rows
        // (altIters alone falls to the build default — it leaves no
        // trace); hardcoded defaults here would silently change the
        // index's operating point, the one thing maintenance must not do
        val (_, m, codebookK) = derivedBookConf(spark, path)
        buildOpq(vecs, idCol, vecCol, next, m, codebookK, 5, sampleN)
      case (_, Some(c)) if c.length == 4 =>
        buildOpqIvf(vecs, idCol, vecCol, next, c(0), c(1), c(2), c(3),
          sampleN)
      case _ =>
        val (nCellsOpt, m, codebookK) = derivedBookConf(spark, path)
        buildOpqIvf(vecs, idCol, vecCol, next, nCellsOpt.getOrElse(16), m,
          codebookK, 5, sampleN)
    }
    if (built) ArtifactSwap.swap(spark, path, next)
    else ArtifactSwap.clearStale(spark, next)
    built
  }

  /** Drift-gated OPQ rebuild — [[retrainIfDrifted]]'s twin for the
    * probe-pruned OPQ family (`opq_ivf`: the occupancy monitor reads
    * `cid`, which the cell-less `opq` kind does not have — gate that one
    * on corpus-growth policy and call [[rebuildOpq]] directly). Returns
    * true iff a rebuild happened. */
  def rebuildOpqIfDrifted(spark: SparkSession, path: String,
                          vecs: DataFrame, idCol: String, vecCol: String,
                          skewThreshold: Double = 8.0,
                          sampleN: Int = 10000): Boolean = {
    val drifted = occupancyStats(spark, path, skewThreshold)
      .select("recommend_retrain").head().getBoolean(0)
    drifted && rebuildOpq(vecs, idCol, vecCol, path, sampleN)
  }

  /** COMPACT the encoded index table — the file-merge maintenance the
    * LSH band table gets from [[LshIndexIO.compact]], on the vector
    * side: an [[appendAuto]] chain adds files under the touched cell
    * partitions every batch, so probe-pruned searches pay creeping
    * listing/footer/tiny-row-group costs while the encodings themselves
    * never change. Compaction rewrites the table into a fresh
    * generation in the SAME layout family it found (flat: cid
    * partitions; hier: sid partitions with the (sid, cid) within-file
    * sort the cid pushdown depends on), file count bounded by writer
    * arity, promoted by [[ArtifactSwap]]'s atomic rename. NO model
    * change, NO re-encode: search results are bit-identical before and
    * after (the `ann_index_compact` oracle shares `ann_index_append`'s
    * SQL verbatim). Returns (files_before, files_after). */
  def compact(spark: SparkSession, path: String,
              targetPartitions: Int = 0,
              knownBefore: Long = -1L): (Long, Long) = {
    // heal a prior crash BEFORE the layout sniff: compactTable recovers
    // its own swap root, but the isHier read below precedes it and would
    // throw missing-path inside the crash window otherwise
    recoverRoots(spark, path)
    // layout family detected from the live table, preserved by the plan
    val isHier = spark.read.parquet(s"$path/index").columns.contains("sid")
    ArtifactSwap.compactTable(spark, s"$path/index",
      (df, parts) =>
        if (isHier) df.repartitionByRange(parts, col("sid"), col("cid"))
          .sortWithinPartitions("sid", "cid")
        else df.repartitionByRange(parts, col("cid"))
          .sortWithinPartitions("cid"),
      if (isHier) "sid" else "cid", targetPartitions, knownBefore)
  }

  /** Fragmentation-gated compaction ([[LshIndexIO.compactIfFragmented]]'s
    * twin, sharing [[ArtifactSwap.fragmentedAt]] — the gate's listing is
    * reused as the compactor's `before`): healthy indexes are a
    * listing-only no-op. Returns true iff a compaction ran. */
  def compactIfFragmented(spark: SparkSession, path: String,
                          maxFiles: Int = 0,
                          targetPartitions: Int = 0): Boolean = {
    // heal BEFORE the gate's listing: in compact()'s crash window the
    // live dir is absent, so dataFileCount would report 0 (healthy) and
    // a gated-only maintenance loop would never recover the stranded
    // corpus under _prev
    recoverRoots(spark, path)
    ArtifactSwap.fragmentedAt(spark, s"$path/index", maxFiles) match {
      case Some(n) => compact(spark, path, targetPartitions, n); true
      case None => false
    }
  }

  /** Cell-occupancy monitor for a built index: one map-side-combined
    * aggregate over the (pruned-to-metadata) index scan. Returns a
    * single-row frame —
    * `n_rows, n_cells, mean_occupancy, max_occupancy, skew,
    *  recommend_retrain` — where `skew = max/mean` and the retrain flag
    * trips at `skew > skewThreshold`. A healthy quantizer keeps cells
    * near-uniform; drifted appends pile into few cells, which first
    * costs probe recall (queries probe `nprobe` cells, a crowded cell
    * holds more of the true neighbors' competitors) and then search
    * latency (one giant cell serializes its partition's scan).
    *
    * NOTE `skew = max/mean` is bounded above by the POPULATED cell count
    * (all rows in one cell of c gives skew = c), so the default
    * threshold 8 assumes production arity (hundreds of cells or more);
    * a toy index with < ~16 populated cells needs a proportionally
    * smaller `skewThreshold` to be able to trip at all. */
  def occupancyStats(spark: SparkSession, path: String,
                     skewThreshold: Double = 8.0): DataFrame = {
    recoverRoots(spark, path) // gauge through a maintenance crash
    val perCell = spark.read.parquet(s"$path/index")
      .groupBy("cid").agg(count(lit(1)).as("n"))
    perCell.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_cells"),
        avg(col("n")).as("mean_occupancy"),
        max(col("n")).as("max_occupancy"))
      .select(col("n_rows"), col("n_cells"), col("mean_occupancy"),
        col("max_occupancy"),
        (col("max_occupancy") / col("mean_occupancy")).as("skew"))
      .withColumn("recommend_retrain", col("skew") > skewThreshold)
  }

  /** Build-time quantization-error sidecar (`path/_QERR`, one ASCII
    * double): [[buildOpq]] records its training sample's reconstruction
    * MSE so [[quantDrift]] can compare the CURRENT corpus against the
    * quantizer's own birth certificate — self-calibrating, no absolute
    * threshold to size per corpus. */
  private def qerrPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_QERR")

  private def writeQerr(spark: SparkSession, path: String,
                        mse: Double): Unit = {
    val p = qerrPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mse.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Quantization-error drift monitor for the CELL-LESS `opq` family —
    * [[occupancyStats]]' counterpart where there is no `cid` to gauge:
    * drift under a frozen rotation/codebook shows up as RECONSTRUCTION
    * ERROR (regions the books never saw quantize onto far-away code
    * words — asymmetric ranks go arbitrary there, the recall damage the
    * retrain spec measures). Takes a deterministic hash-spread sample of
    * the CURRENT corpus (old and appended rows alike), measures its MSE
    * through the persisted rotation + books ([[VectorOps.pqMse]], the
    * objective the build descended), and compares against the
    * build-time baseline the artifact carries (`_QERR`): a healthy
    * corpus sits near 1×; `recommend_rebuild` trips past `factor`. The
    * actuator is [[rebuildOpq]], which resets the baseline. Driver-side
    * sample math bounded by `sampleN` (the fit-sample discipline).
    * Returns one row: `n_sample, baseline_mse, sample_mse, ratio,
    * recommend_rebuild`. Pre-sidecar artifacts fail fast (no baseline
    * to gauge against — rebuild once to mint one). */
  def quantDrift(spark: SparkSession, path: String, vecs: DataFrame,
                 idCol: String, vecCol: String, sampleN: Int = 2000,
                 factor: Double = 2.0): DataFrame = {
    import spark.implicits._
    recoverRoots(spark, path)
    val baseline = ArtifactSwap.readSmall(spark, qerrPath(path))
      .map(_.trim.toDouble)
      .getOrElse(throw new IllegalArgumentException(
        s"$path carries no _QERR baseline (pre-r15 artifact) — " +
          "rebuildOpq once to mint one"))
    val (rot, books) = opqModelFromDF(spark.read.parquet(s"$path/quantizer"))
    val sample = VectorOps.normalized(vecs, idCol, vecCol)
      .select(col(idCol).cast("string").as("_k"), col("vn"))
      .orderBy(md5(col("_k"))) // hash-spread: old AND appended rows
      .limit(sampleN)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("vn").toArray)
    val mse = VectorOps.pqMse(sample, rot, books)
    val ratio = mse / math.max(baseline, 1e-300)
    // a legitimately ~zero baseline (toy corpus with <= codebookK
    // distinct vectors — the books memorize the training sample exactly)
    // makes the ratio astronomical forever: the monitor would recommend
    // a rebuild on EVERY call and each rebuild re-mints a zero baseline,
    // a non-converging monitor→actuator loop. Gate the recommendation on
    // the sample error also clearing an absolute floor (1e-12 on unit
    // vectors is far below any real quantization error), so a perfectly
    // memorizing quantizer reads as not-drifted.
    val drifted = ratio > factor && mse > math.max(baseline * factor, 1e-12)
    Seq((sample.length.toLong, baseline, mse, ratio, drifted))
      .toDF("n_sample", "baseline_mse", "sample_mse", "ratio",
        "recommend_rebuild")
  }

  /** Drift-gated rebuild for the cell-less family — the closed
    * monitor→actuator loop ([[retrainIfDrifted]]'s shape) on the one
    * kind with no occupancy axis. Returns true iff a rebuild ran. */
  def rebuildOpqIfQuantDrifted(spark: SparkSession, path: String,
                               vecs: DataFrame, idCol: String,
                               vecCol: String, sampleN: Int = 2000,
                               factor: Double = 2.0): Boolean = {
    val drifted = quantDrift(spark, path, vecs, idCol, vecCol, sampleN,
      factor).select("recommend_rebuild").head().getBoolean(0)
    drifted && rebuildOpq(vecs, idCol, vecCol, path)
  }

  /** Search a [[buildAuto]]-built index: dispatches on the persisted
    * quantizer kind (hier ⇒ probed `probeSupers` supers wide; flat ⇒
    * `probeSupers` ignored). Bit-identical to the matching explicit
    * search either way. The kind comes from the `_KIND` sidecar written
    * at build time — a driver-side FS read, NO Spark job; indexes
    * predating the sidecar fall back to a one-row probe of the
    * quantizer table. */
  def searchAuto(spark: SparkSession, path: String, corpus: DataFrame,
                 idCol: String, vecCol: String, queryPred: Column, k: Int,
                 nprobe: Int = 4, rerank: Int = 100,
                 probeSupers: Int = 4): DataFrame = {
    recoverRoots(spark, path) // serve through a maintenance crash
    val qdf = spark.read.parquet(s"$path/quantizer")
    val isHier = readKind(spark, path) match {
      case Some(kind) => kind == "hier"
      case None => qdf.filter(col("kind") === "super").limit(1).count() > 0
    }
    if (isHier) {
      val model = hierModelFromDF(qdf)
      val v = graft.CacheRegistry.persistTracked(
        VectorOps.normalized(corpus, idCol, vecCol)
          .select(col(idCol).as("v_id"), col("vn")))
      val index = prunedHierIndex(spark, path, model, v.filter(queryPred),
        probeSupers, nprobe)
      VectorOps.ivfPqSearchHierNormalized(model, index, v,
        queryPred, k, probeSupers, nprobe, rerank)
    } else
      VectorOps.ivfPqSearch(modelFromDF(qdf),
        spark.read.parquet(s"$path/index"), corpus, idCol, vecCol,
        queryPred, k, nprobe, rerank)
  }
}
