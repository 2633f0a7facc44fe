package graft.operators

import graft.SparkSpec

/** Connected components: property-checked against a driver-side
  * union-find on random graphs, plus the adversarial shapes that break
  * naive propagation (long chains) and the star/clique fixed points. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find reference. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = GraphOps.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("chain graph (worst case for naive propagation) resolves in O(log n)") {
    val n = 200L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size == n)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint cliques + singleton edges") {
    val clique = for {
      base <- Seq(100L, 200L, 300L)
      i <- 0 until 5; j <- (i + 1) until 5
    } yield (base + i, base + j)
    val got = run(clique ++ Seq((7L, 9L)))
    assert(got(104L) == 100L && got(204L) == 200L && got(304L) == 300L)
    assert(got(9L) == 7L && got(7L) == 7L)
  }

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val n = 50 + trial * 30
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(edges)
      val got = run(edges)
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("duplicate / reversed edges and empty input") {
    val got = run(Seq((3L, 1L), (1L, 3L), (3L, 1L), (5L, 5L)))
    assert(got == Map(1L -> 1L, 3L -> 1L)) // self-loop 5 contributes nothing
    assert(run(Nil).isEmpty)
  }

  test("r17: driver union-find fast path == forced distributed loop") {
    val rnd = new scala.util.Random(23)
    val edges = (0L until 80L).map(i => (i, i + 1)) ++ // long chain
      Seq.fill(60)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b }
    val local = run(edges) // default gate → driver union-find
    val dist = GraphOps.connectedComponents(
        edges.toDF("a", "b"), "a", "b", maxLocalEdges = 0)
      .as[(Long, Long)].collect().toMap
    graft.CacheRegistry.releaseAll()
    assert(local == dist)
  }

  test("reliable checkpointDir: same labels, round files actually written") {
    val dir = java.nio.file.Files.createTempDirectory("cc_ckpt").toString
    // chain + clique mix so the run takes several rounds
    val edges = (0L until 60L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val expect = run(edges) // localCheckpoint (default) path
    val got = GraphOps.connectedComponents(
        edges.toDF("a", "b"), "a", "b", checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    graft.CacheRegistry.releaseAll()
    assert(got == expect)
    // the durable path must really have gone through the reliable store
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
    assert(anyFile(new java.io.File(dir)),
      s"no checkpoint data written under $dir")
  }

  test("celebrity node: one doc near-dup to 10^3 others, bounded and canonical") {
    // hub 0 connected to 1..1000 (the LSH celebrity shape) plus a tail
    // chain hanging off a leaf — labels must all collapse to 0
    val hub = (1L to 1000L).map(i => (0L, i))
    val tail = (1000L until 1010L).map(i => (i, i + 1))
    val got = run(hub ++ tail)
    assert(got.size == 1011)
    assert(got.values.toSet == Set(0L))
    // keeper semantics downstream: exactly one self-labeled root
    assert(got.count { case (n, c) => n == c } == 1)
  }

  test("pageRank: closed-form star, cycle fixpoint, dangling redistribution") {
    def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
      GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // star a→b, c→b, b→a after one iteration (n=3, all odeg 1):
    // b: 0.05 + 0.85·(⅓+⅓) = 0.616667; a: 0.05 + 0.85·⅓; c: base only
    val star = ranks(Seq((1L, 2L), (3L, 2L), (2L, 1L)), iters = 1)
    assert(star(2L) == 0.616667 && star(1L) == 0.333333 && star(3L) == 0.05)
    assert(math.abs(star.values.sum - 1.0) < 1e-5) // dangling-free: mass kept
    // 2-cycle is a fixpoint at 0.5/0.5 for any iteration count
    assert(ranks(Seq((1L, 2L), (2L, 1L)), iters = 4)
      == Map(1L -> 0.5, 2L -> 0.5))
    // canonical dangling handling: a→b only, b's parked mass (0.5)
    // redistributes uniformly (D/n = 0.25 each):
    // a: 0.075 + 0.85·0.25 = 0.2875; b: 0.075 + 0.85·(0.5 + 0.25)
    val sink = ranks(Seq((1L, 2L)), iters = 1)
    assert(sink == Map(1L -> 0.2875, 2L -> 0.7125),
      s"canonical dangling redistribution broken: $sink")
    assert(math.abs(sink.values.sum - 1.0) < 1e-9)
    graft.CacheRegistry.releaseAll()
  }

  test("pageRank rank-sum law: ranks sum to 1 on sink-bearing graphs") {
    // a chain with a terminal sink, a detached sink pair, and a hub that
    // is itself dangling — every shape of parked mass must come back
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain into sink 4
      (5L, 6L),                                   // detached sink 6
      (1L, 7L), (2L, 7L), (5L, 7L))               // dangling hub 7
    for (iters <- Seq(1, 3, 7)) {
      val r = GraphOps.pageRank(edges.toDF("s", "d"), "s", "d", iters)
        .collect().map(_.getDouble(1))
      assert(math.abs(r.sum - 1.0) < 5e-6 * r.length,
        s"iters=$iters: ranks sum to ${r.sum}, not 1 (leaked dangling mass)")
      assert(r.forall(_ > 0.0), s"iters=$iters: nonpositive rank")
    }
    graft.CacheRegistry.releaseAll()
  }
}
