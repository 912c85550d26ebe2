package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property fuzzing for the custom operators against brute-force references:
  * the oracle fixtures exercise realistic shapes, these exercise adversarial
  * ones (empty ranges, ranges spanning many bins, bin-boundary points,
  * self-loops, dense random graphs). */
class OperatorPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def forAll[A](gen: Gen[A], n: Int = 12)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("ObjectStore.putBulk == sequential put on random objects/windows") {
    import graft.transport._
    val genObj = for {
      nameLen <- Gen.choose(1, 12)
      name <- Gen.listOfN(nameLen, Gen.alphaNumChar).map(_.mkString)
      size <- Gen.oneOf(Gen.const(0), Gen.choose(1, 40), Gen.choose(41, 300))
      bytes <- Gen.listOfN(size, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (name, bytes.toArray, size.toLong)
    val gen = for {
      objs <- Gen.listOfN(17, genObj)
      window <- Gen.choose(1, 7)
      chunk <- Gen.oneOf(1, 7, 64)
    } yield (objs, window, chunk)
    var run = 0
    forAll(gen, n = 8) { case (objs0, window, chunk) =>
      run += 1
      // distinct names: sequential-put and bulk orderings only agree on
      // the last write per name, which dedup to distinct makes exact
      val objs = objs0.distinctBy(_._1)
      val url = s"nats://prop-bulk-$run:4222"
      FakeJetStream.listen(url)
      val t = Transport.connect(url)
      val seq = new ObjectStore(t, "pseq", chunk)
      objs.foreach { case (n, d, m) => seq.put(n, d, m) }
      val blk = new ObjectStore(t, "pblk", chunk)
      assert(blk.putBulk(objs.iterator, window) == objs.length.toLong)
      val a = seq.list().map(i => (i.name, i.size, i.chunks, i.digest))
        .sortBy(_._1)
      val b = blk.list().map(i => (i.name, i.size, i.chunks, i.digest))
        .sortBy(_._1)
      assert(a == b, s"bulk diverged (window=$window chunk=$chunk)")
      objs.foreach { case (n, d, _) =>
        assert(java.util.Arrays.equals(blk.get(n), d), s"content of $n")
      }
      assert(blk.sweepOrphans() == 0, "fresh bulk load left orphans")
    }
  }

  test("rangeJoin == naive containment join on random points/ranges") {
    import spark.implicits._
    val gen = for {
      pts <- Gen.listOfN(60, Gen.chooseNum(0L, 1000L))
      rs <- Gen.listOfN(15, for {
        lo <- Gen.chooseNum(0L, 1000L)
        span <- Gen.chooseNum(0L, 400L)
      } yield (lo, lo + span))
      bin <- Gen.oneOf(1L, 7L, 100L, 1000L)
    } yield (pts, rs, bin)
    forAll(gen) { case (pts, rs, bin) =>
      val points = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pid", "t")
      val ranges = rs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("rid", "lo", "hi")
      val got = graft.operators.RangeJoin
        .rangeJoin(points, "t", ranges, "lo", "hi", bin)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (t, pi) <- pts.zipWithIndex
        ((lo, hi), ri) <- rs.zipWithIndex
        if t >= lo && t <= hi
      } yield (pi.toLong, ri.toLong)).toSet
      assert(got == want, s"bin=$bin pts=$pts rs=$rs")
    }
  }

  test("connectedComponents == brute-force union-find on random graphs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(2, 25)
      m <- Gen.chooseNum(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter(e => e._1 != e._2)
    forAll(gen, n = 8) { edges0 =>
      val edges = if (edges0.isEmpty) List((0L, 1L)) else edges0
      val got = graft.operators.Dedup
        .connectedComponents(edges.toDF("id1", "id2"), "id1", "id2")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force union-find
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map { x =>
        // canonical component id = min node in the component
        val root = find(x)
        x -> nodes.filter(find(_) == root).min
      }.toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("duplicateSpans == brute-force span counting on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val gen = for {
      // doc lengths straddle k (incl. shorter-than-k docs, the ANSI
      // element_at trap) and a tiny alphabet forces real span collisions
      docs <- Gen.listOfN(25, Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)))
      k <- Gen.oneOf(2, 3, 5)
    } yield (docs, k)
    forAll(gen) { case (docs, k) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.duplicateSpans(df, "doc_id", "text", k)
        .select("doc_id", "n_spans", "n_dup_spans")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val spans = docs.zipWithIndex.map { case (ws, i) =>
        i.toLong -> ws.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
      }
      // NOTE: "" splits to one empty token, matching split('', ' ') = ['']
      val counts = spans.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val want = (for {
        (id, ss) <- spans
        dup = ss.count(s => counts(s) >= 2)
        if dup > 0
      } yield (id, ss.size, dup.toLong)).toSet
      assert(got == want, s"k=$k docs=$docs")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("scrubDuplicateSpans == brute-force span removal on random corpora") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val gen = for {
      docs <- Gen.listOfN(20, Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word)))
      k <- Gen.oneOf(2, 3, 5)
    } yield (docs, k)
    forAll(gen, n = 10) { case (docs, k) =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.scrubDuplicateSpans(df, "doc_id", "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      // brute force; NOTE "" splits to one empty token, matching split()
      val toks = docs.map(ws => if (ws.isEmpty) List("") else ws)
      val dupSet = toks
        .flatMap(_.sliding(k).filter(_.size == k).map(_.mkString(" ")).distinct)
        .groupBy(identity).filter(_._2.size >= 2).keySet
      val want = toks.zipWithIndex.map { case (ws, i) =>
        val n = ws.size
        val starts = (1 to n).map(j =>
          j <= n - k + 1 && dupSet.contains(ws.slice(j - 1, j - 1 + k).mkString(" ")))
        val covered = (1 to n).map(j =>
          (math.max(1, j - k + 1) to j).exists(x => starts(x - 1)))
        val kept = ws.zip(covered).filter(!_._2).map(_._1).mkString(" ")
        (i.toLong, n.toLong, covered.count(identity).toLong, md5hex(kept))
      }.toSet
      assert(got == want, s"k=$k docs=$docs")
    }
  }

  test("pqReconstruct == brute-force subspace argmin encode/decode") {
    import spark.implicits._
    val f = Gen.chooseNum(-100, 100).map(_ / 16.0f)
    val gen = for {
      dim <- Gen.oneOf(8, 16, 32)
      nSub <- Gen.oneOf(2, 4)
      nCode <- Gen.chooseNum(2, 6)
      vecs <- Gen.listOfN(20, Gen.listOfN(dim, f))
      codes <- Gen.listOfN(nCode, Gen.listOfN(dim, f))
    } yield (dim, nSub, vecs.map(_.toArray), codes.map(_.toArray))
    forAll(gen, n = 8) { case (dim, nSub, vecs, codes) =>
      val codebook = codes.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toArray
      val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "vec")
        .select(col("id"), graft.functions.Similarity
          .pqReconstruct(col("vec"), codebook, nSub).as("rv"))
        .orderBy("id").collect().map(_.getSeq[Double](1).toArray)
      val w = dim / nSub
      val want = vecs.map { v =>
        (0 until nSub).flatMap { s =>
          val sub = v.slice(s * w, s * w + w)
          val best = codebook.minBy { case (k, cv) =>
            val c = cv.slice(s * w, s * w + w)
            var acc = 0.0
            var j = 0
            while (j < w) {
              val d = sub(j).toDouble - c(j).toDouble
              acc += d * d; j += 1
            }
            (acc, k)
          }
          // the native fold emits the codeword widened to double (exact)
          best._2.slice(s * w, s * w + w).map(_.toDouble).toSeq
        }.toArray
      }
      got.zip(want).foreach { case (g, e) =>
        assert(g.sameElements(e), s"dim=$dim nSub=$nSub")
      }
    }
  }

  test("incrementalMinhashPairs == full self-join restricted to new×index") {
    import spark.implicits._
    // small vocab → real shingle collisions → real near-dup pairs
    val word = Gen.oneOf("data", "spark", "row", "join", "sort", "key")
    val doc = Gen.chooseNum(5, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val gen = for {
      nOld <- Gen.chooseNum(4, 10)
      nNew <- Gen.chooseNum(2, 6)
      texts <- Gen.listOfN(nOld + nNew, doc)
    } yield (nOld, texts)
    forAll(gen, n = 6) { case (nOld, texts) =>
      val all = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val old = all.filter(col("doc_id") < nOld)
      val neu = all.filter(col("doc_id") >= nOld)
      val got = graft.operators.Dedup
        .incrementalMinhashPairs(neu, old, "doc_id", "text")
        .select("new_id", "index_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // reference: the full-corpus self-join, keeping only pairs that
      // cross the new/index boundary (id1 < id2 and ids split at nOld)
      val want = graft.operators.Dedup
        .minhashLshPairs(all, "doc_id", "text")
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a < nOld && b >= nOld }
        .map { case (a, b) => (b, a) }.toSet
      assert(got == want, s"nOld=$nOld texts=$texts")
      graft.Caches.drain()
    }
  }

  test("ZOrder.interleave == reference Morton code on random ranks/dims/bits") {
    import spark.implicits._
    def morton(ranks: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- ranks.indices; b <- 0 until bits)
        z |= (((ranks(i) >>> b) & 1L) << (b * ranks.length + i))
      z
    }
    val gen = for {
      nDims <- Gen.chooseNum(1, 4)
      bits <- Gen.chooseNum(1, 63 / nDims)
      rows <- Gen.listOfN(40, Gen.listOfN(nDims,
        Gen.chooseNum(0L, (1L << bits) - 1)))
    } yield (nDims, bits, rows)
    forAll(gen) { case (nDims, bits, rows) =>
      val df = rows.map(r => Tuple1(r)).toDF("ranks")
      val cols = (0 until nDims).map(i => col("ranks").getItem(i))
      val got = df.select(graft.operators.ZOrder.interleave(cols, bits).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val want = rows.map(r => morton(r, bits))
      assert(got == want, s"nDims=$nDims bits=$bits")
      // monotone prefix property: equal high rank bits ⇒ equal high z bits
      // (the locality the curve exists for) — spot-check via sort order of
      // single-dim inputs degenerating to the identity
      if (nDims == 1)
        assert(got == rows.map(_.head), "1-dim z-order must be the rank")
    }
  }

  test("connectedComponents reliable-checkpoint mode == localCheckpoint mode") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    // chain + triangle + isolated pair: exercises multi-round convergence
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("id1", "id2")
    val local = graft.operators.Dedup
      .connectedComponents(edges, "id1", "id2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = graft.operators.Dedup
      .connectedComponents(edges, "id1", "id2", checkpointDir = Some(ckpt))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == reliable)
    assert(reliable(5L) == 1L && reliable(12L) == 10L && reliable(21L) == 20L)
    // reliable mode actually wrote checkpoint data to the DFS dir
    def count(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(count).sum else 1
    assert(count(new java.io.File(ckpt)) > 0, "no reliable checkpoint files written")
  }

  test("DedupIndex: build+appends with a compact ANYWHERE in the lifecycle " +
    "probes identically to one build over the union (random slicing/buckets)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val gen = for {
      nSlices <- Gen.choose(2, 5)
      buckets <- Gen.oneOf(2, 4, 8)
      compactAfter <- Gen.choose(0, nSlices - 1) // slice index to compact after
      doubleCompact <- Gen.oneOf(true, false)
    } yield (nSlices, buckets, compactAfter, doubleCompact)
    val spec0 = operators.DedupIndex.Spec(numHashes = 16, bands = 4, buckets = 4)
    val refIdx = java.nio.file.Files
      .createTempDirectory("graft_prop_ref").toString
    operators.DedupIndex.build(corpus, "doc_id", "text", spec0, refIdx)
    val ref = operators.DedupIndex
      .probePairs(spark, refIdx, batch, "doc_id", "text", minEst = 0.5)
      .orderBy("new_id", "index_id").collect().toSeq
    assert(ref.nonEmpty)
    forAll(gen, n = 5) { case (nSlices, buckets, compactAfter, doubleCompact) =>
      val idx = java.nio.file.Files
        .createTempDirectory("graft_prop_cmp").toString
      def slice(i: Int) =
        corpus.filter(pmod(expr("doc_id div 10"), lit(nSlices)) === i)
      operators.DedupIndex.build(slice(0), "doc_id", "text",
        spec0.copy(buckets = buckets), idx)
      (1 until nSlices).foreach { i =>
        operators.DedupIndex.append(slice(i), "doc_id", "text", idx)
        if (i == compactAfter) operators.DedupIndex.compact(spark, idx)
      }
      if (compactAfter == 0 || doubleCompact)
        operators.DedupIndex.compact(spark, idx)
      val got = operators.DedupIndex
        .probePairs(spark, idx, batch, "doc_id", "text", minEst = 0.5)
        .orderBy("new_id", "index_id").collect().toSeq
      assert(got == ref,
        s"nSlices=$nSlices buckets=$buckets compactAfter=$compactAfter " +
          s"doubleCompact=$doubleCompact: ${got.size} vs ${ref.size} pairs")
    }
  }

  test("DedupIndex: random append/compact/REMOVE histories probe like a " +
    "build over the surviving docs; every flip's retained snapshot " +
    "time-travels exactly until expired") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
    val spec0 = operators.DedupIndex.Spec(numHashes = 16, bands = 4, buckets = 4)
    val gen = for {
      nSlices <- Gen.choose(2, 4)
      buckets <- Gen.oneOf(2, 4, 8)
      removeSlice <- Gen.choose(0, nSlices - 1) // whose ids get removed
      compactFirst <- Gen.oneOf(true, false) // compact before the remove?
    } yield (nSlices, buckets, removeSlice, compactFirst)
    forAll(gen, n = 4) { case (nSlices, buckets, removeSlice, compactFirst) =>
      val idx = java.nio.file.Files
        .createTempDirectory("graft_prop_rm").toString
      def slice(i: Int) =
        corpus.filter(pmod(expr("doc_id div 10"), lit(nSlices)) === i)
      operators.DedupIndex.build(slice(0), "doc_id", "text",
        spec0.copy(buckets = buckets), idx)
      (1 until nSlices).foreach(i =>
        operators.DedupIndex.append(slice(i), "doc_id", "text", idx))
      if (compactFirst) operators.DedupIndex.compact(spark, idx)
      def probe() = operators.DedupIndex
        .probePairs(spark, idx, batch, "doc_id", "text", minEst = 0.5)
        .orderBy("new_id", "index_id").collect().toSeq
      // snapshot the live state, then REMOVE one slice's ids
      val preRemove = probe()
      val genBefore = operators.DedupIndex.liveGeneration(spark, idx)
      operators.DedupIndex.remove(spark, idx,
        slice(removeSlice).select("doc_id"), "doc_id")
      // live surface == one build over the survivors
      val refIdx = java.nio.file.Files
        .createTempDirectory("graft_prop_rm_ref").toString
      operators.DedupIndex.build(
        corpus.filter(pmod(expr("doc_id div 10"), lit(nSlices)) =!= removeSlice),
        "doc_id", "text", spec0.copy(buckets = buckets), refIdx)
      val want = operators.DedupIndex
        .probePairs(spark, refIdx, batch, "doc_id", "text", minEst = 0.5)
        .orderBy("new_id", "index_id").collect().toSeq
      assert(probe() == want,
        s"nSlices=$nSlices buckets=$buckets removeSlice=$removeSlice " +
          s"compactFirst=$compactFirst: live probe diverges from a " +
          "build over the survivors")
      // the flip retained the pre-remove generation: time-travel
      // reproduces the pre-remove probe exactly...
      val snap = operators.DedupIndex
        .probePairsAt(spark, idx, genBefore, batch, "doc_id", "text",
          minEst = 0.5)
        .orderBy("new_id", "index_id").collect().toSeq
      assert(snap == preRemove, "retained snapshot diverges from the " +
        "pre-remove probe")
      // ...until expiry reclaims it, loudly
      operators.DedupIndex.expireGenerations(spark, idx)
      intercept[IllegalArgumentException] {
        operators.DedupIndex.probePairsAt(spark, idx, genBefore, batch,
          "doc_id", "text", minEst = 0.5)
      }
      ()
    }
  }
}
