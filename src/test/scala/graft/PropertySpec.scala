package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.pipeline.{IncrementalFilter, Upsert}

/** Property-based invariants (SURVEY §5.3), using plain ScalaCheck
  * generators with fixed seeds (the scalatest-scalacheck bridge is not
  * in the offline dependency cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0, 8), Gen.alphaLowerStr.map(_.take(4))))

  private def samples(n: Int): Seq[(List[(Int, String)], List[(Int, String)])] =
    (0 until n).map { i =>
      val s1 = rowsGen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val s2 = rowsGen.apply(Gen.Parameters.default, Seed(1000L + i)).getOrElse(Nil)
      (s1, s2)
    }

  test("upsert idempotence: upsert(upsert(s,u),u) == upsert(s,u)") {
    samples(8).foreach { case (b, u) =>
      val base = b.toDF("id", "s").dropDuplicates("id")
      val ups = u.toDF("id", "s").dropDuplicates("id")
      val once = Upsert(base, ups, Seq("id"))
      val twice = Upsert(once, ups, Seq("id"))
      assert(once.orderBy("id", "s").collect().toSeq ==
        twice.orderBy("id", "s").collect().toSeq)
    }
  }

  test("upsert result PKs = base PKs union update PKs") {
    samples(8).foreach { case (b, u) =>
      val base = b.toDF("id", "s").dropDuplicates("id")
      val ups = u.toDF("id", "s").dropDuplicates("id")
      val got = Upsert(base, ups, Seq("id")).select("id").as[Int].collect().toSet
      assert(got == (b.map(_._1).toSet ++ u.map(_._1).toSet))
    }
  }

  test("incremental filter output ⊆ candidates and is disjoint from recent keys") {
    samples(8).foreach { case (c, r) =>
      val cand = c.map(_._2).toDF("k")
      val recent = r.map(_._2).toDF("k")
      val out = IncrementalFilter(cand, recent, "k", "k").as[String].collect().toSet
      assert(out.subsetOf(c.map(_._2).toSet))
      assert(out.map(_.toLowerCase).intersect(r.map(_._2.toLowerCase).toSet).isEmpty)
    }
  }

  test("BPE merge fold equals the index-based greedy reference on random segmentations") {
    import org.apache.spark.sql.functions._
    // Reference: scan positions left to right, merge (lhs, rhs) at i
    // when syms(i)=lhs, syms(i+1)=rhs and syms(i) wasn't consumed by
    // the previous merge — textbook greedy non-overlapping BPE.
    def greedyRef(syms: List[String], lhs: String, rhs: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
          out += (lhs + rhs); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    // small symbol alphabet forces runs (the lhs==rhs overlap regime)
    // and multi-char symbols (post-merge vocabulary shapes)
    val symGen = Gen.oneOf("a", "b", "ab", "ba", "aa")
    val wordGen = Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, symGen))
    val caseGen = Gen.zip(Gen.listOfN(25, wordGen), symGen, symGen)
    (0 until 6).foreach { s =>
      val (words, lhs, rhs) = caseGen.apply(Gen.Parameters.default, Seed(4200L + s))
        .getOrElse((Nil, "a", "b"))
      val got = words.map(_.mkString(",")).toDF("seg")
        .select(graft.operators.TextAnalysisQueries
          .applyMerge(split(col("seg"), ","), lit(lhs), lit(rhs)).as("m"))
        .as[String].collect().toList
      val want = words.map(w => greedyRef(w, lhs, rhs).mkString(","))
      assert(got == want, s"seed=$s lhs=$lhs rhs=$rhs")
    }
  }

  test("t=1/2 prefix-filtered truth equals brute-force all-pairs Jaccard >= 0.5") {
    import org.apache.spark.sql.functions._
    // random gram-set corpora over a SMALL vocab (forces mid-similarity
    // overlap, the regime the lossless-prefix proof must cover)
    val corpusGen: Gen[List[(Long, List[String])]] =
      Gen.listOfN(40, Gen.choose(2, 12).flatMap(k =>
        Gen.listOfN(k, Gen.choose(0, 19).map(i => s"g$i"))))
        .map(_.zipWithIndex.map { case (gs, i) => (i.toLong, gs.distinct) })
    var totalPairs = 0
    (0 until 6).foreach { i =>
      val corpus = corpusGen.apply(Gen.Parameters.default, Seed(7000L + i)).getOrElse(Nil)
      val shArr = corpus.toDF("doc_id", "sh_arr")
      val prefix = graft.operators.DedupQueries.halfJaccardPrefix(shArr).cache()
      val got = graft.operators.DedupQueries.halfJaccardTruth(prefix, shArr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // independent brute force in plain Scala
      val want = (for {
        (a, ga) <- corpus; (b, gb) <- corpus if a < b
        c = ga.toSet.intersect(gb.toSet).size
        if 3 * c >= ga.size + gb.size
      } yield (a, b, (10 * c) / (ga.size + gb.size - c))).toSet
      prefix.unpersist()
      assert(got == want, s"seed ${7000 + i}: prefix truth diverged from brute force")
      totalPairs += want.size
    }
    // the generator must actually exercise the filter (no vacuous pass)
    assert(totalPairs > 0, "no qualifying pairs across any seed — generator too sparse")
  }

  /** Independent reference: union-find with min-id representatives. */
  private def unionFindMin(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def ccCheck(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("doc_a", "doc_b").cache()
    // default threshold -> driver-local union-find path
    val local = graft.operators.DedupQueries.connectedComponents(spark, df)
      .as[(Long, Long)].collect().toMap
    // threshold 0 -> forced distributed min-label-propagation path
    val dist = graft.operators.DedupQueries
      .connectedComponents(spark, df, localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    df.unpersist()
    assert(local == unionFindMin(edges), s"local path, edges=$edges")
    assert(dist == unionFindMin(edges), s"distributed path, edges=$edges")
  }

  test("connected components match union-find on random graphs") {
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L))).map(_.filter(e => e._1 != e._2))
    (0 until 3).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(7000L + i)).getOrElse(Nil)
      if (edges.nonEmpty) ccCheck(edges)
    }
  }

  test("distributed components are loop-checkpoint-dial invariant (reliable vs local)") {
    // Same certification as GraphSpec's pagerank dial test, for the
    // label-propagation loop: GRAFT_LOOP_CHECKPOINT=reliable swaps
    // per-round localCheckpoint (no recompute path) for reliable
    // checkpoint files without changing a single label.
    import spark.implicits._
    val edges = ((0L until 30L).map(i => (i, i + 1)) ++ // path: depth stress
      Seq((100L, 101L), (101L, 102L), (200L, 201L))).toDF("doc_a", "doc_b").cache()
    def runWith(mode: Option[String]): Map[Long, Long] = {
      mode.foreach(sys.props("graft.loop.checkpoint") = _)
      try graft.operators.DedupQueries
        .connectedComponents(spark, edges, localThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      finally sys.props.remove("graft.loop.checkpoint")
    }
    // serialized with GraphSpec's dial test: the dial is a JVM-global
    // sysprop and suites run concurrently — one test's cleanup must
    // not flip the other's loop back to local mid-run
    val (default, reliable) = graft.operators.LoopState.synchronized {
      (runWith(None), runWith(Some("reliable")))
    }
    edges.unpersist()
    assert(default.nonEmpty)
    assert(reliable == default,
      "reliable-checkpoint components differ from the local-checkpoint loop's")
  }

  test("distributed components resume from the last committed round after a driver crash") {
    // pagerank's LoopResume recovery, proven for the label-propagation
    // loop: min-label propagation is monotone, so any committed labels
    // state is a valid restart point — a run crashed by round budget
    // after 2 committed compress rounds resumes to the same labels as
    // an uninterrupted reference, and a wrong edge-set tag refuses.
    import spark.implicits._
    val edges = ((0L until 30L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (200L, 201L))).toDF("doc_a", "doc_b").cache()
    val resume = java.nio.file.Files
      .createTempDirectory("graft-cc-resume").toString
    val ref = graft.operators.DedupQueries
      .connectedComponents(spark, edges, localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    intercept[IllegalArgumentException] {
      graft.operators.DedupQueries.connectedComponents(spark, edges,
        localThreshold = 0L, maxRounds = 2,
        resumeDir = Some(resume), resumeTag = "path30")
    }
    // atomicity: a crash BETWEEN the staging write and the rename
    // leaves only a _tmp_round_* dir — resume must ignore it and
    // continue from the newest RENAMED round, never read staged state
    val staleTmp = java.nio.file.Paths.get(resume, "_tmp_round_9")
    java.nio.file.Files.createDirectory(staleTmp)
    java.nio.file.Files.write(staleTmp.resolve("garbage.txt"),
      "not a committed round".getBytes("UTF-8"))
    val resumed = graft.operators.DedupQueries.connectedComponents(spark, edges,
        localThreshold = 0L, resumeDir = Some(resume), resumeTag = "path30")
      .as[(Long, Long)].collect().toMap
    assert(resumed == ref,
      "resumed labels differ from the uninterrupted run's")
    val tagErr = intercept[IllegalArgumentException] {
      graft.operators.DedupQueries.connectedComponents(spark, edges,
        localThreshold = 0L, resumeDir = Some(resume), resumeTag = "other-graph")
    }
    assert(tagErr.getMessage.contains("different source"), tagErr.getMessage)
    edges.unpersist()
  }

  test("connected components refuse a resume dir without an edge-set tag") {
    // r14 advisor: resumeTag defaulted to "" — srcHash("") matches
    // every other untagged loop, so two different edge sets sharing a
    // resume dir would silently resume each other's labels, defeating
    // the exact mismatch guard LoopResume exists for. The refusal
    // fires before any Spark work.
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-notag").toString
    val err = intercept[IllegalArgumentException] {
      graft.operators.DedupQueries.connectedComponents(
        spark, edges, resumeDir = Some(dir))
    }
    assert(err.getMessage.contains("resumeTag"), err.getMessage)
  }

  test("connected components handle a path graph (pointer-halving depth stress)") {
    // diameter 49 (reversed chain + duplicate edges): plain
    // min-propagation would need 49 rounds — more than the loop's
    // 20-round budget; pointer halving must converge in O(log d)
    ccCheck((0L until 49L).map(i => (i + 1, i)) ++ Seq((10L, 11L), (3L, 4L)))
  }

  test("max_multiplicity equals the count-per-distinct max on random arrays") {
    import org.apache.spark.sql.functions._
    import graft.functions.MaxMultiplicity.max_multiplicity
    // small alphabet forces collisions; include empty and null elements
    val arrGen: Gen[List[String]] =
      Gen.listOfN(20, Gen.oneOf("a", "b", "c", "d", "", null: String))
    val arrays = (0 until 6).map(i =>
      arrGen.apply(Gen.Parameters.default, Seed(4000L + i)).getOrElse(Nil))
    val df = arrays.toDF("arr")
    val fused = df.select(max_multiplicity(col("arr"))).as[Long].collect().toSeq
    val want = arrays.map(a =>
      a.filter(_ != null).groupBy(identity).values.map(_.size.toLong)
        .foldLeft(0L)(math.max))
    assert(fused == want)
  }

  test("sliding_min equals the per-position slice minimum on random hash arrays") {
    import org.apache.spark.sql.functions._
    val arrGen: Gen[List[String]] =
      Gen.listOfN(15, Gen.choose(0, 9999).map(n => f"$n%04d"))
    val arrays = (0 until 6).map(i =>
      arrGen.apply(Gen.Parameters.default, Seed(5000L + i)).getOrElse(Nil))
    val df = arrays.toDF("arr")
    val fused = df.select(graft.functions.SlidingMin.sliding_min(col("arr"), 5))
      .as[Seq[String]].collect().toSeq
    val want = arrays.map(a => a.indices.map(i => a.slice(i, i + 5).min))
    assert(fused.map(_.toList) == want.map(_.toList))
  }

  test("rank is within [1, partition size] and starts at 1") {
    val rk = graft.operators.OperatorCatalog.rankWindow(spark, sf0001)
    import org.apache.spark.sql.functions._
    val bad = rk.groupBy("c_mktsegment")
      .agg(max("rk").as("max_rk"), count(lit(1)).as("n"), min("rk").as("min_rk"))
      .filter(col("max_rk") > col("n") || col("min_rk") =!= 1)
    assert(bad.count() == 0)
  }

  test("distributed prefix sum == plain window on random partitions/ids/values") {
    import graft.pipeline.PrefixSum
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // random (partition, unique id, value) triples; duplicate ids per
    // partition are discarded (PrefixSum's documented precondition)
    val tripleGen: Gen[List[(Int, Long, Long)]] =
      Gen.listOfN(200, Gen.zip(
        Gen.choose(0, 3), Gen.choose(0L, 5000L), Gen.choose(-50L, 50L)))
    (0 until 6).foreach { i =>
      val rows = tripleGen.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil)
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val df = rows.toDF("p", "id", "v")
      val levels = 1 + i % 3
      val got = PrefixSum.exclusiveOffsets(df, Seq("p"), "id", "v", "got",
        levels = levels, k = 5)
      val want = df.withColumn("want", coalesce(
        sum(col("v")).over(Window.partitionBy(col("p")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val joined = got.join(want, Seq("p", "id", "v"))
      assert(joined.count() == rows.size, s"seed ${42 + i}: lost rows")
      assert(joined.filter(col("got") =!= col("want")).count() == 0,
        s"seed ${42 + i}, levels=$levels: diverged")
    }
  }

  test("q_split stability: monotone-id appends never move an existing doc's split") {
    // Pins the NOTES_r5 claim "late-arriving cluster members are
    // stable". It holds under two preconditions, asserted here:
    //   1. ingest ids are MONOTONE — every appended doc_id is larger
    //      than every existing one, so the min-doc_id group label of
    //      any existing class/cluster cannot shrink;
    //   2. an appended doc joins at most ONE existing cluster — a doc
    //      near-dup to two previously-separate clusters legitimately
    //      merges them and relabels the larger-min one (that is a
    //      semantic merge, not an instability).
    // Appends here are exact copies of one existing doc (join exactly
    // that doc's class) or fresh-vocabulary singletons (join nothing).
    import org.apache.spark.sql.functions.{col, length, lit}
    val vocabGen = Gen.choose(0, 9).map(i => ('a' + i).toChar.toString)
    val textGen = Gen.listOfN(5, vocabGen).map(_.mkString(" "))
    def writeDir(rows: Seq[(Long, String)]): String = {
      val out = java.nio.file.Files.createTempDirectory("split_stab").toString
      rows.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
        .withColumn("lang", lit("xx"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      out
    }
    (0 until 3).foreach { trial =>
      val texts = Gen.listOfN(12, textGen)
        .apply(Gen.Parameters.default, Seed(9000L + trial)).getOrElse(Nil)
      // 12 random 5-token docs over a 10-token vocab (dense enough to
      // form real near-dup clusters), plus an empty-text exact class
      val base = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) } ++
        Seq((13L, ""), (14L, ""))
      val copyIdx = Gen.listOfN(3, Gen.choose(0, base.size - 1))
        .apply(Gen.Parameters.default, Seed(9100L + trial)).getOrElse(Nil)
      val appended = copyIdx.zipWithIndex.map { case (ci, j) =>
        ((100 + j).toLong, base(ci)._2)
      } ++ Seq((200L, s"z$trial zz$trial zzz$trial zzzz$trial zzzzz$trial"),
        (201L, ""))
      val before = graft.operators.CurationQueries
        .leakSafeSplit(spark, writeDir(base))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      val after = graft.operators.CurationQueries
        .leakSafeSplit(spark, writeDir(base ++ appended))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      before.foreach { case (id, sp) =>
        assert(after(id) == sp,
          s"trial=$trial: doc $id moved $sp -> ${after(id)} after append")
      }
    }
  }

  test("dup_spans invariants: bounds, clean/report consistency, growth monotonicity") {
    import org.apache.spark.sql.functions._
    def writeDir(rows: Seq[(Long, String)]): String = {
      val out = java.nio.file.Files.createTempDirectory("spans_prop").toString
      rows.toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
        .withColumn("lang", lit("xx"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      out
    }
    val textGen: Gen[String] =
      Gen.choose(3, 14).flatMap(k =>
        Gen.listOfN(k, Gen.choose(0, 7).map(i => s"w$i")).map(_.mkString(" ")))
    (0 until 3).foreach { trial =>
      val texts = Gen.listOfN(10, textGen)
        .apply(Gen.Parameters.default, Seed(9500L + trial)).getOrElse(Nil)
      val base = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val dir = writeDir(base)
      val rep = graft.operators.DedupQueries.dupSpans(spark, dir)
        .select("doc_id", "n_tokens", "n_dup_regions", "dup_tokens")
        .as[(Long, Long, Long, Long)].collect()
      // bounds: regions and coverage never exceed the doc
      rep.foreach { case (id, n, r, d) =>
        assert(d <= n && r <= d, s"trial=$trial doc=$id n=$n r=$r d=$d")
        assert((r == 0) == (d == 0))
      }
      // clean/report consistency: n_removed matches dup_tokens, the
      // cleaned text has exactly n_kept tokens
      val clean = graft.operators.DedupQueries.dupSpansClean(spark, dir)
        .select("doc_id", "clean_text", "n_removed", "n_kept")
        .as[(Long, String, Long, Long)].collect()
        .map { case (id, t, r, k) => (id, (t, r, k)) }.toMap
      val repM = rep.map { case (id, _, _, d) => (id, d) }.toMap
      clean.foreach { case (id, (txt, removed, kept)) =>
        assert(removed == repM(id))
        val nTok = if (txt.isEmpty) 0 else txt.split(" ").length
        assert(nTok.toLong == kept, s"trial=$trial doc=$id '$txt' kept=$kept")
      }
      // monotonicity: appending a copy of an existing doc never
      // SHRINKS any original doc's duplicated coverage
      val bigger = base ++ Seq((100L, base(trial % base.size)._2))
      val after = graft.operators.DedupQueries.dupSpans(spark, writeDir(bigger))
        .select("doc_id", "dup_tokens").as[(Long, Long)].collect().toMap
      repM.foreach { case (id, d) =>
        assert(after(id) >= d, s"trial=$trial doc=$id ${after(id)} < $d")
      }
    }
  }

  test("exclusiveRunningMax equals the plain window on random sparse inputs at every depth") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gen: Gen[List[(Long, Long)]] = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 5000L), Gen.choose(-50L, 50L)))
    (0 until 6).foreach { i =>
      val rows = gen.apply(Gen.Parameters.default, Seed(77L + i)).getOrElse(Nil)
        .distinctBy(_._1) // ids unique (the contract)
      val df = rows.toDF("id", "v")
      val want = df.withColumn("want",
        max(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      for (levels <- 1 to 3) {
        val got = graft.pipeline.PrefixSum
          .exclusiveRunningMax(df, Nil, "id", "v", "got", levels = levels, k = 5)
        val j = got.join(want, Seq("id", "v"))
        assert(j.count() == rows.size, s"trial=$i levels=$levels lost rows")
        assert(j.filter((col("got").isNull =!= col("want").isNull) ||
          (col("got").isNotNull && col("got") =!= col("want"))).count() == 0,
          s"trial=$i levels=$levels diverged")
      }
    }
  }

  // ===== round-11 additions: CDC collapse and triangle counting =====

  private val logGen: Gen[List[(Long, Long, Long, String, Double)]] =
    Gen.listOfN(30, Gen.zip(
      Gen.choose(0L, 5L),               // user_id: few keys => many versions
      Gen.choose(0L, 9L),               // sec: coarse => same-ts ties happen
      Gen.oneOf("view", "click", "purchase", "error"),
      Gen.choose(0, 99)))
      .map(_.zipWithIndex.map { case ((u, t, op, v), i) =>
        (i.toLong, t, u, op, v / 10.0)  // event_id = position, unique
      })

  test("cdc collapse equals the sequential replay reference on random logs") {
    (0 until 8).foreach { i =>
      val log = logGen.apply(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil)
      val df = log.toDF("event_id", "sec", "user_id", "event_type", "value")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_seconds(sec)"))
      val got = graft.operators.PipelineQueries.cdcMergeOf(df)
        .select("user_id", "last_op", "last_value")
        .as[(Long, String, Double)].collect().toSet
      // reference: replay the log in (ts, event_id) order, keep the
      // last entry per key, drop keys whose last entry is a tombstone
      val want = log.groupBy(_._3).flatMap { case (u, vs) =>
        val last = vs.maxBy(r => (r._2, r._1))
        if (last._4 == "error") None else Some((u, last._4, last._5))
      }.toSet
      assert(got === want, s"seed ${42 + i}")
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
        .distinct)

  test("triangle count equals brute-force triple enumeration on random graphs") {
    (0 until 8).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil)
      if (edges.nonEmpty) {
        val df = edges.toDF("u", "v")
        val got = graft.operators.GraphQueries.trianglesOf(spark, df).collect().head
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val want = (for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield 1).size.toLong
        assert(got.getLong(0) === nodes.size.toLong, s"nodes, seed ${7 + i}")
        assert(got.getLong(1) === edges.size.toLong, s"edges, seed ${7 + i}")
        assert(got.getLong(2) === want, s"triangles, seed ${7 + i}")
      }
    }
  }
}
