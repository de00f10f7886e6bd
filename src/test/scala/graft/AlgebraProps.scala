package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Property-based algebraic laws (SURVEY §5 item 3) over generated
  * datasets at varying partition counts — the invariants 100 TB execution
  * depends on (partial aggregation, shuffle invariance, dedup stability).
  */
object AlgebraProps extends Properties("algebra") {

  // Spark jobs per case are milliseconds-cheap but not free; 10 diverse
  // cases per law is the budget.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark

  private val row: Gen[(Int, Int, String)] = for {
    a <- Gen.chooseNum(-50, 50)
    b <- Gen.chooseNum(0, 5)
    s <- Gen.oneOf("x", "y", "z")
  } yield (a, b, s)
  private val rows: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(40, row).flatMap(l => Gen.choose(0, 40).map(l.take))
  private val parts: Gen[Int] = Gen.choose(1, 7)

  private def df(xs: List[(Int, Int, String)], n: Int) = {
    import spark.implicits._
    spark.createDataset(xs).toDF("a", "b", "s").repartition(n)
  }

  private def bag(d: org.apache.spark.sql.DataFrame): Map[String, Int] =
    d.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  property("filter commutes with projection over disjoint columns") =
    forAll(rows, parts) { (xs, n) =>
      val base = df(xs, n)
      bag(base.filter(col("a") > 0).select("b", "s")) ==
        bag(base.select(col("a"), col("b"), col("s"))
          .filter(col("a") > 0).select("b", "s"))
    }

  property("unionAll counts are additive") = forAll(rows, rows, parts) {
    (xs, ys, n) =>
      df(xs, n).unionAll(df(ys, n)).count() == xs.length + ys.length
  }

  property("left_semi equals inner-join-then-distinct-left") =
    forAll(rows, rows, parts) { (xs, ys, n) =>
      val (l, r) = (df(xs, n), df(ys, n).select(col("b").as("rb")))
      val semi = l.join(r, l("b") === r("rb"), "left_semi")
      val viaInner = l.join(r.distinct(), l("b") === r("rb"), "inner")
        .select(l("a"), l("b"), l("s"))
      bag(semi) == bag(viaInner)
    }

  property("row_number is a 1..n permutation within every partition key") =
    forAll(rows, parts) { (xs, n) =>
      val w = Window.partitionBy("s").orderBy("a", "b")
      val rns = df(xs, n).withColumn("rn", row_number().over(w))
        .groupBy("s").agg(collect_list("rn").as("rns"))
        .collect().map(_.getSeq[Int](1).sorted)
      rns.forall(g => g == (1 to g.length))
    }

  property("dropDuplicates is idempotent and keeps one row per key") =
    forAll(rows, parts) { (xs, n) =>
      val once = df(xs, n).dropDuplicates("a", "b", "s")
      val twice = once.dropDuplicates("a", "b", "s")
      bag(once) == bag(twice) &&
        once.count() == xs.distinct.length
    }

  property("decimal-routed sum is partition-count invariant and exact") =
    forAll(rows) { xs =>
      // doubles with 2dp: decimal(38,6) accumulation is exact, so any
      // partitioning must give the identical double back.
      val vals = xs.map { case (a, b, _) => a + b / 100.0 }
      import spark.implicits._
      val sums = List(1, 3, 7).map { n =>
        spark.createDataset(vals).toDF("v").repartition(n)
          .agg(Canon.sumDec(col("v"))).collect()(0)
      }
      xs.isEmpty || (sums.distinct.length == 1 &&
        math.abs(sums.head.getDouble(0) -
          BigDecimal(vals.map(BigDecimal(_)).sum.toDouble).toDouble) < 1e-9)
    }

  property("intersect is contained in both inputs") =
    forAll(rows, rows, parts) { (xs, ys, n) =>
      val inter = df(xs, n).intersect(df(ys, n)).collect().map(_.toString).toSet
      inter.subsetOf(xs.map(t => s"[${t._1},${t._2},${t._3}]").toSet) &&
        inter.subsetOf(ys.map(t => s"[${t._1},${t._2},${t._3}]").toSet)
    }

  // ---- plan-rewrite equivalence laws: the scale-safe formulations the
  // engine ships (q24 prefix-count, q26 union+window) must agree with the
  // naive quadratic formulations they replaced, on arbitrary data. ----

  property("q24 rewrite: prefix-count of richer rows == theta-join count") =
    forAll(rows, parts) { (xs, n) =>
      // treat (a) as the balance, (index) as the unique key
      import spark.implicits._
      val sup = xs.zipWithIndex.map { case ((a, _, _), i) => (i.toLong, a) }
        .toDF("k", "bal").repartition(n)
      val naive = sup.alias("s1")
        .join(sup.alias("s2"), col("s2.bal") > col("s1.bal"), "left")
        .groupBy(col("s1.k").as("k"))
        .agg(count(col("s2.k")).as("n_richer"))
      // the SHIPPED implementation, with a tiny bucket count so the law
      // exercises bucket-boundary capping and cross-bucket carry
      val fast = graft.Engine.withCountGreater(sup, col("bal"), "n_richer",
        buckets = 3).select("k", "n_richer")
      bag(naive) == bag(fast)
    }

  property("q26 rewrite: union+running-last == join+row_number as-of") =
    forAll(Gen.listOfN(30, for {
      u <- Gen.chooseNum(0, 3) // few users -> dense per-user histories
      t <- Gen.chooseNum(0, 50)
      p <- Gen.oneOf(true, false)
    } yield (u, t, p)), parts) { (evs, n) =>
      import spark.implicits._
      val ev = evs.zipWithIndex.map { case ((u, t, p), i) =>
        (u.toLong, t.toLong, i.toLong, p)
      }.toDF("user_id", "ts", "event_id", "is_p").repartition(n)
      // naive: left join purchases to earlier-or-equal clicks, keep latest
      val p = ev.filter(col("is_p")).select(col("user_id").as("pu"),
        col("ts").as("p_ts"), col("event_id").as("p_id"))
      val c = ev.filter(!col("is_p")).select(col("user_id").as("cu"),
        col("ts").as("c_ts"), col("event_id").as("c_id"))
      val wj = Window.partitionBy(col("p_id"))
        .orderBy(col("c_ts").desc_nulls_last, col("c_id").desc_nulls_last)
      val naive = p.join(c,
          col("pu") === col("cu") && col("c_ts") <= col("p_ts"), "left")
        .withColumn("rn", row_number().over(wj)).filter(col("rn") === 1)
        .select(col("p_id"), col("c_id"), col("c_ts"))
      // shipped: THE production operator (the same code q26 runs)
      val fast = Engine.asOfMatch(ev, "user_id", "ts", "event_id",
          col("is_p"))
        .select(col("p_id"), col("c_id"), col("c_ts"))
      bag(naive) == bag(fast)
    }

  property("q91c rewrite: PPJoin filters are loss-free vs naive all-pairs") =
    forAll(
      Gen.listOfN(12, for {
        // tiny vocabulary + short docs -> dense near-dup structure, so the
        // prefix/length/positional filters and the threshold boundary all
        // get exercised (incl. exact-equality J == t pairs from dup docs).
        // Per-doc length draws INSIDE the generator (flatMap), so lengths
        // vary across docs within one case — .sample at construction time
        // froze one length for the whole run.
        len <- Gen.choose(2, 8)
        w <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield w.mkString(" ")),
      Gen.oneOf(40, 60, 75),
      // both shingle orders: n=2 (the operator's historical default) and
      // n=3 (what q91c now registers) — docs below n words carry no
      // shingles and drop from BOTH sides of the law identically.
      Gen.oneOf(2, 3)) { (texts, pct, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sv = sort_array(Engine.wordNgrams(split(col("text"), " "), n))
      val d = docs.withColumn("sv", sv).filter(size(col("sv")) >= 1)
      val a = d.select(col("doc_id").as("doc_a"), col("sv").as("sa"))
      val b = d.select(col("doc_id").as("doc_b"), col("sv").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb")))
      val uni = size(col("sa")) + size(col("sb")) - inter
      val naive = a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("jaccard", round(inter.cast("double") / uni, 6))
        .filter(inter * 100 >= uni * pct)
        .select("doc_a", "doc_b", "jaccard")
      // shipped: THE production operator (the same code q91c runs)
      val fast = Engine.jaccardJoin(docs, "doc_id", "text",
        thresholdPct = pct, ngramWords = n)
      bag(naive) == bag(fast)
    }

  property("q90d rewrite: bipartite PPJoin is loss-free vs naive cross-pairs") =
    forAll(
      Gen.listOfN(12, for {
        len <- Gen.choose(2, 8)
        w <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield w.mkString(" ")),
      Gen.oneOf(40, 60, 75)) { (texts, pct) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (newB, hist) = (docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 =!= 0))
      val sv = sort_array(Engine.wordNgrams(split(col("text"), " "), 2))
      def side(d: org.apache.spark.sql.DataFrame, idAs: String, svAs: String) =
        d.withColumn(svAs, sv).filter(size(col(svAs)) >= 1)
          .select(col("doc_id").as(idAs), col(svAs))
      val a = side(newB, "left_id", "sa")
      val b = side(hist, "right_id", "sb")
      val inter = size(array_intersect(col("sa"), col("sb")))
      val uni = size(col("sa")) + size(col("sb")) - inter
      val naive = a.crossJoin(b)
        .withColumn("jaccard", round(inter.cast("double") / uni, 6))
        .filter(inter * 100 >= uni * pct)
        .select("left_id", "right_id", "jaccard")
      // shipped: THE production operator (the same code q90d runs)
      val fast = Engine.jaccardJoinAcross(newB, hist, "doc_id", "text",
        thresholdPct = pct, ngramWords = 2)
      bag(naive) == bag(fast)
    }

  property("q90d banded rewrite: banded join admits NO false pair and never " +
      "misses an exact duplicate") =
    forAll(
      Gen.listOfN(12, for {
        len <- Gen.choose(2, 8)
        w <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd"))
      } yield w.mkString(" ")),
      Gen.oneOf(40, 60, 75)) { (texts, pct) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val (newB, hist) = (docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 =!= 0))
      def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val banded = pairs(Engine.minHashJoinAcross(newB, hist,
        "doc_id", "text", thresholdPct = pct, ngramWords = 2))
      val exact = pairs(Engine.jaccardJoinAcross(newB, hist,
        "doc_id", "text", thresholdPct = pct, ngramWords = 2))
      // (1) NO FALSE POSITIVES is a THEOREM (verification is exact), so
      // it must hold on EVERY corpus — unlike recall, which is
      // probabilistic for near-dups and only deterministic at J = 1
      val noFalse = banded.subsetOf(exact)
      // (2) an exact duplicate has an identical shingle set, hence an
      // identical signature, hence collides in EVERY band — recall of
      // J=1 cross-seam pairs is 1.0 deterministically
      val dupPairs = (for {
        (tl, l) <- texts.zipWithIndex if l % 3 == 0
        (tr, r) <- texts.zipWithIndex if r % 3 != 0 && tl == tr
      } yield (l.toLong, r.toLong)).toSet
      val dupsFound = dupPairs.subsetOf(banded.map(p => (p._1, p._2)))
      noFalse && dupsFound
    }

  property("packSequences conserves docs and tokens at any partitioning") =
    forAll(
      Gen.listOfN(30, for {
        sh <- Gen.oneOf("s0", "s1", "s2")
        nt <- Gen.chooseNum(1L, 40L)
      } yield (sh, nt)),
      Gen.oneOf(16, 64), parts) { (xs, cap, n) =>
      import spark.implicits._
      val docs = xs.zipWithIndex
        .map { case ((sh, nt), i) => (sh, i.toLong, nt) }
        .toDF("shard", "id", "nt").repartition(n)
      val packed = Engine.packSequences(docs, col("shard"), col("id"),
        col("nt"), capTokens = cap).collect()
      val docsOk = packed.map(_.getInt(2).toLong).sum == xs.length.toLong
      val toksOk = packed.map(_.getLong(3)).sum == xs.map(_._2).sum
      // a sequence never STARTS beyond the cumulative shard total: every
      // seq_id is floor(start/cap) for a start < the shard's token total
      val shardTotal = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      val seqOk = packed.forall { r =>
        val sid = r.getInt(1)
        sid >= 0 && sid <= (shardTotal(r.getString(0)) - 1) / cap
      }
      docsOk && toksOk && seqOk
    }

  property("slotSpine: chunked two-level spine == one-shot sequence spine") =
    forAll(for {
      lo <- Gen.chooseNum(0L, 500000L)
      span <- Gen.chooseNum(0L, 4L * 86400L) // up to 4 days -> >1 chunk
      slot <- Gen.oneOf(1L, 7L, 60L, 900L, 3600L, 86400L) // incl. non-divisors
      chunk <- Gen.oneOf(3600L, 86400L)
      if chunk >= slot
    } yield (lo, lo + span, slot, chunk)) { case (lo, hi, slot, chunk) =>
      import spark.implicits._
      val bounds = Seq((lo, hi)).toDF("l", "h")
        .select(timestamp_seconds(col("l")).as("lo"),
          timestamp_seconds(col("h")).as("hi"))
      val naive = bounds.select(explode(sequence(col("lo"), col("hi"),
          expr(s"INTERVAL $slot SECONDS"))).as("wstart"))
        .collect().map(_.getTimestamp(0).getTime).toSeq.sorted
      val chunked = Engine.slotSpine(bounds, slot, chunkSeconds = chunk)
        .collect().map(_.getTimestamp(0).getTime).toSeq.sorted
      chunked == naive
    }

  property("applyDedup keeps exactly the cluster minima plus all singletons") =
    forAll(
      Gen.listOf(for {
        a <- Gen.chooseNum(0L, 9L); b <- Gen.chooseNum(0L, 9L)
        if a != b
      } yield (math.min(a, b), math.max(a, b))).map(_.distinct),
      parts) { (edges, n) =>
      import spark.implicits._
      val ids = (0L to 14L).toList // ids 10-14 never appear in a pair
      val docs = ids.map(i => (i, s"d$i")).toDF("doc_id", "payload")
        .repartition(n)
      // model: union-find over the same edges
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ids.filter(i => find(i) == i).toSet
      val kept =
        if (edges.isEmpty) ids.toSet // no pairs -> everything survives
        else Engine.applyDedup(docs, "doc_id", edges.toDF("doc_a", "doc_b"))
          .collect().map(_.getLong(0)).toSet
      kept == expect
    }

  property("dedupChunks conserves chunks: distinct survive once, totals add up") =
    forAll(
      Gen.listOfN(12, Gen.choose(1, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))),
      parts) { (texts, n) =>
      import spark.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text").repartition(n)
      val out = Engine.dedupChunks(docs, "doc_id", "text", chunkWords = 2)
        .collect()
      val allChunks = texts.flatMap { t =>
        t.split(" ").grouped(2).map(_.mkString(" ")).toList
      }
      val keptOk = out.map(_.getInt(2).toLong).sum ==
        allChunks.distinct.length.toLong
      val totalOk = out.map(_.getInt(1).toLong).sum ==
        allChunks.length.toLong
      keptOk && totalOk
    }

  /** Driver-side reference for [[Engine.dupSpans]]: duplicated-gram
    * positions merged into maximal islands with gap ≤ n. */
  private def refSpans(docs: List[(Long, String)],
      n: Int): Set[(Long, Int, Int, Int)] = {
    val grams = docs.flatMap { case (id, text) =>
      val w = text.split(" ").toList
      if (w.size >= n)
        w.sliding(n).zipWithIndex
          .map { case (g, p) => (id, p + 1, g.mkString(" ")) }.toList
      else Nil
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    grams.filter(g => counts(g._3) > 1)
      .groupBy(_._1).toList
      .flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (Nil, p) => List(List(p))
          case (cur :: done, p) =>
            if (p - cur.head <= n) (p :: cur) :: done
            else List(p) :: cur :: done
        }
        islands.map(is =>
          (id, is.min, is.max + n - 1, is.max + n - is.min))
      }.toSet
  }

  /** Driver-side reference for [[Engine.semanticDedup]], with the same
    * rounded-cosine (HALF_UP, 6 dp) and id tiebreaks as the operator. */
  private def refSemanticDedup(vecs: List[(Long, Array[Float])],
      cents: List[(Long, Array[Float])], tau: Double): Set[(Long, Long)] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cells = vecs.map { case (id, v) =>
      val cell = cents.map { case (cid, c) => (-r6(cos(v, c)), cid) }
        .min._2
      (id, v, cell)
    }
    val dropped = (for {
      (ia, va, ca) <- cells
      (ib, vb, cb) <- cells
      if ca == cb && ia < ib && r6(cos(va, vb)) >= tau
    } yield ib).toSet
    cells.collect { case (id, _, cell) if !dropped(id) => (id, cell) }
      .toSet
  }

  property("semanticDedup == brute-force within-cell reference") = {
    val vec: Gen[Array[Float]] =
      Gen.listOfN(4, Gen.choose(1, 5).map(_.toFloat)).map(_.toArray)
    forAll(
      Gen.choose(3, 15).flatMap(k => Gen.listOfN(k, vec)),
      Gen.choose(2, 3).flatMap(k => Gen.listOfN(k, vec)),
      Gen.oneOf(0.9, 0.99, 0.999), parts) { (vs, cs, tau, p) =>
      import spark.implicits._
      val vecs = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val cents = cs.zipWithIndex.map { case (c, i) => (100L + i, c) }
      val got = Engine.semanticDedup(
          vecs.toDF("vec_id", "embedding").repartition(p),
          "vec_id", "embedding",
          cents.toDF("cid", "ce"), "cid", "ce", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == refSemanticDedup(vecs, cents, tau)
    }
  }

  property("normalizeText is idempotent, case/punct-invariant, and emits canonical forms") =
    forAll(Gen.listOfN(12, Gen.oneOf(
      Gen.alphaLowerChar, Gen.alphaUpperChar, Gen.numChar,
      Gen.oneOf(' ', ' ', ',', '.', ';', '!', '-', '\t')))
      .map(_.mkString)) { s =>
      import spark.implicits._
      def norm(xs: String*): Seq[String] =
        xs.toDF("t").select(Engine.normalizeText(col("t"))).collect()
          .map(_.getString(0)).toSeq
      val Seq(n1) = norm(s)
      val Seq(n2, nUp) = norm(n1, s.toUpperCase)
      // idempotent (a canonical form normalizes to itself), re-casing
      // never changes the canonical form, and the output grammar is
      // exactly space-separated [a-z0-9] words with no edge spaces
      n2 == n1 && nUp == n1 &&
        n1.matches("|[a-z0-9]+( [a-z0-9]+)*")
    }

  property("round6 == the exact decimal half-up rule, ties included") =
    // Pure-JVM kernel, so each of the 10 scalacheck cases sweeps a
    // 2 000-value batch: uniform magnitudes across the working range
    // plus values engineered AT and NEAR the k·1e-6 + 5e-7 rounding
    // tie with ±ulp jitter — the region where the fast path must defer
    // to BigDecimal or silently drift one fixed-point unit.
    forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      def exact(d: Double) = java.math.BigDecimal.valueOf(d)
        .movePointRight(6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      (0 until 1000).forall { _ =>
        val d = rnd.nextDouble() * 1.0e7
        graft.plans.PqBlockDists.round6(d) == exact(d)
      } && (0 until 1000).forall { _ =>
        val base = rnd.nextLong(1_000_000_000L) * 1e-6 + 5e-7
        val j = rnd.nextInt(7) - 3
        val d = if (j == 0) base else base + j * Math.ulp(base)
        graft.plans.PqBlockDists.round6(d) == exact(d)
      }
    }

  property("dupSpans == brute-force duplicated-gram island merge") =
    forAll(
      Gen.choose(1, 12).flatMap(k => Gen.listOfN(k,
        Gen.choose(2, 8).flatMap(len =>
          Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))),
      Gen.oneOf(2, 3), parts) { (texts, ng, p) =>
      import spark.implicits._
      val withId = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = spark.createDataset(withId).toDF("doc_id", "text")
        .repartition(p)
      val got = Engine.dupSpans(df, "doc_id", "text", ng).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSet
      got == refSpans(withId, ng)
    }

  /** Driver-side integer replay of [[Engine.pageRankInt]]'s contract:
    * distinct edges, scores ×10⁶, contribution pr/outdeg (integer
    * truncation ≡ Spark `div` for the non-negative values here),
    * damping 85·Σ/100, dangling nodes keep the 150000 floor. */
  private def refPageRank(edges: Set[(String, String)],
      iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += pr(s) / outdeg(s)
      pr = nodes.map(n => n -> (150000L + 85 * contrib(n) / 100)).toMap
    }
    pr
  }

  property("pageRankInt == driver-side integer reference at any " +
    "partitioning") =
    forAll(
      Gen.listOfN(12, for {
        s <- Gen.oneOf("a", "b", "c", "d", "e")
        d <- Gen.oneOf("a", "b", "c", "d", "e")
      } yield (s, d)).suchThat(_.nonEmpty),
      Gen.choose(1, 4), parts) { (es, iters, p) =>
      import spark.implicits._
      val df = spark.createDataset(es).toDF("src", "dst").repartition(p)
      val got = Engine.pageRankInt(df, "src", "dst", iterations = iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got == refPageRank(es.toSet, iters)
    }

  property("madOutliers is partition-invariant and conserves group sizes") =
    forAll(
      Gen.listOfN(30, for {
        k <- Gen.oneOf("x", "y")
        v <- Gen.chooseNum(-100, 100)
      } yield (k, v * 0.25)).suchThat(_.nonEmpty),
      parts, parts) { (xs, p1, p2) =>
      import spark.implicits._
      def run(p: Int) = Engine.madOutliers(
          spark.createDataset(xs).toDF("k", "v").repartition(p), "k", "v")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
        .toMap
      val a = run(p1)
      // the exact medians must not depend on physical layout, and every
      // input row lands in exactly one group profile
      a == run(p2) && a.values.map(_._3).sum == xs.length &&
        a.forall { case (k, (_, mad, n, nOut)) =>
          mad >= 0 && nOut <= n &&
            n == xs.count(_._1 == k)
        }
    }

  /** Driver-side reference k-core: sequentially peel until fixed point. */
  private def refKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var live = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    var done = false
    var deg = Map.empty[Long, Int]
    while (!done) {
      deg = live.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
        .filter(_._2 >= k)
      val next = live.filter { case (a, b) =>
        deg.contains(a) && deg.contains(b) }
      done = next == live
      live = next
    }
    deg
  }

  property("kCore at a generous round bound equals the sequential " +
      "fixed point and is partition-invariant") =
    forAll(
      Gen.listOfN(18, for {
        a <- Gen.chooseNum(1L, 10L); b <- Gen.chooseNum(1L, 10L)
      } yield (a, b)),
      Gen.choose(1, 3), parts) { (es, k, p) =>
      import spark.implicits._
      val df = spark.createDataset(es).toDF("a", "b").repartition(p)
      val got = Engine.kCore(df, col("a"), col("b"), k, rounds = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      got == refKCore(es.toSet, k)
    }

  property("winsorizedStats: the clipped mean lies inside the band, " +
      "wall counts bound n, and the result is partition-invariant") =
    forAll(
      Gen.listOfN(25, Gen.chooseNum(-200, 200).map(_ * 0.25))
        .suchThat(_.size >= 3), parts, parts) { (vs, p1, p2) =>
      import spark.implicits._
      def run(p: Int) = Engine.winsorizedStats(
          spark.createDataset(vs.map(("g", _))).toDF("k", "v")
            .repartition(p), col("k"), col("v"), 0.1, 0.9)
        .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).head
      val a = run(p1)
      val (lo, hi, n, nLo, nHi, m) = a
      a == run(p2) && lo <= hi && m >= lo && m <= hi &&
        n == vs.size && nLo + nHi <= n
    }

  property("rankingMetrics: a perfect prediction scores ndcg 1 and " +
      "mrr 1 with every truth item hit") =
    forAll(Gen.choose(1, 8), parts) { (depth, p) =>
      import spark.implicits._
      val t = (1 to depth).map(i => (7L, s"i$i", i)).toList
      val df = spark.createDataset(t).toDF("q", "item", "rnk")
        .repartition(p)
      val r = Engine.rankingMetrics(df, df, "q", "item", "rnk")
        .collect().head
      r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 &&
        r.getInt(3) == depth
    }

  property("kaplanMeier: survival starts at most 1, never increases " +
      "within a cohort, and n_risk strictly exhausts") =
    forAll(
      Gen.listOfN(12, for {
        u <- Gen.chooseNum(1L, 8L)
        d <- Gen.choose(1, 25)
      } yield (u, f"2024-01-$d%02d")).suchThat(_.nonEmpty), parts) {
      (xs, p) =>
      import spark.implicits._
      val df = spark.createDataset(xs).toDF("u", "d")
        .withColumn("d", to_timestamp(col("d"))).repartition(p)
      val rows = Engine.kaplanMeier(df, col("u"), col("d"), 5)
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2),
          r.getDouble(5)))
        .groupBy(_._1).values
      rows.forall { cohort =>
        val s = cohort.sortBy(_._2)
        s.head._4 <= 1.0 + 1e-9 &&
          s.sliding(2).forall {
            case Array((_, _, n1, s1), (_, _, n2, s2)) =>
              s2 <= s1 + 1e-9 && n2 < n1
            case _ => true
          }
      }
    }

  property("theilSen: translating every value shifts the intercept " +
      "and leaves the slope bit-identical") =
    forAll(
      Gen.listOfN(8, for {
        d <- Gen.choose(1, 9)
        v <- Gen.chooseNum(-100, 100).map(_ * 0.25)
      } yield (d, v)).suchThat(_.map(_._1).distinct.size >= 2), parts) {
      (xs, p) =>
      import spark.implicits._
      def run(shift: Double) = {
        val df = spark.createDataset(xs.map { case (d, v) =>
            ("g", f"2024-01-0$d", v + shift) }).toDF("k", "d", "v")
          .withColumn("d", to_timestamp(col("d"))).repartition(p)
        Engine.theilSen(df, col("k"), col("d"), col("v"))
          .collect().map(r => (r.getDouble(3), r.getDouble(4))).head
      }
      val (m0, b0) = run(0.0)
      val (m5, b5) = run(5.0)
      m5 == m0 && math.abs(b5 - (b0 + 5.0)) <= 2e-6
    }

  property("quotaSample: per-stratum counts are exactly " +
      "min(quota, |stratum|) at any partitioning") =
    forAll(rows, parts, Gen.choose(1, 6), Gen.choose(1, 6)) {
      (xs, p, qa, qb) =>
        import spark.implicits._
        val quotas = Seq(("x", qa), ("y", qb), ("z", 2))
          .toDF("stratum", "quota")
        val counts = Engine.quotaSample(df(xs, p), col("s"), col("a"),
            quotas)
          .groupBy("stratum").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val sizes = xs.groupBy(_._3).view.mapValues(_.size).toMap
        val qmap = Map("x" -> qa, "y" -> qb, "z" -> 2)
        sizes.forall { case (s, n) =>
          counts.getOrElse(s, 0L) == math.min(qmap(s), n).toLong
        } && counts.keySet.subsetOf(sizes.keySet)
    }

  property("survivorWeights: weights conserve corpus mass, cluster " +
      "minima survive, loners weigh one") =
    forAll(rows, parts) { (xs, p) =>
      import spark.implicits._
      val ids = xs.map(_._1.toLong).distinct
      val docs = spark.createDataset(ids).toDF("doc_id").repartition(p)
      val members = ids.filter(_ % 2 == 0)
      val clusters = spark.createDataset(
          members.map(m => (m, m % 3 - 100)))
        .toDF("doc_id", "cluster_id").repartition(p)
      val got = Engine.survivorWeights(docs, "doc_id", clusters,
          "doc_id", "cluster_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byC = members.groupBy(_ % 3)
      got.values.sum == ids.size.toLong &&
        byC.forall { case (_, ms) =>
          got.get(ms.min).contains(ms.size.toLong) } &&
        (ids.toSet -- members).forall(l => got.get(l).contains(1L))
    }

  property("kAnonymity: exactly the sub-k classes of the brute-force " +
      "grouping, with exact sizes") =
    forAll(rows, parts, Gen.choose(2, 4)) { (xs, p, k) =>
      val got = Engine.kAnonymity(df(xs, p),
          Seq(("s", col("s")), ("b", col("b"))), k)
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
      val ref = xs.groupBy(t => (t._3, t._2)).view
        .mapValues(_.size.toLong).filter(_._2 < k).toMap
      got == ref
    }

  property("fdAudit: violating keys and worst fan-out match the " +
      "brute-force reference") =
    forAll(rows.suchThat(_.nonEmpty), parts) { (xs, p) =>
      val r = Engine.fdAudit(df(xs, p),
        Seq(("a->s", col("a"), col("s")))).collect()(0)
      val fan = xs.groupBy(_._1).view
        .mapValues(_.map(_._3).distinct.size).toMap
      r.getLong(1) == fan.size.toLong &&
        r.getLong(2) == fan.values.count(_ > 1).toLong &&
        r.getLong(4) == fan.values.max.toLong &&
        r.getBoolean(5) == fan.values.forall(_ == 1)
    }

  property("gapRegularity: time translation leaves every output " +
      "bit-identical at any partitioning (cv is shift-free)") =
    forAll(Gen.listOfN(25, for {
      u <- Gen.choose(1, 3)
      t <- Gen.choose(0L, 100000L)
    } yield (u, t)), parts, Gen.choose(1L, 500000L)) { (xs, p, shift) =>
      import spark.implicits._
      def run(off: Long) = {
        val df = spark.createDataset(xs.zipWithIndex.map {
            case ((u, t), i) => (u.toLong, (t + off) * 1000000L, i.toLong)
          }).toDF("user_id", "us", "event_id")
          .withColumn("ts", timestamp_micros(col("us"))).repartition(p)
        Engine.gapRegularity(df, col("user_id"), col("ts"),
            col("event_id"), minGaps = 3)
          .collect().map(_.toString).sorted.toSeq
      }
      run(0L) == run(shift)
    }

  property("charEntropy kernel: permutation-invariant, and " +
      "self-concatenation doubles n but preserves entropy exactly") =
    forAll(Gen.listOf(Gen.oneOf("abcdd  XY.!".toSeq)).map(_.mkString)) {
      t =>
        import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
        val base = graft.plans.CharEntropy.compute(u8(t))
        val perm = graft.plans.CharEntropy.compute(
          u8(new scala.util.Random(42).shuffle(t.toSeq).mkString))
        val dbl = graft.plans.CharEntropy.compute(u8(t + t))
        base.getLong(0) == perm.getLong(0) &&
          base.getInt(1) == perm.getInt(1) &&
          base.getDouble(2) == perm.getDouble(2) &&
          dbl.getLong(0) == 2 * base.getLong(0) &&
          dbl.getInt(1) == base.getInt(1) &&
          dbl.getDouble(2) == base.getDouble(2)
    }

  property("zipfSlope: duplicating the corpus preserves the slope and " +
      "shifts the intercept by ln 2 (rank order is frequency-scale-free)") =
    forAll(Gen.listOfN(12,
      Gen.listOfN(8, Gen.oneOf("aa bb cc dd ee ff gg hh".split(" ").toSeq))
        .map(_.mkString(" "))).suchThat(_.nonEmpty), parts) { (docs, p) =>
      import spark.implicits._
      val d1 = spark.createDataset(docs).toDF("text").repartition(p)
      val r1 = Engine.zipfSlope(d1, col("text"), topN = 8).collect()(0)
      val r2 = Engine.zipfSlope(d1.unionAll(d1), col("text"), topN = 8)
        .collect()(0)
      r1.getLong(0) == r2.getLong(0) &&
        math.abs(r2.getDouble(1) - r1.getDouble(1)) <= 2e-6 &&
        math.abs(r2.getDouble(2) -
          (r1.getDouble(2) + math.log(2.0))) <= 2e-6
    }

  property("bhFdrDrift: adjusted p is a step-up — non-decreasing along " +
      "the raw-p order, >= raw p, capped at 1") =
    forAll(rows.suchThat(_.map(_._3).distinct.size >= 2), parts) {
      (xs, p) =>
        val out = Engine.bhFdrDrift(
            df(xs, p).withColumn("v", col("a").cast("double")),
            col("s"), col("v"), buckets = 16)
          .collect().map(r => (r.getDouble(3), r.getDouble(4)))
          .sortBy(_._1)
        out.forall { case (pr, pa) => pa >= pr - 1e-9 && pa <= 1.0 } &&
          out.sliding(2).forall {
            case Array((_, a), (_, b)) => b >= a - 1e-9
            case _ => true
          }
    }

  property("eventTrigrams: with an unbounded k the pattern counts sum " +
      "to exactly sum_u max(0, |events_u| - 2)") =
    forAll(Gen.listOfN(30, for {
      u <- Gen.choose(1, 4)
      t <- Gen.choose(0L, 1000L)
      e <- Gen.oneOf("a", "b", "c")
    } yield (u, t, e)), parts) { (xs, p) =>
      import spark.implicits._
      val df = spark.createDataset(xs.zipWithIndex.map {
          case ((u, t, e), i) => (u.toLong, t * 1000000L, i.toLong, e)
        }).toDF("user_id", "us", "event_id", "event_type")
        .withColumn("ts", timestamp_micros(col("us"))).repartition(p)
      val got = Engine.eventTrigrams(df, col("user_id"), col("ts"),
          col("event_id"), col("event_type"), k = 1000000)
        .agg(sum(col("n"))).collect()(0)
      val want = xs.groupBy(_._1).values.map(g => math.max(0, g.size - 2))
        .sum.toLong
      (if (got.isNullAt(0)) 0L else got.getLong(0)) == want
    }

  property("columnStatsDrift: identical versions read ratio exactly 1, " +
      "zero null-rate delta, no drift") =
    forAll(rows.suchThat(_.nonEmpty), parts) { (xs, p) =>
      val d = df(xs, p)
      Engine.columnStatsDrift(d, d, Seq("a", "b", "s")).collect()
        .forall { r =>
          r.getDouble(7) == 1.0 && !r.getBoolean(8) &&
            r.getDouble(3) == r.getDouble(4) &&
            r.getLong(1) == r.getLong(2)
        }
    }
}
