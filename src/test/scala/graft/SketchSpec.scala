package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** HLL sketch: merge algebra, small-range accuracy, error bound. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hllMerge(union of groups) equals registers of the union — " +
      "the property that makes sketches fold across corpora") {
    val vals = (1 to 3000)
      .map(i => (if (i % 2 == 0) "a" else "b", s"val_$i"))
      .toDF("g", "v")
    val perGroup = Sketch.hllRegisters(vals, Seq("g"), col("v"), 6)
    val merged = Sketch.hllMerge(perGroup, Nil)
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    val direct = Sketch
      .hllRegisters(vals.withColumn("g", lit("x")), Seq("g"), col("v"), 6)
      .select("bucket", "reg")
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(merged == direct)
  }

  test("small-range correction: a 30-distinct set estimates near 30, " +
      "not the raw-HLL blowup") {
    val vals = (1 to 30).map(i => ("g", s"item_$i")).toDF("g", "v")
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(vals, Seq("g"), col("v"), 6), Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    assert(math.abs(est - 30) / 30.0 < 0.25,
      s"linear-counting regime estimate off: $est for 30 distinct")
  }

  test("estimate tracks exact within the m=64 error regime on 5k " +
      "distinct values; duplicates don't move it") {
    val vals = (1 to 5000).map(i => ("g", s"u_$i")).toDF("g", "v")
    val withDups = vals.unionByName(
      (1 to 2000).map(i => ("g", s"u_$i")).toDF("g", "v"))
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(withDups, Seq("g"), col("v"), 6),
        Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    // 1.04/sqrt(64) ≈ 13% standard error; allow 3 sigma
    assert(math.abs(est - 5000) / 5000.0 < 0.4,
      s"estimate $est too far from 5000")
    val estNoDups = Sketch.hllEstimate(
        Sketch.hllRegisters(vals, Seq("g"), col("v"), 6), Seq("g"), 6)
      .select("ndv_hll").head().getDouble(0)
    assert(est == estNoDups, "HLL must be insensitive to duplicates")
  }

  test("CMS never underestimates, and is exact for every key when " +
      "the grid is collision-checkably wide") {
    val rng = new scala.util.Random(7)
    // zipfy-ish: key k_i appears i times — 40 keys, 820 rows
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(("g", s"k_$i")))
    val df = rng.shuffle(rows).toDF("g", "v")
    val exact = df.groupBy("v").agg(count(lit(1)).as("cnt_exact"))
    val cms = Sketch.cmsMerge(
      Sketch.cmsTable(df, Seq("g"), col("v"), depth = 3, width = 64),
      Nil)
    val got = Sketch
      .cmsEstimate(cms, exact, col("v"), depth = 3, width = 64)
      .as[(String, Long, Long)].collect()
    assert(got.length == 40)
    got.foreach { case (k, ex, est) =>
      assert(est >= ex, s"CMS underestimated $k: $est < $ex")
    }
    // 40 keys into 3 independent rows of 4096 cells: min-over-rows is
    // exact unless a key collides in ALL rows — vanishingly unlikely,
    // and the assertion would name the colliding key if it ever did
    val wide = Sketch.cmsMerge(
      Sketch.cmsTable(df, Seq("g"), col("v"), depth = 3, width = 4096),
      Nil)
    Sketch.cmsEstimate(wide, exact, col("v"), depth = 3, width = 4096)
      .as[(String, Long, Long)].collect()
      .foreach { case (k, ex, est) =>
        assert(est == ex, s"wide CMS not exact for $k: $est != $ex")
      }
  }

  test("cmsMerge(per-group tables) equals the table built over the " +
      "union; an absent key estimates 0 on an empty-cell miss") {
    val a = (1 to 200).map(i => ("a", s"x_${i % 17}")).toDF("g", "v")
    val b = (1 to 150).map(i => ("b", s"x_${i % 23}")).toDF("g", "v")
    val both = a.unionByName(b)
    val merged = Sketch
      .cmsMerge(Sketch.cmsTable(both, Seq("g"), col("v"), 3, 64), Nil)
      .orderBy("row_j", "cell").as[(Int, Long, Long)].collect().toSeq
    val direct = Sketch
      .cmsTable(both.withColumn("g", lit("x")), Seq("g"), col("v"), 3, 64)
      .select("row_j", "cell", "cnt")
      .orderBy("row_j", "cell").as[(Int, Long, Long)].collect().toSeq
    assert(merged == direct)
    // a key no row ever hashed near: with an empty sketch every cell
    // misses and the left-join coalesce floors the estimate at 0
    val empty = Sketch.cmsMerge(
      Sketch.cmsTable(both.limit(0), Seq("g"), col("v"), 3, 64), Nil)
    val est = Sketch
      .cmsEstimate(empty, Seq(("absent", 0L)).toDF("v", "cnt_exact"),
        col("v"), 3, 64)
      .select("cnt_cms").head().getLong(0)
    assert(est == 0L)
  }

  test("Bloom: no false negatives ever; bloomMerge(per-group) equals " +
      "the filter built over the union") {
    val ins = (1 to 400).map(i => (if (i % 2 == 0) "a" else "b", s"in_$i"))
      .toDF("g", "v")
    val perG = Sketch.bloomWords(ins, Seq("g"), col("v"),
      mBits = 4096, kHashes = 4)
    val merged = Sketch.bloomMerge(perG, Nil)
    val direct = Sketch.bloomWords(ins.withColumn("g", lit("x")),
        Seq("g"), col("v"), mBits = 4096, kHashes = 4)
      .select("word", "bits")
    assert(merged.orderBy("word").as[(Long, Long)].collect().toSeq ==
      direct.orderBy("word").as[(Long, Long)].collect().toSeq)
    // every inserted value must probe back as a member — the one-sided
    // guarantee decontamination relies on (no contaminated doc escapes)
    val probed = Sketch.bloomProbeFromHash(merged,
      ins.select("v"), graft.functions.HashFunctions.md5Long(col("v")),
      mBits = 4096, kHashes = 4)
    assert(probed.filter(col("is_member") === 0).count() == 0)
  }

  test("Bloom: duplicates don't move the filter; absent probes can " +
      "false-positive but stay within the fill-rate bound") {
    val ins = (1 to 300).map(i => ("g", s"in_$i")).toDF("g", "v")
    val withDups = ins.unionByName(
      (1 to 200).map(i => ("g", s"in_$i")).toDF("g", "v"))
    def words(df: org.apache.spark.sql.DataFrame) =
      Sketch.bloomMerge(
        Sketch.bloomWords(df, Seq("g"), col("v"), 4096, 4), Nil)
    assert(words(withDups).orderBy("word").as[(Long, Long)].collect()
        .toSeq ==
      words(ins).orderBy("word").as[(Long, Long)].collect().toSeq,
      "Bloom insert must be idempotent")
    val filter = words(ins)
    val bitsSet = Sketch.bloomBitsSet(filter).head().getLong(0)
    assert(bitsSet > 0 && bitsSet <= 4L * 300,
      s"bits_set $bitsSet outside (0, k·n]")
    // 2000 never-inserted probes: expected FP rate ≈ (bitsSet/4096)^4
    // — deterministic here (fixed md5 positions), bound it loosely
    val absent = (1 to 2000).map(i => s"out_$i").toDF("v")
    val fp = Sketch.bloomProbeFromHash(filter, absent,
        graft.functions.HashFunctions.md5Long(col("v")), 4096, 4)
      .filter(col("is_member") === 1).count()
    val pFill = bitsSet.toDouble / 4096
    assert(fp <= math.max(10.0, 5 * 2000 * math.pow(pFill, 4)),
      s"$fp false positives at fill $pFill — family not independent?")
  }

  test("Bloom cross-check vs brute-force membership on random " +
      "corpora: never a false negative, FPs only outside the set") {
    for (seed <- Seq(1, 7, 42)) {
      val rng = new scala.util.Random(seed)
      val universe = (1 to 1200).map(_ =>
        rng.alphanumeric.take(rng.nextInt(12) + 3).mkString).distinct
      val (inSet, outSet) = universe.splitAt(universe.length / 3)
      val truth = inSet.toSet
      val filter = Sketch.bloomMerge(
        Sketch.bloomWords(inSet.toDF("v"), Nil, col("v"), 4096, 4), Nil)
      val got = Sketch.bloomProbeFromHash(filter,
          (inSet ++ outSet).toDF("v"),
          graft.functions.HashFunctions.md5Long(col("v")), 4096, 4)
        .as[(String, Long)].collect()
      got.foreach { case (v, m) =>
        if (truth(v)) assert(m == 1L,
          s"false NEGATIVE for inserted '$v' (seed $seed)")
      }
      val fps = got.count { case (v, m) => !truth(v) && m == 1L }
      // fill ≤ 4·|inSet|/4096 ≈ 39%; FP rate ≤ fill^4 ≈ 2.3% — allow
      // a loose 5× margin over the expectation on |outSet| probes
      assert(fps <= math.max(10, outSet.length / 8),
        s"$fps FPs over ${outSet.length} absent probes (seed $seed)")
    }
  }

  test("Bloom model-as-literal serving (bloomMemberLit) agrees with " +
      "the join-shaped probe on every inserted and absent value") {
    import graft.functions.HashFunctions.md5Long
    val ins = (1 to 250).map(i => ("g", s"in_$i")).toDF("g", "v")
    val filter = Sketch.bloomMerge(
      Sketch.bloomWords(ins, Seq("g"), col("v"), 4096, 4), Nil)
    val words = Sketch.bloomWordArray(filter, 4096)
    assert(words.length == 128) // 4096 bits / 32 per word
    val probes = ((1 to 250).map(i => s"in_$i") ++
      (1 to 500).map(i => s"out_$i")).toDF("v")
    val viaJoin = Sketch.bloomProbeFromHash(filter, probes,
        md5Long(col("v")), 4096, 4)
      .orderBy("v").as[(String, Long)].collect().toSeq
    val viaLit = probes
      .select(col("v"),
        Sketch.bloomMemberLit(md5Long(col("v")), words, 4096, 4)
          .as("is_member"))
      .orderBy("v").as[(String, Long)].collect().toSeq
    assert(viaJoin == viaLit)
  }

  test("distCompare: identical distributions diverge 0, disjoint " +
      "supports diverge 1 (log2 bound), hand value for the " +
      "half-overlap case") {
    val a = Seq((0L, 5L), (1L, 5L)).toDF("cell", "cnt")
    val same = Sketch.distCompare(a, a).as[(Double, Double)].head()
    assert(same == ((0.0, 0.0)))
    val b = Seq((2L, 3L), (3L, 7L)).toDF("cell", "cnt")
    val disj = Sketch.distCompare(a, b).as[(Double, Double)].head()
    assert(disj == ((1.0, 2.0)), s"disjoint: $disj")
    // a = {c0: 1}, b = {c0: ½, c1: ½}:
    // JS = ½·log2(4/3) + ½·(½·log2(2/3) + ½·log2(2)) ≈ 0.311278
    val oneCell = Seq((0L, 1L)).toDF("cell", "cnt")
    val half = Seq((0L, 1L), (1L, 1L)).toDF("cell", "cnt")
    val (js, l1) = Sketch.distCompare(oneCell, half)
      .as[(Double, Double)].head()
    assert(math.abs(js - 0.311278) < 1e-6 && l1 == 1.0,
      s"half-overlap: ($js, $l1)")
  }

  test("distCompare: an empty side raises instead of returning a " +
      "silent null/degenerate drift value") {
    val a = Seq((0L, 5L), (1L, 5L)).toDF("cell", "cnt")
    val empty = Seq.empty[(Long, Long)].toDF("cell", "cnt")
    for ((l, r) <- Seq((a, empty), (empty, a), (empty, empty))) {
      val e = intercept[Exception] {
        Sketch.distCompare(l, r).collect()
      }
      assert(e.getMessage.contains("empty side") ||
        e.getCause != null && e.getCause.getMessage.contains("empty side"),
        s"wrong error: ${e.getMessage}")
    }
  }

  test("histogram quantiles: exact on uniform data at full " +
      "resolution, merge equals union-build, interpolation is " +
      "monotone in q") {
    // 0..6399 uniform: with 64 bins each bin holds exactly 100 values
    val vals = spark.range(0, 6400)
      .select((col("id") % 2).cast("string").as("g"), col("id").as("v"))
    val domain = vals.agg(min("v").as("lo"), max("v").as("hi"))
    val perG = Sketch.histogram(vals.crossJoin(domain), Seq("g"),
      col("v"), col("lo"), col("hi"), bins = 64)
    val merged = Sketch.histMerge(perG, Nil)
      .orderBy("bin").as[(Long, Long)].collect().toSeq
    val direct = Sketch.histogram(
        vals.withColumn("g", lit("x")).crossJoin(domain), Seq("g"),
        col("v"), col("lo"), col("hi"), bins = 64)
      .select("bin", "cnt").orderBy("bin")
      .as[(Long, Long)].collect().toSeq
    assert(merged == direct && merged.size == 64 &&
      merged.forall(_._2 == 100L))
    val qs = Seq(0.25, 0.5, 0.9)
    val est = Sketch.histQuantiles(Sketch.histMerge(perG, Nil), qs,
        domain, 64)
      .orderBy("q").as[(Double, Double)].collect().toSeq
    // uniform ⇒ interpolated quantile ≈ q · 6400 (within one value)
    est.foreach { case (q, e) =>
      assert(math.abs(e - q * 6400) <= 1.0, s"q=$q est=$e")
    }
    assert(est.map(_._2) == est.map(_._2).sorted,
      "quantile estimates must be monotone in q")
  }

  test("histogram quantiles land inside the covering bin on skewed " +
      "data (never outside the value domain)") {
    // 90% of mass at small values, a long tail
    val vals = (1 to 900).map(i => ("g", (i % 10).toLong)) ++
      (1 to 100).map(i => ("g", 1000L + i))
    val df = vals.toDF("g", "v")
    val domain = df.agg(min("v").as("lo"), max("v").as("hi"))
    val h = Sketch.histMerge(Sketch.histogram(df.crossJoin(domain),
      Seq("g"), col("v"), col("lo"), col("hi"), bins = 16), Nil)
    val est = Sketch.histQuantiles(h, Seq(0.5, 0.99), domain, 16)
      .orderBy("q").as[(Double, Double)].collect().toSeq
    val (lo, hi) = (0.0, 1100.0)
    est.foreach { case (q, e) =>
      assert(e >= lo && e <= hi + 1, s"q=$q est=$e outside domain")
    }
    // the median must land in the low-mass region, p99 in the tail
    assert(est.head._2 < 100.0 && est.last._2 > 1000.0)
  }
}
