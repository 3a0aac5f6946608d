package graft.operators

import graft.functions.HashFunctions.md5Long
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (HyperLogLog, Flajolet et al. 2007)
  * over the engine's portable md5 hashing — the profiling primitive a
  * 100 TB pipeline runs where exact COUNT(DISTINCT) would shuffle the
  * full key set: registers are a GROUP-BY-sized aggregate (m small
  * ints per group), partial-aggregate map-side, and union across
  * corpora/partitions is a per-register max — the sketch of a year of
  * data folds in per-day register tables without touching rows again.
  *
  * Unlike the built-in approx_count_distinct (whose xxhash/HLL++
  * internals no other engine reproduces), these registers are
  * bit-reproducible anywhere md5 exists, so estimates are
  * oracle-checkable and stable across engines and versions.
  */
object Sketch {

  /** Standard HLL bias constant α_m. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** Per-group HLL registers over `value`: bucket = low `bucketBits`
    * of md5-60(value), rho = leading-zero count of the remaining
    * 60−bucketBits bits + 1 (via the engine-portable bin()-length
    * trick), register = max rho. Output: groupCols :+ (bucket, reg) —
    * one narrow projection and one partial-aggregating group-by.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column,
                   bucketBits: Int): DataFrame =
    hllRegistersFromHash(df, groupCols, md5Long(value), bucketBits)

  /** [[hllRegisters]] over an ALREADY-HASHED 60-bit md5Long column —
    * for pipelines whose relations carry graft hashes natively (the
    * positional-shingle index, content keys): the sketch then costs no
    * second hashing pass.
    */
  def hllRegistersFromHash(df: DataFrame, groupCols: Seq[String],
                           hash: Column, bucketBits: Int): DataFrame = {
    val m = 1 << bucketBits
    val restBits = 60 - bucketBits
    val rest = shiftright(hash, bucketBits)
    val rho = when(rest === 0, lit(restBits + 1))
      .otherwise(lit(restBits + 1) - length(bin(rest)))
    df.select((groupCols.map(col) :+ pmod(hash, lit(m)).as("bucket")
        :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Merge registers across the dropped dimension(s): per-bucket max —
    * the HLL union. `keepCols` are the group columns that survive.
    */
  def hllMerge(regs: DataFrame, keepCols: Seq[String]): DataFrame =
    regs.groupBy((keepCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))

  /** HLL estimate per group from a register table (absent buckets
    * count as zero registers via the dense grid join): raw
    * α_m · m² / Σ 2^(−reg), with Flajolet's SMALL-RANGE correction —
    * when the raw estimate ≤ 2.5·m and zero registers remain, linear
    * counting (m · ln(m/V)) is the accurate regime. Rounded to 4 dp.
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
                  bucketBits: Int): DataFrame = {
    val m = 1 << bucketBits
    val groups = regs.select(groupCols.map(col): _*).distinct()
    val grid = groups.crossJoin(
      regs.sparkSession.range(m).select(col("id").as("bucket")))
    val raw = lit(hllAlpha(m)) * lit(m.toDouble * m) /
      sum(pow(lit(2.0), negate(col("reg"))))
    val zeros = sum(when(col("reg") === 0, 1L).otherwise(0L))
    grid.join(regs, groupCols :+ "bucket", "left")
      .select((groupCols.map(col)
        :+ coalesce(col("reg"), lit(0)).as("reg")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(round(when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros))
        .otherwise(raw), 4).as("ndv_hll"))
  }

  // ---- Count-Min sketch (Cormode & Muthukrishnan 2005) ---------------
  //
  // The frequency sibling of the HLL registers above: a depth × width
  // counter grid whose cell (j, h_j(x) mod width) accumulates every
  // occurrence of x; the point estimate is min_j over the depth rows —
  // an OVERESTIMATE by construction (collisions only add), within
  // ε·N = (e/width)·N with probability 1 − e^(−depth). State is
  // depth·width small ints per group regardless of corpus size, the
  // partial aggregate combines map-side, and cross-corpus union is a
  // per-cell SUM — the heavy-hitter monitor that folds a year of
  // per-day tables without re-touching rows. Hash family: ONE portable
  // md5 per item, row j derived via the Carter–Wegman affine family
  // ([[graft.functions.HashFunctions.affineHash]]) — bit-reproducible
  // in any engine, so the approximate counters are oracle-checkable.

  /** The depth exploded (row_j, cell) pairs for one base-hash column —
    * shared by the build and probe sides so both land in the same
    * cells by construction. */
  private def cmsCells(base: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map { j =>
      struct(lit(j).as("row_j"),
        pmod(graft.functions.HashFunctions.affineHash(base, j),
          lit(width.toLong)).as("cell"))
    }: _*))

  /** Per-group CMS counter table over `value`: one narrow projection
    * (md5 once, depth affine derivations) and one fixed-size group-by
    * — output rows ≤ groups × depth × width, `cnt` = weight of the
    * cell. */
  def cmsTable(df: DataFrame, groupCols: Seq[String], value: Column,
               depth: Int, width: Int): DataFrame =
    df.select((groupCols.map(col)
        :+ cmsCells(md5Long(value), depth, width).as("rc")): _*)
      .select((groupCols.map(col) :+ col("rc.row_j").as("row_j")
        :+ col("rc.cell").as("cell")): _*)
      .groupBy((groupCols :+ "row_j" :+ "cell").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge counter tables across the dropped dimension(s): per-cell
    * sum — the CMS union. `keepCols` are the group columns that
    * survive. */
  def cmsMerge(cms: DataFrame, keepCols: Seq[String]): DataFrame =
    cms.groupBy((keepCols :+ "row_j" :+ "cell").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  // ---- fixed-bin histogram / quantile sketch --------------------------
  //
  // The distribution member of the profiling suite (cardinality = HLL,
  // frequency = CMS, distribution = this): a fixed-bin equi-width
  // histogram over a bounded integer domain. State is `bins` counters
  // per group at any corpus size, partial-aggregated map-side; union
  // across corpora is a per-bin SUM; quantiles interpolate inside the
  // covering bin. Binning is the exact integer arithmetic of
  // [[graft.operators.Layout.scale16]], so bin ids (and therefore the
  // estimates) are bit-reproducible in any engine.

  /** Per-group histogram over a long `value` in [lo, hi]: bin =
    * (v − lo) · bins div (hi − lo + 1) — exact-multiple division, no
    * fp. Output: groupCols :+ (bin, cnt); empty bins are absent. */
  def histogram(df: DataFrame, groupCols: Seq[String], value: Column,
                lo: Column, hi: Column, bins: Int): DataFrame = {
    val num = (value - lo) * lit(bins.toLong)
    val den = hi - lo + lit(1L)
    val bin = ((num - pmod(num, den)) / den).cast("long")
    df.select((groupCols.map(col) :+ bin.as("bin")): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histograms across the dropped dimension(s): per-bin sum. */
  def histMerge(hist: DataFrame, keepCols: Seq[String]): DataFrame =
    hist.groupBy((keepCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from a group-free histogram (exactly
    * bin/cnt — merge first): for each q, the covering bin is the
    * first whose cumulative count reaches q·n, and the estimate
    * interpolates uniformly inside it. The cumulative is a self-join
    * over the ≤`bins`-row sketch (never a corpus-sized window); the
    * probe fan-out is |qs| × bins rows. `domain` is the SAME 1-row
    * (lo, hi) frame the histogram was built with. Returns (q, est_q)
    * with est_q unrounded — the caller owns the rounding contract. */
  def histQuantiles(hist: DataFrame, qs: Seq[Double], domain: DataFrame,
                    bins: Int): DataFrame = {
    import hist.sparkSession.implicits._
    val h = hist.select(col("bin"), col("cnt"))
    val cum = h.alias("a")
      .join(h.alias("b"), col("b.bin") <= col("a.bin"))
      .groupBy(col("a.bin").as("bin"), col("a.cnt").as("cnt"))
      .agg(sum(col("b.cnt")).as("cum"))
    val probes = qs.toDF("q")
      .crossJoin(h.agg(sum(col("cnt")).as("n")))
      .select(col("q"), (col("q") * col("n")).as("t"))
    probes
      .join(cum, col("cum") >= col("t"))
      .groupBy("q", "t")
      .agg(min(struct(col("bin"), col("cnt"), col("cum"))).as("sel"))
      .crossJoin(broadcast(domain))
      .select(col("q"),
        (col("lo") + ((col("sel.bin")
          + (col("t") - (col("sel.cum") - col("sel.cnt")))
            / col("sel.cnt"))
          * (col("hi") - col("lo") + lit(1L))) / lit(bins))
          .as("est_q"))
  }

  /** Distribution comparison between two cell-count tables (exactly
    * (cell, cnt) each — the hashed token histograms of two corpus
    * snapshots): normalizes both, meets them in one full-outer join
    * on cell id, and returns ONE row (js_divergence, l1_distance) —
    * JS in log2 so it is bounded [0, 1] regardless of scale. Absent
    * cells are zero-probability; a side's zero terms contribute 0 by
    * the usual 0·log convention. The comparison runs over ≤ cells
    * rows however large either corpus was — the drift alarm costs a
    * sketch, not a scan. */
  def distCompare(a: DataFrame, b: DataFrame): DataFrame = {
    def norm(df: DataFrame, p: String) = df
      .crossJoin(broadcast(df.agg(sum(col("cnt")).as("n"))))
      .select(col("cell"), (col("cnt") / col("n")).as(p))
    val j = norm(a, "pb")
      .join(norm(b, "pd"), Seq("cell"), "full_outer")
      .na.fill(0.0, Seq("pb", "pd"))
    val m = (col("pb") + col("pd")) / lit(2)
    val js = lit(0.5) * sum(when(col("pb") > 0,
        col("pb") * log2(col("pb") / m)).otherwise(0.0)) +
      lit(0.5) * sum(when(col("pd") > 0,
        col("pd") * log2(col("pd") / m)).otherwise(0.0))
    // an EMPTY side must fail loudly, not normalize away: an empty
    // side makes its normalized column all-null (sum(cnt) over zero
    // rows is null), the join keys collapse, and the "drift" value is
    // null or a degenerate 0.5 — a silently wrong alarm if a stream
    // side drains empty. The guard rides the always-one-row totals
    // frame joined to the always-one-row result, so it fires even
    // when BOTH sides are empty (a guard inside norm() never would:
    // empty × 1-row crossJoin is empty, the filter never evaluates).
    val totals = a.agg(sum(col("cnt")).as("_na"))
      .crossJoin(b.agg(sum(col("cnt")).as("_nb")))
    j.agg(round(js, 6).as("js_divergence"),
        round(sum(abs(col("pb") - col("pd"))), 6).as("l1_distance"))
      .crossJoin(broadcast(totals))
      .filter(when(col("_na").isNull || col("_na") === 0 ||
          col("_nb").isNull || col("_nb") === 0,
          raise_error(concat(lit("distCompare: empty side (sum(cnt) a="),
            coalesce(col("_na").cast("string"), lit("null")),
            lit(", b="),
            coalesce(col("_nb").cast("string"), lit("null")),
            lit(") — drift against an empty distribution is undefined")))
            .cast("boolean"))
        .otherwise(lit(true)))
      .drop("_na", "_nb")
  }

  // ---- Bloom filter (Bloom 1970) --------------------------------------
  //
  // The MEMBERSHIP member of the profiling suite (cardinality = HLL,
  // frequency = CMS, distribution = histogram, membership = this): a
  // fixed mBits-bit array, word-packed as ⌈mBits/32⌉ longs whose low 32
  // bits each hold bits [32w, 32w+31]. Insert sets k bit positions
  // derived from ONE portable md5 via the Carter–Wegman affine family
  // ([[graft.functions.HashFunctions.affineHash]] — the CMS convention);
  // the build is one narrow projection + one fixed-size group-by whose
  // bit_or partial-aggregates map-side; union across corpora/partitions
  // is a per-word OR — a year of per-day filters folds without
  // re-touching rows. Probes can FALSE-POSITIVE (collisions only set
  // bits) but never false-negative — the one-sided guarantee that makes
  // it the scalable PROBE SIDE of decontamination: the corpus joins
  // against ⌈mBits/32⌉ broadcast rows however large the eval set grows,
  // where the exact probe ([[Dedup.decontaminate]]) broadcasts every
  // eval shingle. Insertion is idempotent, so build sides need no
  // distinct pass. Bit positions are bit-reproducible anywhere md5
  // exists, so the approximate membership — including each false
  // positive — is oracle-checkable.

  /** Number of packed words for an mBits-bit filter. */
  private def bloomWordCount(mBits: Int): Int = (mBits + 31) / 32

  /** The k exploded (word, mask) single-bit updates for one base-hash
    * column — shared by the build and probe sides so both land on the
    * same bits by construction. pos_j = affine_j(base) mod mBits;
    * word = pos div 32 (exact-multiple division, no fp), mask = 1 <<
    * (pos mod 32) — computed as 2^bit in double, exact for bits 0-31
    * (well under 2^53), so bit 31 is the highest ever set and the long
    * stays non-negative and sign-free on every engine. */
  private def bloomBits(base: Column, mBits: Int, kHashes: Int): Column =
    explode(array((0 until kHashes).map { j =>
      val pos = pmod(graft.functions.HashFunctions.affineHash(base, j),
        lit(mBits.toLong))
      val word = ((pos - pmod(pos, lit(32L))) / 32L).cast("long")
      struct(word.as("word"),
        pow(lit(2.0), pmod(pos, lit(32L))).cast("long").as("mask"))
    }: _*))

  /** Per-group Bloom word tables over an ALREADY-HASHED 60-bit md5Long
    * column: groupCols :+ (word, bits) — words no insert touched are
    * absent (zero). ≤ groups × ⌈mBits/32⌉ rows however large the
    * corpus. */
  def bloomWordsFromHash(df: DataFrame, groupCols: Seq[String],
                         hash: Column, mBits: Int, kHashes: Int)
      : DataFrame =
    df.select((groupCols.map(col)
        :+ bloomBits(hash, mBits, kHashes).as("wm")): _*)
      .select((groupCols.map(col) :+ col("wm.word").as("word")
        :+ col("wm.mask").as("mask")): _*)
      .groupBy((groupCols :+ "word").map(col): _*)
      .agg(bit_or(col("mask")).as("bits"))

  /** [[bloomWordsFromHash]] over raw values (one md5 per row). */
  def bloomWords(df: DataFrame, groupCols: Seq[String], value: Column,
                 mBits: Int, kHashes: Int): DataFrame =
    bloomWordsFromHash(df, groupCols, md5Long(value), mBits, kHashes)

  /** Merge word tables across the dropped dimension(s): per-word OR —
    * the Bloom union. `keepCols` are the group columns that survive. */
  def bloomMerge(words: DataFrame, keepCols: Seq[String]): DataFrame =
    words.groupBy((keepCols :+ "word").map(col): _*)
      .agg(bit_or(col("bits")).as("bits"))

  /** Membership probes against a group-free word table (exactly
    * word/bits — merge first): every probe column rides through plus
    * `is_member` (1 iff ALL k bits are set; a value never inserted can
    * still report 1 — the measured false-positive rate — but an
    * inserted value never reports 0). The filter side joins broadcast
    * (≤ ⌈mBits/32⌉ rows); the probe side fans out ×k then folds back
    * by min — never more than k rows per probe in flight. */
  def bloomProbeFromHash(words: DataFrame, probes: DataFrame,
                         hash: Column, mBits: Int, kHashes: Int)
      : DataFrame = {
    val keep = probes.columns.toSeq
    probes
      .select((keep.map(col)
        :+ bloomBits(hash, mBits, kHashes).as("wm")): _*)
      .select((keep.map(col) :+ col("wm.word").as("word")
        :+ col("wm.mask").as("mask")): _*)
      .join(broadcast(words), Seq("word"), "left")
      .select((keep.map(col)
        :+ when(coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask"))
            =!= 0L, lit(1L)).otherwise(lit(0L)).as("hit")): _*)
      .groupBy(keep.map(col): _*)
      .agg(min(col("hit")).as("is_member"))
  }

  /** Total set bits of a word table — the fill ratio numerator (the
    * false-positive-rate driver: p_fp ≈ (bits_set / mBits)^k). */
  def bloomBitsSet(words: DataFrame): DataFrame =
    words.agg(coalesce(sum(bit_count(col("bits"))), lit(0)).cast("long")
      .as("bits_set"))

  /** Membership as a PURE PROJECTION against a driver-collected word
    * array — the model-as-literal serving shape (the ⌈mBits/32⌉ longs
    * ride inside the plan like a PQ codebook): zero joins, zero extra
    * aggregates, so a STREAM can probe the filter and still spend its
    * one stateful operator on the per-doc rollup. `words(w)` = packed
    * bits of word w, absent words 0 (use [[bloomWordArray]]). */
  def bloomMemberLit(hash: Column, words: Array[Long], mBits: Int,
                     kHashes: Int): Column =
    (0 until kHashes).map { j =>
      val pos = pmod(graft.functions.HashFunctions.affineHash(hash, j),
        lit(mBits.toLong))
      val word = get(typedlit(words.toSeq),
        ((pos - pmod(pos, lit(32L))) / 32L).cast("int"))
      val mask = pow(lit(2.0), pmod(pos, lit(32L))).cast("long")
      when(word.bitwiseAND(mask) =!= 0L, lit(1L)).otherwise(lit(0L))
    }.reduce(least(_, _))

  /** Collect a group-free word table into the dense array
    * [[bloomMemberLit]] serves from — ⌈mBits/32⌉ longs of driver
    * traffic, the same budget a codebook collect pays. */
  def bloomWordArray(words: DataFrame, mBits: Int): Array[Long] = {
    val m = words.collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate(bloomWordCount(mBits))(w => m.getOrElse(w, 0L))
  }

  /** Point estimates for `probes` (every column rides through) against
    * a group-free counter table (exactly row_j/cell/cnt — merge first):
    * min over the depth rows, absent cells count 0 (an item never
    * inserted CAN estimate 0). Probe side is rows × depth — broadcast
    * it; the sketch side is ≤ depth·width rows however large the
    * corpus was. */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, key: Column,
                  depth: Int, width: Int): DataFrame = {
    val keep = probes.columns.toSeq
    probes
      .select((keep.map(col)
        :+ cmsCells(md5Long(key), depth, width).as("rc")): _*)
      .select((keep.map(col) :+ col("rc.row_j").as("row_j")
        :+ col("rc.cell").as("cell")): _*)
      .join(broadcast(cms), Seq("row_j", "cell"), "left")
      .select((keep.map(col)
        :+ coalesce(col("cnt"), lit(0L)).as("cnt")): _*)
      .groupBy(keep.map(col): _*)
      .agg(min(col("cnt")).as("cnt_cms"))
  }
}
