package graft.operators

import graft.functions.HashFunctions.{md5LongArray, shingleHashes}
import org.apache.spark.sql.graft.Bridge
import graft.functions.TextFunctions.{shingles, words}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines.
  *
  * The reference's only dedup is `INSERT OR IGNORE` on exact content
  * (reference server.js:198). At 100 TB, near-duplicate detection is the
  * workhorse, so the suite adds MinHash+LSH, SimHash, and exact n-gram
  * Jaccard — each expressed as shuffled-once relational plans over
  * engine-portable md5 hashing (see [[graft.functions.HashFunctions]]).
  */
object Dedup {

  /** Exact dedup: keep the smallest id per key column. Deterministic
    * (unlike `dropDuplicates`, whose survivor is partition-order
    * dependent). One hash-aggregate shuffle on the key.
    */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  /** Distinct word n-gram shingle set per document, as rows
    * (idCol, shingle). The base relation for Jaccard and MinHash.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    df.select(
        col(idCol),
        explode(array_distinct(shingles(words(col(textCol)), n))).as("shingle"))

  /** Same inverted-index relation keyed by the 60-bit shingle hash — an
    * 8-byte shuffle key instead of the n-gram string. Oracles hash with
    * the same md5, so even a (astronomically unlikely) collision yields
    * identical results on both engines.
    */
  def shingleHashSet(df: DataFrame, idCol: String, textCol: String, n: Int)
      : DataFrame =
    df.select(
        col(idCol),
        explode(shingleHashes(words(col(textCol)), n)).as("shingle"))

  /** Exact n-gram Jaccard similarity for every pair with at least one
    * shared shingle, via an inverted index (shingle hash → sorted doc-id
    * postings list) — never a cross join. One shuffle builds the
    * postings, pair generation is a narrow slice-explode over each list,
    * one shuffle counts pairs. `maxDf` drops stop-shingles (postings
    * longer than maxDf) before pairing, the standard frequency cap that
    * bounds fan-out at scale: a shingle shared by d docs yields
    * d·(d-1)/2 pair rows, so the blow-up is O(sum over shingles of d²).
    *
    * OWNERSHIP: persists the postings intermediate (it feeds two
    * branches) and, being lazy, cannot unpersist it — the caller that
    * evaluates the result releases it (`unpersist`/`clearCache`), as
    * Bench/Verify do between queries. Same contract as
    * [[lshCandidatePairs]].
    */
  /** All ordered in-list pairs (ids[i], ids[j>i]) from a (.., ids)
    * postings frame — the pair-generation kernel shared by the one-shot
    * and incremental Jaccard paths. */
  private def pairsFromLists(lists: DataFrame): DataFrame =
    lists.select(explode(flatten(
      transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, greatest(size(col("ids")), lit(1))),
          y => struct(x.as("id_a"), y.as("id_b"))))))
      .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .filter(col("id_a") < col("id_b")) // drop same-doc dup-hash pairs

  /** jaccard = inter / (sz_a + sz_b − inter), thresholded — the scoring
    * tail shared by the one-shot and incremental paths. `inter` columns:
    * (id_a, id_b, inter); `sizes`: (idCol, sz). */
  private def jaccardFromCounts(inter: DataFrame, sizes: DataFrame,
                                idCol: String,
                                threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(
        col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDf: Long = 1000L): DataFrame = {
    val postings = shingleHashSet(df, idCol, textCol, n)
      .groupBy("shingle")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) <= maxDf)
      .persist() // feeds both the sizes and the pair branch
    // materialize NOW: the downstream join evaluates `sizes` inside a
    // broadcast future that runs CONCURRENTLY with the main job, and a
    // lazily-persisted frame gives racing readers each a full recompute
    // of the shingle scan (measured 3-10x bench inflation); one eager
    // pass pins the cache first (same precedent as Ingest.buildIndex)
    postings.count()
    val sizes = postings
      .select(explode(col("ids")).as(idCol))
      .groupBy(col(idCol)).agg(count("*").as("sz"))
    val inter = pairsFromLists(postings)
      .groupBy("id_a", "id_b").agg(count("*").as("inter"))
    jaccardFromCounts(inter, sizes, idCol, threshold)
  }

  /** The maintained near-dup INDEX: unfiltered shingle postings (full
    * lists — overflow detection needs true lengths), per-doc kept-
    * shingle sizes, and the thresholded pair set. The artifact a real
    * pipeline persists per corpus snapshot and updates per ingest
    * batch ([[updateJaccardIndex]]) instead of rebuilding O(corpus).
    *
    * LSM-shaped: `postings` is the immutable BASE artifact; each
    * incremental update appends one delta-sized postings frame to
    * `deltas` (the sidecar) instead of rewriting the base. Readers
    * that need full lists use [[mergedPostings]] (base ∪ sidecars,
    * folded on read); [[compactJaccardIndex]] folds the sidecars into
    * a new base at whatever cadence the pipeline chooses — so the
    * O(base) merge is a scheduled compaction, never a per-trigger tax.
    */
  case class JaccardIndex(postings: DataFrame, sizes: DataFrame,
                          pairs: DataFrame,
                          deltas: Seq[DataFrame] = Nil) {
    /** The full logical postings relation: base lists ∪ sidecar lists,
      * re-grouped per shingle. Equals what a from-scratch build would
      * produce (DedupSpec pins it). Delta-sized sidecars make this one
      * skinny union + re-group, not a rebuild.
      */
    def mergedPostings: DataFrame =
      if (deltas.isEmpty) postings
      else (postings +: deltas).reduce(_ unionByName _)
        .groupBy("shingle")
        .agg(array_sort(flatten(collect_list(col("ids")))).as("ids"))
  }

  /** One-shot build of [[JaccardIndex]] — same semantics as
    * [[ngramJaccardPairs]] (which stays the artifact-free query path),
    * but keeping postings UNFILTERED so later deltas can detect maxDf
    * crossings. All three frames are LOCAL-CHECKPOINTED (eager,
    * lineage-truncated — the in-session stand-in for the parquet
    * artifact a pipeline persists per corpus snapshot): an index that
    * silently recomputed its corpus-sized build on every consumer
    * would defeat the entire incremental contract.
    */
  def buildJaccardIndex(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDf: Long = 1000L): JaccardIndex = {
    val postings = shingleHashSet(df, idCol, textCol, n)
      .groupBy("shingle")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .localCheckpoint()
    val kept = postings.filter(size(col("ids")) <= maxDf)
    val sizes = kept
      .select(explode(col("ids")).as(idCol))
      .groupBy(col(idCol)).agg(count("*").as("sz"))
      .localCheckpoint()
    val inter = pairsFromLists(kept)
      .groupBy("id_a", "id_b").agg(count("*").as("inter"))
    JaccardIndex(postings, sizes,
      jaccardFromCounts(inter, sizes, idCol, threshold).localCheckpoint())
  }

  /** INCREMENTAL near-dup maintenance — the operation that makes daily
    * ingest affordable at 100 TB: fold a `delta` batch into an existing
    * [[JaccardIndex]] touching only delta-proportional state. The base
    * postings artifact is NEVER rewritten (it returns in the updated
    * index by reference); the delta's lists land in a sidecar frame
    * appended to `ix.deltas`, and the only base access is a READ pruned
    * to the delta's shingles (a semi-join on the broadcast delta keys —
    * on a deployed shingle-bucketed postings table, bucket-local point
    * lookups). Per-trigger cost is therefore O(delta + lists the delta
    * hits), with the O(base) fold deferred to [[compactJaccardIndex]].
    *
    * Work done: the delta's shingles are grouped once; the lists they
    * land in are assembled from base ∪ sidecars ∪ delta for exactly
    * those shingles. NEW pairs can only arise in lists containing a
    * delta doc, and every such list's shingle occurs in the delta — so
    * pair generation runs over those touched lists only, keeps pairs
    * with a delta member (old-old pairs are already in the base
    * artifact), and scores them against base sizes ∪ delta sizes.
    *
    * Every frame materialized per update (delta postings, touched
    * lists, delta sizes, new scored pairs) is delta-sized and
    * localCheckpointed — eager, lineage-truncated — so a long-running
    * stream (s10's foreachBatch) accumulates bounded, delta-sized
    * state per trigger instead of base-sized caches and ever-deeper
    * union plans; the union fan-in (one leg per update) is bounded by
    * the caller's compaction cadence.
    *
    * Contracts: delta ids must be NEW (disjoint from the base — the
    * ingest path guarantees it). Returns the updated index plus the
    * OVERFLOWED shingles (lists that crossed maxDf in this update):
    * when non-empty, previously-valid pairs may have lost a
    * contribution and exactness requires a rebuild — the operator
    * reports the condition instead of silently approximating; when
    * empty, the updated pair set is IDENTICAL to a full rebuild (t31
    * pins this equivalence against the full-corpus oracle).
    */
  def updateJaccardIndex(ix: JaccardIndex, delta: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         threshold: Double, maxDf: Long = 1000L)
      : (JaccardIndex, DataFrame) = {
    val deltaSh = shingleHashSet(delta, idCol, textCol, n)
      .groupBy("shingle")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .localCheckpoint() // eager + truncated: read by 3 branches below
    val deltaKeys = deltaSh.select("shingle")
    // prior lists the delta touches: a PRUNED READ of base ∪ sidecars
    // (semi-join on the broadcast delta keys) — output is delta-keyed,
    // the base is never rewritten
    val priorLists = (ix.postings +: ix.deltas)
      .map(_.join(broadcast(deltaKeys), Seq("shingle"), "left_semi")
        .select(col("shingle"), col("ids"), lit(true).as("_old")))
      .reduce(_ unionByName _)
    // full current list per touched shingle, plus the PRIOR length
    // (base + earlier sidecars) so a maxDf crossing in THIS update is
    // detectable
    val touched = priorLists
      .unionByName(deltaSh.select(col("shingle"), col("ids"),
        lit(false).as("_old")))
      .groupBy("shingle")
      .agg(array_sort(flatten(collect_list(col("ids")))).as("ids"),
        sum(when(col("_old"), size(col("ids"))).otherwise(0))
          .as("_old_len"))
      .localCheckpoint() // delta-sized; feeds overflow, pairs and sizes
    val overflowed = touched
      .filter(size(col("ids")) > maxDf && col("_old_len") <= maxDf)
      .select("shingle")
    // a list can yield a NEW pair iff it contains a delta doc, and
    // every such list's shingle appears in the delta by construction
    val kept = touched.filter(size(col("ids")) <= maxDf)
    val deltaIds = delta.select(col(idCol)).distinct()
      .withColumn("_d", lit(1))
    val newPairs = pairsFromLists(kept)
      .join(broadcast(deltaIds.select(col(idCol).as("id_a"), col("_d").as("_da"))),
        Seq("id_a"), "left")
      .join(broadcast(deltaIds.select(col(idCol).as("id_b"), col("_d").as("_db"))),
        Seq("id_b"), "left")
      .filter(col("_da") === 1 || col("_db") === 1)
      .select("id_a", "id_b")
    val inter = newPairs.groupBy("id_a", "id_b").agg(count("*").as("inter"))
    // delta docs' kept-shingle counts all live in touched lists
    val deltaSizes = touched.filter(size(col("ids")) <= maxDf)
      .select(explode(col("ids")).as(idCol))
      .join(broadcast(deltaIds.select(idCol)), Seq(idCol), "left_semi")
      .groupBy(col(idCol)).agg(count("*").as("sz"))
    val allSizes = ix.sizes.unionByName(deltaSizes.localCheckpoint())
    val scored = jaccardFromCounts(inter, allSizes, idCol, threshold)
    (JaccardIndex(ix.postings, allSizes,
      ix.pairs.unionByName(scored.localCheckpoint()),
      ix.deltas :+ deltaSh), overflowed)
  }

  /** Fold an index's sidecar deltas into a new base — the scheduled
    * COMPACTION leg of the LSM split ([[updateJaccardIndex]] is the
    * per-trigger leg). O(base + deltas): runs at whatever cadence the
    * pipeline chooses (nightly, every N triggers), never inside the
    * ingest hot path. Also flattens the per-update union chains in
    * sizes/pairs into single checkpointed frames, resetting plan depth
    * for the next epoch of updates. Pure repackaging: pairs, sizes and
    * the merged postings relation are unchanged (DedupSpec pins it).
    */
  def compactJaccardIndex(ix: JaccardIndex): JaccardIndex =
    if (ix.deltas.isEmpty) ix
    else JaccardIndex(ix.mergedPostings.localCheckpoint(),
      ix.sizes.localCheckpoint(), ix.pairs.localCheckpoint(), Nil)

  /** MinHash signature (array<bigint>, length numHashes) from a column of
    * precomputed 60-bit shingle hashes: component j is the min over the
    * affine family member j (one md5 per shingle TOTAL, not per family —
    * see [[graft.functions.HashFunctions.affineHash]]). Narrow,
    * shuffle-free.
    */
  def minHashSignature(baseHashes: Column, numHashes: Int): Column =
    Bridge.column(graft.expressions.MinHashSignature(
      Bridge.expression(baseHashes), numHashes))

  /** (idCol, signature) per document. The base md5 pass lives in its own
    * projection so it is evaluated once, not once per hash family.
    */
  def minHash(df: DataFrame, idCol: String, textCol: String,
              n: Int, numHashes: Int): DataFrame =
    df.select(
      col(idCol),
      minHashSignature(shingleHashes(words(col(textCol)), n), numHashes)
        .as("signature"))

  /** LSH banding: signature split into `bands` bands of
    * numHashes/bands rows each; docs sharing a full band land in the
    * same bucket. Returns candidate pairs with the estimated Jaccard
    * (fraction of equal signature components). The only shuffles are the
    * band-bucket aggregation and the pair dedup — no pairwise scan.
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String, bands: Int)
      : DataFrame = {
    // NOTE: bands must divide the signature length, and bands >
    // numHashes would make every band slice empty (md5("") for all docs
    // → an all-pairs cross product). Signature length is only known at
    // runtime, so the arithmetic guard below (rowsPerBand >= 1) is a
    // row-level safety net; callers own the static check.
    require(bands >= 1, s"bands must be >= 1, got $bands")
    // self-join below would otherwise recompute the whole signature
    // pipeline on both sides; signatures are numHashes longs per doc, so
    // caching them is strictly cheaper than one recomputation. The cache
    // cannot be unpersisted here (the returned plan is lazy) — callers
    // that loop over corpora should clearCache()/unpersist between calls
    // (Bench/Verify do). Materialized eagerly so the self-join's two
    // sides (one of which may evaluate inside a concurrent broadcast
    // future) read the cache instead of racing to recompute it.
    sigs.persist()
    sigs.count()
    val banded = sigs.select(
        col(idCol),
        col("signature"),
        posexplode(bandKeys(col("signature"), bands)).as(Seq("band", "key")))
    val a = banded.select(col(idCol).as("id_a"), col("signature").as("sig_a"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("id_b"), col("signature").as("sig_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          (x === y).cast("int")), v => v === 1)).cast("double") /
          size(col("sig_a"))).as("est_jaccard"))
      .distinct()
  }

  /** One md5 bucket key per band: md5 of the ':'-joined band slice.
    * Integer floor division (Column `/` would be double division, making
    * non-divisible band counts overlap/gap the slices); bands must
    * divide the signature length — degenerate geometry (bands > length →
    * empty slices whose identical md5("") would bucket everything
    * together) aborts the query via raise_error rather than silently
    * going quadratic.
    */
  private def bandKeys(signature: Column, bands: Int): Column = {
    val rowsPerBand = floor(size(signature) / bands).cast("int")
    transform(
      sequence(lit(0), lit(bands - 1)),
      bnd => md5(array_join(
        slice(signature,
          bnd * rowsPerBand + 1,
          when(rowsPerBand >= 1, rowsPerBand)
            .otherwise(raise_error(lit(
              "lshCandidatePairs: bands exceeds signature length")))),
        ":")))
  }

  /** C4-style cross-document line dedup: split every document into
    * fixed-width non-overlapping word windows ("lines" — the fixture
    * corpus has no newlines), keep the globally FIRST occurrence of each
    * line (min (id, position) — the C4 rule "remove any duplicated
    * line, keeping one"), and report per-document totals. Returns
    * (idCol, n_lines, n_kept).
    *
    * Scale shape: the only shuffle is the window over the 8-byte line
    * hash (same skinny-key rationale as [[shingleHashSet]]); line
    * windows themselves are a narrow chunker projection. Per-line state
    * in the window is one row — no postings lists, no pair blow-up.
    */
  def lineDedupKeepFirst(df: DataFrame, idCol: String, textCol: String,
                         lineWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = Chunker
      .chunk(df.select(col(idCol), col(textCol)), textCol, lineWords, 0)
      .select(col(idCol), col("chunk_ix").as("pos"),
        graft.functions.HashFunctions.md5Long(col("chunk")).as("line_key"))
    lines
      .withColumn("rn", row_number().over(
        Window.partitionBy("line_key").orderBy(col(idCol), col("pos"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum((col("rn") === 1).cast("long")).as("n_kept"))
  }

  /** [[lineDedupKeepFirst]] with RECONSTRUCTION — the transform C4
    * actually applies: globally-duplicate lines are REMOVED and each
    * doc's surviving lines are re-joined in original order, yielding
    * (idCol, n_kept, kept_text). Docs whose every line lost drop out
    * entirely (nothing survives to emit). Same plan shape as the
    * counting variant — one shuffle keyed by the 8-byte line hash for
    * keep-first, one doc-keyed aggregate to rebuild — plus the line
    * TEXT riding alongside its hash (at 100 TB that column is the
    * payload you must move anyway to produce output).
    */
  def lineDedupRebuild(df: DataFrame, idCol: String, textCol: String,
                       lineWords: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = Chunker
      .chunk(df.select(col(idCol), col(textCol)), textCol, lineWords, 0)
      .select(col(idCol), col("chunk_ix").as("pos"), col("chunk"),
        graft.functions.HashFunctions.md5Long(col("chunk")).as("line_key"))
    lines
      .withColumn("rn", row_number().over(
        Window.partitionBy("line_key").orderBy(col(idCol), col("pos"))))
      .filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          array_sort(collect_list(struct(col("pos"), col("chunk"))))
            .getField("chunk")).as("kept_text"))
  }

  /** Benchmark decontamination (the GPT-3/PaLM eval-leak gate): for
    * every corpus document, count how many of its distinct n-gram
    * shingles also occur in the (small) eval set. Returns
    * (idCol, n_shingles, n_hits) for ALL corpus docs — callers apply
    * their overlap-fraction threshold.
    *
    * Scale shape: the eval shingle set is distinct-reduced and
    * BROADCAST (benchmarks are a few thousand docs; the corpus is the
    * 100 TB side) — the corpus is never shuffled for the probe, only
    * for its own per-doc count.
    */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val evalShingles = shingleHashSet(evalSet, idCol, textCol, n)
      .select("shingle").distinct()
      .withColumn("hit", lit(1))
    // single pass over the corpus: the broadcast left join tags hits,
    // one aggregate counts both totals (count(hit) skips nulls) — the
    // corpus shingle kernel runs ONCE and shuffles once
    shingleHashSet(corpus, idCol, textCol, n)
      .join(broadcast(evalShingles), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
  }

  /** SimHash fingerprint (bits ≤ 60) from precomputed 60-bit token
    * hashes: per-bit ±1 votes weighted by token multiplicity; bit set iff
    * the vote sum is positive. Narrow projection, no shuffle.
    */
  def simHashFromHashes(tokenHashes: Column, bits: Int): Column =
    Bridge.column(graft.expressions.SimHashBits(
      Bridge.expression(tokenHashes), bits))

  /** (idCol, simhash) per document over whitespace tokens. The md5 pass
    * lives in its own projection so each token is hashed once, not once
    * per bit.
    */
  def simHashDocs(df: DataFrame, idCol: String, textCol: String, bits: Int)
      : DataFrame =
    df.select(col(idCol),
      simHashFromHashes(md5LongArray(words(col(textCol))), bits)
        .as("simhash"))

  /** Hamming distance between two simhash fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: fingerprints within `maxHamming` of
    * each other, found by the pigeonhole block trick — split the `bits`
    * fingerprint into maxHamming+1 blocks; any pair within the radius
    * agrees exactly on at least one block, so candidate generation is an
    * equi-join on (block index, block value) and only candidates pay the
    * hamming check. Same blocking-join shape as MinHash banding.
    *
    * The candidate count is Σ over (block, block_val) buckets of
    * |bucket|² — linear only while buckets stay ~n/2^width. That
    * assumption is precisely FALSE on template-heavy corpora (many
    * identical fingerprints collapse into one hot bucket and the join
    * goes quadratic), so the plan aborts via `raise_error` when the
    * hottest bucket exceeds `maxBucketRows` (the cosineNearDupPairs /
    * semanticDedup honesty contract: fail fast before the fan-out, with
    * the remediation in the message). The right fix upstream is exact
    * dedup first (identical docs ⇒ identical simhashes) or wider blocks.
    *
    * OWNERSHIP: `blocked` feeds the guard aggregate and BOTH join
    * sides — unpersisted, the tokenize+md5+simhash kernel would run
    * three times over the corpus. Persisted here; the caller that
    * evaluates the result releases it (unpersist/clearCache), the
    * semanticDedup convention.
    */
  def simHashNearDupPairs(fingerprints: DataFrame, idCol: String,
                          bits: Int, maxHamming: Int,
                          maxBucketRows: Long = 100000L): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = bits / nBlocks
    require(width > 0, s"bits=$bits too small for maxHamming=$maxHamming")
    val blocked = fingerprints.select(
      col(idCol), col("simhash"),
      posexplode(array((0 until nBlocks).map { b =>
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("block", "block_val"))).persist()
    // one tiny aggregate broadcast against the candidate join: a hot
    // bucket fails fast instead of hanging a quadratic task
    val guard = blocked.groupBy("block", "block_val").count()
      .agg(max(col("count")).as("_mx"))
    val a = blocked.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("block"), col("block_val"))
      .crossJoin(broadcast(guard))
      .filter(when(col("_mx") > maxBucketRows,
          raise_error(concat(lit("simHashNearDupPairs: hottest (block, " +
              "block_val) bucket "), col("_mx"),
            lit(s" rows exceeds maxBucketRows=$maxBucketRows; " +
              "template-heavy corpora collapse fingerprints into hot " +
              "buckets (quadratic candidates) — use simHashNearDupGroups " +
              "(identical fingerprints collapse before the join) or raise bits"))).cast("boolean"))
        .otherwise(lit(true)))
      .drop("_mx")
    val b = blocked.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("block"), col("block_val"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash near-dup at the GROUP level — the scale-correct answer to
    * the template-heavy corpora that trip [[simHashNearDupPairs]]'s
    * hot-bucket guard: identical fingerprints are first collapsed into
    * (simhash, n, keeper) groups, so a million boilerplate copies
    * become ONE row and their quadratic pair mass one SELF row
    * (hamming 0, n > 1) instead of n²/2 join outputs. The pigeonhole
    * block join then runs over DISTINCT fingerprints only — candidate
    * fan-out is bounded by the distinct-fingerprint count, which is
    * exactly what template-heavy corpora keep small. Downstream dedup
    * wants groups anyway (keep `keeper`, drop the rest); pair-level
    * output stays available from [[simHashNearDupPairs]] where the
    * corpus is known diverse.
    *
    * Returns cross-group rows (sh_a < sh_b, hamming ≤ maxHamming,
    * both groups' sizes and keeper ids) plus one self row per
    * duplicated fingerprint (sh_a = sh_b, hamming 0) — together the
    * complete near-dup structure at fingerprint granularity.
    *
    * OWNERSHIP: `groups` feeds the self rows and both join sides —
    * persisted here, released by the evaluating caller (the
    * simHashNearDupPairs convention).
    */
  def simHashNearDupGroups(fingerprints: DataFrame, idCol: String,
                           bits: Int, maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming + 1
    val width = bits / nBlocks
    require(width > 0, s"bits=$bits too small for maxHamming=$maxHamming")
    val groups = fingerprints.groupBy("simhash")
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))
      .persist()
    val blocked = groups.select(
      col("simhash"), col("n"), col("keeper"),
      posexplode(array((0 until nBlocks).map { b =>
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("block", "block_val")))
    val a = blocked.select(col("simhash").as("sh_a"), col("n").as("n_a"),
      col("keeper").as("keeper_a"), col("block"), col("block_val"))
    val b = blocked.select(col("simhash").as("sh_b"), col("n").as("n_b"),
      col("keeper").as("keeper_b"), col("block"), col("block_val"))
    val cross = a.join(b, Seq("block", "block_val"))
      .filter(col("sh_a") < col("sh_b"))
      .select(col("sh_a"), col("sh_b"),
        hammingDist(col("sh_a"), col("sh_b")).as("hamming"),
        col("n_a"), col("n_b"), col("keeper_a"), col("keeper_b"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    val self = groups.filter(col("n") > 1)
      .select(col("simhash").as("sh_a"), col("simhash").as("sh_b"),
        lit(0L).as("hamming"), col("n").as("n_a"), col("n").as("n_b"),
        col("keeper").as("keeper_a"), col("keeper").as("keeper_b"))
    cross.unionByName(self)
  }

  /** EXACT-SUBSTRING span detection (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022 — the
    * ExactSubstr criterion, re-expressed relationally instead of via
    * their suffix array): every maximal run of ≥ `minRunTokens`
    * consecutive tokens shared VERBATIM between two documents.
    * Positional w-shingle hashes match across docs; matches at the
    * same alignment (pos_a − pos_b) with consecutive positions merge
    * into runs (the gaps-and-islands window); a run of L consecutive
    * matching shingles is L + w − 1 shared tokens. Document-level
    * near-dup (t03/t05) misses a copied paragraph inside an otherwise
    * novel page — this is the operator that finds it.
    *
    * Scale shape: one aggregate for shingle document frequency (maxDf
    * caps stop-shingles, t03's convention — dropping one can only
    * SPLIT a run, never fabricate one), one equi-join on the 60-bit
    * hash (postings-bounded: Σ df², df ≤ maxDf — never all-pairs),
    * one window partitioned by (id_a, id_b, alignment) — pair-local.
    * No suffix array, no global sort over the corpus concatenation.
    *
    * Returns (id_a, id_b, pos_a, pos_b, run_tokens): 0-based start
    * positions of each qualifying run, id_a < id_b.
    */
  def substringSpans(df: DataFrame, idCol: String, textCol: String,
                     w: Int, maxDf: Long = 1000L,
                     minRunTokens: Int = 16): DataFrame =
    // OWNERSHIP: the shingle index feeds the df counts and both join
    // sides — four re-tokenize-and-md5 passes over the corpus
    // unpersisted (measured 8.2 s → 3.9 s at sf0.1 with the persist;
    // pipelines that keep the index as a per-snapshot artifact call
    // [[substringSpansFrom]] directly). Caller releases the persist.
    substringSpansFrom(
      positionalShingleHashes(df, idCol, textCol, w).persist(),
      idCol, w, maxDf, minRunTokens)

  /** (idCol, pos, sh): the 60-bit hash of the w-token shingle STARTING
    * at each 0-based position — the positional index
    * [[substringSpansFrom]] consumes. Build once per corpus snapshot
    * (it is the expensive leg: one md5 per token position); docs
    * shorter than w contribute their whole text at pos 0.
    */
  def positionalShingleHashes(df: DataFrame, idCol: String,
                              textCol: String, w: Int,
                              carryCols: Seq[String] = Nil): DataFrame = {
    import graft.functions.HashFunctions.md5Long
    val ws = words(col(textCol))
    df.select((col(idCol) +: carryCols.map(col)) :+
        posexplode(transform(
          sequence(lit(0), greatest(size(ws) - lit(w), lit(0))),
          i => md5Long(array_join(slice(ws, i + lit(1), lit(w)), " "))))
          .as(Seq("pos", "sh")): _*)
      .select((col(idCol) +: carryCols.map(col)) :+
        col("pos").cast("long").as("pos") :+ col("sh"): _*)
  }

  /** The span-detection leg of [[substringSpans]] over a prebuilt
    * positional-shingle index: df-cap, alignment equi-join, run merge.
    */
  def substringSpansFrom(sh: DataFrame, idCol: String, w: Int,
                         maxDf: Long, minRunTokens: Int): DataFrame = {
    val kept = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("sh"),
      Seq("sh"), "left_semi")
      .persist()
    val a = kept.select(col("sh"), col(idCol).as("id_a"),
      col("pos").as("pos_a"))
    val b = kept.select(col("sh"), col(idCol).as("id_b"),
      col("pos").as("pos_b"))
    val m = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        (col("pos_a") - col("pos_b")).as("_align"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "_align").orderBy("pos_a")
    m.withColumn("_grp", col("pos_a") - row_number().over(wRun))
      .groupBy(col("id_a"), col("id_b"), col("_align"), col("_grp"))
      .agg(min(col("pos_a")).as("pos_a"), min(col("pos_b")).as("pos_b"),
        (count(lit(1)) + lit(w - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= minRunTokens)
      .select("id_a", "id_b", "pos_a", "pos_b", "run_tokens")
  }

  /** Per-snapshot ExactSubstr state, the [[JaccardIndex]] LSM split
    * applied to the positional-shingle index: `base` is the build-once
    * (id, pos, sh) index artifact (NEVER rewritten by updates),
    * `spans` the scored span set so far, `deltas` the sidecar indexes
    * appended by [[updateSubstrIndex]] — folded into a new base by
    * [[compactSubstrIndex]] on the pipeline's schedule, never in the
    * ingest hot path. */
  case class SubstrIndex(base: DataFrame, spans: DataFrame,
                         deltas: Seq[DataFrame]) {
    /** base ∪ sidecars — the full current positional index. */
    def mergedIndex: DataFrame = (base +: deltas).reduce(_ unionByName _)
  }

  /** Build the ExactSubstr snapshot artifact: positional index +
    * full span detection, both eagerly checkpointed (the t31
    * convention — construction is paid at snapshot time; what each
    * ingest batch pays is [[updateSubstrIndex]]). */
  def buildSubstrIndex(df: DataFrame, idCol: String, textCol: String,
                       w: Int, maxDf: Long = 1000L,
                       minRunTokens: Int = 16): SubstrIndex = {
    val sh = positionalShingleHashes(df, idCol, textCol, w)
      .localCheckpoint()
    SubstrIndex(sh,
      substringSpansFrom(sh, idCol, w, maxDf, minRunTokens)
        .localCheckpoint(), Nil)
  }

  /** INCREMENTAL ExactSubstr maintenance — [[updateJaccardIndex]]'s
    * contract for the positional index: fold a `delta` batch (NEW doc
    * ids) into an existing [[SubstrIndex]] touching only
    * delta-proportional state. The base index is never rewritten; the
    * only base access is a READ pruned to the delta's shingles (a
    * semi-join on the broadcast delta keys — bucket-local point
    * lookups on a deployed shingle-bucketed index).
    *
    * Why delta-restricted detection is EXACT: a span row pairs
    * positions from two documents, so every NEW match involves at
    * least one delta row, and a run between an old doc and a delta doc
    * consists entirely of such matches (the old-old span set cannot
    * change — old docs gained no rows). The one exception is a shingle
    * whose occurrence count crosses `maxDf` in THIS update: its
    * existing matches retroactively lose validity (dropping a
    * stop-shingle can only SPLIT a run, but the split must be
    * recomputed). Those shingles come back in the second return value;
    * when non-empty, exactness requires a rebuild — reported, not
    * silently approximated; when EMPTY, the updated span set is
    * IDENTICAL to a full rebuild (DedupSpec pins the equivalence, the
    * t47 query pins it against t34's oracle verbatim).
    */
  def updateSubstrIndex(ix: SubstrIndex, delta: DataFrame,
                        idCol: String, textCol: String, w: Int,
                        maxDf: Long = 1000L, minRunTokens: Int = 16)
      : (SubstrIndex, DataFrame) = {
    val deltaSh = positionalShingleHashes(delta, idCol, textCol, w)
      .localCheckpoint() // read by keys, df counts, and the join below
    val deltaKeys = deltaSh.select("sh").distinct()
    // prior rows the delta touches: a PRUNED READ of base ∪ sidecars
    val prior = (ix.base +: ix.deltas)
      .map(_.join(broadcast(deltaKeys), Seq("sh"), "left_semi")
        .select(col("sh"), col(idCol), col("pos"),
          lit(true).as("_old")))
      .reduce(_ unionByName _)
    val touched = prior.unionByName(
        deltaSh.select(col("sh"), col(idCol), col("pos"),
          lit(false).as("_old")))
      .localCheckpoint() // delta-keyed; feeds df counts and both join sides
    val dfCounts = touched.groupBy("sh")
      .agg(count(lit(1)).as("_df"),
        sum(when(col("_old"), 1L).otherwise(0L)).as("_old_df"),
        countDistinct(when(col("_old"), col(idCol))).as("_old_docs"))
      .localCheckpoint()
    // a crossing invalidates prior state only if prior MATCHES through
    // the shingle were possible: ≥2 DISTINCT prior docs (the pair join
    // requires id_a < id_b, so repeats inside a single prior doc can
    // never have matched) AND the shingle wasn't already dropped
    // (prior rows ≤ maxDf). An all-new shingle over maxDf is dropped
    // identically by update and rebuild.
    val overflowed = dfCounts
      .filter(col("_df") > maxDf &&
        col("_old_docs") >= 2 && col("_old_df") <= maxDf)
      .select("sh")
    val kept = touched.join(
      broadcast(dfCounts.filter(col("_df") <= maxDf).select("sh")),
      Seq("sh"), "left_semi")
    val deltaIds = delta.select(col(idCol)).distinct()
      .withColumn("_d", lit(1))
    val a = kept.select(col("sh"), col(idCol).as("id_a"),
      col("pos").as("pos_a"))
    val b = kept.select(col("sh"), col(idCol).as("id_b"),
      col("pos").as("pos_b"))
    val m = a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .join(broadcast(deltaIds.select(col(idCol).as("id_a"),
        col("_d").as("_da"))), Seq("id_a"), "left")
      .join(broadcast(deltaIds.select(col(idCol).as("id_b"),
        col("_d").as("_db"))), Seq("id_b"), "left")
      .filter(col("_da") === 1 || col("_db") === 1)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        (col("pos_a") - col("pos_b")).as("_align"))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a", "id_b", "_align").orderBy("pos_a")
    val newSpans = m
      .withColumn("_grp", col("pos_a") - row_number().over(wRun))
      .groupBy(col("id_a"), col("id_b"), col("_align"), col("_grp"))
      .agg(min(col("pos_a")).as("pos_a"), min(col("pos_b")).as("pos_b"),
        (count(lit(1)) + lit(w - 1)).as("run_tokens"))
      .filter(col("run_tokens") >= minRunTokens)
      .select("id_a", "id_b", "pos_a", "pos_b", "run_tokens")
      .localCheckpoint()
    (SubstrIndex(ix.base, ix.spans.unionByName(newSpans),
      ix.deltas :+ deltaSh), overflowed)
  }

  /** Fold the sidecar deltas into a new base — the scheduled
    * compaction leg ([[compactJaccardIndex]]'s contract): O(base +
    * deltas), run on the pipeline's cadence, pure repackaging (the
    * span set is unchanged; plan depth resets for the next epoch). */
  def compactSubstrIndex(ix: SubstrIndex): SubstrIndex =
    if (ix.deltas.isEmpty) ix
    else SubstrIndex(ix.mergedIndex.localCheckpoint(),
      ix.spans.localCheckpoint(), Nil)

  /** The REMOVAL action over [[substringSpans]] output (Lee et al.'s
    * ExactSubstr dedup removes every duplicated span from all but one
    * occurrence): cut from each document every token covered by a span
    * in which it is the LATER (id_b) side — keep-first, so one copy of
    * every duplicated passage survives — and reconstruct the cleaned
    * text from the surviving tokens in order. Overlapping spans from
    * different partners need no interval merging: a token is removed
    * iff ANY covering span exists (the anti range-join).
    *
    * Returns, for each AFFECTED document: (idCol, n_tokens,
    * n_tokens_clean, clean_md5) — token counts before/after and the
    * md5 of the reconstructed text (a fully-duplicated document
    * reconstructs to the empty string). Scale shape: tokens explode
    * narrowly; the anti-join is doc-local (equi on the id, range
    * condition on the position); reconstruction is one grouped sort —
    * all keyed by document, embarrassingly parallel.
    */
  def removeSpans(docs: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val iv = spans.select(col("id_b").as("_rid"), col("pos_b").as("_s"),
      (col("pos_b") + col("run_tokens")).as("_e"))
    val affected = iv.select(col("_rid").as(idCol)).distinct()
    val toks = docs.join(affected, Seq(idCol), "left_semi")
      .select(col(idCol), posexplode(words(col(textCol)))
        .as(Seq("pos", "tok")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(iv,
      toks(idCol) === iv("_rid") &&
        col("pos") >= col("_s") && col("pos") < col("_e"),
      "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens_clean"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          p => p("tok")), " ").as("_clean"))
    docs.join(affected, Seq(idCol), "left_semi")
      .select(col(idCol),
        size(words(col(textCol))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_tokens_clean"), lit(0L)).as("n_tokens_clean"),
        md5(coalesce(col("_clean"), lit(""))).as("clean_md5"))
  }

  /** SEMANTIC dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    * cluster the embedding space with k-means, then drop every vector
    * that has an EARLIER (lower-id) cluster-mate within cosine `tau` —
    * the keep-first curation rule, deterministic end-to-end. This is
    * the embedding-space complement of the token-level near-dup family
    * above: paraphrases and re-renderings that share no shingles still
    * collide in embedding space.
    *
    * Plan shape: assignment is a broadcast of the tiny centroid set
    * ([[Ann.ivfAssign]]); the pairwise scan is a SELF-join keyed on
    * `centroid_id` — one shuffle co-locating each cluster, then
    * cluster-local pairs only, never the n² corpus. Cost is
    * Σ|cluster|², which is the SemDeDup contract: k grows with n
    * (n/k roughly constant, paper §3 uses ~50k points/cluster at
    * LAION scale), so per-cluster work is bounded and the whole pass
    * is one co-partitioned join away from embarrassingly parallel.
    * `maxClusterSize` enforces that contract mechanically — a skewed
    * clustering that would quadratically blow up a task raises before
    * the fan-out rather than hanging it (v06's guard convention).
    *
    * Returns (idCol, centroid_id, kept): `kept` = no earlier mate
    * within tau. Threshold semantics: cos >= tau drops (the paper
    * sweeps epsilon = 1 - tau).
    */
  def semanticDedup(emb: DataFrame, centroids: DataFrame, idCol: String,
                    vecCol: String, tau: Double,
                    maxClusterSize: Long = 1000000L): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    // OWNERSHIP: the assignment feeds the guard and BOTH sides of the
    // pair self-join — unpersisted it would recompute the broadcast
    // argmin over the corpus up to 4× (measured 21.9 s → 0.9 s at the
    // 32× probe). Like ngramJaccardPairs' postings, the caller that
    // evaluates the result releases it (unpersist/clearCache); at
    // deployment scale the assignment is a materialized artifact.
    val assigned = Ann.ivfAssign(emb, centroids, idCol, vecCol).persist()
    // the guard is one tiny aggregate broadcast against the corpus
    // (cosineNearDupPairs' convention): a degenerate clustering fails
    // fast instead of hanging a quadratic task
    val guard = assigned.groupBy("centroid_id").count()
      .agg(max(col("count")).as("_mx"))
    val g = assigned.crossJoin(broadcast(guard))
      .filter(when(col("_mx") > maxClusterSize,
          raise_error(concat(lit("semanticDedup: largest cluster "),
            col("_mx"),
            lit(s" rows exceeds maxClusterSize=$maxClusterSize; raise " +
              "k (SemDeDup scales k with n to bound cluster size)")))
            .cast("boolean"))
        .otherwise(lit(true)))
      .drop("_mx")
    val earlier = g.select(col("centroid_id").as("_ecid"),
      col(idCol).as("_eid"), col(vecCol).as("_evec"))
    val dropped = g
      .join(earlier, col("centroid_id") === col("_ecid") &&
        col("_eid") < col(idCol) &&
        cosineSim(col(vecCol), col("_evec")) >= tau, "left_semi")
      .select(col(idCol), lit(false).as("kept"))
    g.select(col(idCol), col("centroid_id"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("centroid_id"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** FastSS deletion-neighborhood fuzzy join (Bocek et al. 2007,
    * "Fast Similarity Search in Large Dictionaries" — public): all
    * DISTINCT-value pairs of `nameCol` within Levenshtein distance 1,
    * with per-value row support counts. The entity-resolution /
    * catalog-typo shape ("cold bolt" ↔ "old bolt") the n-gram dedup
    * family can't express — shingle Jaccard is word-level, this is
    * character-level and EXACT.
    *
    * Blocking: two strings are within edit distance 1 only if their
    * del-1 neighborhoods intersect, where `D1(s) = {s} ∪ {s with one
    * character deleted}` (substitution ⇒ both sides share the
    * delete-at-that-position variant; insert/delete ⇒ one side IS a
    * variant of the other; equality is excluded by the strict pair
    * order). The converse does not hold ("ab"/"ba" share "a" at
    * distance 2), so candidates are verified with the exact
    * `levenshtein` builtin — the blocking is a sound candidate
    * GENERATOR, the verify step makes the answer exact.
    *
    * Scale shape (100 TB): the t48 group-level convention — values
    * collapse to DISTINCT names with counts BEFORE any pairing, so a
    * million rows sharing one catalog name cost one row; the variant
    * explode is ×(len+1) on the distinct-name frame only; pairing is
    * an equi-join on the variant string (fan-out Σ|variant bucket|²,
    * never n²) and the verify filter is codegen'd. No windows, no
    * driver loops.
    */
  def fuzzyNameJoin(df: DataFrame, nameCol: String): DataFrame = {
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
    // D1(name): the string itself + every single-deletion variant
    // (array_distinct: duplicate adjacent chars collapse, so a name
    // never meets itself twice through two equal variants)
    val variants = names.select(col("name"), col("n"),
      explode(array_distinct(concat(array(col("name")),
        when(length(col("name")) >= 1,
          expr("transform(sequence(1, length(name)), i -> " +
            "concat(substring(name, 1, i - 1), substring(name, i + 1)))"))
          .otherwise(array().cast("array<string>"))))).as("v"))
      // the self-join reads this twice; without the persist each side
      // re-runs the distinct-name aggregate over the input
      // (lshCandidatePairs' convention — callers clearCache between
      // corpora)
      .persist()
    val a = variants.select(col("v"), col("name").as("name_a"),
      col("n").as("n_a"))
    val b = variants.select(col("v"), col("name").as("name_b"),
      col("n").as("n_b"))
    a.join(b, "v")
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b", "n_a", "n_b")
      .distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"),
        col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }
}
