package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // parity with Verify/ScalingProbe/PlansDump: outside sbt's forked
      // -D flags, a non-UTC JVM would shift the TIMESTAMP_NTZ events
      .config("spark.sql.session.timeZone", "UTC")
      // Static conf sizing CodeGenerator's generated-class cache
      // (default 100 entries). The interleaved sweep design (below)
      // visits all 214 queries between two runs of the same query, so
      // at the default size every timed run pays full Janino
      // recompilation of every stage — a +0.3-1.0 s tax on nearly
      // every query (measured: the first interleaved full run came in
      // at 172.7 s vs 142.9 s consecutive-run, with no early-alphabet
      // drift but a broad flat inflation). Sized to hold the whole
      // inventory's generated classes so sweep N+1 re-measures the
      // query, not the compiler.
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      // Injected runtime bloom filters OFF (round-15 measurement, the
      // true source of the r14 bench tail's 4.1/2.2 MiB task-binary
      // warnings mis-attributed to v66/v67 literals): localCheckpoint
      // frames (every beam-walk round) are LogicalRDDs with UNKNOWN
      // stats, which defeats InjectRuntimeFilter's 10 GiB application-
      // side threshold, so Spark injected 1 MiB statically-sized
      // blooms (1M items / 8.4M bits vs 280-row fixture scans) whose
      // payloads literal-fold into EVERY task binary of every walk
      // stage. At deployment scale the injection wouldn't fire either
      // (corpus-scale creation sides exceed the 10 MB
      // creationSideThreshold); where a runtime filter IS the right
      // shape, the engine sizes one explicitly from corpus knowledge
      // (Prefilter.bloomSemiFilter — r31's pattern).
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.ui.enabled", "false")
      // local profiling aid; the driver never sets this
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG_DIR", "/tmp/spark-events"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Timed runs per query, report the fastest: the first run of a
    // plan shape pays one-time janino/JIT compilation (seconds of noise
    // on sub-second queries), and the build host has noisy neighbors —
    // min-of-3 measures the steady state through transient load spikes.
    // clearCache between runs drops per-call persisted intermediates
    // (LSH signatures, postings) so data is still computed fresh.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    // Local-iteration filter: comma-separated query-name prefixes.
    // Unset (the driver's case) => full inventory.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq).getOrElse(Seq(""))
    // Named artifact-ownership phase (full-inventory runs only): build
    // every shared per-corpus artifact ONCE, before any timing, so no
    // query's measurement includes another query's snapshot-time index/
    // model construction landing on it by run order. Reported as
    // setup_sec — visible, not hidden — and NOT added to per-query
    // numbers or the total (which, as min-of-N, already excluded these
    // one-time builds in steady state; the phase removes the first-run
    // spikes that made per-run arrays bimodal). Subset runs skip it:
    // a dev loop timing one query shouldn't pay every artifact.
    val (setup: Double, owners: Seq[(String, Double)]) =
      if (sys.env.contains("SPARK_GRAFT_ONLY")) (0.0, Seq.empty)
      else {
        val t0 = System.nanoTime()
        val os = SparkEntry.warm(spark, sfDir)
        os.foreach { case (n, s) =>
          System.err.println(f"[warm] $n%-24s ${s}%.2f s")
        }
        spark.catalog.clearCache() // same state every timed query sees
        ((System.nanoTime() - t0) / 1e9, os)
      }
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE) would render 114,126 — invalid JSON
    def fmt3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // per-owner warm timings as JSON so warm-phase regressions are
    // machine-diffable round-over-round like per-query timings are
    val setupJson = owners
      .map { case (n, s) => "\"" + n + "\":" + fmt3(s) }
      .mkString("{", ",", "}")
    // INTERLEAVED sweeps: run the whole inventory once per sweep and
    // take each query's min ACROSS sweeps — not N consecutive runs per
    // query. Consecutive runs of a short query all complete inside the
    // same measurement window, so a window-scale distortion (JIT/C2
    // compilation in a freshly-started JVM, a host-load spike) inflates
    // every run and the min can't escape it — exactly the round-12
    // early-alphabet drift: the warm phase got 28 s shorter (cross-run
    // model reuse), the JVM entered the timed section cold, and the
    // alphabetically-first i*/r* queries measured 3/3 elevated runs
    // (isolated reproduction: run arrays like [6.5, 1.5, 1.3, 1.2,
    // 1.1, 1.1] — run 1 pays compilation, steady state matches the
    // pins). Sweep N+1 starts a full inventory (~2 min of execution)
    // after sweep N touched the same query, so repeat measurements are
    // far outside both the cold window and any single load spike.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.exists(n.startsWith) }
    val sweeps: Seq[Map[String, Double]] = (1 to runs).map { _ =>
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query must NOT masquerade as a fast success: -1 marker
        val dt =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            -1.0
          }
        spark.catalog.clearCache()
        name -> dt
      }.toMap
    }
    val results: Map[String, (Double, Seq[Double])] = names.map {
      case (name, _) =>
        val times = sweeps.map(_(name))
        name -> (if (times.exists(_ < 0)) -1.0 else times.min, times)
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // ALL N per-run times, not just the min: a degraded measurement
    // window ("every run slow" = real regression) and a transient host
    // spike ("one bad window" = noise) are indistinguishable from a
    // min alone — the artifact must carry enough to adjudicate without
    // a re-run. scripts/benchruns.py reads this field.
    val runsJson = results.toSeq.sortBy(_._1)
      .map { case (k, (_, ts)) =>
        s"\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // -1 failure markers must not subtract from (and so flatter) the
    // total: sum successful queries only
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""runs":$runsJson,"setup_sec":$setup,"setup":$setupJson,""" +
        s""""sf":"$sfDir"}"""
    // The FULL artifact (per-query mins + all N per-run times + the
    // per-owner warm map) goes to a file: at 200+ queries the line is
    // >20 KB, and the driver keeps only the last ~2 KB of stdout — a
    // full line on stdout is guaranteed to arrive truncated and
    // unparseable (the r9/r10 `"parsed": null` artifacts). stdout gets
    // a COMPACT summary line instead, small enough to survive a 2 KB
    // tail capture even with a trailing sbt status line, pointing at
    // the file for the per-query detail.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    val nOk = results.values.count(_._1 >= 0)
    val nFail = results.size - nOk
    println(
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""n_queries":${results.size},"n_failed":$nFail,""" +
        s""""setup_sec":${fmt3(setup)},"queries_file":"$outFile",""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
