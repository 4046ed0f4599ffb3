package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Markdown performance/analysis report — the engine-side analog of the
  * reference's PDF report + charts (`generate_report.py:80-239`:
  * system overview, performance section, shard-distribution chart,
  * conclusion; `visualize_results.py:91-155`: latency-vs-k and
  * distribution plots). No plotting stack in this environment, so
  * charts render as ASCII bars inside a markdown artifact — the
  * content (latency vs k, recall vs probes, shard distribution,
  * imbalance, memory estimate) is the same analysis.
  *
  * Usage: runMain graft.Report [detailJson] [outMd] [prevDetailJson]
  *   detailJson defaults to ./BENCH_DETAIL.json (a `graft.Bench` run's
  *   detail output); outMd defaults to ./REPORT.md. The shard section
  *   additionally runs the live v10 stats query against
  *   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  *
  *   With a third argument (the PREVIOUS round's committed detail
  *   file) the report adds a round-over-round section listing only
  *   rows whose seconds moved more than 1.3× in either direction —
  *   since r14 every row ≥0.3 s is an in-run median-of-3, so a move
  *   past that band is signal, not sampling noise (r13 verdict task
  *   #2; sub-0.3 s rows sit on the scheduler floor and are excluded).
  */
object Report {
  private val BarWidth = 40

  private def bar(frac: Double): String =
    "█" * math.max(0, math.min(BarWidth, math.round(frac * BarWidth).toInt))

  /** Minimal parser for Bench's flat detail line:
    * {"metric":...,"queries":{"name":1.23,...},"gauges":{...},
    * "sf":"..."}. Parses ONLY the named flat object — scanning the
    * whole line (the r12 bug) also swallowed the provenance's
    * `load_avg_*` and ranked a load average as a query.
    */
  private def parseMap(json: String, key: String): Seq[(String, Double)] = {
    val start = json.indexOf("\"" + key + "\":{")
    if (start < 0) return Seq.empty
    val open = json.indexOf('{', start)
    val close = json.indexOf('}', open) // flat object, no nesting
    val m = """"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)""".r
    m.findAllMatchIn(json.substring(open, close + 1))
      .map(g => g.group(1) -> g.group(2).toDouble)
      .toSeq
  }

  def main(args: Array[String]): Unit = {
    val detailPath = args.headOption.getOrElse("BENCH_DETAIL.json")
    val outPath = args.drop(1).headOption.getOrElse("REPORT.md")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val detail = new String(
      Files.readAllBytes(Paths.get(detailPath)), "UTF-8")
    // seconds and gauges (recall/MB/file counts) are separate maps;
    // lookups by name may draw from either, but anything that SUMS or
    // RANKS works over the seconds map alone
    val secs = parseMap(detail, "queries").toMap
    val q = secs ++ parseMap(detail, "gauges").toMap
    val totalRe = """"metric":"total","value":([0-9.]+)""".r
    val total = totalRe.findFirstMatchIn(detail).map(_.group(1)).getOrElse("?")
    val sfRe = """"sf":"([^"]+)"""".r
    val benchSf = sfRe.findFirstMatchIn(detail).map(_.group(1)).getOrElse("?")

    val sb = new StringBuilder
    sb ++= "# graft engine report\n\n"
    sb ++= s"Source: `$detailPath` (bench sf `$benchSf`), " +
      s"stats sf `$sfDir`.\n\n"

    // ---- 1. Overview (generate_report.py:80 system overview) -------
    sb ++= "## 1. Overview\n\n"
    sb ++= s"- bench total: **$total s** across " +
      s"${q.size} recorded metrics\n"
    q.get("index_build").foreach(v =>
      sb ++= f"- LSH index build: $v%.3f s\n")
    q.get("quant_index_build").foreach(v =>
      sb ++= f"- quantized index build (SQ8+IVF+PQ): $v%.3f s\n")
    sb ++= "\n"

    // ---- 2. Latency vs k (visualize_results.py:91 latency_vs_k) ----
    sb ++= "## 2. Search latency vs k (ms/query, 20 warm queries)\n\n"
    sb ++= "| k | exact | pruned |\n|---|---|---|\n"
    Seq(1, 5, 10, 20, 50, 100).foreach { k =>
      (q.get(s"knn_exact_k$k"), q.get(s"knn_pruned_k$k")) match {
        case (Some(e), Some(p)) =>
          sb ++= f"| $k | ${e * 1000}%.1f | ${p * 1000}%.1f |\n"
        case _ => ()
      }
    }
    q.get("knn_batch100_per_query").foreach { v =>
      sb ++= f"\nBatched (100 queries, one job): **${v * 1000}%.1f ms/query** " +
        f"(${q.getOrElse("knn_batch100_total", 0.0)}%.2f s total)\n"
    }
    sb ++= "\n"

    // ---- 2b. Quantized tiers ---------------------------------------
    val tiers = Seq(
      ("sq8", "knn_sq8_k10", "8 bits/dim"),
      ("int4", "knn_int4_k10", "4 bits/dim"),
      ("pq", "knn_pq_k10", "~0.5 bits/dim"),
      ("opq", "knn_opq_k10", "~0.5 bits/dim, trained rotation"),
      ("ivfpq", "knn_ivfpq_k10", "~0.5 bits/dim, 2/16 cells"),
      ("ivfpqr", "knn_ivfpqr_k10", "~0.5 bits/dim residual, 2/16 cells"),
      ("bitq", "knn_bitq_k10", "1 bit/dim"))
      .flatMap { case (n, k, b) => q.get(k).map(v => (n, v, b)) }
    if (tiers.nonEmpty) {
      sb ++= "### Quantized-tier search, k=10 (coarse code scan + " +
        "bounded exact re-rank)\n\n"
      sb ++= "| tier | ms/query | code size (vs 32 bits/dim float) |\n|---|---|---|\n"
      tiers.foreach { case (n, v, b) =>
        sb ++= f"| $n | ${v * 1000}%.1f | $b |\n"
      }
      sb ++= "\n"
    }

    // ---- 3. Recall vs probes ---------------------------------------
    sb ++= "## 3. Pruned-search recall@10 vs probes (16-bucket store)\n\n"
    sb ++= "```\n"
    (1 to 4).foreach { p =>
      q.get(s"knn_pruned_recall_at10_p${p}_of16").foreach { r =>
        sb ++= f"probes=$p  ${bar(r)}%-40s $r%.3f\n"
      }
    }
    sb ++= "```\n\n"
    // PQ vs OPQ recall at the same coarse budget — what the trained
    // rotation buys at identical bytes read (r12 verdict task #5)
    (q.get("knn_pruned_recall_at10_pq"),
      q.get("knn_pruned_recall_at10_opq")) match {
      case (Some(p), Some(o)) =>
        sb ++= f"Quant-tier recall@10 at coarseN=100: pq $p%.3f vs " +
          f"opq $o%.3f (trained rotation, same code budget).\n\n"
      case _ => ()
    }
    // multi-table OR-probing curve at the same probed fraction per
    // probe (1/16 of one corpus copy) — present when the bench ran
    // the LshConfig(multiTable) protocol
    if (q.contains("knn_pruned_recall_at10_p1_of16_mt")) {
      sb ++= "Multi-table OR-probing (4 tables × 16 buckets, same " +
        "probed fraction per probe):\n\n"
      sb ++= "```\n"
      (1 to 4).foreach { p =>
        q.get(s"knn_pruned_recall_at10_p${p}_of16_mt").foreach { r =>
          sb ++= f"probes=$p  ${bar(r)}%-40s $r%.3f\n"
        }
      }
      sb ++= "```\n\n"
    }

    // ---- 3b. Storage vs recall: the multi-table layout buys recall
    //      with ×L storage; recall-per-MB makes the trade a number.
    val layouts = Seq(
      ("mod-16 bucket", "index_mb_mod16", "knn_pruned_recall_at10_p%d_of16"),
      ("multi-table 4×16", "index_mb_mt4x16",
        "knn_pruned_recall_at10_p%d_of16_mt"))
      .flatMap { case (name, mbKey, rKey) =>
        q.get(mbKey).map(mb => (name, mb,
          // one cell per probe position: a missing middle key must
          // render as "—" in ITS column, not compact later values left
          (1 to 4).map(p => q.get(rKey.format(p)))))
      }
    if (layouts.nonEmpty) {
      sb ++= "### Storage vs recall (recall per MB)\n\n"
      sb ++= "| layout | index MB | r@10 p=1 | p=2 | p=3 | p=4 | " +
        "p=1 recall/MB |\n|---|---|---|---|---|---|---|\n"
      layouts.foreach { case (name, mb, rs) =>
        val cells = rs.map(_.map(r => f"$r%.3f").getOrElse("—")).mkString(" | ")
        val perMb = rs.head.map(r => f"${r / mb}%.4f").getOrElse("—")
        sb ++= f"| $name | $mb%.1f | $cells | $perMb |\n"
      }
      q.get("index_mb_mod3").foreach(mb =>
        sb ++= f"\n(reference-shaped mod-3 store: $mb%.1f MB, " +
          "prunes at most 1/3 of the corpus per probe)\n")
      sb ++= "\n"
    }

    // ---- 3c. Maintenance decisions (e26's maintain() pass): what the
    //      OPTIMIZE-when policy decided this run — compaction scope,
    //      fresh-audit recall, whether a retrain fired.
    q.get("maintain_compacted_cells").foreach { cells =>
      val audit = q.get("maintain_audit_recall")
        .map(r => f", fresh audit recall@10 = $r%.3f").getOrElse("")
      val retrain = q.get("maintain_retrained") match {
        case Some(v) if v > 0.5 =>
          ", RETRAINED" + q.get("maintain_recall_after_retrain")
            .map(r => f" (recall after = $r%.3f)").getOrElse("")
        case _ => ", no retrain (audit met target)"
      }
      val files = (q.get("maintain_files_before"), q.get("maintain_files_after"))
        match {
          case (Some(b), Some(a)) => f", files ${b.toLong} → ${a.toLong}"
          case _ => ""
        }
      sb ++= "### Maintenance decisions (policy-driven maintain())\n\n"
      sb ++= f"compacted ${cells.toLong} over-threshold cell(s)$files" +
        s"$audit$retrain\n\n"
    }

    // ---- PNG chart artifacts (the reference's matplotlib figures:
    //      latency_vs_k.png `performance_analysis.py:101-111`,
    //      shard_distribution.png `:200-214`) — written next to the
    //      markdown so they land in the repo like the reference's.
    val outDir = Option(new java.io.File(outPath).getParent).getOrElse(".")
    try {
      val ks = Seq(1, 5, 10, 20, 50, 100)
      def curve(prefix: String) = ks.flatMap(k =>
        q.get(s"knn_${prefix}_k$k").map(v => (k.toDouble, v * 1000)))
      val (ex, pr) = (curve("exact"), curve("pruned"))
      if (ex.nonEmpty) {
        Charts.lineChart(Seq("exact" -> ex, "pruned" -> pr),
          "Search Latency vs. k (20 warm queries)", "k (number of results)",
          "Latency (ms)", s"$outDir/latency_vs_k.png")
        sb ++= "![latency vs k](latency_vs_k.png)\n\n"
      }
      val mod = (1 to 4).flatMap(p =>
        q.get(s"knn_pruned_recall_at10_p${p}_of16").map(r => (p.toDouble, r)))
      val mt = (1 to 4).flatMap(p =>
        q.get(s"knn_pruned_recall_at10_p${p}_of16_mt").map(r => (p.toDouble, r)))
      if (mod.nonEmpty) {
        Charts.lineChart(
          Seq("mod-16 bucket" -> mod) ++
            (if (mt.nonEmpty) Seq("multi-table 4×16" -> mt) else Nil),
          "Pruned-search recall@10 vs probes", "probes (1/16 corpus each)",
          "recall@10", s"$outDir/recall_vs_probes.png")
        sb ++= "![recall vs probes](recall_vs_probes.png)\n\n"
      }
    } catch { case e: Throwable =>
      System.err.println(s"[report] charts failed: ${e.getMessage}")
    }

    // ---- 4. Query-group totals + slowest ---------------------------
    // The detail file carries per-query entries only; derive group
    // totals via Bench.groupOf (the single shared mapping).
    val perQuery = secs.filterNot { case (k, _) =>
      k.startsWith("knn_") || k.startsWith("index_build") ||
        Bench.isGauge(k) ||
        k == "quant_index_build" || k.endsWith("_total")
    }
    val groups = perQuery.groupBy { case (n, _) => Bench.groupOf(n) }
      .map { case (g, es) => g -> es.values.sum }
    if (groups.nonEmpty) {
      sb ++= "## 4. Query-group wall time (s)\n\n```\n"
      val mx = groups.values.max
      groups.toSeq.sortBy(-_._2).foreach { case (g, v) =>
        sb ++= f"$g%-22s ${bar(v / mx)}%-40s $v%.2f\n"
      }
      sb ++= "```\n\n"
    }
    if (perQuery.nonEmpty) {
      sb ++= "### Slowest 10 queries\n\n| query | s |\n|---|---|\n"
      perQuery.toSeq.sortBy(-_._2).take(10).foreach { case (k, v) =>
        sb ++= f"| $k | $v%.2f |\n"
      }
      sb ++= "\n"
    }

    // ---- 4b. Round-over-round (vs a previous detail file) ----------
    args.drop(2).headOption.foreach { prevPath =>
      try {
        val prevText = new String(
          Files.readAllBytes(Paths.get(prevPath)), "UTF-8")
        val prev = parseMap(prevText, "queries").toMap
        // only rows that are medians in BOTH runs are comparable:
        // EACH side's floor is the adaptive-median threshold recorded
        // in that file's own provenance — never a hardcoded constant
        // that silently diverges when Bench's threshold moves again. A
        // pre-threshold-provenance file defaults to 2.0 s (the
        // threshold of every run that predates the recording), so a
        // 0.3-2.0 s single sample never reads as a 1.3x move
        // (r14 ADVICE #2).
        def floorOf(text: String): Double =
          """"median_threshold_s":([0-9.]+)""".r
            .findFirstMatchIn(text).map(_.group(1).toDouble).getOrElse(2.0)
        val prevFloor = floorOf(prevText)
        val curFloor = floorOf(detail)
        val moved = secs.toSeq.flatMap { case (k, v) =>
          prev.get(k).collect {
            case p if p >= prevFloor && v >= curFloor &&
                math.max(v / p, p / v) > 1.3 =>
              (k, p, v, v / p)
          }
        }.sortBy(-_._4)
        sb ++= s"### Round-over-round vs `$prevPath` (moves >1.3×)\n\n"
        if (moved.isEmpty)
          sb ++= "_no row moved more than 1.3×._\n\n"
        else {
          sb ++= "| query | prev s | now s | ratio |\n|---|---|---|---|\n"
          moved.foreach { case (k, p, v, r) =>
            sb ++= f"| $k | $p%.3f | $v%.3f | $r%.2f |\n"
          }
          sb ++= "\n"
        }
      } catch { case e: Throwable =>
        System.err.println(s"[report] round-over-round failed: ${e.getMessage}")
      }
    }

    // ---- 5. Shard distribution (generate_report.py:207,
    //         performance_analysis.py:224-235) ----------------------
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val statsDf = SparkEntry.queries("v10_stats")(spark, sfDir)
      val stats = statsDf.collect()
      if (stats.nonEmpty) {
        val cols = statsDf.columns
        val cntIdx = cols.indexOf("cnt")
        val maxCnt = stats.map(_.getLong(cntIdx)).max.toDouble
        sb ++= "## 5. Shard (bucket) distribution\n\n```\n"
        stats.foreach { r =>
          val b = r.get(cols.indexOf("bucket"))
          val c = r.getLong(cntIdx)
          sb ++= f"bucket $b%-4s ${bar(c / maxCnt)}%-40s $c%d\n"
        }
        sb ++= "```\n\n"
        try {
          Charts.barChart(
            stats.map(r => r.get(cols.indexOf("bucket")).toString).toSeq,
            stats.map(_.getLong(cntIdx).toDouble).toSeq,
            "Vector Distribution Across Shards", "shard (LSH bucket)",
            "Number of Vectors", s"$outDir/shard_distribution.png")
          sb ++= "![shard distribution](shard_distribution.png)\n\n"
        } catch { case e: Throwable =>
          System.err.println(s"[report] shard chart failed: ${e.getMessage}")
        }
        val iIdx = cols.indexOf("imbalance")
        if (iIdx >= 0)
          sb ++= f"- imbalance (max−min)/avg: ${stats.head.getDouble(iIdx)}%.4f\n"
        val mIdx = cols.indexOf("memory_mb")
        if (mIdx >= 0)
          sb ++= f"- estimated resident size: ${stats.map(_.getDouble(mIdx)).sum}%.2f MB\n"
        sb ++= "\n"
      }
    } catch { case e: Throwable =>
      sb ++= s"## 5. Shard distribution\n\n_unavailable: ${e.getMessage}_\n\n"
    } finally spark.stop()

    Files.write(Paths.get(outPath), sb.toString.getBytes("UTF-8"))
    println(s"wrote $outPath")
  }
}
