package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ×100 density probe for the blocked pairwise similarity ops (PLANS.md
  * round-16 scale arc): the three ops whose cost is quadratic in BLOCK
  * density — d8 semDedup (cell blocks), e2 embeddingNearDup (label
  * blocks), e5 srpNearDup (SRP-signature blocks) — each probed at the
  * registered configuration AND at the configuration its own Scaladoc
  * prescribes for a grown corpus (more cells / finer buckets), so the
  * ledger carries the measured cost of ignoring that prescription.
  *
  *   runMain graft.tools.ProbeAnn <scaledDir> [section]
  *
  * `section` ∈ d8 | d8:<k> (one k arm) | d8reg | e5 | e2 | e2reg | all |
  * lab. `all` (default) runs the op sections including the REGISTERED
  * round-17 shapes (d8reg: derived-k kmeans semDedup; e2reg: label ∧
  * bucket); `lab` is the opt-in argmax cost decomposition (it
  * deliberately re-runs the ~6-minute struct-ordered cliff arm, so it is
  * NOT part of `all`). Forces with a count() over the pair/keep output
  * (no keep-first elimination hazard here — the filters consume the
  * scored columns). */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val section = args.lift(1).getOrElse("all")
    require(section.matches("all|lab|d8(:\\d+)?|d8reg|e5|e2|e2reg|e10|e2recall|e2sample|e2probe|d768"),
      s"unknown section '$section': use d8 | d8:<k> | d8reg | e5 | e2 | e2reg | e10 | e2recall | e2sample | e2probe | d768 | all | lab")
    def on(s: String) = section == "all" || section == s
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.model.Tables(spark, dir, "embeddings")

    // GRAFT_PROBE_PROF=1 prints per-stage task time + shuffle volumes on
    // the second (warm) pass, via the shared StageProf listener.
    @volatile var collect = false
    if (sys.env.get("GRAFT_PROBE_PROF").contains("1"))
      StageProf.attachPrinter(spark)(() => collect)

    def time(label: String)(body: => Long): Unit = {
      for (pass <- 1 to 2) {
        collect = pass == 2
        val t0 = System.nanoTime()
        val n = body
        // events are async — drain before dropping the flag or the final
        // (usually heaviest) stage lines are silently lost
        if (collect) StageProf.drain()
        collect = false
        println(f"[ann] pass=$pass $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    // d8: the FORMER registered k=8 stand-in (per-cell density grows with
    // the corpus — the mis-config semDedup's doc warns about; round 17
    // re-registered d8 at derived-k kmeans, probed by d8reg below) vs k
    // grown with the corpus.
    // Total cost ≈ c1·n·k (broadcast argmax assignment) + c2·n²/k (within-
    // cell pairs): a U-curve in k with optimum ~√(c2·n/c1), so "more cells"
    // overshoots once assignment dominates — k=80 probes the middle.
    // Survivor counts differ by design — k is a clustering parameter.
    // `d8:<k>` runs a single k arm (the assignment-shape experiments
    // re-measure only the arm the shape can move).
    val kOnly = Option(section).filter(_.startsWith("d8:")).map(_.drop(3).toInt)
    if (on("d8") || kOnly.nonEmpty) for (k <- kOnly.map(Seq(_)).getOrElse(Seq(8, 80, 800))) {
      time(s"d8_semdedup k=$k") {
        graft.ops.Similarity
          .semDedup(emb, emb.filter(col("vec_id") < k), 0.3)
          .filter(col("keep")).count()
      }
    }

    // d8reg: the REGISTERED shape verbatim — pulled from the registry (not
    // re-built here) so the probe cannot drift from the registration:
    // derived k = ceil(sqrt(n)) with real Lloyd centroids (the round-17
    // fix for the k=8 density cliff). Includes the kmeans training cost,
    // which the vec_id<k arms skip.
    if (on("d8reg")) time("d8_semdedup registered (derived-k kmeans)") {
      graft.SparkEntry.queries("d8_semdedup")(spark, dir)
        .filter(col("keep")).count()
    }

    // e5 vs e2: signature blocking vs label blocking on the same corpus
    // and threshold. e5's planes knob is the same density control as d8's
    // k: planes=12 is the registered shape; the doc's scale answer is more
    // planes when buckets saturate.
    if (on("e5")) for (planes <- Seq(12, 16)) {
      time(s"e5_srp_neardup planes=$planes") {
        graft.ops.Similarity.srpNearDup(emb, 0.3, planes = planes).count()
      }
    }
    if (on("e2")) time("e2_embed_neardup (label blocks)") {
      graft.ops.Similarity.embeddingNearDup(emb, 0.3).count()
    }
    // e2reg: the REGISTERED shape (r18: label ∧ derived-k k-means cell) —
    // pulled from the registry so the probe cannot drift from it.
    if (on("e2reg")) time("e2_embed_neardup registered (label ∧ cell)") {
      graft.SparkEntry.queries("e2_embed_neardup")(spark, dir).count()
    }

    // e10: the IVF-PQ composition at the REGISTERED config (from the
    // registry — no drift) next to its two parents at the same config, so
    // the ledger shows what composing buys: e4 (IVF alone) still pays
    // exact float cosine inside probed cells; e9 (PQ alone) still scans
    // every corpus code per query; e10 pays integer ADC on probed cells
    // only. Forced through the full output (rank filter consumes dist_fx).
    if (on("e10")) {
      time("e4_ivf_topk (IVF alone)") {
        graft.SparkEntry.queries("e4_ivf_topk")(spark, dir).count()
      }
      time("e9_pq_topk (PQ alone)") {
        graft.SparkEntry.queries("e9_pq_topk")(spark, dir).count()
      }
      time("e10_ivfpq_topk registered (IVF-PQ)") {
        graft.SparkEntry.queries("e10_ivfpq_topk")(spark, dir).count()
      }
      // Scale-config arms: the composition's win is the probed FRACTION
      // (nprobe/k), so at the gate's 8 coarse cells (25% probed) the extra
      // enc⋈cells join can cost more than the ADC restriction saves. 800
      // cells (0.25% probed — the k≈√n regime d8 derives) is where IVF-PQ
      // must beat IVF alone: exact float cosine over probed cells vs
      // integer ADC over the same cells.
      val q = emb.filter(col("vec_id") < 10)
      val cent800 = emb.filter(col("vec_id") < 800)
      time("e4 ivfTopK k=800 cells") {
        graft.ops.Similarity.ivfTopK(emb, q, cent800, 3, nprobe = 2).count()
      }
      time("e10 ivfPqTopK k=800 cells") {
        graft.ops.Similarity.ivfPqTopK(emb, q, cent800, 3, nprobe = 2).count()
      }
      // Query-volume arms: with 10 queries the probed-cell rerank is noise
      // either way; the PQ leg's 16× bandwidth cut only matters when the
      // candidate stream (n·nprobe·nq/k pairs) dominates — batch ANN.
      val q1k = emb.filter(col("vec_id") < 1000)
      time("e4 ivfTopK k=800 cells nq=1000") {
        graft.ops.Similarity.ivfTopK(emb, q1k, cent800, 3, nprobe = 2).count()
      }
      time("e10 ivfPqTopK k=800 cells nq=1000") {
        graft.ops.Similarity.ivfPqTopK(emb, q1k, cent800, 3, nprobe = 2).count()
      }
    }

    // e2recall (opt-in — NOT in `all`: it runs the density-quadratic
    // label-only ground truth): the registered composed blocking's recall
    // curve vs plane count and threshold, against the label-only pair set.
    // Feeds the registration decision (8 vs 16 planes) and the gate-level
    // recall pin OpsSpec carries (ADVICE r17 medium).
    if (section == "e2recall") {
      import graft.ops.Similarity
      val thr = 0.3 // the gate corpus has NO pairs above 0.6 (measured)
      val truth = Similarity.embeddingNearDup(emb, thr).count()
      println(f"[recall] thr=$thr label-only truth pairs=$truth")
      for (planes <- Seq(4, 8, 16)) {
        val got = Similarity
          .embeddingNearDupBucketed(emb, thr, planes = planes).count()
        val rec = if (truth == 0) Double.NaN else got.toDouble / truth
        println(f"[recall] thr=$thr planes=$planes pairs=$got recall=$rec%.4f")
      }
      // the d8-machinery alternative: block on label ∧ derived-k kmeans cell
      val k = Similarity.derivedCellCount(emb)
      val base = emb.filter(size(col("embedding")) === 64)
        .select(col("label"), col("vec_id"),
          Similarity.asDouble(col("embedding")).as("emb"),
          Similarity.l2norm(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val assigned = Similarity.kmeansAssign(emb, k, iters = 2)
        .join(base, Seq("vec_id"))
      val l = assigned.select(col("label"), col("cell"), col("vec_id").as("a"),
        col("emb").as("ea"), col("nrm").as("na"))
      val r = assigned.select(col("label"), col("cell"), col("vec_id").as("b"),
        col("emb").as("eb"), col("nrm").as("nb"))
      val got = l.join(r, Seq("label", "cell")).filter(col("a") < col("b"))
        .filter(Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= thr)
        .count()
      val rec = if (truth == 0) Double.NaN else got.toDouble / truth
      println(f"[recall] thr=$thr label∧cell k=$k pairs=$got recall=$rec%.4f")
    }

    // e2sample (opt-in): the SemDeDup-paper training posture — Lloyd
    // iterations over a deterministic SAMPLE, assignment over the full
    // corpus. e2/d8's registered shapes train on the full corpus each
    // iteration (O(n·k·dims) per iteration); at 100 TB the paper answer
    // is sampled training, so this measures what it costs in recall and
    // buys in wall. Sample = md5-bucket on vec_id (the x6 oracle-
    // replayable convention), k stays derived from the FULL corpus.
    if (section == "e2sample") {
      import graft.ops.Similarity
      val thr = 0.3
      val dims = 64
      val k = Similarity.derivedCellCount(emb)
      val full = emb.filter(size(col("embedding")) === dims)
      val base = full
        .select(col("label"), col("vec_id"),
          Similarity.asDouble(col("embedding")).as("emb"),
          Similarity.l2norm(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val small = emb.count() <= 10000
      val truth = if (small) Similarity.embeddingNearDup(emb, thr).count() else -1L
      if (small) println(s"[sample] truth pairs=$truth")
      // trainPct is the REGISTERED sampling path since r19 (salt "lloyd"),
      // so this arm measures exactly the shape the gate certifies.
      for (pct <- Seq(100, 10, 1)) {
        val t0 = System.nanoTime()
        val centF = Similarity.kmeansCentroidFrame(spark, emb, k, iters = 2, trainPct = pct)
          .select(col("vec_id").as("cell"),
            Similarity.asDouble(col("embedding")).as("cemb"))
        val assigned = Similarity.assignCells(
          base.select(col("vec_id"), col("emb"), col("nrm")), centF)
          .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
        val keyed = graft.Materialize.pin(assigned)
        val l = keyed.select(col("label"), col("cell"), col("vec_id").as("a"),
          col("emb").as("ea"), col("nrm").as("na"))
        val r = keyed.select(col("label"), col("cell"), col("vec_id").as("b"),
          col("emb").as("eb"), col("nrm").as("nb"))
        val pairs = l.join(r, Seq("label", "cell")).filter(col("a") < col("b"))
          .filter(Similarity.dot(col("ea"), col("eb")) / (col("na") * col("nb")) >= thr)
          .count()
        val wall = (System.nanoTime() - t0) / 1e9
        val rec = if (truth > 0) f"${pairs.toDouble / truth}%.4f" else "n/a"
        println(f"[sample] train=$pct%% k=$k pairs=$pairs recall=$rec t=$wall%.2fs")
      }
    }

    // d768 (opt-in): the e-family at REALISTIC embedding dims — point this
    // at a ScaleCorpus `dims768` corpus (12 perturbed 64-dim tiles per
    // vector). The Similarity Scaladocs claim PQ / IVF-PQ's lever appears
    // when dims grow toward 768 (the 16× scan-footprint argument, the
    // fixed-point LUT range at sub=192); this measures it instead of
    // claiming it. Same k=800 / nq=1000 configs as the e10 scale arms so
    // the 64-dim decades in BASELINE.md compare row-for-row. Recall curves
    // on the tiled corpus are NOT meaningful (tiles correlate) — wall and
    // footprint are the probe's subject.
    if (section == "d768") {
      import graft.ops.Similarity
      val q1k = emb.filter(col("vec_id") < 1000)
      val cent800 = emb.filter(col("vec_id") < 800)
      time("e1 bruteForceTopK d768 nq=1000") {
        Similarity.bruteForceTopK(emb, q1k, 3).count()
      }
      time("e4 ivfTopK d768 k=800 nq=1000") {
        Similarity.ivfTopK(emb, q1k, cent800, 3, nprobe = 2).count()
      }
      time("e9 pqTopK d768 m=4 nq=1000") {
        Similarity.pqTopK(emb, q1k, 3, m = 4, codes = 4, dims = 768).count()
      }
      time("e10 ivfPqTopK d768 k=800 nq=1000") {
        Similarity.ivfPqTopK(emb, q1k, cent800, 3, nprobe = 2,
          m = 4, codes = 4, dims = 768).count()
      }
    }

    // e2probe (opt-in): corpus-side multi-probe A/B — the r19 registration
    // decision. Same sampled training (trainPct=10, the registered
    // posture); nprobe=1 vs 2 on the corpus side of the celled blocking.
    // Recall vs the label-only truth where the corpus is small enough to
    // compute it; wall + pair count always.
    if (section == "e2probe") {
      import graft.ops.Similarity
      val thr = 0.3
      val small = emb.count() <= 10000
      val truth = if (small) Similarity.embeddingNearDup(emb, thr).count() else -1L
      if (small) println(s"[probe2] truth pairs=$truth")
      // time() = two passes per arm: the first ×1000 run of this section
      // timed JVM/scan warmup into the nprobe=1 arm and a 30-load window
      // into the nprobe=2 arm (432 vs 90 s for the SAME nprobe=1 leg
      // across windows) — single-pass numbers here measure the host.
      for (np <- Seq(1, 2)) {
        var pairs = -1L
        time(s"e2 celled trainPct=10 nprobe=$np") {
          pairs = Similarity
            .embeddingNearDupCelled(emb, thr, trainPct = 10, nprobe = np).count()
          pairs
        }
        val rec = if (truth > 0) f"${pairs.toDouble / truth}%.4f" else "n/a"
        println(s"[probe2] nprobe=$np pairs=$pairs recall=$rec")
      }
    }

    // lab (opt-in only — NOT in `all`): decompose the k=800 assignment
    // stage cost — candidate-row production alone, + the dot, + the full
    // struct-ordered argmax (the ~6 min cliff arm, kept reproducible).
    if (section == "lab") {
      import graft.ops.Similarity.{asDouble, dot, l2norm}
      val base = emb.filter(size(col("embedding")) === 64)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"),
          l2norm(col("embedding")).as("nrm"))
        .filter(col("nrm") > 0)
      val cent = broadcast(emb.filter(col("vec_id") < 800)
        .select(col("vec_id").as("cell"),
          asDouble(col("embedding")).as("cemb")))
      def one(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"[lab] $label rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      // count() would let Catalyst PRUNE the aggregate expressions (the
      // ProbeChunk elimination trap) — every arm folds its agg output into
      // a scalar so the hot expression provably evaluates per row.
      one("rows-only (count per vec)") {
        base.join(cent).groupBy("vec_id")
          .agg(count(lit(1)).as("n"))
          .agg(sum(col("n"))).head().getLong(0)
      }
      one("sum(dot) (cosine, no argmax)") {
        base.join(cent).groupBy("vec_id")
          .agg(sum(dot(col("emb"), col("cemb"))).as("s"))
          .agg(sum(col("s"))).head().getDouble(0).toLong
      }
      one("max_by struct ordering (the real argmax)") {
        base.join(cent).groupBy("vec_id")
          .agg(max_by(col("cell"),
            struct(dot(col("emb"), col("cemb")).as("c"),
              (-col("cell")).as("n"))).as("cell"))
          .agg(sum(col("cell"))).head().getLong(0)
      }
      one("max_by primitive ordering (cos only, ties arbitrary)") {
        base.join(cent).groupBy("vec_id")
          .agg(max_by(col("cell"),
            dot(col("emb"), col("cemb")) / (col("nrm"))).as("cell"))
          .agg(sum(col("cell"))).head().getLong(0)
      }
    }
    spark.stop()
  }
}
