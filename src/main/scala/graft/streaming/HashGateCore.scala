package graft.streaming

import graft.llm.Clusters
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The shared hash-space streaming-dedup pipeline under [[PhashGate]]
  * (perceptual image hashes, m13) and [[AfpGate]] (acoustic
  * fingerprints, m14): both gates reduce each micro-batch to DISTINCT
  * 63-bit signatures, band-probe the admitted [[GateIndex]], hamming-
  * verify, elect component keepers, and rejoin rows for per-blob
  * verdicts — only the decode ladder in front differs by modality.
  *
  *   rows -> collapse to DISTINCT sigs        (dup pressure dies here)
  *        -> band-probe the admitted index    (corpus near-dups)
  *        -> band self-join within the batch  (intra-batch near-dups)
  *        -> exact hamming verify <= maxHamming, components, keeper
  *        -> admit keepers; append their band rows to the index
  *
  * Banding is 8 bands of 8 bits over the 63-bit signature — recall is
  * EXACT for hamming <= 7 by pigeonhole, not a probabilistic trade.
  * Every quadratic step runs in distinct-signature space, so a viral
  * re-upload storm collapses to one node before any join; rows rejoin
  * by signature at the end, one join against signature-sized labels.
  */
private[streaming] object HashGateCore {

  /** the 8 (band, key) rows of a 63-bit signature column */
  def bandRows(sigs: DataFrame, sig: String): DataFrame =
    sigs.select(col(sig),
      posexplode(expr(
        s"transform(sequence(0, 7), b -> shiftright($sig, b * 8) & 255)"))
        .as(Seq("band", "key")))

  def bandBucket(nb: Int, band: Column, key: Column): Column =
    pmod(hash(band, key), lit(nb))

  /** One gate step over decoded rows. `rows0` carries
    * `(media_id, fmt, <sig>, ok, verdict, <lakeCols...>)`; `lakeCols`
    * is the full admitted-lake schema (modality metadata + the
    * signature). Lands lake / index-delta / decisions under
    * `batch=<batchTag>` with the gates' shared overwrite-idempotence,
    * then auto-folds via `compactFn` past `autoFoldGenerations`
    * index deltas.
    */
  def step(
      spark: SparkSession,
      rows0: DataFrame,
      sig: String,
      lakeCols: Seq[String],
      batchTag: String,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      maxHamming: Int,
      indexBuckets: Int,
      autoFoldGenerations: Int,
      compactFn: () => Unit): Unit = {
    val sigC = col(sig)
    var cached = List[DataFrame]()
    def track(df: DataFrame): DataFrame = { cached ::= df; df }
    try {
      val rows = track(rows0.cache())
      val okRows = rows.filter(col("ok"))
      // dup pressure collapses HERE: signature-space nodes, with the
      // would-be keeper (min media_id over the signature's rows)
      // riding along for the election and for partner attribution
      val nodes = track(okRows.groupBy(sig)
        .agg(min(col("media_id")).as("cand_id")).cache())
      val bands = track(bandRows(nodes.select(sig), sig).cache())

      // signature-level corpus drops: banded probe of the admitted
      // index, exact hamming verify, partner = the (lowest-hamming,
      // lowest-id) admitted keeper — deterministic across replays
      val corpusDropped: DataFrame =
        if (!GateIndex.exists(spark, s"$indexDir/bands"))
          nodes.select(sigC).limit(0)
            .withColumn("partner", lit(null).cast("long"))
            .withColumn("hamming", lit(null).cast("long"))
        else {
          // which buckets does the batch touch? <= indexBuckets ints —
          // the one driver-side materialization of the probe
          val touched = bands
            .select(bandBucket(indexBuckets, col("band"), col("key")).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toIndexedSeq
          val probe = GateIndex.read(spark, s"$indexDir/bands")
            .filter(col("batch") =!= batchTag && col("bucket").isin(touched: _*))
            .select(col("band"), col("key"),
              col(sig).as("a_hash"), col("media_id").as("a_id"))
          probe
            .join(broadcast(bands), Seq("band", "key"))
            .select(sigC, col("a_hash"), col("a_id")).distinct()
            .withColumn("hamming", expr(s"bit_count($sig ^ a_hash)").cast("long"))
            .filter(col("hamming") <= maxHamming)
            .groupBy(sig)
            .agg(min(struct(col("hamming"), col("a_id"))).as("m"))
            .select(sigC, col("m.a_id").as("partner"),
              col("m.hamming").as("hamming"))
        }
      val cd = track(corpusDropped.cache())

      // intra-batch near-dup components among surviving signatures:
      // the cluster keeper is the signature carrying the min candidate
      // media_id (ties to the lower signature) — m13's lexicographic
      // election in hash space
      val rem = track(nodes.join(cd.select(sig), Seq(sig), "left_anti").cache())
      val remBands = bands.join(broadcast(rem.select(sig)), Seq(sig), "leftsemi")
      val pairs = remBands.as("a").join(remBands.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col(s"a.$sig") < col(s"b.$sig"))
        .select(col(s"a.$sig").as("d1"), col(s"b.$sig").as("d2")).distinct()
        .filter(expr(s"bit_count(d1 ^ d2) <= $maxHamming"))
      val comps = Clusters
        .connectedComponents(rem.select(sigC.as("doc_id")), pairs)
        .withColumnRenamed("doc_id", sig)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
      val elected = track(rem.join(comps, Seq(sig))
        .withColumn("k", min(struct(col("cand_id"), sigC)).over(w))
        .select(sigC, col("cand_id"),
          col("k.cand_id").as("keeper_id"), col(s"k.$sig").as("keeper_hash"))
        .cache())

      // signature-space labels -> per-row verdicts. Three states:
      // corpus-dropped, cluster loser, cluster keeper; within a KEEPER
      // signature only the min-media_id row admits — its same-signature
      // duplicates drop against it at hamming 0.
      val labels =
        cd.select(sigC, lit("corpus").as("hstate"),
            col("partner"), col("hamming"),
            lit(null).cast("long").as("keeper_id"))
          .unionByName(elected.select(sigC,
            when(sigC === col("keeper_hash"), "keeper")
              .otherwise("loser").as("hstate"),
            when(sigC === col("keeper_hash"), lit(null).cast("long"))
              .otherwise(col("keeper_id")).as("partner"),
            when(sigC === col("keeper_hash"), lit(null).cast("long"))
              .otherwise(expr(s"bit_count($sig ^ keeper_hash)").cast("long"))
              .as("hamming"),
            col("keeper_id")))
      val verdicted = track(okRows.join(labels, Seq(sig))
        .select(lakeCols.map(col) ++ Seq(
          when(col("hstate") === "corpus", "drop_corpus")
            .when(col("hstate") === "loser", "drop_batch")
            .when(col("media_id") === col("keeper_id"), "admit")
            .otherwise("drop_batch").as("decision"),
          when(col("hstate") === "corpus", col("partner"))
            .when(col("hstate") === "loser", col("partner"))
            .when(col("media_id") === col("keeper_id"), lit(null).cast("long"))
            .otherwise(col("keeper_id")).as("partner"),
          when(col("hstate") === "corpus", col("hamming"))
            .when(col("hstate") === "loser", col("hamming"))
            .when(col("media_id") === col("keeper_id"), lit(null).cast("long"))
            .otherwise(lit(0L)).as("hamming")): _*)
        .cache())

      def write(df: DataFrame, dir: String): Unit =
        df.write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchTag")

      write(verdicted.filter(col("decision") === "admit")
        .select(lakeCols.map(col): _*), lakeDir)
      // index: 8 band rows per admitted signature, keeper id attached
      val admitted = elected.filter(sigC === col("keeper_hash"))
        .select(sigC, col("keeper_id").as("media_id"))
      GateIndex.writeDelta(
        bandRows(admitted.select(sig), sig)
          .join(broadcast(admitted), Seq(sig))
          .withColumn("bucket", bandBucket(indexBuckets, col("band"), col("key"))),
        s"$indexDir/bands", batchTag)
      // decisions: every ok row's verdict + every rejected row's reason
      write(verdicted.select("media_id", "fmt", "decision", "partner", "hamming")
        .unionByName(rows.filter(!col("ok"))
          .select(col("media_id"), col("fmt"), col("verdict").as("decision"),
            lit(null).cast("long").as("partner"),
            lit(null).cast("long").as("hamming"))), decisionsDir)
    } finally cached.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    // auto-fold AFTER the batch fully commits (NearDupGate's rule: the
    // newest delta generation is never folded, so a crash-replay stays
    // a same-tag overwrite)
    if (autoFoldGenerations > 0 &&
        GateIndex.deltaGenerationCount(spark, s"$indexDir/bands") > autoFoldGenerations)
      compactFn()
  }

  /** the gates' shared three-root maintenance window. `liveTag` is the
    * in-flight batch tag when called from a step's auto-fold — its
    * generation is excluded from every fold BY NAME (exact on stores
    * without directory mtimes; see [[GateIndex.foldIntoBase]]).
    */
  def compact(
      spark: SparkSession,
      lakeDir: String,
      indexDir: String,
      decisionsDir: String,
      liveTag: Option[String] = None): Unit = {
    val roots = Seq(lakeDir, decisionsDir, s"$indexDir/bands")
    LakeCompact.withLeases(spark, roots) {
      LakeCompact.foldGenerations(spark, lakeDir, assumeLeased = true, liveTag = liveTag)
      LakeCompact.foldGenerations(spark, decisionsDir, assumeLeased = true, liveTag = liveTag)
      GateIndex.foldIntoBase(spark, s"$indexDir/bands", liveTag)
    }
  }
}
