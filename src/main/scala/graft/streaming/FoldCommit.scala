package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE crash-atomic maintenance publication primitive, shared by
  * every right-to-be-forgotten fold in the repo (the round-11 unification:
  * `LlmQueries.forgetRows` for the row-shaped index folds d18/s10/s19,
  * `LlmQueries.s13Forget`/`s13FoldForgets` for the BM25 retraction
  * generations, and [[GateForget]] for the streaming gates'
  * batch-generation roots). Callers hold the [[LakeCompact]] lease; this
  * object only guarantees that a crash at ANY point leaves the root in a
  * state the next entry heals to either the pre-fold or the post-fold
  * image — never a torn one.
  *
  * Protocol, per publication under a `root` directory:
  *
  *  1. '''stage''' — the caller's `write` populates
  *     `root/_fold-<token>.staging` (underscore-prefixed, so parquet
  *     partition discovery and every reader ignore it);
  *  2. '''commit marker''' — a `_folded_inputs` file is written INTO the
  *     staging dir: line 1 is the final name this publication will take,
  *     the remaining lines are root-relative names to delete once it is
  *     visible (replaced generations, or the displaced old relation).
  *     The marker doubles as the completeness attestation: staging
  *     without a marker is garbage, staging with one is publishable;
  *  3. '''displace''' — if the final name is already taken (the
  *     fixed-path relation-replacement case: `postings`, `shingles`…),
  *     the current dir is renamed aside to `<final>.retired-<token>`
  *     (that name was already recorded in the marker at step 2);
  *  4. '''publish''' — ONE rename makes the staged data visible at its
  *     final name, carrying its marker with it;
  *  5. '''retire''' — the marker's listed names are deleted, then the
  *     marker itself.
  *
  * [[heal]] (run at every publication entry, and by maintenance
  * operations before they read) finishes whatever a crash interrupted:
  * committed staging rolls FORWARD (the staged image was derived under
  * the same lease from a relation nothing has touched since, so
  * completing the fold is exactly what the crashed operation intended —
  * and the folds themselves are idempotent filtered rewrites, so a
  * re-entered fold over a rolled-forward image is a no-op); uncommitted
  * staging rolls BACK (deleted); published-but-unretired dirs finish
  * their retire phase. Every heal step is itself re-crashable.
  *
  * A REBUILD invalidates pending maintenance instead: [[clearResidue]]
  * drops staged/retired state so a stale fold from a previous corpus can
  * never roll forward over freshly built relations (the cross-run
  * poisoning failure mode documented on [[graft.llm.LlmQueries]]'s
  * s13BuildAt).
  */
private[graft] object FoldCommit {

  val Marker = "_folded_inputs"
  private val StagePrefix = "_fold-"
  private val StageSuffix = ".staging"

  /** TEST-ONLY crash injection: set to one of "staged", "committed",
    * "displaced", "published", "retiring" and the matching point in
    * [[publish]]/[[finishRetire]] throws, simulating a process death
    * there. Never set outside specs.
    */
  @volatile private[graft] var failpoint: String = null
  private def trip(p: String): Unit =
    if (failpoint == p)
      throw new IllegalStateException(s"injected crash at $p")

  /** Publish one maintenance result under `root` as `finalName`,
    * deleting the root-relative `retires` once it is visible. `write`
    * receives the staging directory path and must leave a complete
    * image there (any layout — single parquet relation, or a
    * generation dir with sub-relations). If `finalName` already exists
    * it is displaced and retired with the rest.
    */
  def publish(fs: FileSystem, root: Path, finalName: String,
      retires: Seq[String])(write: String => Unit): Unit = {
    heal(fs, root)
    val st = stage(fs, root, finalName, retires)(write)
    commitStaged(fs, st)
    finishStaged(fs, st)
  }

  /** A staged-but-not-yet-published maintenance result — the handle
    * the two-phase [[stage]]/[[commitStaged]]/[[finishStaged]] path
    * threads. Multi-publication operations (the forget fold's
    * base + delta rewrites) stage EVERY expensive rewrite first, then
    * commit all markers back-to-back: once the last marker lands, a
    * crash anywhere heals by rolling ALL of them forward, so the
    * torn-between-publications window shrinks from "a distributed
    * rewrite job" to "two metadata writes".
    */
  final case class Staged(root: Path, staging: Path, finalName: String,
      retires: Seq[String], token: String)

  /** Phase 1: run the expensive rewrite into an (ignored, uncommitted)
    * staging dir. A crash here rolls BACK at the next heal. Does NOT
    * heal first — multi-stage callers heal once at entry, then stage
    * several results under the same root.
    */
  def stage(fs: FileSystem, root: Path, finalName: String,
      retires: Seq[String])(write: String => Unit): Staged = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(root, s"$StagePrefix$token$StageSuffix")
    write(staging.toString)
    trip("staged")
    Staged(root, staging, finalName, retires, token)
  }

  /** Phase 2 — THE commit point for this publication: once the marker
    * is written, [[heal]] rolls the staged image forward.
    */
  def commitStaged(fs: FileSystem, st: Staged): Unit = {
    val fin = new Path(st.root, st.finalName)
    val displaced =
      if (fs.exists(fin)) Seq(s"${st.finalName}.retired-${st.token}") else Nil
    writeMarker(fs, st.staging, st.finalName +: (st.retires ++ displaced))
    trip("committed")
  }

  /** Phase 3: displace / publish-rename / retire. Idempotent with
    * [[heal]] — a crash anywhere in here is finished at the next entry.
    */
  def finishStaged(fs: FileSystem, st: Staged): Unit = {
    val fin = new Path(st.root, st.finalName)
    if (!fs.exists(st.staging)) return // a concurrent heal already published it
    val lines = readMarker(fs, new Path(st.staging, Marker))
    val protocolRetire = s"${st.finalName}.retired-"
    if (fs.exists(fin)) {
      lines.tail.find(_.startsWith(protocolRetire)) match {
        case Some(r) =>
          require(fs.rename(fin, new Path(st.root, r)),
            s"fold displace failed for ${st.finalName}")
        case None => fs.delete(fin, true): Unit
      }
    }
    trip("displaced")
    require(fs.rename(st.staging, fin), s"fold publish failed for ${st.finalName}")
    trip("published")
    finishRetire(fs, st.root, fin)
  }

  /** Finish any interrupted publication under `root`. Safe (and cheap)
    * to call when there is nothing to heal; every step is idempotent.
    */
  def heal(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    for (st <- fs.listStatus(root).toSeq
         if st.isDirectory && isStaging(st.getPath.getName)) {
      val mark = new Path(st.getPath, Marker)
      if (fs.exists(mark)) {
        val lines = readMarker(fs, mark)
        val finalName = lines.head
        val fin = new Path(root, finalName)
        // retires the publication itself creates (the displaced old
        // relation) vs inputs that must still be there for the staged
        // image to be a valid replacement (generation dirs): if any of
        // the latter vanished, the world moved while the lease was
        // stale (e.g. compaction consumed the generations this fold
        // was consolidating) — the staged image no longer replaces
        // anything coherent, so roll BACK instead of forward
        val protocolRetire = s"$finalName.retired-"
        val inputsIntact = lines.tail
          .filterNot(_.startsWith(protocolRetire))
          .forall(n => fs.exists(new Path(root, n)))
        if (inputsIntact) {
          if (fs.exists(fin)) {
            // crashed before the displace: the marker already names the
            // retired slot, so finish the displacement first. (A
            // non-displacing publication records no retired slot and
            // can only collide with itself — tokens are unique — so
            // the staged image wins.)
            lines.tail.find(_.startsWith(protocolRetire)) match {
              case Some(r) =>
                require(fs.rename(fin, new Path(root, r)),
                  s"fold heal displace failed for $finalName")
              case None => fs.delete(fin, true): Unit
            }
          }
          require(fs.rename(st.getPath, fin),
            s"fold heal publish failed for $finalName")
          finishRetire(fs, root, fin)
        } else {
          // roll back: restore a displaced relation if the crash left
          // it renamed aside, then drop the staged image
          if (!fs.exists(fin))
            lines.tail.find(r => r.startsWith(protocolRetire) &&
                fs.exists(new Path(root, r)))
              .foreach(r => require(fs.rename(new Path(root, r), fin),
                s"fold heal undisplace failed for $finalName"))
          fs.delete(st.getPath, true): Unit
        }
      } else fs.delete(st.getPath, true): Unit // uncommitted: roll back
    }
    // publications that crashed mid-retire keep their marker — finish
    for (st <- fs.listStatus(root).toSeq
         if st.isDirectory && !isStaging(st.getPath.getName))
      finishRetire(fs, root, st.getPath)
  }

  /** A REBUILD's entry hook: delete staged, retired and marker residue
    * under `root` WITHOUT rolling anything forward — the rebuild
    * supersedes any pending fold, and letting one complete over the new
    * relations would corrupt them.
    */
  def clearResidue(fs: FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    for (st <- fs.listStatus(root).toSeq if st.isDirectory) {
      val name = st.getPath.getName
      if (isStaging(name) || name.contains(".retired-"))
        fs.delete(st.getPath, true): Unit
      else {
        val mark = new Path(st.getPath, Marker)
        if (fs.exists(mark)) fs.delete(mark, false): Unit
      }
    }
  }

  private def isStaging(name: String): Boolean =
    name.startsWith(StagePrefix) && name.endsWith(StageSuffix)

  /** delete `fin`'s retire list then its marker (both idempotent) */
  private def finishRetire(fs: FileSystem, root: Path, fin: Path): Unit = {
    val mark = new Path(fin, Marker)
    if (fs.exists(mark)) {
      val lines = readMarker(fs, mark)
      trip("retiring")
      lines.tail.filter(_ != fin.getName)
        .foreach(n => fs.delete(new Path(root, n), true): Unit)
      fs.delete(mark, false): Unit
    }
  }

  private def writeMarker(fs: FileSystem, dir: Path, lines: Seq[String]): Unit = {
    val out = fs.create(new Path(dir, Marker), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  private def readMarker(fs: FileSystem, mark: Path): List[String] = {
    val in = fs.open(mark)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }
}
