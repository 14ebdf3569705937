package graft.io

/** MODEL-GENERATION machinery shared by the persisted index families
  * whose maintenance includes a full retrain/re-derive of the
  * per-record artifacts (PQ codebook refresh, embedding band-width
  * rebuild): unlike the per-artifact `base.g<k>` generations
  * ([[graft.text.Dedup.publishNextGen]] — single-artifact rewrites
  * that REAP their predecessors), a model generation is a COMPLETE
  * sibling index under `root/modelgen<k>`, committed by a marker file
  * written LAST, with the previous generation left INTACT: an
  * in-flight reader that resolved the old generation keeps
  * hash-identical results for its whole session, and serving never
  * observes a torn artifact set (a crash anywhere before the marker
  * leaves a marker-less subdir every resolver ignores).
  *
  * `liveRoot` is IDEMPOTENT (a modelgen subdir contains no nested
  * modelgens), so leaf path helpers can resolve unconditionally. */
private[graft] object ModelGens {

  val Prefix = "modelgen"

  private def genNum(name: String): Option[Long] =
    if (name.startsWith(Prefix) && name.length > Prefix.length &&
        name.drop(Prefix.length).forall(_.isDigit))
      Some(name.drop(Prefix.length).toLong)
    else None

  /** The LIVE model generation's root: the highest-numbered COMMITTED
    * `modelgen<k>` subdir, else `root` itself (generation 0 — the
    * plain build layout). */
  def liveRoot(root: String): String = {
    val (fs, r) = graft.text.Dedup.hadoopFs(root)
    if (!fs.exists(r)) root
    else {
      val gens = fs.listStatus(r).toSeq.map(_.getPath).filter { p =>
        genNum(p.getName).isDefined &&
          fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED"))
      }
      if (gens.isEmpty) root
      else gens.maxBy(p => genNum(p.getName).get).toString
    }
  }

  /** The NEXT generation's directory (counts marker-less torn dirs
    * too, so a re-run after a crash never reuses a dirty number). */
  def nextRoot(root: String): String = {
    val (fs, r) = graft.text.Dedup.hadoopFs(root)
    val next = fs.listStatus(r).toSeq
      .flatMap(st => genNum(st.getPath.getName))
      .foldLeft(0L)(math.max) + 1
    s"$root/$Prefix$next"
  }

  /** The commit point: the marker lands only after every artifact of
    * the new generation is fully written. */
  def commit(sub: String): Unit = {
    val (fs, _) = graft.text.Dedup.hadoopFs(sub)
    fs.create(new org.apache.hadoop.fs.Path(sub, "_COMMITTED")).close()
  }
}
