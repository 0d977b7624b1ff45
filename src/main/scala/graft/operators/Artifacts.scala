package graft.operators

/** Shared plumbing for materialized layout artifacts (derived
  * structures written once as parquet and consumed by many registry
  * queries — the co-occurrence edge list, the IVF index). Artifacts
  * live under the JVM temp dir, keyed by source directory AND a
  * size/mtime fingerprint of the table they derive from, so a
  * regenerated dataset can never serve a stale artifact. */
object Artifacts {

  private def fingerprint(dir: String, table: String): String = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .map(walk).foldLeft((0L, 0L)) { case ((s, m), (s2, m2)) =>
            (s + s2, math.max(m, m2))
          }
      else (f.length(), f.lastModified())
    val (sz, mt) = walk(new java.io.File(dir, s"$table.parquet"))
    java.lang.Long.toHexString(sz ^ java.lang.Long.rotateLeft(mt, 21))
  }

  /** Root directory for one artifact: `<tag>` names the artifact
    * family, `table` is the source table whose fingerprint keys it. */
  def path(dir: String, table: String, tag: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_artifacts/${tag}_${safe}_${fingerprint(dir, table)}"
  }

  /** True iff every named part of the artifact has a parquet `_SUCCESS`
    * marker under `root`. */
  def complete(root: String, parts: Seq[String]): Boolean =
    parts.forall(s => new java.io.File(s"$root/$s", "_SUCCESS").exists())

  /** Force-materialize guard for CONCURRENT harnesses. The registered
    * build-step queries call `materialize` unconditionally so the
    * bench prices construction honestly — but under Verify's
    * concurrent batches, an `overwrite` of a complete artifact deletes
    * parquet files out from under a sibling query mid-scan
    * (FILE_NOT_EXIST, or worse, a silent partial read). Verify sets
    * `-Dgraft.artifacts.lazy=true` (it measures correctness, not build
    * cost), turning a force-build of an already-complete artifact into
    * a no-op; the fingerprint in [[path]] still guarantees a stale
    * artifact can never be served. Every `materialize` checks this
    * INSIDE its `synchronized` block, so the complete() read cannot
    * race a concurrent build of the same artifact. */
  def skipBuild(root: String, parts: Seq[String]): Boolean =
    sys.props.get("graft.artifacts.lazy").contains("true") &&
      complete(root, parts)
}
