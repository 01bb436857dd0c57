package graft.util

/** Shared once-per-(dir, source-mtime) tmp-fixture builder — ONE
  * implementation of the stamp/lock/publish machinery the export-style
  * queries kept re-implementing (Scans' format exports, IngestQ's bronze
  * chain, Streams' quantile store), with the crash-idempotence the
  * copies individually got wrong: the round-15 review found IngestQ's
  * _DONE-guarded build APPENDING onto a partial tree after a kill
  * between the append-mode write and the marker.
  *
  * Discipline: `build` runs into a STAGING directory; publication is a
  * single atomic rename. A crash mid-build leaves only the staging dir,
  * which the next attempt clears before rebuilding — the published path
  * either exists complete or not at all, and no marker file is needed.
  * Keyed on the source table's mtime so a regenerated testdata dir
  * rebuilds instead of serving stale fixtures. */
object FixtureCache {

  private val lock = new Object

  private def deleteRecursive(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }

  /** Returns the published fixture root for (`name`, `dir`), building it
    * first if absent. `build` receives the staging root and must write
    * everything under it. */
  def buildOnce(dir: String, srcTable: String, name: String)
      (build: java.nio.file.Path => Unit): String = {
    val src = java.nio.file.Paths.get(dir, s"$srcTable.parquet")
    val mtime = java.nio.file.Files.getLastModifiedTime(src).toMillis
    val stamp = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$name:$dir@$mtime").toLong
        & 0xffffffffL)
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_${name}_$stamp")
    lock.synchronized {
      if (!java.nio.file.Files.exists(out)) {
        val staging = out.resolveSibling(out.getFileName.toString + ".staging")
        deleteRecursive(staging)
        java.nio.file.Files.createDirectories(staging)
        build(staging)
        try java.nio.file.Files.move(staging, out,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another JVM published between our existence check and move —
          // its fixture is complete (publication is atomic); use it
          case _: java.nio.file.FileAlreadyExistsException
              | _: java.nio.file.DirectoryNotEmptyException =>
            deleteRecursive(staging)
        }
      }
    }
    out.toString
  }
}
