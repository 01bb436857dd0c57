package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Schema migrations — the reference's A17 surface completed: its sqlx
  * runner applies versioned up-migrations
  * (`/root/reference/src/storage/db.rs:5-10`,
  * `/root/reference/migrations/0001_initial.sql`) and ships a teardown
  * (`0001_initial.down.sql`) that nothing ever runs. Here both directions
  * are first-class:
  *
  *   - a migration = (version, name, up, down) acting on a table root;
  *   - `migrate` applies pending migrations in version order and records
  *     them in a ledger file (the sqlx `_sqlx_migrations` analog);
  *   - `rollback(to)` runs `down` in reverse order back to a version.
  *
  * "CREATE TABLE" in a Parquet-only engine = write an empty frame with the
  * declared schema (the schema footer is the DDL); "DROP TABLE" = delete
  * the path. The ledger is a plain text file of applied versions, replaced
  * atomically — adequate for the single-writer migration step the
  * reference models (its runner is also one process at startup).
  */
object Migrations {

  case class Migration(
    version: Int,
    name: String,
    up: SparkSession => Unit,
    down: SparkSession => Unit)

  // Ledger and drop go through the Hadoop filesystem API, not java.nio —
  // createTable writes via Spark, so a URI-qualified root (file:/, hdfs:/,
  // s3a:/) must resolve ledger and teardown against the SAME filesystem or
  // ledger and data silently diverge (same reasoning as
  // GraftCatalog.registerBronze). Local relative paths resolve to the local
  // FS exactly as before.
  private def fsFor(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    val active = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val conf = active.map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    (p.getFileSystem(conf), p)
  }

  private def ledgerPath(root: String) = s"$root/_migrations"

  /** Versions already applied at this root, ascending. A missing main
    * ledger falls back to the in-flight `.tmp` (newest content — a crash
    * landed between the backup and final rename) then the parked `.bak`,
    * so a mid-swap crash never reads as "nothing applied" and re-runs
    * arbitrary user `up()` functions.
    *
    * The `.tmp` candidate is accepted ONLY when complete: a crash can also
    * land mid-WRITE of tmp (truncating the file), and a torn tmp must lose
    * to the intact `.bak` behind it — an empty/short read would re-run
    * ups, and a mid-digit truncation would record a never-applied version.
    * Completeness = the `#n=<count>` header writeLedger stamps matches the
    * parsed entry count. dst/.bak need no such check: both only ever exist
    * as fully-written files moved into place by rename. */
  def applied(root: String): Seq[Int] = {
    val (fs, p) = fsFor(ledgerPath(root))
    def parse(f: HPath, requireComplete: Boolean): Option[Seq[Int]] = {
      if (!fs.exists(f)) return None
      val in = fs.open(f)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val lines = text.split("\n", -1).toList
      val (header, body) = lines.partition(_.startsWith("#"))
      val versions = body.filter(_.nonEmpty)
      if (requireComplete) {
        // torn tmp detection: declared count must match, every entry must
        // parse, and the write must have finished (trailing newline —
        // catches a final version truncated mid-digit, which still parses)
        val declared = header.collectFirst { case s"#n=$n" => n.toIntOption }.flatten
        if (!declared.contains(versions.size)) return None
        if (versions.exists(_.toIntOption.isEmpty)) return None
        if (!text.endsWith("\n")) return None
      }
      Some(versions.map(_.toInt).sorted)
    }
    parse(p, requireComplete = false)
      .orElse(parse(new HPath(s"${ledgerPath(root)}.tmp"), requireComplete = true))
      .orElse(parse(new HPath(s"${ledgerPath(root)}.bak"), requireComplete = false))
      .getOrElse(Seq.empty)
  }

  private def writeLedger(root: String, versions: Seq[Int]): Unit = {
    val (fs, rootP) = fsFor(root)
    fs.mkdirs(rootP)
    val tmp = new HPath(rootP, "_migrations.tmp")
    val out = fs.create(tmp, true)
    // completeness header first: `applied` only trusts a .tmp whose
    // declared count matches its parsed entries (see scaladoc above)
    try out.write(versions.sorted
      .mkString(s"#n=${versions.size}\n", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // Hadoop rename won't clobber an existing target, so the swap parks
    // the old ledger at .bak, moves the new one in, then drops the backup.
    // A crash anywhere in that window leaves .tmp (new) and/or .bak (old)
    // on disk, both of which `applied` falls back to — there is no instant
    // at which every ledger copy is gone (the old delete-then-rename had
    // one, re-running every migration after a crash in it).
    val dst = new HPath(rootP, "_migrations")
    val bak = new HPath(rootP, "_migrations.bak")
    if (fs.exists(bak)) fs.delete(bak, false)
    if (fs.exists(dst) && !fs.rename(dst, bak))
      throw new java.io.IOException(s"ledger backup failed: $dst -> $bak")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"ledger rename failed: $tmp -> $dst")
    fs.delete(bak, false)
  }

  /** Apply every pending migration in version order; returns the versions
    * applied this call. Idempotent: already-recorded versions are skipped. */
  def migrate(spark: SparkSession, root: String,
      migrations: Seq[Migration]): Seq[Int] = {
    val done = applied(root).toSet
    val pending = migrations.filterNot(m => done.contains(m.version)).sortBy(_.version)
    pending.foreach { m =>
      m.up(spark)
      writeLedger(root, (applied(root) :+ m.version).distinct)
    }
    pending.map(_.version)
  }

  /** Roll back to `toVersion` (exclusive floor): every applied migration
    * with version > toVersion runs `down`, newest first. */
  def rollback(spark: SparkSession, root: String,
      migrations: Seq[Migration], toVersion: Int): Seq[Int] = {
    val byVersion = migrations.map(m => m.version -> m).toMap
    val undo = applied(root).filter(_ > toVersion).sorted.reverse
    undo.foreach { v =>
      byVersion.get(v) match {
        case Some(m) => m.down(spark)
        case None => throw new IllegalArgumentException(
          s"applied version $v has no registered migration to roll back")
      }
      writeLedger(root, applied(root).filterNot(_ == v))
    }
    undo
  }

  // ------------------------------------------------------- bronze DDL set

  /** Empty-frame "CREATE TABLE" with a declared schema. */
  def createTable(spark: SparkSession, path: String, schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("ignore").parquet(path)

  /** "DROP TABLE" = delete the path recursively (SURVEY §2A A17) — via the
    * Hadoop FS so URI-qualified roots drop the same data Spark wrote. */
  def dropTable(path: String): Unit = {
    val (fs, p) = fsFor(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The reference's 0001_initial (blocks + transactions,
    * `0001_initial.sql:6-40`) and its teardown (`0001_initial.down.sql`). */
  def initialBronze(root: String): Migration = Migration(
    version = 1, name = "initial",
    up = s => {
      createTable(s, s"$root/blocks",
        BlockIngest.normalizeBlocks(emptyParsed(s)).schema)
      createTable(s, s"$root/transactions",
        BlockIngest.normalizeTxs(emptyParsed(s)).schema)
    },
    down = _ => {
      dropTable(s"$root/transactions")
      dropTable(s"$root/blocks")
    })

  /** Round-2 logs table (`README.md:187-196` model) as migration 2. */
  def logsBronze(root: String): Migration = Migration(
    version = 2, name = "logs",
    up = s => createTable(s, s"$root/logs",
      BlockIngest.normalizeLogs(emptyParsedLogs(s)).schema),
    down = _ => dropTable(s"$root/logs"))

  /** Empty frames carrying the declared message schemas, so the bronze
    * DDL schemas stay derived from the ONE normalize definition. */
  private def emptyParsed(s: SparkSession) =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      BlockIngest.blockMsgSchema)

  private def emptyParsedLogs(s: SparkSession) =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      BlockIngest.logMsgSchema)
}
