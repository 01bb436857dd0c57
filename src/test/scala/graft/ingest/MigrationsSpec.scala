package graft.ingest

import graft.SparkSpec

/** A17 completed: versioned up-migrations with a ledger + the teardown the
  * reference ships but never runs (`0001_initial.down.sql`). */
class MigrationsSpec extends SparkSpec {

  private def all(root: String) =
    Seq(Migrations.initialBronze(root), Migrations.logsBronze(root))

  test("migrate: applies pending in order, records ledger, idempotent") {
    val root = java.nio.file.Files.createTempDirectory("mig").toString
    val first = Migrations.migrate(spark, root, all(root))
    assert(first === Seq(1, 2))
    assert(Migrations.applied(root) === Seq(1, 2))
    // empty tables exist with the DECLARED schemas (DDL = schema footer)
    val blocks = spark.read.parquet(s"$root/blocks")
    assert(blocks.count() === 0)
    assert(blocks.schema.fieldNames.toSeq.take(3) === Seq("block_number", "chain_name", "hash"))
    val logs = spark.read.parquet(s"$root/logs")
    assert(logs.schema.fieldNames.contains("topics"))
    // re-run: nothing pending
    assert(Migrations.migrate(spark, root, all(root)) === Seq.empty)
  }

  test("rollback: downs run newest-first back to the floor, ledger shrinks") {
    val root = java.nio.file.Files.createTempDirectory("mig2").toString
    Migrations.migrate(spark, root, all(root))
    // roll back only the logs table
    assert(Migrations.rollback(spark, root, all(root), toVersion = 1) === Seq(2))
    assert(Migrations.applied(root) === Seq(1))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/logs")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/blocks")))
    // full teardown (the 0001_initial.down.sql analog)
    assert(Migrations.rollback(spark, root, all(root), toVersion = 0) === Seq(1))
    assert(Migrations.applied(root) === Seq.empty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/blocks")))
    // and the cycle restarts cleanly
    assert(Migrations.migrate(spark, root, all(root)) === Seq(1, 2))
  }

  test("ledger survives a crash mid-swap: .tmp and .bak both readable") {
    val root = java.nio.file.Files.createTempDirectory("mig4").toString
    Migrations.migrate(spark, root, all(root))
    val nio = java.nio.file.Paths.get(root, "_migrations")
    // crash after dst→bak, before tmp→dst: only the NEW .tmp + old .bak exist
    java.nio.file.Files.move(nio, nio.resolveSibling("_migrations.bak"))
    java.nio.file.Files.write(nio.resolveSibling("_migrations.tmp"),
      "#n=2\n1\n2\n".getBytes("UTF-8"))
    assert(Migrations.applied(root) === Seq(1, 2), "must read complete .tmp")
    // a TORN .tmp (crash mid-write truncated it: header says 2, body has
    // one entry cut mid-digit) must lose to the intact .bak behind it
    java.nio.file.Files.write(nio.resolveSibling("_migrations.tmp"),
      "#n=2\n1".getBytes("UTF-8"))
    assert(Migrations.applied(root) === Seq(1, 2), "torn .tmp must yield to .bak")
    // crash before tmp→dst with no tmp written yet: .bak alone must serve
    java.nio.file.Files.delete(nio.resolveSibling("_migrations.tmp"))
    assert(Migrations.applied(root) === Seq(1, 2), "must fall back to .bak")
    // the recovered ledger prevents any re-run of already-applied ups
    assert(Migrations.migrate(spark, root, all(root)) === Seq.empty)
  }

  test("rollback of an unregistered applied version fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("mig3").toString
    Migrations.migrate(spark, root, all(root))
    intercept[IllegalArgumentException] {
      Migrations.rollback(spark, root, Seq(Migrations.initialBronze(root)), 0)
    }
  }
}
