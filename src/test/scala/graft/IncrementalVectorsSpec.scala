package graft

import graft.streaming.IncrementalVectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalVectorsSpec extends SparkSpecBase {
  import spark.implicits._

  // 4-cell codebook on the axes of a 2-d space: assignment is by cosine,
  // so a vector near an axis lands in that axis's cell — hand-predictable.
  private val codebook: Seq[Seq[Double]] =
    Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(0.0, -1.0))

  private def vecs(rows: (Long, Int, Seq[Double])*): DataFrame =
    rows.toSeq.toDF("vec_id", "label", "v")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"ivspec-$name").toFile
    d.delete(); d.getAbsolutePath
  }

  private def content(df: DataFrame): Set[(Long, Int, Seq[Double], Int)] =
    df.select(col("vec_id"), col("label"), col("v"), col("cell").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2), r.getInt(3)))
      .toSet

  private def cellFiles(store: String, cell: Int): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$store/cell=$cell")
    d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("first upsert builds the partitioned store; load round-trips the assignment") {
    val store = tmp("build")
    val base = vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 0, Seq(0.1, 0.9)),
      (2L, 1, Seq(-0.8, 0.1)), (3L, 1, Seq(0.0, -0.7)))
    val cells = IncrementalVectors.upsert(spark, store, base, codebook)
    assert(cells === Seq(0, 1, 2, 3))
    val got = content(IncrementalVectors.load(spark, store))
    assert(got.map(t => t._1 -> t._4).toMap ===
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    // partition layout is physical: one dir per cell
    (0 to 3).foreach(c => assert(new java.io.File(s"$store/cell=$c").isDirectory))
  }

  test("tick merge: re-embedded vector MOVES cell, ghost dropped, unaffected cells' files untouched") {
    val store = tmp("tick")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 0, Seq(0.1, 0.9)),
      (2L, 1, Seq(-0.8, 0.1)), (3L, 1, Seq(0.0, -0.7))), codebook)
    val filesC2Before = cellFiles(store, 2)
    val filesC3Before = cellFiles(store, 3)
    // vec 0 re-embeds from cell 0 to cell 1; vec 4 is brand new in cell 1
    val affected = IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.2, 0.95)), (4L, 2, Seq(0.1, 0.8))), codebook)
    assert(affected === Seq(0, 1), "old cell of the mover + target cell only")
    val got = content(IncrementalVectors.load(spark, store))
    assert(got.map(t => t._1 -> t._4).toMap ===
      Map(0L -> 1, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 1))
    // the mover's new vector replaced the old one (no ghost in cell 0)
    assert(got.find(_._1 == 0L).get._3 === Seq(0.2, 0.95))
    assert(!new java.io.File(s"$store/cell=0").exists() ||
      content(spark.read.parquet(s"$store/cell=0")
        .withColumn("cell", lit(0))).isEmpty,
      "cell 0 must not retain the moved vector")
    // the partial-rewrite claim, physically: cells 2 and 3 were not touched
    assert(cellFiles(store, 2) === filesC2Before)
    assert(cellFiles(store, 3) === filesC3Before)
    // and no debris
    assert(!new java.io.File(s"$store/.staging").exists())
    assert(!new java.io.File(s"$store/.old").exists())
  }

  test("redelivery idempotence: the same tick twice converges to the same content") {
    val store = tmp("redeliver")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 0, Seq(0.1, 0.9))), codebook)
    val tick = vecs((0L, 0, Seq(-0.9, 0.1)), (5L, 1, Seq(0.8, 0.0)))
    IncrementalVectors.upsert(spark, store, tick, codebook)
    val once = content(IncrementalVectors.load(spark, store))
    IncrementalVectors.upsert(spark, store, tick, codebook)
    val twice = content(IncrementalVectors.load(spark, store))
    assert(once === twice)
  }

  test("crash between renames rolls FORWARD: staged cells promoted, aside cell recovered") {
    val store = tmp("crash")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 0, Seq(0.1, 0.9))), codebook)
    // hand-build the crash state a real tick passes through: a COMPLETED
    // staging (job _SUCCESS marker) for cells 0+1, with live cell=0
    // already set aside and nothing renamed in — the worst window
    val merged = IncrementalVectors.assignedOf(vecs(
      (0L, 0, Seq(0.95, 0.0)), (1L, 0, Seq(0.0, 0.95)),
      (6L, 3, Seq(0.9, 0.2))), codebook)
    graft.sources.BucketedLayout.writePartitioned(merged, s"$store/.staging", "cell")
    assert(new java.io.File(s"$store/.staging/_SUCCESS").exists(),
      "parquet job commit must leave its job marker")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/_AFFECTED2"), "keep:0\nkeep:1")
    val f = new java.io.File(s"$store/.old"); f.mkdirs()
    assert(new java.io.File(s"$store/cell=0")
      .renameTo(new java.io.File(s"$store/.old/cell=0")))
    // any read path recovers: load() rolls the commit forward
    val got = content(IncrementalVectors.load(spark, store))
    assert(got.map(t => t._1 -> t._3).toMap ===
      Map(0L -> Seq(0.95, 0.0), 1L -> Seq(0.0, 0.95), 6L -> Seq(0.9, 0.2)))
    assert(!new java.io.File(s"$store/.staging").exists())
    assert(!new java.io.File(s"$store/.old").exists())
  }

  test("crash AFTER a brand-new cell's rename: replay keeps it (r10 regression — keep/drop manifest)") {
    val store = tmp("crash-new-cell")
    IncrementalVectors.upsert(spark, store, vecs((0L, 0, Seq(0.9, 0.1))), codebook)
    // tick 2 creates cell=3 (no prior live dir, so no aside ever exists)
    IncrementalVectors.upsert(spark, store, vecs((6L, 3, Seq(0.0, -0.8))), codebook)
    val committed = content(IncrementalVectors.load(spark, store))
    assert(committed.exists(_._1 == 6L))
    // hand-build the fatal replay window: every rename done (staged dirs
    // gone, live cell=3 present, NO aside), but the crash hit before
    // .staging was deleted — so the manifest is replayed. The pre-r10
    // merged manifest made this state indistinguishable from an emptied
    // cell and deleted the just-committed cell=3 permanently.
    new java.io.File(s"$store/.staging").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/_AFFECTED2"), "keep:0\nkeep:3")
    new java.io.File(s"$store/.old").mkdirs()
    val got = content(IncrementalVectors.load(spark, store))
    assert(got === committed, "replay must not destroy a newly created cell")
    assert(new java.io.File(s"$store/cell=3").exists())
    assert(!new java.io.File(s"$store/.staging").exists())
  }

  test("drop manifest line deletes an emptied cell's ghost dir on replay") {
    val store = tmp("crash-drop")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 1, Seq(0.1, 0.9))), codebook)
    // fabricate a committed tick whose merge emptied cell=1 (its only
    // vector moved away): staged write covered nothing for cell=1, so the
    // manifest carries it in the DROP set; replay must delete the ghost
    new java.io.File(s"$store/.staging").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/_AFFECTED2"), "drop:1")
    val got = content(IncrementalVectors.load(spark, store))
    assert(got.map(_._1) === Set(0L))
    assert(!new java.io.File(s"$store/cell=1").exists())
  }

  test("legacy-format staging (pre-v2 plain-int _AFFECTED) is discarded, never misparsed") {
    val store = tmp("legacy-manifest")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 1, Seq(0.1, 0.9))), codebook)
    val before = content(IncrementalVectors.load(spark, store))
    // a staging left by the PRE-r10 code: plain int lines under the old
    // marker name. The old parser upgrade hazard (r10 ADVICE): reading
    // this through the keep:/drop: parser yields empty sets and deletes
    // .staging as if committed — discarding staged cells while treating
    // the commit as done. The v2 marker RENAME makes it unreachable:
    // recovery sees no v2 marker, discards the staging as incomplete, and
    // the un-advanced watermark re-merges the batch next tick.
    new java.io.File(s"$store/.staging").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/_AFFECTED"), "0\n1")
    val got = content(IncrementalVectors.load(spark, store))
    assert(got === before, "legacy staging must not mutate the live store")
    assert(!new java.io.File(s"$store/.staging").exists(),
      "legacy staging is discarded for the next tick to rewrite")
  }

  test("legacy crash MID-swap: a cell set aside under .old with live missing is restored, not lost") {
    val store = tmp("legacy-midswap")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 1, Seq(0.1, 0.9))), codebook)
    val before = content(IncrementalVectors.load(spark, store))
    // the r11 ADVICE window: the OLD binary wrote its v1 marker and crashed
    // between `live → aside` and `staged → live` for cell=1 — the aside is
    // the only complete copy of cell=1's non-dirty rows
    new java.io.File(s"$store/.old").mkdirs()
    assert(new java.io.File(s"$store/cell=1").renameTo(
      new java.io.File(s"$store/.old/cell=1")))
    new java.io.File(s"$store/.staging/cell=1").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/_AFFECTED"), "1")
    val got = content(IncrementalVectors.load(spark, store))
    assert(got === before,
      "mid-swap aside must be restored — discarding it loses non-dirty rows permanently")
    assert(new java.io.File(s"$store/cell=1").exists())
    assert(!new java.io.File(s"$store/.staging").exists())
  }

  test("empty dirty set is a no-op — never creates or rewrites a store") {
    val store = tmp("empty")
    val none = vecs()
    assert(IncrementalVectors.upsert(spark, store, none, codebook) === Seq.empty)
    assert(!new java.io.File(store).exists(),
      "an empty first build must not poison the path with a data-less dir")
    IncrementalVectors.upsert(spark, store, vecs((0L, 0, Seq(0.9, 0.1))), codebook)
    val before = content(IncrementalVectors.load(spark, store))
    assert(IncrementalVectors.upsert(spark, store, none, codebook) === Seq.empty)
    assert(content(IncrementalVectors.load(spark, store)) === before)
  }

  test("vector pipeline tick: watermark commit, strictly-greater restart, latest-wins, freshness") {
    val store = tmp("pipe-store"); val state = tmp("pipe-state")
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    @volatile var rows: Seq[(Long, Int, Seq[Double], java.sql.Timestamp)] = Seq(
      (0L, 0, Seq(0.9, 0.1), t("2024-01-01 10:00:00")),
      (1L, 0, Seq(0.1, 0.9), t("2024-01-01 10:00:00")),
      // in-batch double change: vec 2 re-embedded within the same tick —
      // the LATER embedding must win
      (2L, 1, Seq(-0.9, 0.0), t("2024-01-01 10:00:01")),
      (2L, 1, Seq(0.0, -0.9), t("2024-01-01 10:00:02")))
    val pipe = new graft.streaming.IncrementalVectorPipeline(
      s => rows.toDF("vec_id", "label", "v", "modified"), codebook, store, state)
    assert(pipe.tick(spark) === 3L)
    val got1 = content(graft.streaming.IncrementalVectors.load(spark, store))
    assert(got1.map(x => x._1 -> x._4).toMap === Map(0L -> 0, 1L -> 1, 2L -> 3))
    assert(got1.find(_._1 == 2L).get._3 === Seq(0.0, -0.9), "latest embedding wins")
    // no new changes: watermark holds, tick is a no-op (strictly greater —
    // rows AT the watermark are not reprocessed)
    assert(pipe.tick(spark) === 0L)
    // a later re-embedding moves vec 0 across cells; freshness after tick
    rows = rows :+ ((0L, 0, Seq(-0.95, 0.05), t("2024-01-01 10:00:05")))
    assert(pipe.tick(spark) === 1L)
    val got2 = content(graft.streaming.IncrementalVectors.load(spark, store))
    assert(got2.map(x => x._1 -> x._4).toMap === Map(0L -> 2, 1L -> 1, 2L -> 3))
    assert(pipe.currentWatermark(spark) === t("2024-01-01 10:00:05"))
  }

  test("partial staging WITHOUT the job marker is discarded, store unchanged") {
    val store = tmp("partial")
    IncrementalVectors.upsert(spark, store, vecs(
      (0L, 0, Seq(0.9, 0.1)), (1L, 0, Seq(0.1, 0.9))), codebook)
    val before = content(IncrementalVectors.load(spark, store))
    // a crash mid-write: staged files exist, no _SUCCESS
    val staged = new java.io.File(s"$store/.staging/cell=0"); staged.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$store/.staging/cell=0/part-junk.parquet"), "junk")
    val got = content(IncrementalVectors.load(spark, store))
    assert(got === before)
    assert(!new java.io.File(s"$store/.staging").exists())
  }
}
