package graft

import graft.sources.SqliteFile
import org.apache.spark.sql.functions._

/** The pure-JVM SQLite file reader (SURVEY §2 S1 — the reference's paged
  * extractor, sqlite_extractor_file.py:13-20, step 3000) against a REAL
  * `.sqlite` fixture committed at src/test/resources: the reference's
  * five-table movies schema written by CPython's sqlite3 (an independent
  * writer — nothing round-trips through this decoder), 7000 film_work
  * rows (> 2× the reference step), one payload spilled across overflow
  * pages, plus a types_zoo table covering every serial type. Ground
  * truths in the assertions were computed by sqlite3 itself at fixture
  * build time.
  */
class SqliteSpec extends SparkSpecBase {
  private val fixture =
    getClass.getResource("/movies_fixture.sqlite").getPath

  test("sqlite_master: the reference's five-table movies schema is discovered") {
    val ts = SqliteFile.tables(fixture)
    val names = ts.map(_.name).toSet
    assert(Set("film_work", "genre", "person", "genre_film_work",
      "person_film_work").subsetOf(names))
    val fw = ts.find(_.name == "film_work").get
    assert(fw.columns.map(_.name) === Seq("id", "title", "description",
      "creation_date", "file_path", "rating", "type", "created", "modified"))
  }

  test("film_work: full scan matches sqlite3's own ground truth, overflow row intact") {
    val df = SqliteFile.read(spark, fixture, "film_work")
    assert(df.count() === 7000L)
    // python sqlite3 at fixture build: sum(rating) = 36982.6 over 6696
    // non-null ratings; description non-null on 6810 rows
    val agg = df.agg(sum("rating").as("s"), count(col("rating")).as("nr"),
      count(col("description")).as("nd")).head
    assert(math.abs(agg.getAs[Double]("s") - 36982.6) < 1e-6)
    assert(agg.getAs[Long]("nr") === 7000L - (7000L + 22) / 23)
    assert(agg.getAs[Long]("nd") === 6810L)
    // the one deliberately page-spilling payload reads through its
    // overflow chain byte-complete
    val big = df.filter(col("title") === "Film 4242")
      .select(length(col("description"))).head.getInt(0)
    assert(big === "overflow ".length * 2000)
    // every id is a uuid; types are the two reference enum values
    assert(df.filter(length(col("id")) =!= 36).count() === 0)
    assert(df.select("type").distinct().collect().map(_.getString(0)).toSet ===
      Set("movie", "tv_show"))
  }

  test("step-3000 partitioning: > 2 partitions, every partition bounded by the step") {
    val df = SqliteFile.read(spark, fixture, "film_work", stepRows = 3000)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.length >= 3, s"7000 rows at step 3000 must take >= 3 chunks, got ${sizes.toSeq}")
    sizes.foreach(s => assert(s <= 3000, s"partition of $s rows exceeds the step"))
    assert(sizes.sum === 7000)
  }

  test("types_zoo: every serial type decodes exactly; INTEGER PRIMARY KEY takes the rowid") {
    val rows = SqliteFile.read(spark, fixture, "types_zoo")
      .orderBy("k").collect()
    assert(rows.length === 10)
    // k is the rowid alias (stored NULL in the record, value = rowid)
    assert(rows.map(_.getAs[Long]("k")).toSeq === (1L to 10L))
    val is = rows.map(r => if (r.isNullAt(1)) null else r.getAs[Long]("i"))
    assert(is.toSeq === Seq(0L, 1L, 127L, -128L, 32000L, 8388000L,
      Int.MaxValue.toLong, 1L << 40, 1L << 62, -(1L << 62)))
    val r5 = rows(4)
    assert(r5.getAs[Double]("r") === 3.14159)
    assert(r5.getAs[String]("t") === "юникод ✓")
    assert(r5.getAs[Array[Byte]]("b").toSeq === "abc".getBytes.toSeq)
    assert(rows(0).getAs[String]("t") === "")
    assert(rows(0).getAs[Array[Byte]]("b").length === 0)
    assert(rows(3).isNullAt(2) && rows(3).isNullAt(3) && rows(3).isNullAt(4))
    assert(rows(5).getAs[Double]("r") === 1e300)
    assert(rows(6).getAs[Double]("r") === -1e-300)
  }

  test("edge fixture: pre-ALTER short records NULL-fill; defaulted columns fail loud; virtual tables refuse") {
    val edges = getClass.getResource("/edges_fixture.sqlite").getPath
    // rows written before ALTER TABLE ADD COLUMN store short records —
    // the added no-default column reads NULL, the post-ALTER row reads
    // its stored value (ground truth from sqlite3 itself)
    val altered = SqliteFile.read(spark, edges, "altered").orderBy("id").collect()
    assert(altered.map(r => (r.getAs[Long]("id"), r.getAs[String]("a"),
      r.getAs[String]("b"))).toSeq ===
      Seq((1L, "one", null), (2L, "two", null), (3L, "three", "full")))
    // a short record whose missing column DECLARES a default must not be
    // silently misread as NULL — named loud failure
    val e = intercept[Exception] {
      SqliteFile.read(spark, edges, "defaulted").collect()
    }
    assert(causeChain(e).contains("DEFAULT"), s"unexpected failure: ${causeChain(e)}")
    // virtual tables (rootpage 0) hold no b-tree: named refusal
    val e2 = intercept[IllegalArgumentException] {
      SqliteFile.read(spark, edges, "ft")
    }
    assert(e2.getMessage.contains("virtual"))
    // migration over the edge fixture skips the virtual table and the
    // sqlite_sequence internal, and fails LOUD on the first unsupported
    // table in the reference's name-length load order — ft_idx, an fts5
    // WITHOUT-ROWID shadow table stored as an index b-tree (page type
    // 10/2), which since r16 the page walk refuses BY NAME as a WITHOUT
    // ROWID layout. (The 'defaulted' DEFAULT refusal is pinned directly
    // above; before the r15 load-order change it was simply the first
    // failure hit.)
    val e3 = intercept[Exception] {
      graft.migrate.Migrate.migrateSqliteDb(spark, edges,
        java.nio.file.Files.createTempDirectory("edges_migrate").toString)
    }
    assert(causeChain(e3).contains("WITHOUT ROWID"),
      s"unexpected failure: ${causeChain(e3)}")
  }

  test("parseColumns: string literals and doubled quotes never split or unbalance the column list") {
    val cols = SqliteFile.parseColumns(
      """CREATE TABLE t (a TEXT DEFAULT 'x,y (z)', "b,weird" INT,
        |c TEXT DEFAULT 'it''s', d REAL CHECK (d > 0),
        |PRIMARY KEY (a, "b,weird"))""".stripMargin)
    assert(cols.map(_.name) === Seq("a", "b,weird", "c", "d"))
    assert(cols.map(_.hasDefault) === Seq(true, false, true, false))
  }

  test("hostile inputs fail loud with named requires, never confused downstream errors") {
    val dir = java.nio.file.Files.createTempDirectory("sqlite_hostile")
    def write(name: String, bytes: Array[Byte]): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, bytes)
      p.toString
    }
    val real = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    // wrong magic
    val badMagic = real.clone(); badMagic(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException] {
      SqliteFile.tables(write("magic.sqlite", badMagic))
    }
    assert(e1.getMessage.contains("not a SQLite 3 database"))
    // UTF-16 text encoding declared (header offset 56)
    val badEnc = real.clone(); badEnc(59) = 2
    val e2 = intercept[IllegalArgumentException] {
      SqliteFile.tables(write("enc.sqlite", badEnc))
    }
    assert(e2.getMessage.contains("UTF-8"))
    // truncated mid-tree: the page read itself fails (EOF), not a
    // wrong-answer decode
    val cut = java.util.Arrays.copyOfRange(real, 0, real.length / 3)
    intercept[java.io.IOException] {
      val p = write("cut.sqlite", cut)
      SqliteFile.tables(p).foreach(t => SqliteFile.read(spark, p, t.name).count())
    }
    // unknown table name is a named error
    val e4 = intercept[IllegalArgumentException] {
      SqliteFile.read(spark, fixture, "no_such_table")
    }
    assert(e4.getMessage.contains("no table"))
  }

  test("WAL-journal databases are rejected by name, never read stale (r15 verdict)") {
    // header offsets 18/19 = write/read format version; 2 = WAL. The main
    // file of a WAL db may be missing every uncheckpointed transaction
    // sitting in the -wal file — a silent-stale read, the one non-loud
    // failure mode the decoder had left.
    val dir = java.nio.file.Files.createTempDirectory("sqlite_wal")
    val real = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val wal = real.clone(); wal(18) = 2; wal(19) = 2
    val p = dir.resolve("wal.sqlite")
    java.nio.file.Files.write(p, wal)
    val e = intercept[IllegalArgumentException] {
      SqliteFile.tables(p.toString)
    }
    assert(e.getMessage.contains("WAL"), s"wrong rejection: ${e.getMessage}")
    assert(e.getMessage.contains("checkpoint"), "must tell the user the fix")
  }

  test("WITHOUT ROWID tables are rejected by name at both layers (r15 verdict)") {
    // layer 1: the declared table options, before any page is read
    val e1 = intercept[IllegalArgumentException] {
      SqliteFile.requireRowidLayout("kv",
        "CREATE TABLE kv (k TEXT PRIMARY KEY, v TEXT) WITHOUT ROWID")
    }
    assert(e1.getMessage.contains("WITHOUT ROWID"))
    intercept[IllegalArgumentException] {
      SqliteFile.requireRowidLayout("kv",
        "CREATE TABLE kv (k TEXT PRIMARY KEY) without\n  rowid, strict")
    }
    // a string literal inside the column list must NOT false-positive
    SqliteFile.requireRowidLayout("ok",
      "CREATE TABLE ok (note TEXT DEFAULT 'without rowid', n INT)")
    // layer 2: a schema row that lies about its options still fails by
    // name at the page walk — point a real table's root at an index-leaf
    // page type (10)
    val real = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val pageSize = ((real(16) & 0xff) << 8) | (real(17) & 0xff)
    val t = SqliteFile.tables(fixture).filter(_.rootPage > 1)
      .minBy(_.rootPage)
    val bad = real.clone()
    bad((t.rootPage - 1) * pageSize) = 10
    val dir = java.nio.file.Files.createTempDirectory("sqlite_worid")
    val p = dir.resolve("worid.sqlite")
    java.nio.file.Files.write(p, bad)
    val e2 = intercept[Exception] {
      SqliteFile.read(spark, p.toString, t.name).count()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("WITHOUT ROWID"),
      s"wrong rejection: ${e2.getMessage}")
  }

  test("mutation fuzz: corrupt database bytes fail loud (named require / IO error), never a raw index crash") {
    val real = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture))
    val dir = java.nio.file.Files.createTempDirectory("sqlite_fuzz")
    val rnd = new scala.util.Random(8191)
    var loud = 0
    for (trial <- 1 to 120) {
      val p = real.clone()
      // bias mutations toward the structural head (header, page 1,
      // early b-tree pages) where a flipped byte derails the walk
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = if (rnd.nextBoolean()) rnd.nextInt(math.min(p.length, 32768))
                 else rnd.nextInt(p.length)
        p(at) = rnd.nextInt(256).toByte
      }
      val f = dir.resolve(s"m$trial.sqlite")
      java.nio.file.Files.write(f, p)
      try {
        SqliteFile.tables(f.toString).foreach { t =>
          if (t.rootPage >= 1)
            SqliteFile.read(spark, f.toString, t.name).count()
        }
      } catch {
        // the fail-loud surface: named requires, named IAE, real IO
        // errors (truncation/EOF), Spark-wrapped versions of the same
        case e: Throwable =>
          val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
          assert(chain.exists(c =>
            c.isInstanceOf[IllegalArgumentException] ||
            c.isInstanceOf[java.io.IOException]),
            s"trial $trial: unnamed crash ${chain.map(_.getClass.getSimpleName).mkString(" <- ")}: ${e.getMessage}")
          loud += 1
      }
    }
    assert(loud > 0, "the sweep must hit at least some loud failures")
  }

  test("full migration off the real file: every table lands, reconciles, and re-runs idempotently") {
    val dst = java.nio.file.Files.createTempDirectory("sqlite_migrate").toString
    val first = graft.migrate.Migrate.migrateSqliteDb(spark, fixture, dst)
    assert(first.keySet === Set("film_work", "genre", "person",
      "genre_film_work", "person_film_work", "types_zoo"))
    // the reference's load order (load_data.py:47 sort(key=len), stable —
    // film_work before types_zoo because sqlite_master lists it first):
    // the returned ListMap iterates in the order tables were loaded
    assert(first.keys.toSeq === Seq("genre", "person", "film_work",
      "types_zoo", "genre_film_work", "person_film_work"),
      "migration must load tables in the reference's name-length order")
    first.foreach { case (t, (appended, report)) =>
      assert(report.ok, s"$t failed reconciliation: $report")
      assert(appended === report.srcRows, s"$t first run must append every row")
    }
    assert(first("film_work")._1 === 7000L)
    // the reference loader's ON CONFLICT DO NOTHING re-run: zero appends,
    // reconciliation still whole
    val second = graft.migrate.Migrate.migrateSqliteDb(spark, fixture, dst)
    second.foreach { case (t, (appended, report)) =>
      assert(appended === 0L, s"$t re-run must be a no-op")
      assert(report.ok, s"$t failed post-rerun reconciliation: $report")
    }
  }

  test("bridge tables reconcile: every person_film_work row joins a film and a person") {
    val fw = SqliteFile.read(spark, fixture, "film_work").select(col("id").as("film_work_id"))
    val p = SqliteFile.read(spark, fixture, "person").select(col("id").as("person_id"))
    val pfw = SqliteFile.read(spark, fixture, "person_film_work")
    assert(pfw.count() === 3000L)
    assert(pfw.join(fw, "film_work_id").join(p, "person_id").count() === 3000L)
    assert(pfw.select("role").distinct().count() === 3L)
  }
}
