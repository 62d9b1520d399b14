package graft

import java.nio.file.Files

import graft.sources.JdbcSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K3/K4/K5 JDBC sink against embedded Derby (the only in-process SQL
  * engine in the harness): append, DDL-ensure idempotency, staged-copy
  * atomic publish, and full value round-trip through `format("jdbc")`. */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def freshUrl(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft_jdbc_$tag")
    s"jdbc:derby:$dir/db;create=true"
  }

  private val ddl =
    """"n_nationkey" BIGINT, "n_name" VARCHAR(64), "n_regionkey" BIGINT"""

  test("non-identifier table names are rejected before any SQL runs (ADVICE r5)") {
    val url = freshUrl("inject")
    // classic injection shape and a few malformed identifiers — all must
    // throw IllegalArgumentException, not reach the database
    Seq("t; DROP TABLE x", "t\"y", "1starts_with_digit", "", "a.b.c")
      .foreach { bad =>
        intercept[IllegalArgumentException](
          sources.JdbcSink.ensureTable(url, bad, "\"k\" INT"))
        intercept[IllegalArgumentException](
          sources.JdbcSink.dropIfExists(url, bad))
      }
    // schema-qualified plain identifiers stay legal
    sources.JdbcSink.ensureTable(url, "APP.t_ok", "\"k\" INT")
    // append goes through the same gate (review r10): Spark's JDBC writer
    // interpolates dbtable raw into its probe/CREATE/INSERT statements
    val df = Tables.nation(spark, sf).select(col("n_nationkey"))
    intercept[IllegalArgumentException](
      sources.JdbcSink.append(df, url, "t; DROP TABLE x"))
  }

  test("ensureTable is idempotent (second CREATE is swallowed)") {
    val url = freshUrl("ensure")
    JdbcSink.ensureTable(url, "t_ensure", ddl)
    JdbcSink.ensureTable(url, "t_ensure", ddl) // must not throw
    assert(JdbcSink.read(spark, url, "t_ensure").count() == 0)
  }

  test("append writes every row and preserves values") {
    val url = freshUrl("append")
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    JdbcSink.ensureTable(url, "t_append", ddl)
    JdbcSink.append(src, url, "t_append")
    val back = JdbcSink.read(spark, url, "t_append")
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq.mkString("|")).toSeq ==
      src.orderBy("n_nationkey").collect().map(_.toSeq.mkString("|")).toSeq)
    // append again → doubled rows (append semantics, not replace)
    JdbcSink.append(src, url, "t_append")
    assert(JdbcSink.read(spark, url, "t_append").count() == 2 * src.count())
  }

  test("stagedCopy publishes transactionally and cleans its staging table") {
    val url = freshUrl("staged")
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    JdbcSink.stagedCopy(src, url, "t_target", "t_stage", ddl)
    val back = JdbcSink.read(spark, url, "t_target")
    assert(back.count() == src.count())
    // staging table dropped after publish
    val ex = intercept[Exception](JdbcSink.read(spark, url, "t_stage").count())
    assert(ex.getMessage != null)
    // a second publish appends a full second copy (staging recreated fresh)
    JdbcSink.stagedCopy(src, url, "t_target", "t_stage", ddl)
    assert(JdbcSink.read(spark, url, "t_target").count() == 2 * src.count())
  }

  test("a failed transactional publish surfaces the REAL error (rollback before close)") {
    val url = freshUrl("rollback")
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    // pre-create the target with an incompatible schema: the INSERT-SELECT
    // publish step must fail, and the caller must see the column-count
    // SQLException — not Derby's 25001 close-during-transaction error that
    // an unrolled-back connection would throw from the finally block
    JdbcSink.ensureTable(url, "t_bad", """"only_col" BIGINT""")
    val ex = intercept[java.sql.SQLException](
      JdbcSink.stagedCopy(src, url, "t_bad", "t_bad_stg", ddl))
    assert(ex.getSQLState != "25001", s"close error masked the real failure: $ex")
    assert(ex.getSQLState == "42802", s"expected column-count mismatch, got: $ex")
  }

  test("exactlyOnceBatchWriter: a replayed batch commits nothing twice") {
    val url = freshUrl("ledger")
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val write = JdbcSink.exactlyOnceBatchWriter(url, "t_once", "t_ledger", ddl) _
    write(src, 0L)
    write(src, 0L) // foreachBatch replay after a pre-checkpoint failure
    assert(JdbcSink.read(spark, url, "t_once").count() == src.count())
    write(src, 1L) // a genuinely new batch still appends
    assert(JdbcSink.read(spark, url, "t_once").count() == 2 * src.count())
    // ledger recorded both committed ids
    assert(JdbcSink.read(spark, url, "t_ledger").count() == 2)
  }

  test("streaming foreachBatch into JDBC: stream content equals batch content, once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sq = spark; import sq.implicits._
    implicit val ctx = spark.sqlContext
    val url = freshUrl("stream")
    val streamDdl = """"n_nationkey" BIGINT, "n_name" VARCHAR(64), "n_regionkey" BIGINT"""
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("n_nationkey", "n_name", "n_regionkey")
      .writeStream
      .foreachBatch(JdbcSink.exactlyOnceBatchWriter(url, "t_sm", "t_sm_ledger", streamDdl) _)
      .start()
    val rows = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getAs[Number](2).longValue)).toSeq
    try {
      rows.grouped(10).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val back = JdbcSink.read(spark, url, "t_sm")
    assert(back.count() == rows.size)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq.mkString("|")).toSeq ==
      rows.sortBy(_._1).map(t => s"${t._1}|${t._2}|${t._3}"))
  }

  test("sink_jdbc_roundtrip query matches the source nation table") {
    val out = ops.Relational.sinkJdbcRoundtrip(spark, sf)
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy("n_nationkey")
    assert(out.collect().map(_.toSeq.mkString("|")).toSeq ==
      src.collect().map(_.toSeq.mkString("|")).toSeq)
    // idempotent: running the query again yields the same result (Bench
    // times every query twice)
    assert(ops.Relational.sinkJdbcRoundtrip(spark, sf).count() == src.count())
  }

  // ------------------------------------------------- dialect profiles
  // (VERDICT r6 #5) The Postgres/Snowflake profiles can't execute in the
  // zero-egress harness; these cases pin the statements they'd send — the
  // exact divergences the reference exercises (authors TEXT[] on the
  // Postgres append, case-insensitive column matching on the Snowflake
  // staged copy). The Derby profile is covered by every executing test
  // above going through the same dialect-routed code path.

  import graft.sources.SinkDialect
  import org.apache.spark.sql.types._

  private val booksSchema = StructType(Seq(
    StructField("id", LongType), StructField("title", StringType),
    StructField("rating", DoubleType),
    StructField("authors", ArrayType(StringType))))

  test("publish reads the live target's column list from JDBC metadata (review r7)") {
    // the by-name Snowflake publish needs the REAL target's columns, not
    // the frame's own list echoed back — prove the metadata source works
    // against the executable engine
    val url = freshUrl("meta")
    JdbcSink.ensureTable(url, "t_meta", ddl)
    Class.forName(JdbcSink.DerbyDriver)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      assert(JdbcSink.tableColumns(conn, "t_meta") ==
        Seq("n_nationkey", "n_name", "n_regionkey")) // stored case, DDL order
      assert(JdbcSink.tableColumns(conn, "t_absent").isEmpty)
    } finally conn.close()
  }

  test("dialect dispatch follows the JDBC URL scheme, Derby the default") {
    assert(SinkDialect.forUrl("jdbc:postgresql://h:5432/books") == SinkDialect.Postgres)
    assert(SinkDialect.forUrl("jdbc:snowflake://acct.snowflakecomputing.com/") == SinkDialect.Snowflake)
    assert(SinkDialect.forUrl("jdbc:derby:/tmp/db;create=true") == SinkDialect.Derby)
    assert(SinkDialect.forUrl("jdbc:h2:mem:x") == SinkDialect.Derby) // fallback
  }

  test("Postgres profile maps ArrayType to elem[] (reference authors TEXT[]) and emits idempotent DDL") {
    val ddl = SinkDialect.Postgres.columnsDdl(booksSchema)
    assert(ddl == """"id" BIGINT, "title" TEXT, "rating" DOUBLE PRECISION, "authors" TEXT[]""")
    assert(SinkDialect.Postgres.createTableSql("books", ddl)
      .startsWith("CREATE TABLE IF NOT EXISTS books ("))
    assert(SinkDialect.Postgres.dropTableSql("books") == "DROP TABLE IF EXISTS books")
    assert(SinkDialect.Postgres.createExistsState.isEmpty) // statement itself is idempotent
    // positional publish (staging created from the same DDL)
    assert(SinkDialect.Postgres.publishSql("t", "s", Seq("id"), Seq("id")) ==
      "INSERT INTO t SELECT * FROM s")
  }

  test("Snowflake profile publishes by case-insensitive column name (MATCH_BY_COLUMN_NAME analogue)") {
    // target columns in warehouse-upper case, staging in source case —
    // the db_to_snowflake.py:111 CASE_INSENSITIVE situation; an unmatched
    // target column loads NULL, never a positional misalignment
    val sql = SinkDialect.Snowflake.publishSql("BOOKS", "BOOKS_STG",
      targetCols = Seq("ID", "TITLE", "LOAD_TS"),
      stagingCols = Seq("id", "title"))
    assert(sql ==
      """INSERT INTO BOOKS ("ID", "TITLE", "LOAD_TS") SELECT "id", "title", NULL FROM BOOKS_STG""")
    val ddl = SinkDialect.Snowflake.columnsDdl(booksSchema)
    assert(ddl.contains(""""authors" ARRAY""") && ddl.contains(""""rating" DOUBLE"""))
  }

  // (VERDICT r7 #7) Golden-string pins for EVERY dialect-emitted statement
  // — the exact SQL a live Postgres/Snowflake would receive — plus a parse
  // check through the embedded validators available in-harness: Derby
  // executes its own statements in the tests above, and Spark's ANSI
  // parser (doubleQuotedIdentifiers mode) parses every publish INSERT.
  test("golden statements: every dialect DDL/DROP/publish string-pinned verbatim") {
    val pgDdl = SinkDialect.Postgres.columnsDdl(booksSchema)
    assert(SinkDialect.Postgres.createTableSql("books", pgDdl) ==
      """CREATE TABLE IF NOT EXISTS books ("id" BIGINT, "title" TEXT, "rating" DOUBLE PRECISION, "authors" TEXT[])""")
    assert(SinkDialect.Postgres.dropTableSql("books") ==
      "DROP TABLE IF EXISTS books")
    assert(SinkDialect.Postgres.publishSql("books", "books_stg",
      Seq("id", "title"), Seq("id", "title")) ==
      "INSERT INTO books SELECT * FROM books_stg")

    val sfDdl = SinkDialect.Snowflake.columnsDdl(booksSchema)
    assert(SinkDialect.Snowflake.createTableSql("BOOKS", sfDdl) ==
      """CREATE TABLE IF NOT EXISTS BOOKS ("id" NUMBER(19,0), "title" VARCHAR, "rating" DOUBLE, "authors" ARRAY)""")
    assert(SinkDialect.Snowflake.dropTableSql("BOOKS") ==
      "DROP TABLE IF EXISTS BOOKS")
    assert(SinkDialect.Snowflake.publishSql("BOOKS", "BOOKS_STG",
      Seq("ID", "TITLE", "LOAD_TS"), Seq("id", "title")) ==
      """INSERT INTO BOOKS ("ID", "TITLE", "LOAD_TS") SELECT "id", "title", NULL FROM BOOKS_STG""")

    val dSchema = org.apache.spark.sql.types.StructType(booksSchema.fields.filterNot(
      _.dataType.isInstanceOf[ArrayType]))
    val dDdl = SinkDialect.Derby.columnsDdl(dSchema)
    assert(SinkDialect.Derby.createTableSql("books", dDdl) ==
      """CREATE TABLE books ("id" BIGINT, "title" VARCHAR(4000), "rating" DOUBLE)""")
    assert(SinkDialect.Derby.dropTableSql("books") == "DROP TABLE books")
  }

  test("every dialect's publish INSERT parses under Spark's ANSI double-quoted-identifier grammar") {
    val statements = Seq(
      SinkDialect.Postgres.publishSql("books", "books_stg", Seq("id"), Seq("id")),
      SinkDialect.Snowflake.publishSql("BOOKS", "BOOKS_STG",
        Seq("ID", "TITLE", "LOAD_TS"), Seq("id", "title")),
      SinkDialect.Derby.publishSql("t", "s", Seq("id"), Seq("id")))
    val parser = spark.sessionState.sqlParser
    val prev = spark.conf.getOption("spark.sql.ansi.doubleQuotedIdentifiers")
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    try statements.foreach { sql =>
      // throws ParseException on any malformed statement
      parser.parsePlan(sql)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", v)
      case None    => spark.conf.unset("spark.sql.ansi.doubleQuotedIdentifiers")
    }
  }

  test("partitioned JDBC read: >1 reader connection open concurrently, disjoint ranges, lossless (S4 scan, VERDICT r11 #5)") {
    val url = freshUrl("pscan")
    val src = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    JdbcSink.ensureTable(url, "orders_t",
      """"o_orderkey" BIGINT, "o_custkey" BIGINT,
        |"o_orderstatus" VARCHAR(8), "o_totalprice" DOUBLE""".stripMargin)
    // Driver-local seed — the production shape (the distributed append
    // writer boots the embedded engine per executor JVM; see seedLocal).
    JdbcSink.seedLocal(src, url, "orders_t")
    // The production contract (r12 local-cluster finding): the seeded
    // database shuts down and is packaged as Derby's read-only
    // database-in-a-jar, because a read-write embedded boot is
    // exclusive per JVM (XSDB6 from the second executor JVM on) while
    // jar boots take no lock and open concurrently from any number of
    // JVMs. The read below must work off the immutable jar.
    JdbcSink.shutdownDb(url)
    val dbDir = new java.io.File(url.stripPrefix("jdbc:derby:")
      .replaceAll(";create=true", ""))
    assert(!new java.io.File(dbDir, "db.lck").exists,
      "shutdown must have released the embedded boot lock")
    val dbJar = new java.io.File(dbDir.getParentFile, "db.jar")
    JdbcSink.packageDb(dbDir, dbJar)
    val bounds = src.agg(min("o_orderkey"), max("o_orderkey")).head()
    val df = JdbcSink.readPartitioned(spark, JdbcSink.jarDbUrl(dbJar),
      "orders_t", "o_orderkey",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4, "the scan must fan out to 4 readers")
    // Concurrency proof: each task's span covers draining its JDBC
    // result set (`it.size` pulls every row from the open connection
    // inside the span), so two overlapping spans mean two bounded
    // queries were open against the server AT ONCE — a fan-out read,
    // not four sequential fetches through one connection.
    val spans = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val start = System.nanoTime()
      val n = it.size
      val end = System.nanoTime()
      Iterator((pid, start, end, n.toLong))
    }.collect()
    assert(spans.length == 4 && spans.forall(_._4 > 0L),
      "every partition reader must fetch rows (disjoint non-empty ranges)")
    val overlapping = spans.exists { a => spans.exists { b =>
      a._1 != b._1 && a._2 < b._3 && b._2 < a._3 } }
    assert(overlapping,
      ">1 partition reader must be open against the server concurrently")
    // disjoint, lossless: per-partition key sets partition the source
    val perPart = df.select(col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(perPart.map(_._1).distinct.length == perPart.length,
      "partition ranges must be disjoint")
    assert(perPart.length == src.count(),
      "the partitioned union must be lossless")
    val ranges = perPart.groupBy(_._2).values
      .map(g => (g.map(_._1).min, g.map(_._1).max)).toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, "range partitions must not interleave")
      case _ =>
    }
  }

  test("readByQuantiles: a 90/10-skewed key fans out balanced (<= 2x spread) and lossless; uniform bounds do not (VERDICT r12 #4)") {
    val sq = spark; import sq.implicits._
    val url = freshUrl("skew")
    // planted skew: 900 rows dense in [0, 900), 100 rows sparse at the
    // far end of a million-wide key space — a uniform 4-way stride puts
    // all 900 in the first partition and two partitions read nothing
    val keys = (0L until 900L) ++ (0L until 100L).map(i => 999000L + i * 10)
    JdbcSink.ensureTable(url, "skew_t", """"k" BIGINT, "v" VARCHAR(16)""")
    JdbcSink.seedLocal(keys.map(k => (k, s"v$k")).toDF("k", "v"), url, "skew_t")
    JdbcSink.createIndex(url, "skew_t", "k")
    def spread(df: org.apache.spark.sql.DataFrame): (Long, Long, Long, Int) = {
      val per = df.select(col("k")).withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      (per.max, per.filter(_ > 0).min, per.sum, per.length)
    }
    val (qMax, qMin, qTot, qParts) = spread(
      JdbcSink.readByQuantiles(spark, url, "skew_t", "k", numPartitions = 4))
    assert(qParts == 4, "the quantile fan-out must open 4 readers")
    assert(qTot == keys.length.toLong, "the quantile read must be lossless")
    assert(qMax <= 2 * qMin,
      s"rank-seeded partitions must balance within 2x on the skewed key: max=$qMax min=$qMin")
    // the uniform stride on the same table demonstrates the failure mode
    // the quantile form exists for
    val (uMax, _, uTot, _) = spread(
      JdbcSink.readPartitioned(spark, url, "skew_t", "k",
        lowerBound = 0L, upperBound = 999990L, numPartitions = 4))
    assert(uTot == keys.length.toLong)
    assert(uMax >= 900L,
      s"the uniform stride must lump the dense range into one reader: $uMax")
    // value fidelity: both reads return the identical row set
    val a = JdbcSink.readByQuantiles(spark, url, "skew_t", "k", 4)
      .collect().map(_.toString).sorted
    val b = JdbcSink.read(spark, url, "skew_t")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // degenerate geometry: 1 partition = the plain full read
    assert(JdbcSink.readByQuantiles(spark, url, "skew_t", "k", 1)
      .count() == keys.length.toLong)
    // an EMPTY table returns an empty frame like readPartitioned does
    // (review r13): every rank probe lands past the end, the cuts
    // collapse away, and the read degrades to one full (empty) scan —
    // no 'invalid cursor state' from an unchecked ResultSet cursor
    JdbcSink.ensureTable(url, "empty_t", """"k" BIGINT, "v" VARCHAR(16)""")
    assert(JdbcSink.readByQuantiles(spark, url, "empty_t", "k", 4)
      .count() == 0L)
  }

  test("Derby profile rejects array columns with a pointer at the Postgres mapping") {
    val e = intercept[IllegalArgumentException](SinkDialect.Derby.columnsDdl(booksSchema))
    assert(e.getMessage.contains("Postgres"))
    // and columnsDdlFor routes by URL
    assert(JdbcSink.columnsDdlFor(booksSchema, "jdbc:postgresql://h/d").contains("TEXT[]"))
    assert(SinkDialect.Derby.createExistsState.contains("X0Y32"))
    assert(SinkDialect.Derby.dropMissingState.contains("42Y55"))
  }
}
