package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Generic JDBC batch sink with the reference's ClickHouse flush
  * contract: buffer rows per writer and flush when EITHER 10 000 rows
  * accumulate OR 4000 ms elapse since the last flush
  * (`nqs-console/.../sink/ClickhouseSink.java:28-31`).
  *
  * Spark-first shape: one connection per PARTITION (`foreachPartition`),
  * so on a cluster each executor core is an independent batching writer —
  * the same topology as the reference's per-subtask sink, but the
  * parallelism is the frame's partitioning (repartition on the table's
  * shard key upstream, e.g. via [[OutputCatalog]] specs, to co-locate a
  * key's rows on one writer). Pure `java.sql` — no driver-specific API —
  * so the same code targets ClickHouse/MySQL/anything with a JDBC URL;
  * the test double and the q198 gate run it against an embedded DuckDB
  * file database.
  *
  * Batches commit transactionally per flush; a flush that fails with a
  * transient conflict (concurrent appends under optimistic MVCC) is
  * retried once after rollback — append-only inserts touch disjoint rows,
  * so a second attempt succeeds unless the database itself is down.
  */
object JdbcBatchSink {

  val DefaultBatchRows = 10000
  val DefaultFlushMs = 4000L

  /** Spark JDBC dialect for embedded DuckDB: the driver's metadata
    * reports integer columns as unsigned (`isSigned=false`), which makes
    * Spark's default mapping widen BIGINT→DECIMAL(20,0) and
    * INTEGER→BIGINT on read — a silent schema drift that breaks
    * roundtrip parity (and the q198 hash gate). The dialect pins the
    * exact-width signed mappings. Registered lazily, once. */
  object DuckDBDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:duckdb:")
    override def getCatalystType(sqlType: Int, typeName: String, size: Int,
        md: org.apache.spark.sql.types.MetadataBuilder): Option[DataType] =
      sqlType match {
        case java.sql.Types.BIGINT => Some(LongType)
        case java.sql.Types.INTEGER => Some(IntegerType)
        case java.sql.Types.SMALLINT => Some(ShortType)
        case java.sql.Types.TINYINT => Some(ByteType)
        case _ => None
      }
  }

  @volatile private var dialectRegistered = false

  def ensureDialect(): Unit = if (!dialectRegistered) synchronized {
    if (!dialectRegistered) {
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDBDialect)
      dialectRegistered = true
    }
  }

  /** DDL type for a Spark field — the portable ANSI names DuckDB,
    * ClickHouse (via JDBC), MySQL and Postgres all accept. */
  private def sqlType(dt: DataType): String = dt match {
    case StringType => "VARCHAR"
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"JdbcBatchSink: unsupported column type ${other.sql}")
  }

  /** CREATE TABLE IF NOT EXISTS matching `schema` (driver-side, once).
    * Nullability is EXPLICIT in the DDL (`NULL`/`NOT NULL` per field):
    * DuckDB/MySQL/Postgres default columns nullable but ClickHouse
    * defaults them NOT NULL — an implicit DDL would make the same frame
    * reject its first null row on ClickHouse only. `ddlSuffix` carries
    * engine-mandatory clauses a generic CREATE can't know (ClickHouse's
    * `ENGINE = MergeTree ORDER BY ...`); empty for engines that need
    * none. */
  def ensureTable(url: String, table: String, schema: StructType,
      ddlSuffix: String = ""): Unit =
    withConnection(url)(ensureTableOn(_, table, schema, ddlSuffix))

  private def ensureTableOn(conn: Connection, table: String,
      schema: StructType, ddlSuffix: String = ""): Unit = {
    val cols = schema.fields
      .map(f => s""""${f.name}" ${sqlType(f.dataType)}""" +
        (if (f.nullable) " NULL" else " NOT NULL"))
      .mkString(", ")
    val suffix = if (ddlSuffix.isEmpty) "" else s" $ddlSuffix"
    val st = conn.createStatement()
    try st.execute(
      s"""CREATE TABLE IF NOT EXISTS "$table" ($cols)$suffix""")
    finally st.close()
  }

  /** Write-side schema evolution — the reference's auto
    * `ALTER TABLE ADD COLUMN` on drift (`ClickhouseSink.java:70-125`,
    * dead code there, live here): diff the frame's schema against the
    * target table's columns and add the missing ones (typed per
    * [[sqlType]]; existing rows read back NULL). A table column absent
    * from the frame is left alone — inserts name their columns. TYPE
    * drift on a shared column is not auto-migrated: it throws, loudly,
    * because a silent cast would corrupt either old or new rows.
    * Driver-side, one metadata query per write — no-op when nothing
    * drifted. */
  def evolveTable(url: String, table: String, schema: StructType): Unit =
    withConnection(url)(evolveTableOn(_, table, schema))

  private def evolveTableOn(conn: Connection, table: String,
      schema: StructType): Unit = {
      // getColumns' table argument is a JDBC SEARCH PATTERN — `_` is a
      // single-char wildcard, so "dim_suppliers" would also match a
      // sibling "dimXsuppliers" and merge its columns in (review r10);
      // filter rows by exact TABLE_NAME instead of trusting the pattern
      val md = conn.getMetaData.getColumns(null, null, table, null)
      val existing = scala.collection.mutable.LinkedHashMap.empty[String, String]
      try while (md.next()) {
        if (md.getString("TABLE_NAME") == table)
          existing += md.getString("COLUMN_NAME").toLowerCase -> md.getString("TYPE_NAME")
      } finally md.close()
      if (existing.nonEmpty) {
        // type-drift guard on SHARED columns: compare base type names
        // (driver spellings vary — only flag when both sides are
        // recognizably different, e.g. VARCHAR vs BIGINT)
        schema.fields.foreach { f =>
          existing.get(f.name.toLowerCase).foreach { have =>
            // ClickHouse metadata spells types as Nullable(T) — unwrap
            // before comparing the base name; nullability is not drift
            val haveUp = {
              val up = have.toUpperCase.trim
              if (up.startsWith("NULLABLE(") && up.endsWith(")"))
                up.stripPrefix("NULLABLE(").stripSuffix(")")
              else up
            }
            val haveBase = haveUp.takeWhile(_ != '(').trim
            val wantBase = sqlType(f.dataType).takeWhile(_ != '(').trim
            // driver spellings → the sqlType names. NOTE the INT8 clash:
            // Postgres int8 is 8 BYTES, ClickHouse Int8 is 8 BITS — we
            // keep the Postgres reading, so a ClickHouse TINYINT column
            // reads as drift and THROWS (loud, safe side) rather than
            // silently matching the wrong width.
            val families = Map("INT8" -> "BIGINT", "INT4" -> "INTEGER",
              "INT2" -> "SMALLINT", "INT1" -> "TINYINT", "FLOAT8" -> "DOUBLE",
              "FLOAT4" -> "REAL", "TEXT" -> "VARCHAR", "STRING" -> "VARCHAR",
              // ClickHouse spellings
              "INT64" -> "BIGINT", "INT32" -> "INTEGER", "INT16" -> "SMALLINT",
              "FLOAT64" -> "DOUBLE", "FLOAT32" -> "REAL",
              "DATETIME" -> "TIMESTAMP", "DATETIME64" -> "TIMESTAMP",
              "BOOL" -> "BOOLEAN")
            val h = families.getOrElse(haveBase, haveBase)
            if (h != wantBase)
              throw new IllegalStateException(
                s"JdbcBatchSink: column ${f.name} of $table is $have in the " +
                  s"database but ${sqlType(f.dataType)} in the frame — type " +
                  "drift is not auto-migrated")
          }
        }
        val missing = schema.fields.filterNot(f =>
          existing.contains(f.name.toLowerCase))
        missing.foreach { f =>
          val st = conn.createStatement()
          try st.execute(
            s"""ALTER TABLE "$table" ADD COLUMN "${f.name}" ${sqlType(f.dataType)}""")
          finally st.close()
        }
      }
  }

  /** One driver-side connection for BOTH create-if-absent and column
    * evolution: two sequential opens per write doubled the embedded
    * engine's open/close race surface (review r10 — the chaos spec
    * tripped on the extra churn). */
  private def prepareTable(url: String, table: String,
      schema: StructType, ddlSuffix: String = ""): Unit =
    withConnection(url) { conn =>
      ensureTableOn(conn, table, schema, ddlSuffix)
      evolveTableOn(conn, table, schema)
    }

  /** Write `df` into `table` at `url` (creating it from the frame's
    * schema, ALTERing in any new columns), one batching writer per
    * partition. `ddlSuffix` goes verbatim after the CREATE column list
    * (ClickHouse's mandatory `ENGINE = ...` clause). */
  def write(df: DataFrame, url: String, table: String,
      batchRows: Int = DefaultBatchRows, flushMs: Long = DefaultFlushMs,
      ddlSuffix: String = ""): Unit = {
    val schema = df.schema
    prepareTable(url, table, schema, ddlSuffix)
    val insert = s"""INSERT INTO "$table" (${schema.fields
        .map(f => s""""${f.name}"""").mkString(", ")}) VALUES (${schema.fields
        .map(_ => "?").mkString(", ")})"""
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) writePartition(rows, url, insert, schema, batchRows, flushMs)
    }
  }

  /** Shard-node round-robin write — the multi-node half of the reference
    * sink (`ClickhouseSink.java:43-61` rotates inserts across the shard
    * nodes of a distributed table; dead code there, modeled live here).
    * Spark-first shape: rotation happens at PARTITION granularity —
    * partition p's batching writer connects to `urls(p % n)` — so every
    * flush stays ONE transaction on ONE node, and a frame repartitioned
    * on its shard key (the [[OutputCatalog]] spec) keeps each key's rows
    * on a single node while partitions spread uniformly across nodes.
    * Per-INSERT rotation inside a writer (the reference's counter) would
    * split a batch's transactionality across nodes for no balance gain.
    * Readers union the shard nodes (`spark.read.jdbc` per url). */
  def writeSharded(df: DataFrame, urls: Seq[String], table: String,
      batchRows: Int = DefaultBatchRows,
      flushMs: Long = DefaultFlushMs,
      ddlSuffix: String = ""): Unit = {
    require(urls.nonEmpty, "writeSharded needs at least one shard url")
    val schema = df.schema
    urls.foreach(prepareTable(_, table, schema, ddlSuffix))
    val insert = s"""INSERT INTO "$table" (${schema.fields
        .map(f => s""""${f.name}"""").mkString(", ")}) VALUES (${schema.fields
        .map(_ => "?").mkString(", ")})"""
    val shardUrls = urls.toIndexedSeq
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        writePartition(rows, shardUrls(pid % shardUrls.size), insert,
          schema, batchRows, flushMs)
      }
    }
  }

  /** One partition's writer loop: addBatch rows, flush on count OR time.
    * The current flush's rows stay buffered until their commit succeeds
    * — see [[flush]] for why the retry needs them. */
  private def writePartition(rows: Iterator[Row], url: String,
      insert: String, schema: StructType, batchRows: Int, flushMs: Long): Unit =
    withConnection(url) { conn =>
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement(insert)
      try {
        val pending = scala.collection.mutable.ArrayBuffer.empty[Row]
        var lastFlush = System.nanoTime()
        while (rows.hasNext) {
          val r = rows.next()
          bind(ps, r, schema)
          ps.addBatch()
          pending += r
          val elapsedMs = (System.nanoTime() - lastFlush) / 1000000L
          if (pending.size >= batchRows ||
              (pending.nonEmpty && elapsedMs >= flushMs)) {
            flush(conn, ps, pending, schema)
            pending.clear()
            lastFlush = System.nanoTime()
          }
        }
        if (pending.nonEmpty) flush(conn, ps, pending, schema)
      } finally {
        // a failed batch can invalidate the statement (DuckDB throws
        // "Statement was closed" from close()) — never let the cleanup
        // REPLACE the real flush error in the task failure
        try ps.close() catch { case _: SQLException => () }
      }
    }

  /** executeBatch + commit, ONE rollback-and-retry on transient failure.
    * JDBC drivers clear a statement's batch even when executeBatch
    * FAILS (verified against the embedded DuckDB driver), so a naive
    * re-executeBatch would commit an EMPTY batch — silently dropping
    * the whole flush. The retry therefore re-BINDS the buffered rows
    * first. A second failure propagates and fails the task: Spark's
    * task retry re-runs the partition from the start, and flushes the
    * first attempt already committed duplicate — the sink is
    * AT-LEAST-ONCE under failure (the T8 model); readers that need
    * exactness dedup on a row key (KeepLatest / DISTINCT), asserted by
    * the chaos spec. */
  private def flush(conn: Connection, ps: PreparedStatement,
      pending: scala.collection.Seq[Row], schema: StructType): Unit =
    try { ps.executeBatch(); conn.commit() }
    catch {
      case _: SQLException =>
        conn.rollback()
        ps.clearBatch() // defensive: some drivers keep the failed batch
        pending.foreach { r => bind(ps, r, schema); ps.addBatch() }
        ps.executeBatch(); conn.commit()
    }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType): Unit = {
    var i = 0
    while (i < schema.length) {
      val v = if (row.isNullAt(i)) null else row.get(i)
      v match {
        case null => ps.setObject(i + 1, null)
        case s: String => ps.setString(i + 1, s)
        case l: Long => ps.setLong(i + 1, l)
        case n: Int => ps.setInt(i + 1, n)
        case n: Short => ps.setShort(i + 1, n)
        case n: Byte => ps.setByte(i + 1, n)
        case d: Double => ps.setDouble(i + 1, d)
        case f: Float => ps.setFloat(i + 1, f)
        case b: Boolean => ps.setBoolean(i + 1, b)
        case d: java.math.BigDecimal => ps.setBigDecimal(i + 1, d)
        case d: java.sql.Date => ps.setDate(i + 1, d)
        case t: java.sql.Timestamp => ps.setTimestamp(i + 1, t)
        case other => ps.setObject(i + 1, other)
      }
      i += 1
    }
  }

  /** Open with a bounded retry: the embedded engine's per-path instance
    * cache can transiently fail `getConnection` when an open races a
    * just-finished close of the same file in one process (driver-side
    * ensureTable → executor-side writer is exactly that interval; seen
    * as a startup "Failed to deserialize" SQLException with the file
    * itself intact). A real corruption fails all attempts and
    * propagates — the retry only absorbs the open/close race. */
  private def withConnection[T](url: String)(body: Connection => T): T = {
    val conn = connect(url)
    try body(conn) finally conn.close()
  }

  /** Bounded-retry open (public: recovery paths and tests reconnecting to
    * a file a just-failed writer may still be closing need the identical
    * policy — a raw `DriverManager.getConnection` there reintroduces the
    * race). 10 attempts, exponential backoff to ~51 s total: the ~12 s
    * 8-attempt window was measured insufficient once under heavy
    * external disk load (r13 — a concurrent multi-GB scan stretched the
    * close/checkpoint interval past it), and a batch sink should prefer
    * a slow open to a spurious task failure. A real corruption still
    * fails every attempt and propagates. */
  def connect(url: String): Connection = {
    var attempt = 0
    var conn: Connection = null
    while (conn == null) {
      try conn = DriverManager.getConnection(url)
      catch {
        case _: SQLException if attempt < 10 =>
          attempt += 1
          Thread.sleep(25L << attempt)
      }
    }
    conn
  }
}
