package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables / partitioned
  * parquet roots; the loader keeps scans lazy so Catalyst pushes
  * filters and prunes columns down to the parquet reader.
  */
object Tables {
  /** Inferred parquet schema per file path. A bare
    * `spark.read.parquet(path)` runs a footer-reading Spark JOB for
    * schema inference on EVERY call — ~35 ms each, inside the timed
    * region of every bench query that touches the table (a query over
    * three tables pays ~0.1 s before any data moves). A catalog table
    * — what this loader stands in for at cluster scale — carries its
    * schema in the metastore and never pays that job; caching the
    * inferred StructType per path is the local-mode equivalent
    * (metadata only — scans still read the files lazily, filters and
    * column pruning still push down identically).
    *
    * Both caches (schema + rowCount) are JVM-lifetime and keyed on
    * path only: they assume the base tables under a sf-dir are
    * IMMUTABLE for the life of the process, which holds for every
    * caller — `load`/`rowCount` only ever read the driver-generated
    * source testdata. Harness-rewritten tables (soak/stream
    * warehouses) go through bare `spark.read.parquet`, never this
    * loader; route any mutable path the same way.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Exact row count of a parquet table from its footers — driver-side
    * metadata, no Spark job (the metastore rowCount statistic a catalog
    * table would carry). Used by callers that need a cheap upper bound
    * to pick a partitioning layout (Graph.partitionIterEdges) without
    * materializing the derived table first. Cached per path, like the
    * schema.
    */
  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$sfDir/$name.parquet", path => {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      // recurse: a partitioned layout nests data files in subdirs — a
      // top-level-only listing would silently return 0 for them and
      // feed an UNDERcount to partitionIterEdges' layout choice
      val files =
        if (fs.getFileStatus(p).isDirectory) {
          val it = fs.listFiles(p, true)
          val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.Path]()
          while (it.hasNext) {
            val f = it.next().getPath
            if (f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
              buf += f
          }
          buf.toArray
        } else Array(p)
      require(files.nonEmpty,
        s"rowCount($path): no parquet data files found — an invalid " +
          "bound must fail loudly, not undercount a layout decision")
      files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in two parquet encodings: TIMESTAMP(NANOS)
    * (readable only as a raw long via the legacy nanos-as-long mode) and
    * TIMESTAMP_MICROS with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * The loader reads whatever is on disk and normalizes to a session-UTC
    * TimestampType, so downstream operators see one contract regardless
    * of how the driver re-encodes the feed.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(eventsRaw(s, d))

  /** events with `ts` exactly as encoded on disk — LongType epoch-nanos
    * for legacy files, TIMESTAMP/TIMESTAMP_NTZ for current ones.
    * Predicates built with [[eventTsLiteral]] against this column push
    * down to the parquet scan in either encoding.
    */
  def eventsRaw(s: SparkSession, d: String): DataFrame = {
    // Harmless for TIMESTAMP_MICROS files; required for TIMESTAMP(NANOS)
    // ones, whose footer otherwise fails schema inference.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }

  /** Normalize the on-disk `ts` to a session-UTC TimestampType (micros).
    * All sessions here pin spark.sql.session.timeZone=UTC, so the NTZ
    * wall-clock → instant cast is value-preserving and matches the
    * epoch-nanos interpretation of the legacy encoding.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      // integral `div`, not `/` — double division loses precision above 2^53
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
    case _: TimestampType => raw
    case other => throw new IllegalStateException(
      s"events.ts drifted to unsupported type $other — update Tables.normalizeEventTs")
  }

  /** A pushdown-safe cutoff literal for a raw `ts` column: epoch-nanos
    * long for legacy files, a timestamp literal otherwise. `instantUtc`
    * is an ISO instant, e.g. "2024-01-15T00:00:00Z".
    */
  def eventTsLiteral(raw: DataFrame, instantUtc: String): Column = {
    val inst = java.time.Instant.parse(instantUtc)
    raw.schema("ts").dataType match {
      case LongType => lit(inst.getEpochSecond * 1000000000L + inst.getNano)
      case dt => lit(java.sql.Timestamp.from(inst)).cast(dt)
    }
  }

  /** Hour-of-epoch bucket from a raw `ts` column, either encoding. */
  def eventHourBucket(raw: DataFrame): Column = raw.schema("ts").dataType match {
    case LongType => expr("ts div 3600000000000")
    case _ => expr("unix_micros(cast(ts as timestamp)) div 3600000000")
  }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Accepted column types per table; a Seq means "any of these".
    * This is the data contract with the driver generator — checked up
    * front by [[validate]] so a silent re-encode fails in ONE obvious
    * place instead of as dozens of scattered analysis errors.
    */
  private val contract: Map[String, Map[String, Seq[DataType]]] = {
    def one(cols: (String, DataType)*): Map[String, Seq[DataType]] =
      cols.map { case (n, t) => n -> Seq(t) }.toMap
    // a "date-like" column the generator may encode as date or timestamp
    val dateish: Seq[DataType] = Seq(DateType, TimestampType, TimestampNTZType)
    Map(
      "region" -> one("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> one("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> one("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> one("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> one("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> (one("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderpriority" -> StringType) + ("o_orderdate" -> dateish)),
      "lineitem" -> (one("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType) +
        ("l_shipdate" -> dateish)),
      "events" -> (one("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType) +
        ("ts" -> Seq(LongType, TimestampType, TimestampNTZType))),
      "documents" -> one("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> (one("vec_id" -> LongType, "label" -> IntegerType) +
        ("embedding" -> Seq(ArrayType(FloatType, containsNull = true),
          ArrayType(FloatType, containsNull = false)))))
  }

  /** Fail fast (one clear message) if any table's schema drifted from
    * the accepted variants. Called first by Verify and Bench.
    */
  def validate(spark: SparkSession, sfDir: String): Unit = {
    val drift = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      // partial dirs (SoakData writes only the tables it scales) are
      // fine — validate what's there; driver dirs are always complete
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$sfDir/$table.parquet"))) Nil
      else {
      val schema =
        try { if (table == "events") eventsRaw(spark, sfDir).schema
              else load(spark, sfDir, table).schema }
        catch { case e: Exception =>
          throw new IllegalStateException(
            s"DATA CONTRACT: cannot read $sfDir/$table.parquet: ${e.getMessage}", e)
        }
      cols.toSeq.sortBy(_._1).flatMap { case (name, accepted) =>
        schema.fields.find(_.name == name) match {
          case None => Some(s"$table.$name missing (have: ${schema.fieldNames.mkString(",")})")
          case Some(f) if !accepted.contains(f.dataType) =>
            Some(s"$table.$name is ${f.dataType.simpleString}, accepted: " +
              accepted.map(_.simpleString).mkString("|"))
          case _ => None
        }
      }
      }
    }
    if (drift.nonEmpty) throw new IllegalStateException(
      s"DATA CONTRACT violated in $sfDir — ${drift.mkString("; ")}")
  }
}
