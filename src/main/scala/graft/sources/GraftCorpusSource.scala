package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector exposing the reference's manifest corpus
  * (count line + N file paths, 1-based ids —
  * /root/reference/src/main.cpp:334-345) as a first-class Spark
  * source:
  *
  * {{{
  *   spark.read.format("graft-corpus")
  *     .option("manifest", "/path/to/manifest.txt").load()
  *   // => DataFrame(doc_id BIGINT, text STRING), one row per line
  * }}}
  *
  * Why a connector and not the join in [[TextCorpus.documents]]: the
  * join version reads through Spark's generic text source and then
  * must repair `input_file_name()`'s URI encoding to recover ids; the
  * connector plans ONE InputPartition PER MANIFEST FILE, so the
  * path→id mapping is carried by the partition itself — no join, no
  * URI round-trip — and Spark's scheduler distributes the files
  * exactly like the reference's dynamic work queue distributes them
  * to mappers (main.cpp:216-226, R2). Column pruning is pushed into
  * the scan ([[SupportsPushDownRequiredColumns]]): a `count(*)` or
  * doc_id-only query never materializes line text.
  *
  * Scale posture: per-file granularity is the reference's own work
  * unit; at 100 TB with huge single files the next rung is byte-range
  * splits (as Spark's FilePartition does), and with millions of tiny
  * files, bin-packing several per partition — both are
  * planInputPartitions-local changes. Files are opened through the
  * Hadoop FileSystem API, so any scheme the cluster's Hadoop conf
  * resolves (file://, hdfs://, s3a://) works unchanged.
  */
class GraftCorpusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-corpus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCorpusTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftCorpusTable(properties.get("manifest"))
}

object GraftCorpusTable {
  /** The corpus schema: (doc_id, text), one row per file line. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
}

class GraftCorpusTable(manifest: String) extends Table with SupportsRead {
  require(manifest != null,
    """graft-corpus requires .option("manifest", <path>)""")
  override def name(): String = s"graft-corpus($manifest)"
  override def schema(): StructType = GraftCorpusTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCorpusScanBuilder(manifest)
}

class GraftCorpusScanBuilder(manifest: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = GraftCorpusTable.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** doc_id predicates become FILE pruning: a partition carries
    * exactly one doc_id, so evaluating them against manifest entries
    * at planning time is exact — the connector's form of partition
    * pruning (a doc_id-range query over a million-file manifest opens
    * only the matching files). ALL filters are returned for Spark to
    * re-evaluate: pruning is an optimization, never a correctness
    * dependency. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftCorpusScan.prunable)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new GraftCorpusScan(manifest, required, pushed)
}

object GraftCorpusScan {
  /** Filters this source can evaluate against a manifest entry. A
    * filter carrying a null literal (e.g. `isin(1, null)`) is NOT
    * prunable: `keeps` would NPE casting it, and since every filter is
    * re-applied above the scan anyway, declining to prune is always
    * safe. */
  private[sources] def prunable(f: Filter): Boolean = f match {
    case EqualTo("doc_id", v)            => v != null
    case GreaterThan("doc_id", v)        => v != null
    case GreaterThanOrEqual("doc_id", v) => v != null
    case LessThan("doc_id", v)           => v != null
    case LessThanOrEqual("doc_id", v)    => v != null
    case In("doc_id", vs)                => vs != null && vs.forall(_ != null)
    case IsNotNull("doc_id")             => true
    case _                               => false
  }
  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()
  /** Exact evaluation of a prunable filter against one file's id. */
  private[sources] def keeps(id: Long, f: Filter): Boolean = f match {
    case EqualTo("doc_id", v)            => id == asLong(v)
    case GreaterThan("doc_id", v)        => id > asLong(v)
    case GreaterThanOrEqual("doc_id", v) => id >= asLong(v)
    case LessThan("doc_id", v)           => id < asLong(v)
    case LessThanOrEqual("doc_id", v)    => id <= asLong(v)
    case In("doc_id", vs)                => vs.exists(asLong(_) == id)
    case IsNotNull("doc_id")             => true
    case _                               => true
  }
}

class GraftCorpusScan(manifest: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-corpus manifest=$manifest ReadSchema=${required.simpleString}" +
      s" PushedFilters=${pushed.mkString("[", ", ", "]")}"
  /** One partition per manifest entry surviving the pushed doc_id
    * predicates — the manifest is tiny and driver-side by contract
    * (its first line bounds it), so this is an O(N-files) driver
    * step, not a data read. */
  override def planInputPartitions(): Array[InputPartition] =
    TextCorpus.manifestEntries(manifest)
      .filter { case (_, id) =>
        pushed.forall(GraftCorpusScan.keeps(id, _)) }
      .map { case (p, id) => GraftFilePartition(p, id): InputPartition }
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // The SESSION's Hadoop conf, not a bare `new Configuration()`:
    // spark.hadoop.* settings (s3a credentials, defaultFS, …) must
    // reach the executor-side file open or only file:// would work.
    new GraftCorpusReaderFactory(required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()))
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCorpusMicroBatchStream(manifest, createReaderFactory())
}

/** Offset = how many manifest entries have been processed. The
  * manifest contract (count line + N paths, ids 1-based in manifest
  * order) makes this exact: entries are only ever APPENDED (ids are
  * assigned by position, so rewriting history would re-id existing
  * docs — invalid under the reference contract), so a single
  * monotonically-growing count identifies a batch range precisely and
  * replays identically after restart. */
case class GraftManifestOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Streaming rung of the connector: a GROWING manifest becomes a
  * micro-batch source — each batch reads the files appended since the
  * last committed count, one partition per new file, feeding the
  * incremental inverted index (S6) from the reference's own input
  * contract instead of a parquet drop directory. */
class GraftCorpusMicroBatchStream(manifest: String,
    factory: PartitionReaderFactory) extends MicroBatchStream {
  /** Last successfully-observed manifest size. latestOffset() runs on
    * every trigger against a file a producer may be rewriting in
    * place; a torn snapshot (unparseable count line, vanished file)
    * must stall the stream at the previous offset, not kill the
    * query — the next trigger sees the completed write. */
  @volatile protected var lastKnown: Long = 0L
  override def initialOffset(): Offset = GraftManifestOffset(0L)
  override def latestOffset(): Offset = {
    val n = try TextCorpus.manifestEntries(manifest).size.toLong
            catch { case scala.util.control.NonFatal(_) => lastKnown }
    // Monotone: a torn read that surfaces a shorter prefix must not
    // rewind the offset (ids are positional; history never shrinks).
    lastKnown = math.max(lastKnown, n)
    GraftManifestOffset(lastKnown)
  }
  override def deserializeOffset(json: String): Offset =
    GraftManifestOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftManifestOffset].n
    val hi = end.asInstanceOf[GraftManifestOffset].n
    TextCorpus.manifestEntries(manifest)
      .filter { case (_, id) => id > lo && id <= hi }
      .map { case (p, id) => GraftFilePartition(p, id): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = factory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GraftFilePartition(path: String, docId: Long) extends InputPartition

class GraftCorpusReaderFactory(fields: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCorpusReader(partition.asInstanceOf[GraftFilePartition], fields,
      conf.value)
}

/** Streams one corpus file as (doc_id, text) rows; only the pruned
  * fields are materialized (a doc_id-only scan never decodes line
  * bytes into Spark rows). */
class GraftCorpusReader(part: GraftFilePartition, fields: Array[String],
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val fs = new Path(part.path).getFileSystem(conf)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(part.path)),
      java.nio.charset.StandardCharsets.UTF_8))
  private var line: String = _
  // Field extractors resolved ONCE — get() runs per line of a 100 TB
  // corpus and must not re-match field names or allocate closures.
  private val extract: Array[() => Any] = fields.map {
    case "doc_id" => () => part.docId
    case "text"   => () => UTF8String.fromString(line)
  }
  override def next(): Boolean = { line = in.readLine(); line != null }
  override def get(): InternalRow = {
    val values = new Array[Any](extract.length)
    var i = 0
    while (i < values.length) { values(i) = extract(i)(); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }
  override def close(): Unit = in.close()
}
