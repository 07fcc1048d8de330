package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * The reference's transaction-text format as a REAL DataSource V2
 * connector (`spark.read.format("graft-transactions")`): one transaction
 * per line, single-space-separated items, first-occurrence-deduplicated —
 * byte-identical rows to [[TextTransactions.fromText]]'s composed read
 * (spec-enforced), but with the connector owning the 100 TB concern the
 * composition delegates: SPLIT PLANNING. Each file is planned as
 * byte-range partitions of `maxSplitBytes` (default 128 MiB), so one
 * giant transaction log parallelizes across a cluster instead of
 * serializing into one task.
 *
 * Range reading follows Hadoop's LineRecordReader contract exactly: a
 * reader whose range starts mid-file skips its first (possibly partial)
 * line — the previous range reads one line PAST its end to finish it —
 * and reads one line past its own end for the same reason; every line is
 * emitted by exactly one range regardless of where split boundaries land
 * (spec-checked at 16-byte splits, far below any line length).
 *
 * The driver's Hadoop configuration travels to executors as a plain
 * string map (captured at planning time), so fs settings apply without
 * depending on Spark's private SerializableConfiguration.
 */
class TransactionsV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-transactions"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TransactionsV2.Schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties carry the reader options in their ORIGINAL case — wrap
    // back into the case-insensitive view options are defined to have
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty,
      "graft-transactions requires a path: spark.read.format(...).load(path)")
    val split = Option(opts.get("maxsplitbytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(split > 0, s"maxSplitBytes must be positive, got $split")
    new TransactionsTable(path, split)
  }
}

object TransactionsV2 {
  val Schema: StructType = StructType(Seq(
    StructField("items", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** The session Hadoop conf flattened for executor-side rebuild. */
  private[sources] def confToMap(conf: Configuration): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val it = conf.iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  private[sources] def mapToConf(m: Map[String, String]): Configuration = {
    val c = new Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

class TransactionsTable(path: String, maxSplitBytes: Long)
  extends Table with SupportsRead {

  override def name(): String = s"graft-transactions:$path"
  override def schema(): StructType = TransactionsV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = TransactionsV2.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = org.apache.spark.sql.SparkSession.active
          .sessionState.newHadoopConf()
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        // globStatus handles literal paths too (a non-glob matches itself)
        // — fromText accepts globs, so this source must as well
        val matched = Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
        require(matched.nonEmpty, s"graft-transactions: no files match $path")
        // Spark's file-index convention: '_'/'.'-prefixed names (markers,
        // staging, hidden) are skipped when EXPANDING a directory, but a
        // path the user named explicitly (literal or glob match) is read
        // as-is — load("/logs/_part0") must not silently return nothing.
        def isData(f: FileStatus): Boolean = {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        val files: Seq[FileStatus] = matched.toSeq.flatMap { m =>
          if (m.isDirectory) {
            fs.listStatus(m.getPath).toSeq.filter(s => s.isFile && isData(s))
          } else Seq(m)
        }
        files.flatMap { f =>
          val len = f.getLen
          val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
          (0L until n).map { i =>
            TransactionRange(f.getPath.toString, i * maxSplitBytes,
              math.min((i + 1) * maxSplitBytes, len))
          }
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        // ONE conf copy, held by the factory — not one per InputPartition
        // (a 1 TB file is ~8000 ranges; per-range maps would multiply the
        // driver-side payload by the split count)
        val confMap = TransactionsV2.confToMap(
          org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
        new TransactionReaderFactory(confMap)
      }
    }
}

/** One byte range of one file. */
case class TransactionRange(file: String, start: Long, end: Long)
  extends InputPartition

/** Carries the single flattened-conf copy to executors. */
class TransactionReaderFactory(conf: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TransactionRangeReader(partition.asInstanceOf[TransactionRange], conf)
}

class TransactionRangeReader(range: TransactionRange, conf: Map[String, String])
  extends PartitionReader[InternalRow] {

  private val hConf = TransactionsV2.mapToConf(conf)
  private val p = new Path(range.file)
  private val in = p.getFileSystem(hConf).open(p)
  private val reader = {
    if (range.start != 0) in.seek(range.start)
    new LineReader(in)
  }
  private val text = new Text()
  // Hadoop contract: a mid-file range discards its first (possibly
  // partial) line — the previous range finished it.
  private var pos: Long =
    if (range.start != 0) range.start + reader.readLine(text) else 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (pos > range.end) return false // one line past the end has been read
    val n = reader.readLine(text)
    if (n == 0) return false
    pos += n
    // exact fromText semantics: split on the single space char keeping
    // empties (Catalyst split(col, " ")), dedupe keeping first occurrence
    val tokens = text.toString.split(" ", -1)
    val seen = new util.LinkedHashSet[String]()
    tokens.foreach(seen.add)
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    row = new GenericInternalRow(Array[Any](ArrayData.toArrayData(arr)))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
