package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.Text
import org.apache.hadoop.io.compress.CompressionCodecFactory
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
 * composition delegates: SPLIT PLANNING. Each uncompressed file is
 * planned as byte-range partitions of `maxSplitBytes` (default 128 MiB),
 * so one giant transaction log parallelizes across a cluster instead of
 * serializing into one task.
 *
 * Range reading follows Hadoop's LineRecordReader contract exactly: a
 * reader whose range starts mid-file skips its first (possibly partial)
 * line — the previous range reads one line PAST its end to finish it —
 * and reads one line past its own end for the same reason; every line is
 * emitted by exactly one range regardless of where split boundaries land
 * (spec-checked at 16-byte splits, far below any line length).
 *
 * Compressed logs (`.gz`/`.bz2`/`.deflate` — anything the Hadoop
 * `CompressionCodecFactory` resolves by extension) are planned as ONE
 * whole-file range and the reader wraps the stream in the codec's
 * decompressor: chopping a compressed byte stream at arbitrary offsets
 * would silently emit garbage rows, which is exactly what the composed
 * `spark.read.textFile` path never does. Parallelism for compressed
 * inputs comes from the file count, as everywhere in Hadoop-land.
 *
 * Several paths load in one call — `load(p1, p2)` or one comma-separated
 * `path` string (the reference's train+test pair) — and each path may be
 * a literal, a glob, or a directory.
 *
 * The initiating session's Hadoop configuration is captured ONCE when the
 * table is resolved ([[TransactionsV2.getTable]] runs on the session that
 * called `load`) and travels to planning and executors as a plain string
 * map — never re-resolved through `SparkSession.active`, which in a
 * multi-session application can be a DIFFERENT session by planning time.
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
    val paths = TransactionsV2.resolvePaths(opts)
    require(paths.nonEmpty,
      "graft-transactions requires a path: spark.read.format(...).load(path, ...)")
    val split = Option(opts.get("maxsplitbytes")).map(_.toLong)
      .getOrElse(128L * 1024 * 1024)
    require(split > 0, s"maxSplitBytes must be positive, got $split")
    // Resolution runs on the thread of the session that called load():
    // capture ITS Hadoop conf here, once, for planning and executors.
    val confMap = TransactionsV2.confToMap(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new TransactionsTable(paths, split, confMap)
  }
}

object TransactionsV2 {
  val Schema: StructType = StructType(Seq(
    StructField("items", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** All load paths: DataFrameReader encodes `load(p1, p2, ...)` as a
    * JSON-array `paths` option and a single `load(p)` as `path`; a single
    * `path` may itself be comma-separated (train+test in one read).
    * Commas INSIDE glob braces don't separate — `/logs/{a,b}.txt` is one
    * Hadoop alternation glob, not two broken halves. */
  private[sources] def resolvePaths(opts: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(opts.get("paths")).toSeq.flatMap { json =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readValue(json, classOf[Array[String]]).toSeq
    }
    val single = Option(opts.get("path")).toSeq
      .flatMap(splitTopLevelCommas).map(_.trim).filter(_.nonEmpty)
    multi ++ single
  }

  /** Split on commas at brace depth 0 only (Hadoop `{a,b}` alternation
    * globs keep their commas); a backslash-ESCAPED brace — Hadoop's
    * syntax for a literal brace in a file name — is not an alternation
    * and must not swallow later commas. Unbalanced braces never split —
    * the glob engine, not the splitter, owns rejecting malformed
    * patterns. */
  private[sources] def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var escaped = false
    s.foreach { c =>
      if (escaped) { cur += c; escaped = false }
      else c match {
        case '\\' => cur += '\\'; escaped = true
        case '{' => depth += 1; cur += '{'
        case '}' => depth = math.max(0, depth - 1); cur += '}'
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case other => cur += other
      }
    }
    out += cur.result()
    out.result()
  }

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

class TransactionsTable(
    paths: Seq[String], maxSplitBytes: Long, confMap: Map[String, String])
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-transactions:${paths.mkString(",")}"
  override def schema(): StructType = TransactionsV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(paths.size == 1,
      s"graft-transactions writes need exactly one path, got ${paths.size}")
    require(info.schema().length == 1 &&
        info.schema().head.dataType.isInstanceOf[ArrayType] &&
        info.schema().head.dataType.asInstanceOf[ArrayType]
          .elementType == StringType,
      s"graft-transactions writes a single array<string> column, " +
        s"got ${info.schema().simpleString}")
    new TransactionsWriteBuilder(paths.head, confMap)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = TransactionsV2.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = TransactionsV2.mapToConf(confMap)
        val codecs = new CompressionCodecFactory(conf)
        val files: Seq[FileStatus] = paths.flatMap { path =>
          val p = new Path(path)
          val fs = p.getFileSystem(conf)
          // globStatus handles literal paths too (a non-glob matches
          // itself) — fromText accepts globs, so this source must as well
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
          matched.toSeq.flatMap { m =>
            if (m.isDirectory) {
              fs.listStatus(m.getPath).toSeq.filter(s => s.isFile && isData(s))
            } else Seq(m)
          }
        }
        files.flatMap { f =>
          val len = f.getLen
          if (codecs.getCodec(f.getPath) != null) {
            // Compressed: byte offsets index the COMPRESSED stream, so
            // mid-file ranges are meaningless — one whole-file range,
            // decompressed by the reader. Long.MaxValue end: "read to
            // EOF" (decompressed positions never compare past it).
            Seq(TransactionRange(f.getPath.toString, 0L, Long.MaxValue))
          } else {
            val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
            (0L until n).map { i =>
              TransactionRange(f.getPath.toString, i * maxSplitBytes,
                math.min((i + 1) * maxSplitBytes, len))
            }
          }
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        // ONE conf copy, held by the factory — not one per InputPartition
        // (a 1 TB file is ~8000 ranges; per-range maps would multiply the
        // driver-side payload by the split count)
        new TransactionReaderFactory(confMap)
    }
}

/** One byte range of one file (whole file, end = Long.MaxValue, when the
  * file is compressed — offsets would index the compressed stream). */
case class TransactionRange(file: String, start: Long, end: Long)
  extends InputPartition

/** Carries the single flattened-conf copy to executors. */
class TransactionReaderFactory(conf: Map[String, String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TransactionRangeReader(partition.asInstanceOf[TransactionRange], conf)
}

/**
 * The write half of the connector: each task streams its partition to a
 * staged file (`_staging-<queryId>/part-<partition>-<task>.txt`), and the
 * driver-side commit publishes every staged file into the target
 * directory with one rename apiece — task attempts that never commit
 * leave nothing visible, and a failed/aborted query deletes its staging
 * directory wholesale (the classic Hadoop output-committer contract, v1
 * flavor: rename-per-file at commit, no partial results readable).
 * `mode("overwrite")` maps to DSv2 truncate: existing DATA files (the
 * '_'/'.'-prefix convention again) are deleted inside the same commit,
 * after the staged files are known good.
 *
 * Lines are items joined by single spaces — the reference's format.
 * Items containing a space or newline would silently change the
 * transaction's arity on read-back, so the writer REJECTS them
 * (fail-at-write beats corrupt-at-read); empty-array transactions write
 * an empty line, which reads back as `[""]` — the format itself cannot
 * represent an empty transaction (same as the composed text path).
 */
class TransactionsWriteBuilder(path: String, confMap: Map[String, String])
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new TransactionsBatchWrite(path, confMap, doTruncate)
    }
}

class TransactionsBatchWrite(
    path: String, confMap: Map[String, String], truncate: Boolean)
  extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  // Unique per write (one BatchWrite is constructed per query execution):
  // concurrent writers to one directory never share staging, and the
  // SAME id goes into every published file name — two applications
  // appending to one directory can both produce (partition 0, task 7)
  // files, and a cross-app name collision at commit would either clobber
  // rows (POSIX rename) or fail the job (HDFS rename-to-existing).
  private val writeId = java.util.UUID.randomUUID().toString
  private val stagingName = s"_staging-$writeId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new TransactionsWriterFactory(path, stagingName, writeId, confMap)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = TransactionsV2.mapToConf(confMap)
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val staging = new Path(target, stagingName)
    try {
      // Publish FIRST, truncate after: deleting the old data before the
      // renames would leave a window where a rename failure destroys the
      // old dataset while the finally wipes the staged replacement —
      // neither copy survives. In this order a mid-commit failure leaves
      // the old files intact (plus some already-published new ones, which
      // the writeId in every name keeps distinguishable); old files are
      // deleted only once every staged file is in place.
      val published = messages.map { case m: TransactionsCommitMessage =>
        val ok = fs.rename(new Path(staging, m.file), new Path(target, m.file))
        require(ok, s"commit rename failed for ${m.file} under $path")
        m.file
      }.toSet
      if (truncate && fs.exists(target)) {
        fs.listStatus(target).foreach { f =>
          val n = f.getPath.getName
          if (f.isFile && !n.startsWith("_") && !n.startsWith(".") &&
              !published(n))
            fs.delete(f.getPath, false)
        }
      }
    } finally fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = TransactionsV2.mapToConf(confMap)
    val target = new Path(path)
    target.getFileSystem(conf).delete(new Path(target, stagingName), true)
  }
}

case class TransactionsCommitMessage(file: String)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

class TransactionsWriterFactory(
    path: String, stagingName: String, writeId: String,
    conf: Map[String, String])
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new TransactionsFileWriter(
      path, stagingName, writeId, conf, partitionId, taskId)
}

class TransactionsFileWriter(
    path: String, stagingName: String, writeId: String,
    conf: Map[String, String], partitionId: Int, taskId: Long)
  extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  // taskId keeps speculative/retried attempts of one partition from
  // clobbering each other inside staging (only the attempt whose message
  // reaches commit() gets published); writeId makes the PUBLISHED name
  // unique across applications appending to one directory, whose
  // (partitionId, taskId) pairs can collide.
  private val file = f"part-$partitionId%05d-$taskId-$writeId.txt"
  private val hConf = TransactionsV2.mapToConf(conf)
  private val staged = new Path(new Path(path, stagingName), file)
  private val out = staged.getFileSystem(hConf).create(staged, true)
  private var rows = 0L
  // writer-scoped, cleared per row — a fresh set per row is pure garbage
  // on the per-row hot path
  private val seen = new util.HashSet[String]()

  override def write(row: InternalRow): Unit = {
    val arr = row.getArray(0)
    require(arr != null, "graft-transactions cannot write a null items array")
    val sb = new java.lang.StringBuilder
    seen.clear()
    var i = 0
    val n = arr.numElements()
    // a 0-item transaction writes a blank line, which reads back as [""]
    // — the same silent arity change the per-item requires reject
    require(n > 0,
      "empty items array — a blank line reads back as a one-item " +
        "transaction; the text format cannot represent an empty transaction")
    while (i < n) {
      val raw = arr.getUTF8String(i)
      require(raw != null,
        "null item — unrepresentable in the transaction-text format")
      val item = raw.toString
      require(item.indexOf(' ') < 0 && item.indexOf('\n') < 0 &&
          item.indexOf('\r') < 0,
        s"item '$item' contains a space/newline — unrepresentable in the " +
          "transaction-text format (would change arity on read-back)")
      // the format is first-occurrence-deduplicated on READ, so a line
      // with duplicates comes back with a different arity — reject for
      // the same reason as embedded spaces (transactions are item SETS)
      require(seen.add(item),
        s"duplicate item '$item' — the transaction-text format dedupes on " +
          "read, so the transaction's arity would change on read-back")
      if (i > 0) sb.append(' ')
      sb.append(item)
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    rows += 1
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    TransactionsCommitMessage(file)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => }
    staged.getFileSystem(hConf).delete(staged, false)
  }

  override def close(): Unit = ()
}

class TransactionRangeReader(range: TransactionRange, conf: Map[String, String])
  extends PartitionReader[InternalRow] {

  private val hConf = TransactionsV2.mapToConf(conf)
  private val p = new Path(range.file)
  private val in = p.getFileSystem(hConf).open(p)
  private val reader = {
    val codec = new CompressionCodecFactory(hConf).getCodec(p)
    if (codec != null) {
      // planInputPartitions planned codec files as one whole-file range
      assert(range.start == 0, s"compressed file split mid-stream: $range")
      new LineReader(codec.createInputStream(in))
    } else {
      if (range.start != 0) in.seek(range.start)
      new LineReader(in)
    }
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

  // Close the LineReader (which closes the stream it wraps — for codec
  // files that's the CompressionInputStream, whose close releases the
  // decompressor and its native/direct buffers; closing only the raw
  // stream would leak one per compressed partition until finalizers
  // run), then the raw stream for the uncompressed case.
  override def close(): Unit = {
    try reader.close() finally in.close()
  }
}
