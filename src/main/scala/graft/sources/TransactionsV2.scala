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
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
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

  /** Split on commas outside glob constructs only: Hadoop `{a,b}`
    * alternations AND `[a,b]` character classes keep their commas (a
    * comma in a character class is a literal member, and splitting
    * there would break the path into two broken halves); a
    * backslash-ESCAPED brace/bracket — Hadoop's syntax for a literal
    * one in a file name — is not a construct and must not swallow later
    * commas. Unbalanced openers never split — the glob engine, not the
    * splitter, owns rejecting malformed patterns. */
  private[sources] def splitTopLevelCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var braces = 0
    var brackets = 0
    var escaped = false
    s.foreach { c =>
      if (escaped) { cur += c; escaped = false }
      else c match {
        case '\\' => cur += '\\'; escaped = true
        case '{' => braces += 1; cur += '{'
        case '}' => braces = math.max(0, braces - 1); cur += '}'
        case '[' => brackets += 1; cur += '['
        case ']' => brackets = math.max(0, brackets - 1); cur += ']'
        case ',' if braces == 0 && brackets == 0 =>
          out += cur.result(); cur.clear()
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

  /** The name of the commit manifest a [[TransactionsBatchWrite]] in
    * manifest mode maintains at the target directory's root. */
  private[sources] val ManifestName = "_manifest"

  /** Resolve the configured paths to concrete data files. Each path may
    * be a literal, a glob, or a directory; directory EXPANSION honors
    * the manifest protocol — a directory carrying `_manifest` reads
    * EXACTLY the files the manifest lists (relative paths, committed
    * atomically by the manifest-mode writer), so unmanifested residue
    * from a mid-commit crash is invisible — and otherwise skips
    * '_'/'.'-prefixed names (markers, staging, hidden), Spark's
    * file-index convention. A path the user named explicitly (literal
    * or glob match) is read as-is — load("/logs/_part0") must not
    * silently return nothing. */
  private[sources] def discoverFiles(
      paths: Seq[String], conf: Configuration): Seq[FileStatus] =
    paths.flatMap { path =>
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      // globStatus handles literal paths too (a non-glob matches
      // itself) — fromText accepts globs, so this source must as well
      val matched = Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus])
      require(matched.nonEmpty, s"graft-transactions: no files match $path")
      def isData(f: FileStatus): Boolean = {
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      matched.toSeq.flatMap { m =>
        if (m.isDirectory) {
          val manifest = new Path(m.getPath, ManifestName)
          if (fs.exists(manifest)) {
            readManifest(fs, manifest)
              .map(rel => fs.getFileStatus(new Path(m.getPath, rel)))
          } else {
            fs.listStatus(m.getPath).toSeq.filter(s => s.isFile && isData(s))
          }
        } else Seq(m)
      }
    }

  /** One relative data-file path per line, UTF-8; blank lines ignored. */
  private[sources] def readManifest(
      fs: org.apache.hadoop.fs.FileSystem, manifest: Path): Seq[String] = {
    val in = fs.open(manifest)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
    } finally in.close()
  }

  /** Byte-range split planning shared by the batch scan and the
    * micro-batch stream: uncompressed files shatter into
    * `maxSplitBytes` ranges, codec files (offsets index the compressed
    * stream) stay whole-file. */
  private[sources] def planRanges(
      files: Seq[FileStatus], conf: Configuration,
      maxSplitBytes: Long): Array[InputPartition] = {
    val codecs = new CompressionCodecFactory(conf)
    files.flatMap { f =>
      val len = f.getLen
      if (codecs.getCodec(f.getPath) != null) {
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
}

class TransactionsTable(
    paths: Seq[String], maxSplitBytes: Long, confMap: Map[String, String])
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = s"graft-transactions:${paths.mkString(",")}"
  override def schema(): StructType = TransactionsV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
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
    val manifest = info.options.getBoolean("manifestcommit", false)
    new TransactionsWriteBuilder(paths.head, confMap, manifest)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = TransactionsV2.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val conf = TransactionsV2.mapToConf(confMap)
        // Compressed: byte offsets index the COMPRESSED stream, so
        // mid-file ranges are meaningless — one whole-file range,
        // decompressed by the reader (Long.MaxValue end = "read to EOF");
        // manifest directories read exactly their committed file list.
        TransactionsV2.planRanges(
          TransactionsV2.discoverFiles(paths, conf), conf, maxSplitBytes)
      }

      override def createReaderFactory(): PartitionReaderFactory =
        // ONE conf copy, held by the factory — not one per InputPartition
        // (a 1 TB file is ~8000 ranges; per-range maps would multiply the
        // driver-side payload by the split count)
        new TransactionReaderFactory(confMap)

      override def toMicroBatchStream(
          checkpointLocation: String): MicroBatchStream =
        new TransactionsMicroBatchStream(paths, maxSplitBytes, confMap)
    }
}

/**
 * Streaming read over the same split planner — the third execution mode
 * of the reference's S1 source (composed batch, connector batch, now
 * micro-batch): each `latestOffset` call snapshots the CURRENT file
 * discovery (globs, directories, manifests — identical resolution to
 * the batch scan), and a micro-batch plans the byte ranges of exactly
 * the files that are in the end snapshot but not the start. The offset
 * IS the sorted discovered-file list (the FileStreamSource seen-file
 * log carried in the offset instead of a sidecar), so restarts and
 * AvailableNow runs re-plan deterministically from the checkpoint
 * without re-reading anything already committed.
 *
 * Contract (the standard file-source one): files are immutable once
 * visible, and new data arrives as NEW files — an appended-to file's
 * extra bytes are not picked up (its name is already in the offset).
 * Offset size is O(files seen), the same driver-side bound the batch
 * planner's file list already carries.
 */
class TransactionsMicroBatchStream(
    paths: Seq[String], maxSplitBytes: Long, confMap: Map[String, String])
  extends MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class FilesOffset(files: Seq[String]) extends Offset {
    override def json(): String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.writeValueAsString(files.toArray)
    }
  }

  override def initialOffset(): Offset = FilesOffset(Nil)

  override def latestOffset(): Offset = {
    val conf = TransactionsV2.mapToConf(confMap)
    FilesOffset(TransactionsV2.discoverFiles(paths, conf)
      .map(_.getPath.toString).sorted)
  }

  override def deserializeOffset(json: String): Offset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    FilesOffset(mapper.readValue(json, classOf[Array[String]]).toSeq)
  }

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files.toSet
    val fresh = end.asInstanceOf[FilesOffset].files.filterNot(seen)
    val conf = TransactionsV2.mapToConf(confMap)
    val statuses = fresh.map { f =>
      val p = new Path(f)
      p.getFileSystem(conf).getFileStatus(p)
    }
    TransactionsV2.planRanges(statuses, conf, maxSplitBytes)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TransactionReaderFactory(confMap)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
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
class TransactionsWriteBuilder(
    path: String, confMap: Map[String, String], manifest: Boolean)
  extends org.apache.spark.sql.connector.write.WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new TransactionsBatchWrite(path, confMap, doTruncate, manifest)
    }
}

class TransactionsBatchWrite(
    path: String, confMap: Map[String, String], truncate: Boolean,
    manifest: Boolean)
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

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (manifest) commitManifest(messages) else commitV1(messages)

  /** The v1-committer commit: one rename per staged file into the
    * target root, truncate after. O(files) driver-side renames — fine
    * where rename is a metadata move, the documented trade where it's a
    * copy; [[commitManifest]] is the O(1)-visibility alternative. */
  private def commitV1(messages: Array[WriterCommitMessage]): Unit = {
    val conf = TransactionsV2.mapToConf(confMap)
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val staging = new Path(target, stagingName)
    // Overwrite marker: publish-then-truncate means a mid-commit crash
    // leaves the union of old and new datasets readable — correct files,
    // wrong dataset. The marker makes that residue DETECTABLE: its
    // presence on recovery says "an overwrite died here", distinguishing
    // the union from a completed append; it is deleted only after the
    // truncation finishes.
    val committing = new Path(target, s"_committing-$writeId")
    try {
      if (truncate && fs.exists(target)) fs.create(committing, true).close()
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
        fs.delete(committing, false)
      }
    } finally fs.delete(staging, true)
  }

  /**
   * Manifest commit (`option("manifestCommit", true)`) — O(1) visible
   * -or-not on stores where rename is a copy: the staged directory is
   * renamed ONCE into a permanent '_'-prefixed data directory
   * (`_data-<writeId>` — invisible to directory expansion by the
   * '_'-prefix convention), and visibility flips with ONE atomic
   * rename of the rewritten `_manifest` (written to a temp name first;
   * `FileContext.rename(OVERWRITE)` is the same primitive Spark's own
   * checkpoint managers rely on). Readers of a manifest directory read
   * EXACTLY the listed files, so a crash anywhere before the manifest
   * flip leaves the OLD dataset perfectly readable and the new files
   * invisible — no union-visibility window, no detectable-residue
   * problem (the failed write's `_data-*`/staging dirs are unreferenced
   * garbage, swept by the next successful commit's best-effort pass).
   *
   * Append mode carries the prior dataset forward: the new manifest =
   * old manifest entries (or, upgrading a v1 directory, its root data
   * files) + this write's files. Truncate lists only this write's.
   * Commit cost: 2 renames + one (bounded, file-count-sized) manifest
   * write, regardless of file count.
   */
  private def commitManifest(messages: Array[WriterCommitMessage]): Unit = {
    val conf = TransactionsV2.mapToConf(confMap)
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val staging = new Path(target, stagingName)
    val dataDirName = s"_data-$writeId"
    val dataDir = new Path(target, dataDirName)
    try {
      val committed = messages.map {
        case m: TransactionsCommitMessage => m.file
      }.toSet
      // one rename publishes every staged file into its permanent home;
      // stragglers from uncommitted attempts ride along but are never
      // listed, so readers cannot see them (cleaned best-effort below)
      require(fs.rename(staging, dataDir),
        s"manifest commit: staging rename failed under $path")
      val fresh = committed.toSeq.sorted.map(f => s"$dataDirName/$f")
      val manifestPath = new Path(target, TransactionsV2.ManifestName)
      val prior: Seq[String] =
        if (truncate) Nil
        else if (fs.exists(manifestPath))
          TransactionsV2.readManifest(fs, manifestPath)
        else if (fs.exists(target))
          // upgrading a v1 directory in place: its root data files ARE
          // the prior dataset
          fs.listStatus(target).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
              !f.getPath.getName.startsWith("."))
            .map(_.getPath.getName).sorted
        else Nil
      val tmp = new Path(target, s"_manifest.tmp-$writeId")
      val out = fs.create(tmp, true)
      try out.write((prior ++ fresh).mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // THE visibility flip: atomic overwrite-rename of the manifest
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        target.toUri, conf)
      fc.rename(tmp, manifestPath,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      // convention marker for success-checking tooling (the manifest is
      // the actual guard)
      fs.create(new Path(target, "_SUCCESS"), true).close()
      // best-effort garbage sweep: data dirs no longer referenced by the
      // manifest (failed overwrites, replaced datasets) and uncommitted
      // stragglers inside the live dir
      val live = (prior ++ fresh).toSet
      fs.listStatus(target).foreach { f =>
        val n = f.getPath.getName
        if (f.isDirectory && n.startsWith("_data-") && n != dataDirName &&
            !live.exists(_.startsWith(n + "/")))
          try fs.delete(f.getPath, true) catch { case _: Throwable => }
      }
      fs.listStatus(dataDir).foreach { f =>
        if (f.isFile && !committed(f.getPath.getName))
          try fs.delete(f.getPath, false) catch { case _: Throwable => }
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
