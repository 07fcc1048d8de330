package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 transaction reader: fromText equality at every split size. */
class TransactionsV2Spec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("transactions-v2-spec")
    .getOrCreate()

  private def writeFixture(lines: Seq[String], trailingNewline: Boolean): String = {
    val f = Files.createTempFile("graft-txn", ".txt")
    val body = lines.mkString("\n") + (if (trailingNewline) "\n" else "")
    Files.writeString(f, body)
    f.toFile.deleteOnExit()
    f.toString
  }

  private def itemsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    import spark.implicits._
    df.as[Seq[String]].collect().toSeq.sortBy(_.mkString(""))
  }

  test("v2 source == fromText on messy lines (dups, empties, no trailing \\n)") {
    val lines = Seq(
      "milk bread milk eggs",  // in-line duplicate
      "a  b",                  // double space -> empty token survives dedup
      "",                      // empty transaction
      " lead trail ",          // leading/trailing space
      "solo")
    val path = writeFixture(lines, trailingNewline = false)
    val v2 = spark.read.format(classOf[TransactionsV2].getName).load(path)
    assert(itemsOf(v2) == itemsOf(TextTransactions.fromText(spark, path)))
  }

  test("short name registration: format(\"graft-transactions\")") {
    val path = writeFixture(Seq("x y z", "y x"), trailingNewline = true)
    val v2 = spark.read.format("graft-transactions").load(path)
    assert(itemsOf(v2) == Seq(Seq("x", "y", "z"), Seq("y", "x")))
  }

  test("byte-range splits: every line emitted exactly once at any split size") {
    val rnd = new scala.util.Random(31)
    val lines = Seq.tabulate(300) { i =>
      Seq.fill(1 + rnd.nextInt(8))("item" + rnd.nextInt(20)).mkString(" ")
    }
    val path = writeFixture(lines, trailingNewline = rnd.nextBoolean())
    val whole = itemsOf(TextTransactions.fromText(spark, path))
    // 16 bytes is far below the mean line length: most ranges start and
    // end mid-line, exercising the skip-first/read-past-end contract
    for (split <- Seq(16L, 64L, 1L << 20)) {
      val v2 = spark.read.format("graft-transactions")
        .option("maxSplitBytes", split.toString).load(path)
      assert(itemsOf(v2) == whole, s"split=$split diverged")
      if (split == 16L) {
        assert(v2.rdd.getNumPartitions > 10, "tiny splits should fan out")
      }
    }
  }

  test("glob paths and hidden/marker files behave like the composed read") {
    val dir = Files.createTempDirectory("graft-txn-dir")
    Files.writeString(dir.resolve("a.txt"), "p q\n")
    Files.writeString(dir.resolve("b.txt"), "r s\n")
    // marker/hidden files that Spark's file index skips — so must we
    Files.writeString(dir.resolve("_SUCCESS"), "not data\n")
    Files.writeString(dir.resolve(".staging"), "also not data\n")
    dir.toFile.listFiles().foreach(_.deleteOnExit()); dir.toFile.deleteOnExit()
    val fromDir = spark.read.format("graft-transactions").load(dir.toString)
    assert(itemsOf(fromDir) ==
      itemsOf(TextTransactions.fromText(spark, dir.toString)))
    val fromGlob = spark.read.format("graft-transactions")
      .load(dir.toString + "/*.txt")
    assert(itemsOf(fromGlob) == itemsOf(fromDir))
    // a marker file the user names EXPLICITLY is read as-is — the hidden
    // filter applies only when expanding a directory
    val explicitMarker = spark.read.format("graft-transactions")
      .load(dir.resolve("_SUCCESS").toString)
    assert(itemsOf(explicitMarker) == Seq(Seq("not", "data")))
  }

  test("gzip input: one whole-file range, decompressed — equals the composed read") {
    val lines = Seq.tabulate(200)(i => s"item$i common item${i % 7}")
    val f = Files.createTempFile("graft-txn", ".txt.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    f.toFile.deleteOnExit()
    // a split size far below the compressed length must NOT chop the
    // stream: codec files plan as exactly one range
    val v2 = spark.read.format("graft-transactions")
      .option("maxSplitBytes", "64").load(f.toString)
    assert(v2.rdd.getNumPartitions == 1, "compressed file must not split")
    assert(itemsOf(v2) == itemsOf(TextTransactions.fromText(spark, f.toString)))
  }

  test("multi-path load and comma-separated path read the train+test pair") {
    val a = writeFixture(Seq("a b", "b c"), trailingNewline = true)
    val b = writeFixture(Seq("c d"), trailingNewline = true)
    val expected = itemsOf(TextTransactions.fromText(spark, a)) ++
      itemsOf(TextTransactions.fromText(spark, b))
    val multi = spark.read.format("graft-transactions").load(a, b)
    assert(itemsOf(multi).sortBy(_.mkString("")) == expected.sortBy(_.mkString("")))
    val comma = spark.read.format("graft-transactions").load(s"$a,$b")
    assert(itemsOf(comma).sortBy(_.mkString("")) == expected.sortBy(_.mkString("")))
  }

  test("brace-alternation globs keep their commas (not split as two paths)") {
    val dir = Files.createTempDirectory("graft-txn-brace")
    Files.writeString(dir.resolve("train.txt"), "a b\n")
    Files.writeString(dir.resolve("test.txt"), "c d\n")
    Files.writeString(dir.resolve("other.txt"), "e f\n")
    dir.toFile.listFiles().foreach(_.deleteOnExit()); dir.toFile.deleteOnExit()
    val braced = spark.read.format("graft-transactions")
      .load(dir.toString + "/{train,test}.txt")
    assert(itemsOf(braced) == Seq(Seq("a", "b"), Seq("c", "d")))
    // and the splitter itself: top-level commas split, braced ones don't
    assert(TransactionsV2.splitTopLevelCommas("/x/{a,b}.txt,/y/c.txt")
      == Seq("/x/{a,b}.txt", "/y/c.txt"))
    // a backslash-escaped literal brace is NOT an alternation opener —
    // the comma after it still splits
    assert(TransactionsV2.splitTopLevelCommas("/x/a\\{1.txt,/y/b.txt")
      == Seq("/x/a\\{1.txt", "/y/b.txt"))
  }

  test("write path: staged-rename commit, append and overwrite round-trip") {
    import org.apache.spark.sql.functions.{array_sort, col}
    val dir = Files.createTempDirectory("graft-txn-write")
    dir.toFile.deleteOnExit()
    def writeTx(lines: Seq[Seq[String]], mode: String): Unit = {
      import spark.implicits._
      lines.toDF("items").write.format("graft-transactions")
        .mode(mode).save(dir.toString)
    }
    writeTx(Seq(Seq("a", "b"), Seq("c")), "append")
    writeTx(Seq(Seq("d", "e", "f")), "append")
    val afterAppend = itemsOf(
      spark.read.format("graft-transactions").load(dir.toString))
    assert(afterAppend == Seq(Seq("a", "b"), Seq("c"), Seq("d", "e", "f")))
    // no staging residue is readable or listed
    assert(!dir.toFile.listFiles().exists(_.getName.startsWith("_staging")))
    writeTx(Seq(Seq("x", "y")), "overwrite")
    val afterOverwrite = itemsOf(
      spark.read.format("graft-transactions").load(dir.toString))
    assert(afterOverwrite == Seq(Seq("x", "y")))
    // the written file is the reference's text format, byte for byte
    val dataFiles = dir.toFile.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val body = dataFiles.map(f => Files.readString(f.toPath)).mkString
    assert(body == "x y\n")
    // published names carry the write's UUID: two applications appending
    // to one directory can collide on (partitionId, taskId) alone
    assert(dataFiles.forall(_.getName.matches(
      "part-\\d{5}-\\d+-[0-9a-f-]{36}\\.txt")), dataFiles.map(_.getName).toSeq)
    // an item a space would corrupt is rejected at write, not read
    val e = intercept[Exception] { writeTx(Seq(Seq("bad item")), "append") }
    assert(e.getMessage != null)
    // duplicate items are rejected too: the format dedupes on read, so
    // the transaction's arity would silently change on round-trip
    val e2 = intercept[Exception] { writeTx(Seq(Seq("a", "a")), "append") }
    assert(e2.getMessage != null)
    // and empty transactions: a blank line reads back as [""]
    val e3 = intercept[Exception] { writeTx(Seq(Seq.empty[String]), "append") }
    assert(e3.getMessage != null)
    // the failed write published nothing and left no staging behind
    assert(itemsOf(spark.read.format("graft-transactions").load(dir.toString))
      == Seq(Seq("x", "y")))
    assert(!dir.toFile.listFiles().exists(_.getName.startsWith("_staging")))
    // round-trip a real basket table through the connector's writer
    val baskets = graft.Tables
      .orderBrandBaskets(spark, "/root/testdata/sf0.001")
      .select(col("items"))
    baskets.write.format("graft-transactions").mode("overwrite").save(dir.toString)
    val back = spark.read.format("graft-transactions").load(dir.toString)
      .select(array_sort(col("items")).as("items"))
    assert(itemsOf(back).sortBy(_.mkString(",")) ==
      itemsOf(baskets).sortBy(_.mkString(",")))
  }

  test("character-class globs keep their commas (not split as two paths)") {
    val dir = Files.createTempDirectory("graft-txn-bracket")
    Files.writeString(dir.resolve("ta.txt"), "x y\n")
    Files.writeString(dir.resolve("tb.txt"), "z\n")
    Files.writeString(dir.resolve("tc.txt"), "never\n")
    try {
      // '[a,b]' is ONE Hadoop character class matching 'a', ',' or 'b' —
      // a top-level comma split would produce two broken half-paths
      val v2 = spark.read.format("graft-transactions")
        .load(s"$dir/t[a,b].txt")
      assert(itemsOf(v2) == Seq(Seq("x", "y"), Seq("z")))
      assert(TransactionsV2.splitTopLevelCommas("/d/t[a,b].txt,/d/other.txt")
        == Seq("/d/t[a,b].txt", "/d/other.txt"))
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("micro-batch stream == batch read, with a second batch for late files") {
    val dir = Files.createTempDirectory("graft-txn-stream")
    val ckpt = Files.createTempDirectory("graft-txn-stream-ckpt")
    try {
      Files.writeString(dir.resolve("t0.txt"), "a b\nc\n")
      Files.writeString(dir.resolve("t1.txt"), "d e f\n")
      val sink = Files.createTempDirectory("graft-txn-stream-sink")
      def runAvailableNow(): Seq[Seq[String]] = {
        // parquet sink: supports resuming from the checkpoint (memory
        // sink does not), so the second run exercises the checkpointed
        // seen-file offset
        val q = spark.readStream.format("graft-transactions")
          .load(dir.toString)
          .writeStream.format("parquet")
          .option("path", sink.toString)
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        itemsOf(spark.read.parquet(sink.toString))
      }
      try {
        val batch = itemsOf(
          spark.read.format("graft-transactions").load(dir.toString))
        assert(runAvailableNow() == batch)
        // a NEW file after the first run: the checkpointed offset (the
        // seen-file list) must plan ONLY the new file on resume, and the
        // sink accumulates exactly the union
        Files.writeString(dir.resolve("t2.txt"), "g h\n")
        val batch2 = itemsOf(
          spark.read.format("graft-transactions").load(dir.toString))
        assert(runAvailableNow() == batch2)
      } finally graft.Fs.deleteRecursively(sink)
    } finally {
      graft.Fs.deleteRecursively(dir)
      graft.Fs.deleteRecursively(ckpt)
    }
  }

  test("micro-batch stream honors maxSplitBytes (ranges, not whole files)") {
    val dir = Files.createTempDirectory("graft-txn-stream-split")
    val ckpt = Files.createTempDirectory("graft-txn-stream-split-ckpt")
    try {
      val rnd = new scala.util.Random(67)
      val lines = Seq.tabulate(200)(_ =>
        Seq.fill(1 + rnd.nextInt(6))("i" + rnd.nextInt(30)).mkString(" "))
      Files.writeString(dir.resolve("big.txt"), lines.mkString("\n") + "\n")
      val q = spark.readStream.format("graft-transactions")
        .option("maxSplitBytes", "64")
        .load(dir.toString)
        .writeStream.format("memory")
        .queryName("txn_stream_split_sink")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = itemsOf(spark.table("txn_stream_split_sink"))
      assert(got == itemsOf(
        spark.read.format("graft-transactions").load(dir.toString)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS txn_stream_split_sink")
      graft.Fs.deleteRecursively(dir)
      graft.Fs.deleteRecursively(ckpt)
    }
  }

  test("manifest commit: round trip, overwrite, and crash residue invisibility") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-txn-manifest")
    try {
      import spark.implicits._
      def writeTx(lines: Seq[Seq[String]], mode: String): Unit =
        lines.toDF("items").write.format("graft-transactions")
          .option("manifestCommit", "true")
          .mode(mode).save(dir.toString)
      def readBack(): Seq[Seq[String]] =
        itemsOf(spark.read.format("graft-transactions").load(dir.toString))
      writeTx(Seq(Seq("a", "b"), Seq("c")), "append")
      assert(readBack() == Seq(Seq("a", "b"), Seq("c")))
      // data files live under a '_data-*' dir; the root holds only markers
      val rootFiles = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq
      assert(rootFiles.exists(_.startsWith("_data-")), rootFiles)
      assert(!rootFiles.exists(n => n.endsWith(".txt") && !n.startsWith("_")), rootFiles)
      // append accumulates through the manifest
      writeTx(Seq(Seq("d")), "append")
      assert(readBack() == Seq(Seq("a", "b"), Seq("c"), Seq("d")))
      // CRASH SIMULATION: a write that died after staging its files into
      // a _data dir but BEFORE the manifest flip — the reader must not
      // see them (the v1 path would union them into the dataset)
      val orphanDir = Files.createDirectory(dir.resolve("_data-deadbeef"))
      Files.writeString(orphanDir.resolve("part-00000-0-deadbeef.txt"), "zz\n")
      // ... and an unmanifested file inside a LIVE data dir (a straggler
      // from an uncommitted speculative attempt)
      val liveData = Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("_data-") &&
          p.getFileName.toString != "_data-deadbeef").toSeq.head
      Files.writeString(liveData.resolve("straggler-xyz.txt"), "yy\n")
      assert(readBack() == Seq(Seq("a", "b"), Seq("c"), Seq("d")))
      // overwrite: one atomic manifest flip replaces the dataset; old
      // data dirs and the crash residue become unreferenced and are swept
      writeTx(Seq(Seq("e", "f")), "overwrite")
      assert(readBack() == Seq(Seq("e", "f")))
      val after = Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq
      assert(!after.contains("_data-deadbeef"), after)
      assert(after.contains("_SUCCESS"), after)
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("v1 directory upgrades in place: first manifest append keeps old root files") {
    val dir = Files.createTempDirectory("graft-txn-upgrade")
    try {
      import spark.implicits._
      // v1 write: plain files in the root
      Seq(Seq("a")).toDF("items").write.format("graft-transactions")
        .mode("append").save(dir.toString)
      // manifest write over the same dir: prior root files carry forward
      Seq(Seq("b")).toDF("items").write.format("graft-transactions")
        .option("manifestCommit", "true").mode("append").save(dir.toString)
      assert(itemsOf(spark.read.format("graft-transactions").load(dir.toString))
        == Seq(Seq("a"), Seq("b")))
    } finally graft.Fs.deleteRecursively(dir)
  }

  test("the fpm estimator runs end-to-end on the v2 source") {
    val lines = Seq("a b c", "a b", "a c", "b c", "a b c d")
    val path = writeFixture(lines, trailingNewline = true)
    val df = spark.read.format("graft-transactions").load(path)
    val model = new graft.fpm.FPGrowth().setMinSupport(0.4).setMinConfidence(0.5)
      .fit(df)
    assert(model.freqItemsets.count() > 0)
  }
}
