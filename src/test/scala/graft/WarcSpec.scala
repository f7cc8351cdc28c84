package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    TempDirs.deleteOnExit(d.toFile)
    d.toString
  }

  // -- parser unit level ----------------------------------------------

  private def record(uri: String, body: Array[Byte],
                     httpWrap: Boolean = false): Array[Byte] =
    Warc.recordBytes(uri, body, httpWrap, "2026-01-01T00:00:00Z")

  test("parseBytes frames by Content-Length: CRLFCRLF inside a body " +
    "does not desync the next record") {
    val tricky = "line1\r\n\r\nline2".getBytes(UTF_8) // header-terminator bytes
    val bytes = record("http://a/1", tricky) ++
      record("http://a/2", "second".getBytes(UTF_8))
    val recs = Warc.parseBytes("f", bytes).toList
    assert(recs.map(_.targetUri) == List("http://a/1", "http://a/2"))
    assert(recs.head.body.sameElements(tricky))
  }

  test("parser resyncs on the WARC/ magic after garbage and skips " +
    "records without a parseable Content-Length") {
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad/nolen\r\n\r\n").getBytes(UTF_8)
    val bytes = "not a warc preamble\r\n".getBytes(UTF_8) ++ noLen ++
      record("http://good/1", "ok".getBytes(UTF_8))
    val recs = Warc.parseBytes("f", bytes).toList
    assert(recs.map(_.targetUri) == List("http://good/1"))
  }

  test("a negative Content-Length is unframeable: resync, not a crash") {
    val neg = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://bad/neg\r\nContent-Length: -7\r\n\r\n")
      .getBytes(UTF_8)
    val recs = Warc.parseBytes("f",
      neg ++ record("http://good/1", "ok".getBytes(UTF_8))).toList
    assert(recs.map(_.targetUri) == List("http://good/1"))
  }

  test("non-ASCII target URIs survive the header roundtrip (UTF-8 " +
    "header decode, not per-byte Latin-1)") {
    val uri = "http://例え.jp/ダ"
    val recs = Warc.parseBytes("f",
      record(uri, "x".getBytes(UTF_8))).toList
    assert(recs.map(_.targetUri) == List(uri))
  }

  test("write: null body is an empty payload; null URI fails loudly") {
    val dir = tmpDir("warc_nulls")
    Warc.write(
      Seq(("http://n/1", Option.empty[Array[Byte]])).toDF("target_uri", "body"),
      dir)
    val back = Warc.read(spark, dir).select($"target_uri", $"body_text")
      .as[(String, String)].collect().toList
    assert(back == List(("http://n/1", "")))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.write(Seq((Option.empty[String], "x".getBytes(UTF_8)))
        .toDF("target_uri", "body"), tmpDir("warc_nulluri"))
    }
    assert(e.getMessage.contains("null target URI") ||
      Option(e.getCause).exists(_.getMessage.contains("null target URI")))
  }

  test("multi-member gzip decodes across member boundaries") {
    val bos = new java.io.ByteArrayOutputStream()
    Seq("http://g/1", "http://g/2").foreach { uri =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(record(uri, uri.getBytes(UTF_8)))
      gz.finish()
    }
    val recs = Warc.parseBytes("f", bos.toByteArray).toList
    assert(recs.map(_.targetUri) == List("http://g/1", "http://g/2"))
  }

  test("stripHttp: status parsed and headers removed; truncated " +
    "message (no CRLFCRLF) passes through whole") {
    val (st, payload) = Warc.stripHttp(
      "HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nbody!".getBytes(UTF_8))
    assert(st.contains(404))
    assert(new String(payload, UTF_8) == "body!")
    val raw = "HTTP/1.1 200 OK\r\nX: truncated".getBytes(UTF_8)
    val (st2, p2) = Warc.stripHttp(raw)
    assert(st2.isEmpty && p2.sameElements(raw))
  }

  // -- DataFrame round trip -------------------------------------------

  test("write -> read roundtrip recovers uri/body exactly; warcinfo-" +
    "style non-response types are filtered by default") {
    val dir = tmpDir("warc_rt")
    val rows = Seq(
      ("http://ex.org/a", "hello 世界"), // multibyte: byte-counted framing
      ("http://ex.org/b", "plain ascii"),
      ("http://ex.org/c", ""))
    Warc.write(
      rows.toDF("target_uri", "t")
        .select($"target_uri", encode($"t", "UTF-8").as("body"))
        .repartition(2),
      dir)
    val back = Warc.read(spark, dir)
      .select($"target_uri", $"body_text", $"http_status", $"record_type")
      .as[(String, String, Option[Int], String)].collect().sortBy(_._1)
    assert(back.map(r => r._1 -> r._2).toList == rows.sortBy(_._1)
      .map(r => r._1 -> r._2).toList)
    assert(back.forall(_._3.contains(200)))
    assert(back.forall(_._4 == "response"))
    // exactly one .warc.gz per non-empty partition (ignoring Hadoop
    // local-FS .crc sidecars — hidden files, which binaryFile skips too)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.forall(_.endsWith(".warc.gz")) && files.length == 2, files.toList)
  }

  test("read keeps requested types only and parses them") {
    val dir = tmpDir("warc_types")
    // hand-build a file with a warcinfo record before a response
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Type: application/warc-fields\r\nContent-Length: 9\r\n" +
      "\r\nrobots: x\r\n\r\n").getBytes(UTF_8)
    val bytes = info ++ record("http://t/1", "payload".getBytes(UTF_8))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/f.warc"), bytes)
    assert(Warc.read(spark, dir).count() == 1)
    val all = Warc.read(spark, dir, keepTypes = Set("response", "warcinfo"))
    assert(all.count() == 2)
    assert(all.filter($"record_type" === "warcinfo")
      .select($"body_text").as[String].head() == "robots: x")
  }

  test("readStream: a second AvailableNow drain processes only newly " +
    "landed archive files (checkpointed exactly-once per file)") {
    val root = tmpDir("warc_stream")
    val arch = s"$root/arch"; new java.io.File(arch).mkdirs()
    // land one single-file archive under a unique name
    def land(n: Int, uris: Seq[String]): Unit = {
      val staging = s"$root/stage$n"
      Warc.write(
        uris.toDF("target_uri")
          .select($"target_uri", encode($"target_uri", "UTF-8").as("body"))
          .coalesce(1),
        staging)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$staging/part-00000.warc.gz"),
        java.nio.file.Paths.get(s"$arch/archive-$n.warc.gz"))
    }
    // foreachBatch -> parquet (the production sink shape — the memory
    // sink does not support checkpoint RECOVERY, which is the very
    // thing under test here); each drain writes to its own out dir, so
    // what it contains is exactly what its run processed
    def drain(outName: String): Set[String] = {
      val out = s"$root/$outName"
      val q = Warc.readStream(spark, arch).select($"target_uri")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           id: Long) =>
            b.write.mode("overwrite").parquet(s"$out/batch=$id")
        }
        .start()
      q.awaitTermination()
      if (!new java.io.File(out).exists()) Set.empty
      else spark.read.parquet(s"$out/batch=*").as[String].collect().toSet
    }
    land(0, Seq("http://a/1", "http://a/2"))
    assert(drain("out1") == Set("http://a/1", "http://a/2"))
    land(1, Seq("http://b/1"))
    // shared checkpoint: the second drain processes ONLY the new file —
    // archive 0 is committed, never reread
    assert(drain("out2") == Set("http://b/1"))
  }

  // -- URL blocklist filter -------------------------------------------

  test("urlHost: scheme/userinfo/port/path stripped, lowercased; " +
    "malformed -> empty string") {
    val rows = Seq(
      "https://User@WWW.Ex.ORG:8443/p?q#f",
      "http://plain.org",
      "not a url").toDF("u")
      .select(CorpusOps.urlHost($"u").as("h")).as[String].collect().toList
    assert(rows == List("www.ex.org", "plain.org", ""))
  }

  test("hostSuffixes: full chain, and the maxLabels cap keeps the " +
    "shallow (TLD-side) suffixes") {
    val out = Seq("a.b.c.org").toDF("h")
      .select(CorpusOps.hostSuffixes($"h").as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("a.b.c.org", "b.c.org", "c.org", "org"))
    val capped = Seq("a.b.c.org").toDF("h")
      .select(CorpusOps.hostSuffixes($"h", maxLabels = 2).as("s"))
      .as[Seq[String]].head()
    assert(capped == Seq("c.org", "org"))
  }

  test("urlBlocklistFilter: domain blocks itself and subdomains; " +
    "sibling domains and malformed URLs survive") {
    val docs = Seq(
      (1L, "http://bad.org/x"),            // exact domain
      (2L, "http://a.bad.org/x"),          // subdomain
      (3L, "http://notbad.org/x"),         // suffix of the NAME, not a label suffix
      (4L, "http://www.good.org/x"),
      (5L, "nonsense")).toDF("doc_id", "url")
    val kept = CorpusOps.urlBlocklistFilter(docs, "url",
        Seq("bad.org").toDF("domain"))
      .select($"doc_id").as[Long].collect().sorted.toList
    assert(kept == List(3L, 4L, 5L))
  }

  test("urlBlocklistFilter chains: sequential blocklists compose, the " +
    "host column is recomputed (deterministically) each pass") {
    val docs = Seq(
      (1L, "http://a.org/x"), (2L, "http://b.org/x"), (3L, "http://c.org/x"))
      .toDF("doc_id", "url")
    val once = CorpusOps.urlBlocklistFilter(docs, "url",
      Seq("a.org").toDF("domain"))
    val twice = CorpusOps.urlBlocklistFilter(once, "url",
      Seq("b.org").toDF("domain"))
    assert(twice.select($"doc_id").as[Long].collect().toList == List(3L))
    // a caller's host column with different semantics survives under
    // a custom hostCol
    val own = Seq((1L, "http://a.org/x", "mine")).toDF("doc_id", "url", "host")
    val kept = CorpusOps.urlBlocklistFilter(own, "url",
      Seq("z.org").toDF("domain"), hostCol = "url_host")
    assert(kept.select($"host").as[String].head() == "mine")
    assert(kept.select($"url_host").as[String].head() == "a.org")
  }

  test("write rejects a CR/LF-bearing URI instead of corrupting the " +
    "archive framing") {
    val e = intercept[org.apache.spark.SparkException] {
      Warc.write(Seq(("http://a/x\r\nContent-Length: 0", "b".getBytes(UTF_8)))
        .toDF("target_uri", "body"), tmpDir("warc_crlf"))
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CR/LF")))
  }

  // -- r11 hardening pins: oversize skip-framing, CR-in-header, commit --

  /** `n` synthetic zero bytes with an O(1) skip — stands in for a
    * multi-GB record body no test should allocate. */
  private final class ZeroStream(private var remaining: Long)
      extends java.io.InputStream {
    override def read(): Int =
      if (remaining <= 0) -1 else { remaining -= 1; 0 }
    override def skip(n: Long): Long = {
      val s = math.max(0L, math.min(n, remaining)); remaining -= s; s
    }
  }

  test("a record with a >JVM-array Content-Length is stream-skipped and " +
    "framing survives: the NEXT record still parses") {
    // 2147483647 passes a naive `> Int.MaxValue` guard but exceeds the
    // VM's max array size — the r12 guard routes it to skipFully
    val huge = Int.MaxValue.toLong
    val header = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://big/1\r\n" +
      s"Content-Length: $huge\r\n\r\n").getBytes(UTF_8)
    val after = "\r\n\r\n".getBytes(UTF_8) ++
      record("http://after/2", "still here".getBytes(UTF_8))
    val in = new java.io.SequenceInputStream(
      java.util.Collections.enumeration(java.util.Arrays.asList(
        new java.io.ByteArrayInputStream(header),
        new ZeroStream(huge): java.io.InputStream,
        new java.io.ByteArrayInputStream(after))))
    val recs = Warc.parseStream("f", in).toList
    assert(recs.map(_.targetUri) == List("http://after/2"))
    assert(new String(recs.head.body, UTF_8) == "still here")
  }

  test("skipFully makes progress on a stream whose skip() reports none") {
    val data = (0 until 64).map(_.toByte).toArray
    val in = new java.io.FilterInputStream(
      new java.io.ByteArrayInputStream(data)) {
      override def skip(n: Long): Long = 0L // e.g. a decorator without skip
    }
    Warc.skipFully(in, 10)
    assert(in.read() == 10)
    // skipping past EOF stops quietly (truncated capture)
    Warc.skipFully(in, 1000)
    assert(in.read() == -1)
  }

  test("a bare CR inside a header value is data, not a terminator: " +
    "values round-trip byte-exactly") {
    // 'a\r\rb' exercises consecutive interior CRs; the terminating CRLF
    // is still stripped
    val bytes = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/a\r\rb\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val recs = Warc.parseBytes("f", bytes).toList
    assert(recs.map(_.targetUri) == List("http://x/a\r\rb"))
    assert(new String(recs.head.body, UTF_8) == "ok")
  }

  test("write commit: stale temp files and stale part files from prior " +
    "runs never surface, and a finished write leaves no _tmp litter") {
    val dir = tmpDir("warc_commit")
    // plant (a) a crashed attempt's temp file for partition 0 and (b) a
    // high-numbered part file from an imaginary earlier, wider run
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_tmp-part-00000-attempt-999.warc.gz"),
      "zombie partial".getBytes(UTF_8))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/part-00099.warc.gz"),
      "stale wide-run output".getBytes(UTF_8))
    Warc.write(
      Seq(("http://c/1", "one".getBytes(UTF_8)),
        ("http://c/2", "two".getBytes(UTF_8)))
        .toDF("target_uri", "body").repartition(1),
      dir)
    val names = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(names.count(_.startsWith("_tmp-")) == 0,
      s"temp litter survived: ${names.mkString(",")}")
    assert(!names.contains("part-00099.warc.gz"),
      s"stale part from a wider run survived: ${names.mkString(",")}")
    val back = Warc.read(spark, dir)
      .select($"target_uri", $"body_text").as[(String, String)]
      .collect().toList.sorted
    assert(back == List(("http://c/1", "one"), ("http://c/2", "two")))
  }

  test("write commit: a FAILED job publishes nothing and cleans its own " +
    "temp file") {
    val dir = tmpDir("warc_failcommit")
    intercept[org.apache.spark.SparkException] {
      Warc.write(
        Seq(("http://ok/1", Some("x".getBytes(UTF_8))),
          (null: String, Some("y".getBytes(UTF_8))))
          .toDF("target_uri", "body").repartition(1),
        dir)
    }
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_tmp-")),
      s"failed attempt leaked its temp file: ${names.mkString(",")}")
    assert(!names.exists(n => n.startsWith("part-") && n.endsWith(".warc.gz")),
      s"failed attempt published output: ${names.mkString(",")}")
  }

  test("publishAttempt: winner renames; a later attempt finding a " +
    "committed file drops its own copy and reports not-published") {
    val dir = tmpDir("warc_publish")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$dir/$n")
    def put(n: String, s: String) = java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/$n"), s.getBytes(UTF_8))
    // attempt 0 commits first
    put("_tmp-a0", "payload")
    assert(Warc.publishAttempt(fs, p("_tmp-a0"), p("part-x")))
    assert(!fs.exists(p("_tmp-a0")) && fs.exists(p("part-x")))
    // attempt 1 (zombie) arrives after the winner: its temp must be
    // gone afterwards and a committed file must remain. (On a POSIX
    // local fs the rename may overwrite — byte-identical by the
    // writer's determinism, here same content; on HDFS-likes it is
    // refused and reported not-published.)
    put("_tmp-a1", "payload")
    Warc.publishAttempt(fs, p("_tmp-a1"), p("part-x"))
    assert(!fs.exists(p("_tmp-a1")) && fs.exists(p("part-x")))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/part-x")), UTF_8) == "payload")
    // rename failure with NO committed file present is a loud error —
    // either our own sys.error, or the filesystem's (LocalFileSystem
    // throws FileNotFoundException from rename() itself); what it must
    // never be is a silent success
    val e = intercept[Exception] {
      Warc.publishAttempt(fs, p("_tmp-missing"), p("part-y"))
    }
    assert(e.isInstanceOf[java.io.FileNotFoundException] ||
      e.getMessage.contains("task commit rename"))
    assert(!fs.exists(p("part-y")))
  }

  test("urlBlocklistFilter runs its suffix explode over distinct hosts," +
    " not rows") {
    val docs = (0 until 64).map(i => (i.toLong, s"http://h${i % 4}.org/p/$i"))
      .toDF("doc_id", "url")
    val out = CorpusOps.urlBlocklistFilter(docs, "url",
      Seq("h9.org").toDF("domain"))
    assert(out.count() == 64)
    // the explode feeds off an Aggregate (the distinct), never the raw scan
    val plan = out.queryExecution.optimizedPlan.toString
    val genIdx = plan.indexOf("Generate explode")
    assert(genIdx >= 0, plan.take(800))
    assert(plan.indexOf("Aggregate", genIdx) >= 0, plan.take(1200))
  }
}
