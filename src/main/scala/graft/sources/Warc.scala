package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.x) reader and writer — the container format
  * of Common Crawl, i.e. THE on-disk shape of a real 100 TB pre-training
  * corpus. The engine already has the downstream steps (htmlToText = the
  * WET extraction, Gopher rules, dedup); this closes the ingestion end.
  *
  * Scale shape: production `.warc.gz` files are a concatenation of
  * per-record gzip members, which makes a single file NON-splittable but
  * a crawl trivially parallel ACROSS files (a Common Crawl segment is
  * ~64k files of ~1 GB — file-level parallelism is the production
  * grain, and exactly what `binaryFile` + flatMap gives: one task per
  * file, no shuffle, records never leave the task that read them).
  * `java.util.zip.GZIPInputStream` natively resumes across concatenated
  * members, so member-per-record and whole-file gzip both decode.
  *
  * The parser is length-delimited (WARC `Content-Length` counts body
  * BYTES), so bodies may contain arbitrary binary — including CRLFCRLF
  * — without desyncing; between records it resynchronizes on the next
  * `WARC/` magic, so one malformed record skips forward rather than
  * poisoning the rest of the file.
  */
object Warc {

  /** One parsed record. `httpStatus` is populated (and HTTP response
    * headers stripped from `body`) only for `application/http` payloads
    * — the W3C-archived response convention; other content types pass
    * through untouched. */
  final case class WarcRecord(
      warcFile: String,
      recordType: String,
      recordId: String,
      targetUri: String,
      warcDate: String,
      contentType: String,
      httpStatus: Option[Int],
      body: Array[Byte])

  /** Read every WARC file under `path` (glob ok) into a DataFrame of
    * records, keeping only `keepTypes` (warcinfo/request/metadata
    * records are framing, not content — the default keeps responses,
    * the crawl payload). `body_text` is a UTF-8 decode of the payload
    * for the text pipeline; `body` keeps the exact bytes for binary
    * payloads (images in crawl data). */
  def read(spark: SparkSession, path: String,
           keepTypes: Set[String] = Set("response")): DataFrame = {
    import spark.implicits._
    toRecords(spark,
      spark.read.format("binaryFile").load(path)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])],
      keepTypes)
  }

  /** Streaming face of [[read]]: a file-stream source over a directory
    * that archive files LAND in — each newly arrived `.warc(.gz)` file
    * is parsed (same parser, same output schema as the batch path) in
    * the micro-batch that discovers it, and the checkpoint guarantees
    * each file is processed exactly once across restarts. This is the
    * natural incremental-crawl shape: the crawler drops finished
    * archive files into a directory, the pipeline keeps up file by
    * file — the unit of streaming progress is the same unit as the
    * batch path's parallelism. */
  def readStream(spark: SparkSession, dir: String,
                 keepTypes: Set[String] = Set("response")): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    toRecords(spark,
      spark.readStream.format("binaryFile").schema(binaryFileSchema)
        .load(dir)
        .select(col("path"), col("content"))
        .as[(String, Array[Byte])],
      keepTypes)
  }

  /** Shared (batch + streaming) file-bytes -> record rows step. */
  private def toRecords(spark: SparkSession,
                        files: Dataset[(String, Array[Byte])],
                        keepTypes: Set[String]): DataFrame = {
    import spark.implicits._
    val types = keepTypes.map(_.toLowerCase)
    files.flatMap { case (file, bytes) =>
      parseBytes(file, bytes).filter(r => types(r.recordType.toLowerCase))
    }.toDF()
      .select(
        col("warcFile").as("warc_file"),
        col("recordType").as("record_type"),
        col("recordId").as("record_id"),
        col("targetUri").as("target_uri"),
        col("warcDate").as("warc_date"),
        col("contentType").as("content_type"),
        col("httpStatus").as("http_status"),
        col("body"),
        decode(col("body"), "UTF-8").as("body_text"))
  }

  /** Parse one file's bytes (gunzipping if the gzip magic leads) into
    * records. */
  def parseBytes(file: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val raw = new ByteArrayInputStream(bytes)
    val in =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b)
        new GZIPInputStream(raw)
      else raw
    parseStream(file, new BufferedInputStream(in))
  }

  /** Streaming record parser: header block (case-insensitive keys, CRLF
    * lines, blank-line terminated), then exactly `Content-Length` body
    * bytes, then the inter-record CRLFs. A record without a parseable
    * Content-Length cannot be framed — skip to the next `WARC/` line. */
  def parseStream(file: String, in: InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }

      @annotation.tailrec
      private def advance(): WarcRecord = {
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) null
        else if (!line.startsWith("WARC/")) advance() // resync on magic
        else {
          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0)
              headers(h.substring(0, i).trim.toLowerCase) =
                h.substring(i + 1).trim
            h = readLine(in)
          }
          // a negative length is as unframeable as a missing one — it
          // must take the resync path, not reach readNBytes (which
          // throws on negatives, poisoning the whole file)
          headers.get("content-length").flatMap(_.toLongOption)
            .filter(_ >= 0) match {
            case None => advance() // unframeable: resync
            case Some(n) if n > Int.MaxValue - 8 =>
              // a ~2 GB+ record is legal WARC but can't land in one JVM
              // array (the VM's max array size is Int.MaxValue - 8, so
              // a plain > Int.MaxValue guard would still OOM on the
              // last few values); stream-skip exactly its body so
              // FRAMING survives and every subsequent record still
              // parses (truncating via min() would desync and silently
              // drop the rest of the file)
              skipFully(in, n)
              advance()
            case Some(n) =>
              val body = in.readNBytes(n.toInt)
              val cType = headers.getOrElse("content-type", "")
              val (status, payload) =
                if (cType.toLowerCase.startsWith("application/http"))
                  stripHttp(body)
                else (None, body)
              WarcRecord(
                warcFile = file,
                recordType = headers.getOrElse("warc-type", ""),
                recordId = headers.getOrElse("warc-record-id", ""),
                targetUri = headers.getOrElse("warc-target-uri", ""),
                warcDate = headers.getOrElse("warc-date", ""),
                contentType = cType,
                httpStatus = status,
                body = payload)
          }
        }
      }
    }

  /** Split an embedded HTTP message at its first CRLFCRLF: status code
    * from the status line, payload after the headers. A body with no
    * header terminator passes through whole (truncated capture). */
  private[graft] def stripHttp(body: Array[Byte]): (Option[Int], Array[Byte]) = {
    val sep = indexOfCrlfCrlf(body)
    if (sep < 0) (None, body)
    else {
      val head = new String(body, 0, sep, UTF_8)
      val status = head.linesIterator.nextOption()
        .flatMap(_.split(" ", 3).lift(1)).flatMap(_.toIntOption)
      (status, java.util.Arrays.copyOfRange(body, sep + 4, body.length))
    }
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Discard exactly `n` body bytes from `in` (InputStream.skip may
    * return short — loop; fall back to read() when skip reports no
    * progress so a non-skipping stream still advances). Stops quietly
    * at EOF (truncated capture — nothing left to resync over). */
  private[graft] def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else if (in.read() == -1) return
      else left -= 1
    }
  }

  /** Read one CRLF/LF line, decoded as UTF-8 (the WARC spec allows
    * UTF-8 header values — non-ASCII target URIs exist in real crawls;
    * a per-byte toChar would mojibake them); null at EOF. Only the CR
    * that immediately precedes the terminating LF is stripped — a bare
    * CR INSIDE a header value is data and passes through (a blanket
    * CR-drop would silently alter the value). A lone CR at EOF is a
    * truncated CRLF and is dropped. */
  private def readLine(in: InputStream): String = {
    val bos = new java.io.ByteArrayOutputStream(80)
    var c = in.read()
    if (c == -1) return null
    var pendingCr = false
    while (c != -1 && c != '\n') {
      if (pendingCr) bos.write('\r')
      pendingCr = c == '\r'
      if (!pendingCr) bos.write(c)
      c = in.read()
    }
    new String(bos.toByteArray, UTF_8)
  }

  /** Distributed WARC writer: each input partition becomes one
    * `part-NNNNN.warc.gz` under `dir` (the crawl-segment file layout),
    * each record its own gzip member (the Common Crawl convention — a
    * reader can then seek to a member boundary without decoding the
    * prefix). `df` must carry a string URI column and a binary body
    * column; `httpWrap` stores the body as an archived HTTP 200
    * response (the response-record convention) so reads exercise the
    * header-strip path. Record IDs are content-derived (name-UUID of
    * uri) and `warcDate` is caller-fixed, so the output is
    * deterministic for a given input — rewrites are idempotent.
    *
    * Executors open the destination through Hadoop's FileSystem with a
    * fresh `Configuration()` (loads core-site.xml from the executor
    * classpath — the standard cluster setup; local fs needs nothing).
    * An empty partition writes no file. */
  def write(df: DataFrame, dir: String,
            uriCol: String = "target_uri", bodyCol: String = "body",
            httpWrap: Boolean = true,
            warcDate: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, Array[Byte])] =
      df.select(col(uriCol).cast("string"), col(bodyCol).cast("binary"))
        .as[(String, Array[Byte])]
    // job-level overwrite, DRIVER-side, before any task launches: clear
    // prior part files and crashed attempts' temp litter. Without this
    // (a) a rerun with FEWER partitions would leave stale high-numbered
    // part files mixed into the new output — a silent data corruption a
    // reader can't detect — and (b) `_tmp-*` files from JVM-killed
    // attempts (which never reach their own cleanup) would accumulate
    // forever, invisible to Spark's hidden-file filter but not to the
    // filesystem bill.
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = dirPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (driverFs.exists(dirPath)) {
      val stale =
        Option(driverFs.globStatus(
          new org.apache.hadoop.fs.Path(s"$dir/part-*.warc.gz")))
          .getOrElse(Array.empty) ++
        Option(driverFs.globStatus(
          new org.apache.hadoop.fs.Path(s"$dir/_tmp-part-*")))
          .getOrElse(Array.empty)
      stale.foreach(s => driverFs.delete(s.getPath, false))
    }
    ds.foreachPartition { it: Iterator[(String, Array[Byte])] =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val conf = new org.apache.hadoop.conf.Configuration()
        // task-commit protocol: stream to an ATTEMPT-unique temp path,
        // rename to the final name only after the close() succeeds —
        // first complete rename wins (see [[publishAttempt]]). Two
        // attempts of the same task (speculation, a zombie surviving a
        // retry) write disjoint temp files — a shared final path under
        // fs.create(overwrite) would interleave the two attempts' gzip
        // members, and the reader's resync would silently DROP records
        // instead of failing.
        val fin = new org.apache.hadoop.fs.Path(
          f"$dir/part-$pid%05d.warc.gz")
        val out = new org.apache.hadoop.fs.Path(
          f"$dir/_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}.warc.gz")
        val fs = out.getFileSystem(conf)
        val os = fs.create(out, true)
        // ONE Deflater for the whole partition, reset per member — a
        // GZIPOutputStream per record would allocate (and, absent a
        // close() we can't issue without closing the underlying file,
        // never free) a native Deflater per record: measured 60x slower
        // at 250k records, plus unbounded native memory
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        try it.foreach { case (uri, body) =>
          // a record without a URI is unaddressable — fail loudly with
          // a message, not an executor NPE; a null body is a legitimate
          // empty payload
          require(uri != null, "Warc.write: null target URI row")
          writeGzipMember(os, deflater,
            recordBytes(uri,
              if (body == null) Array.emptyByteArray else body,
              httpWrap, warcDate))
        } catch { case e: Throwable =>
          // failed attempt: drop the partial temp file, never publish
          // it. Each cleanup step runs in its own guard: a throwing
          // close() must neither MASK the original failure (it attaches
          // as suppressed) nor skip the delete that follows it.
          def quietly(step: => Unit): Unit =
            try step catch { case t: Throwable => e.addSuppressed(t) }
          quietly(deflater.end())
          quietly(os.close())
          quietly { fs.delete(out, false); () }
          throw e
        }
        deflater.end()
        os.close()
        publishAttempt(fs, out, fin)
        // best-effort sweep of OTHER attempts' leftovers for this
        // partition: a JVM-killed attempt never runs its own cleanup,
        // and nothing else will ever delete its temp file (ours was
        // just renamed away or dropped by publishAttempt). A sweep
        // racing an attempt that is still WRITING is safe — that
        // zombie's publish will then fail its rename, find the final
        // file present, and count itself committed.
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          f"$dir/_tmp-part-$pid%05d-attempt-*.warc.gz")))
          .getOrElse(Array.empty)
          .foreach(s =>
            try { fs.delete(s.getPath, false); () }
            catch { case _: java.io.IOException => () })
      }
    }
  }

  /** First-commit-wins task publish: rename `tmp` to `fin` WITHOUT
    * pre-deleting the destination. If the rename is refused and `fin`
    * exists, another attempt of the same task already committed — this
    * attempt's copy (byte-identical: the writer is deterministic for a
    * given input partition) is dropped and the commit counts as done.
    * The r11 delete-then-rename protocol had a loss window this closes:
    * a zombie attempt finishing AFTER the winner would delete the
    * committed part file, and if its own rename then failed the
    * partition's output was silently gone while the task stayed marked
    * successful. (On filesystems whose rename overwrites an existing
    * destination — POSIX local fs — the overwrite is harmless for the
    * same determinism reason; HDFS-like filesystems refuse and take the
    * already-committed branch.)
    *
    * @return true if THIS attempt's file was published, false if a
    *         prior attempt's commit was found and kept */
  private[graft] def publishAttempt(fs: org.apache.hadoop.fs.FileSystem,
                                    tmp: org.apache.hadoop.fs.Path,
                                    fin: org.apache.hadoop.fs.Path): Boolean =
    if (fs.rename(tmp, fin)) true
    else if (fs.exists(fin)) { fs.delete(tmp, false); false }
    else sys.error(s"Warc.write: task commit rename $tmp -> $fin failed " +
      "and no committed file exists")

  /** Write `bytes` as one complete gzip member (RFC 1952 header + raw
    * deflate + CRC32/ISIZE trailer) reusing the caller's Deflater. */
  private def writeGzipMember(os: java.io.OutputStream,
                              deflater: java.util.zip.Deflater,
                              bytes: Array[Byte]): Unit = {
    // magic, CM=deflate, no flags, mtime 0 (deterministic output),
    // XFL 0, OS 255 (unknown)
    os.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0,
      0xff.toByte))
    val crc = new java.util.zip.CRC32
    crc.update(bytes)
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](64 * 1024)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) os.write(buf, 0, n)
    }
    def le32(v: Long): Unit = {
      os.write((v & 0xff).toInt); os.write(((v >> 8) & 0xff).toInt)
      os.write(((v >> 16) & 0xff).toInt); os.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(bytes.length.toLong)
  }

  /** Serialize one response record (ASCII headers + byte-counted body +
    * the two inter-record CRLFs). */
  private[graft] def recordBytes(uri: String, body: Array[Byte],
                                   httpWrap: Boolean,
                                   warcDate: String): Array[Byte] = {
    // a CR/LF inside the URI would inject a header line, desync the
    // written Content-Length from the real payload, and make the READER
    // silently drop records at resync — the same silent-loss class the
    // null-URI require guards; crawl data does contain garbage URLs
    require(uri.indexOf('\r') < 0 && uri.indexOf('\n') < 0,
      s"Warc.write: target URI contains CR/LF: ${uri.take(80)}")
    val payload =
      if (!httpWrap) body
      else ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8" +
        s"\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body
    val cType =
      if (httpWrap) "application/http; msgtype=response" else "text/plain"
    val rid = java.util.UUID.nameUUIDFromBytes(uri.getBytes(UTF_8))
    val head =
      s"""WARC/1.0\r
         |WARC-Type: response\r
         |WARC-Record-ID: <urn:uuid:$rid>\r
         |WARC-Date: $warcDate\r
         |WARC-Target-URI: $uri\r
         |Content-Type: $cType\r
         |Content-Length: ${payload.length}\r
         |\r
         |""".stripMargin
    head.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }
}
