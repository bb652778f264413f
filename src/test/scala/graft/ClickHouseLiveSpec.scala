package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path, Paths}

import graft.sink.{ClickHouseNative => N}

/** LIVE external verification of the Native sink — the one contract
  * that cannot be closed by self-consistency: both our codec and our
  * CityHash128 (and the independent `tools/cityhash102_check.py`
  * transcription) were written from the same published sources, so a
  * shared misreading would survive every internal spec. The only
  * authority is ClickHouse itself:
  *
  *  - `clickhouse compressor --decompress` re-derives CityHash128 over
  *    every compressed frame and REFUSES a mismatch
  *    (CHECKSUM_DOESNT_MATCH) — upstream's own code verifying our
  *    checksum + LZ4 framing byte-for-byte;
  *  - `clickhouse local` + the `file(..., 'Native', ...)` table
  *    function parses the decompressed block stream — upstream
  *    verifying our Native column codec;
  *  - the tamper case pins that the verification has teeth (a flipped
  *    payload byte must be REJECTED by the binary, proving the
  *    checksum is actually being checked, not skipped).
  *
  * GATED: this sandbox ships no clickhouse binary and has no egress,
  * so here the suite CANCELS these tests (assume), keeping the gap
  * visible rather than silently green. The moment any environment
  * with a `clickhouse` (or `clickhouse-local`/`clickhouse-compressor`)
  * binary runs the suite, the round-trip executes with no code
  * changes. `tools/ch_roundtrip.sh` is the same procedure as a
  * standalone script, extended to all eight parity tables against a
  * real server.
  *
  * REPORTING QUIRK (round-13 note): sbt's JUnit XML reporter records
  * a ScalaTest CANCELED test as a plain ~0 s pass (`tests=3,
  * skipped=0`) — an auditor counting green tests would count
  * verification that did not run. ScalaTest's own console/summary
  * output DOES show "canceled"; additionally every gated cancel below
  * goes through [[gate]], which prints a loud `CANCELED — external
  * gate` line to stderr so the run log carries the truth even where
  * the XML does not. Trust the console summary / stderr, not the XML,
  * for these three tests. */
class ClickHouseLiveSpec extends SparkSpec {

  /** The multi-call `clickhouse` binary, or None in this sandbox. */
  private lazy val clickhouse: Option[String] =
    sys.env.get("GRAFT_CLICKHOUSE_BIN").filter(p => Files.isExecutable(Paths.get(p)))
      .orElse {
        val dirs = Option(System.getenv("PATH")).getOrElse("")
          .split(java.io.File.pathSeparatorChar).toSeq
        Seq("clickhouse", "clickhouse-local").view
          .flatMap(n => dirs.map(d => Paths.get(d, n)))
          .find(Files.isExecutable(_)).map(_.toString)
      }

  private def run(cmd: Seq[String], stdin: Array[Byte]): (Int, Array[Byte], String) = {
    val pb = new ProcessBuilder(cmd: _*)
    val p = pb.start()
    p.getOutputStream.write(stdin); p.getOutputStream.close()
    val out = p.getInputStream.readAllBytes()
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    (code, out, err)
  }

  /** `clickhouse compressor` vs the plain `clickhouse-local` binary:
    * the latter only serves `local`, so compressor calls need the
    * multi-call binary. Tests that need a subcommand the found binary
    * lacks cancel with a precise message. */
  private def sub(cmdName: String): Option[Seq[String]] =
    clickhouse.flatMap { bin =>
      if (bin.endsWith(s"clickhouse-$cmdName")) Some(Seq(bin))
      else if (bin.endsWith("clickhouse")) Some(Seq(bin, cmdName))
      else None
    }

  /** `assume` with a stderr banner: the JUnit XML renders a cancel as
    * a 0 s pass (see class doc), so the run log must carry the truth. */
  private def gate(cond: Boolean, msg: => String): Unit = {
    if (!cond)
      System.err.println(
        s"[ClickHouseLiveSpec] CANCELED — external gate: $msg " +
          "(JUnit XML will show this as a 0 s pass; see spec header)")
    assume(cond, msg)
  }

  import scala.jdk.CollectionConverters._

  private def framedFile(dir: Path): Path = {
    val s = Files.list(dir)
    try s.iterator().asScala.find(
      _.getFileName.toString.endsWith(".native.lz4")).get
    finally s.close()
  }

  test("clickhouse compressor accepts our frames and its decompressed " +
    "bytes equal our unframed Native block stream (CityHash128 + LZ4 " +
    "framing externally verified)") {
    gate(clickhouse.isDefined,
      "no clickhouse binary in this environment — run tools/ch_roundtrip.sh " +
        "where one exists")
    val comp = sub("compressor")
    gate(comp.isDefined, s"binary ${clickhouse.get} has no compressor mode")
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"row-$i" * 3)).toDF("h", "s")
    val dir = Files.createTempDirectory("graft-chlive")
    try {
      N.write(df.coalesce(1), "t", dir.toString)
      val framed = Files.readAllBytes(framedFile(dir))
      val (code, plain, err) =
        run(comp.get ++ Seq("--decompress"), framed)
      assert(code === 0, s"compressor rejected our frames: $err")
      // byte-identical to the block stream we framed
      val expect = new ByteArrayOutputStream()
      val cols = N.columns("t", df.schema)
      df.coalesce(1).collect().grouped(65536).foreach { rows =>
        N.writeBlock(expect, N.toBlock(cols, df.schema, rows.toSeq))
      }
      assert(plain.toSeq === expect.toByteArray.toSeq)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("a tampered frame is REJECTED by clickhouse compressor " +
    "(the external checksum check has teeth)") {
    gate(clickhouse.isDefined, "no clickhouse binary in this environment")
    val comp = sub("compressor")
    gate(comp.isDefined, s"binary ${clickhouse.get} has no compressor mode")
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"p$i")).toDF("h", "s")
    val dir = Files.createTempDirectory("graft-chtamper")
    try {
      N.write(df.coalesce(1), "t", dir.toString)
      val framed = Files.readAllBytes(framedFile(dir))
      framed(framed.length - 1) = (framed(framed.length - 1) ^ 0x01).toByte
      val (code, _, _) = run(comp.get ++ Seq("--decompress"), framed)
      assert(code !== 0, "tampered frame was accepted — checksum not checked")
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("clickhouse local parses the decompressed Native stream and " +
    "returns our rows (column codec externally verified)") {
    gate(clickhouse.isDefined, "no clickhouse binary in this environment")
    val comp = sub("compressor"); val local = sub("local")
    gate(comp.isDefined && local.isDefined,
      s"binary ${clickhouse.get} lacks compressor/local modes")
    import spark.implicits._
    val rows = (0L until 500L).map(i => (i, s"v$i", Seq(i, i + 1)))
    val df = rows.toDF("h", "s", "ids")
    val dir = Files.createTempDirectory("graft-chlocal")
    try {
      N.write(df.coalesce(1), "t", dir.toString)
      val framed = Files.readAllBytes(framedFile(dir))
      val (c1, plain, e1) = run(comp.get ++ Seq("--decompress"), framed)
      assert(c1 === 0, e1)
      val nativePath = dir.resolve("plain.native")
      Files.write(nativePath, plain)
      val (c2, out, e2) = run(local.get ++ Seq("-q",
        s"SELECT h, s, length(ids) FROM file('$nativePath', 'Native', " +
          "'h UInt64, s String, ids Array(UInt64)') ORDER BY h FORMAT TSV"),
        Array.emptyByteArray)
      assert(c2 === 0, s"clickhouse local rejected the stream: $e2")
      val got = new String(out, "UTF-8").trim.split('\n').toSeq
      val want = rows.map { case (h, s, ids) => s"$h\t$s\t${ids.size}" }
      assert(got === want)
    } finally graft.util.Fs.deleteRecursively(dir)
  }
}
