package graft

import graft.sources.Warc

/** Measures the member-indexed WARC split path against the legacy
  * round-robin form on one multi-GB (inflated) per-record-gzip archive —
  * the BENCH_SCALING evidence for the r10 "seek-free gzip splitting"
  * item. Generates the archive fresh in a temp dir (never committed),
  * then times a full `count()` scan under each `split_mode`:
  *
  *  - `roundrobin`: every slice walks the whole archive — N slices cost
  *    N full inflates (the old default, O(size²/splitSize) total work);
  *  - `index` (cold): first read pays ONE extra linear walk to build the
  *    member cut index, then each slice inflates only its byte range
  *    (~2× total);
  *  - `index` (warm): the index is cached per (path, size) — steady
  *    state is ~1× total inflate.
  *
  * Usage: WarcSplitProbe [members] [bodyMiB] [splitKiB]
  * (defaults 128 × 32 MiB ≈ 4 GiB inflated, 512 KiB splits).
  */
object WarcSplitProbe {
  def main(args: Array[String]): Unit = {
    val members = if (args.length > 0) args(0).toInt else 128
    val bodyMiB = if (args.length > 1) args(1).toInt else 32
    val splitKiB = if (args.length > 2) args(2).toInt else 512

    val dir = java.nio.file.Files.createTempDirectory("warcprobe")
    val f = dir.resolve("big.warc.gz")
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(f), 1 << 20)
    val body = new Array[Byte](bodyMiB * 1024 * 1024)
    // low-entropy but non-constant bodies: compress well (small fixture
    // on disk) while keeping the inflate path honest
    var bi = 0
    while (bi < body.length) { body(bi) = (bi % 251).toByte; bi += 1 }
    (0 until members).foreach { i =>
      val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16)
      gz.write(Warc.record("response", s"http://probe.example/$i",
        Warc.httpResponse(200, "application/octet-stream", body)))
      gz.finish()
    }
    out.close()
    val size = java.nio.file.Files.size(f)
    System.err.println(f"[probe] archive: $members members x $bodyMiB MiB " +
      f"= ${members.toLong * bodyMiB / 1024.0}%.1f GiB inflated, " +
      f"${size / 1e6}%.1f MB on disk, split_size = $splitKiB KiB")

    val spark = GraftSession.fromEnv()
    def scan(mode: String, label: String, sidecar: String = "read"): Unit = {
      val t0 = System.nanoTime()
      val n = spark.read.format("warc")
        .option("split_mode", mode)
        .option("index_sidecar", sidecar)
        .option("split_size", (splitKiB.toLong * 1024).toString)
        .load(dir.toString)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $label%-18s $dt%8.2f s  ($n records)")
      println(f"""{"mode":"$label","sec":$dt%.3f,"records":$n}""")
    }
    scan("roundrobin", "roundrobin")
    scan("index", "index_cold")   // pays the one-time index walk
    scan("index", "index_warm")   // cached index: ~1x total inflate
    // FIRST-CONTACT recipe (r11 Missing 2): a roundrobin read under
    // index_sidecar=write piggybacks index construction on slice 0's
    // walk — same N-walk cost as plain roundrobin, but it leaves the
    // sidecar behind; the next index-mode scan (JVM cache cleared to
    // simulate a fresh driver) plans byte ranges straight from the
    // sidecar, skipping the dedicated index walk index_cold pays.
    scan("roundrobin", "rr_first_contact", sidecar = "write")
    graft.sources.WarcDataSource.indexCache.clear()
    scan("index", "index_after_rr")
    val sidecarPath = graft.sources.WarcDataSource.sidecarPath(f.toString)
    System.err.println(s"[probe] sidecar left by first contact: " +
      s"${java.nio.file.Files.exists(java.nio.file.Paths.get(sidecarPath.toUri.getPath))}")
    spark.stop()
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(sidecarPath.toUri.getPath))
    java.nio.file.Files.delete(f)
    java.nio.file.Files.delete(dir)
  }
}
