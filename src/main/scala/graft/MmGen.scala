package graft

/** DEV harness (not part of the engine): generate the scaled multimodal
  * fixture (VERDICT r10 #6) — `reps` deterministic replicas of the five
  * committed base assets (fixtures/multimodal) into `outDir`, so
  * ScaleBench can measure a real exponent for the mm_* explode paths
  * (row-per-frame / row-per-sample / row-per-patch) instead of the fixed
  * 5-file fixture. Content is an LCG byte stream salted by (base name,
  * replica), matching the committed fixtures' generation scheme — sizes
  * replicate exactly, so total bytes (and thus exploded rows) scale
  * linearly with `reps`.
  *
  *   runMain graft.MmGen [outDir] [reps]
  */
object MmGen {
  // (name, extension, bytes) of the committed base assets
  val baseAssets: Seq[(String, String, Int)] = Seq(
    ("cat", "img", 2048), ("clip", "vid", 8192), ("dog", "img", 3072),
    ("note", "txt", 512), ("song", "aud", 4096))

  def write(outDir: String, reps: Int): Int = {
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    // remove surplus replicas from a previous larger-reps run — without
    // this a stale /tmp dir silently inflates the measured bytes and
    // corrupts the recorded mm_* scaling exponents. ONLY files matching
    // the generated replica name pattern are ever deleted: pointing this
    // at a non-dedicated directory (e.g. the committed fixtures, whose
    // assets carry no _r suffix) must not destroy its contents.
    val expected = (for (r <- 0 until reps; (name, ext, _) <- baseAssets)
      yield s"${name}_$r.$ext").toSet
    val replicaName =
      ("^(" + baseAssets.map(_._1).distinct.mkString("|") + ")_\\d+\\.(" +
        baseAssets.map(_._2).distinct.mkString("|") + ")$").r
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => replicaName.matches(f.getName) && !expected(f.getName))
      .foreach(_.delete())
    var n = 0
    for (r <- 0 until reps; (name, ext, bytes) <- baseAssets) {
      val f = new java.io.File(dir, s"${name}_$r.$ext")
      if (!f.exists() || f.length() != bytes) {
        val buf = new Array[Byte](bytes)
        // deterministic LCG seeded by the file identity
        var h = s"$name:$r:$ext".foldLeft(1125899906842597L)(31 * _ + _)
        var i = 0
        while (i < bytes) {
          h = h * 6364136223846793005L + 1442695040888963407L
          buf(i) = (h >>> 32).toByte
          i += 1
        }
        val out = new java.io.FileOutputStream(f)
        try out.write(buf) finally out.close()
      }
      n += 1
    }
    n
  }

  def main(args: Array[String]): Unit = {
    // default matches ScaleBench's probe dir — NOT a repo path, so a
    // bare run can't litter fixtures/ with generated binaries
    val out = args.headOption.getOrElse("/tmp/graft_mm10")
    val reps = if (args.length > 1) args(1).toInt else 10
    val n = write(out, reps)
    println(s"[mmgen] $n assets in $out")
  }
}
