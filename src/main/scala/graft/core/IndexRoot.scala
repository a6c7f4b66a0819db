package graft.core

/** Deterministic per-dataset index locations (shared by
  * [[graft.operators.AnnIndex]] and [[graft.operators.DedupIndex]] —
  * one copy of the fingerprint rule so a fix to it cannot silently miss
  * one index kind).
  *
  * The path embeds a CONTENT fingerprint of the source — the md5 of the
  * full source path plus every data file's (name, size, mtime) — so a
  * changed or rewritten corpus gets a fresh index root instead of
  * silently serving stale results, and two source dirs whose names
  * sanitize to the same string can never collide on one root.
  */
object IndexRoot {
  def of(sfDir: String, sourceFile: String, prefix: String): String = {
    val src = new java.io.File(sfDir, sourceFile)
    val files: Seq[java.io.File] =
      if (src.isDirectory)
        Option(src.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
      else Seq(src)
    val sig = (src.getAbsolutePath +:
      files.map(f => s"${f.getName}:${f.length}:${f.lastModified}"))
      .mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    new java.io.File(
      sys.props("java.io.tmpdir"),
      prefix + "_" +
        new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9.]", "_") +
        "_" + md).toString
  }
}
