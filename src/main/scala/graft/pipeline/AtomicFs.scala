package graft.pipeline

import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** Atomic small-file commit on ANY Hadoop filesystem — the reference's
  * temp-file → fsync → rename discipline (`utils/fs.py:21-48`) expressed
  * through `FileContext`, whose `rename(Options.Rename.OVERWRITE)` is the
  * same primitive Spark's own streaming checkpoint logs rely on.
  * `java.nio.file.Files.move(ATOMIC_MOVE)` only exists on a local POSIX
  * volume; this code is identical on `file://`, `hdfs://`, and (via the
  * committer-grade rename semantics of the connector) `s3a://` — the
  * scheme is resolved from the path URI, never assumed.
  */
object AtomicFs {
  private def fc(p: Path, conf: Configuration): FileContext =
    FileContext.getFileContext(p.toUri, conf)

  /** Same-directory temp file → hsync → rename(OVERWRITE). The temp name
    * embeds nanoTime so a concurrent writer can never scribble into a
    * half-written file; the rename lands whole-file (never torn),
    * last-writer-wins. */
  def write(p: Path, bytes: Array[Byte],
      conf: Configuration = new Configuration()): Unit = {
    val ctx = fc(p, conf)
    val tmp = new Path(p.getParent, s".${p.getName}.${System.nanoTime()}.tmp")
    val out = ctx.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try { out.write(bytes); out.hsync() } finally out.close()
    ctx.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  /** `None` when the file does not exist (the bootstrap read,
    * `sources/meteosat.py:61-69`). */
  def read(p: Path,
      conf: Configuration = new Configuration()): Option[Array[Byte]] = {
    val ctx = fc(p, conf)
    if (!ctx.util().exists(p)) None
    else {
      val in = ctx.open(p)
      try Some(in.readAllBytes()) finally in.close()
    }
  }
}
