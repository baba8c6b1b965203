package graft.streaming

import java.io.{File, FileNotFoundException, FileOutputStream, RandomAccessFile}
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, FSInputStream, Path, PathFilter}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** Streaming checkpoint I/O on plain `java.nio` — no Hadoop local
  * filesystem, no `FileContext`, and therefore no subprocess forks.
  *
  * The default checkpoint manager drives the offset log, commit log
  * and state-store delta files through `FileContext` over Hadoop's
  * local filesystem, whose permission handling shells out to `chmod` /
  * `ls` / `stat` when native IO is absent (see
  * [[graft.hadoop.BareLocalFileSystem]]). A streaming micro-batch
  * commits at least four such files — under a sandboxed kernel the
  * forks, serialized on the stream-execution thread, dominate
  * end-to-end latency of short streams (sampled stacks during the
  * round-5 gate probe showed the stream thread inside
  * `Shell.execCommand` on a third of samples). Checkpoints of a
  * local-mode stream live on one disk owned by one JVM, so the
  * rename-based atomicity contract is satisfied by
  * `Files.move(..., ATOMIC_MOVE)` directly.
  *
  * Selected via `spark.sql.streaming.checkpointFileManagerClass`
  * (public SQLConf); instantiated reflectively with `(Path,
  * Configuration)`. Production deployments checkpoint to HDFS/S3 and
  * keep the default manager — this class is the local-disk analogue,
  * not a replacement for distributed checkpoint stores.
  */
class NioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def toFile(p: Path): File = {
    val uri = p.toUri
    new File(Option(uri.getPath).filter(_.nonEmpty).getOrElse(p.toString))
  }

  private def status(f: File): FileStatus =
    new FileStatus(f.length(), f.isDirectory, 1, 32 * 1024 * 1024L,
      f.lastModified(), new Path(f.toURI))

  private def move(src: File, dst: File, overwrite: Boolean): Unit =
    try {
      if (overwrite)
        Files.move(src.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else Files.move(src.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE)
    } catch {
      // callers (HDFSMetadataLog concurrent-batch detection) expect the
      // Hadoop flavor of the exception
      case _: java.nio.file.FileAlreadyExistsException =>
        src.delete()
        throw new FileAlreadyExistsException(dst.toString)
    }

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val target = toFile(path)
    Option(target.getParentFile).foreach(_.mkdirs())
    val tmp = new File(target.getParentFile,
      s".${target.getName}.${UUID.randomUUID()}.tmp")
    val fout = new FileOutputStream(tmp)
    new CancellableFSDataOutputStream(fout) {
      @volatile private var terminated = false
      override def cancel(): Unit = if (!terminated) {
        terminated = true
        try fout.close() finally tmp.delete()
      }
      override def close(): Unit = if (!terminated) {
        terminated = true
        super.close() // flushes the FSDataOutputStream wrapper, closes fout
        move(tmp, target, overwriteIfPossible)
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val f = toFile(path)
    if (!f.isFile) throw new FileNotFoundException(s"$f does not exist")
    new FSDataInputStream(new NioSeekableStream(f))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = toFile(path)
    if (!dir.exists()) throw new FileNotFoundException(s"$dir does not exist")
    val children = if (dir.isFile) Array(dir) else dir.listFiles()
    children.iterator.map(status)
      .filter(s => filter == null || filter.accept(s.getPath)).toArray
  }

  override def mkdirs(path: Path): Unit =
    Files.createDirectories(toFile(path).toPath)

  override def exists(path: Path): Boolean = toFile(path).exists()

  override def delete(path: Path): Unit = {
    val f = toFile(path)
    if (f.exists()) {
      val walk = Files.walk(f.toPath)
      try {
        import scala.jdk.CollectionConverters._
        walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally walk.close()
    }
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    val f = toFile(root).getAbsoluteFile
    Files.createDirectories(f.toPath)
    new Path(f.toURI)
  }
}

/** Seekable/positioned-readable stream over a local file for
  * `FSDataInputStream` (the positioned-read defaults come from
  * `FSInputStream`).
  */
private final class NioSeekableStream(f: File) extends FSInputStream {
  private val raf = new RandomAccessFile(f, "r")
  override def seek(pos: Long): Unit = raf.seek(pos)
  override def getPos: Long = raf.getFilePointer
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int = raf.read()
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    raf.read(b, off, len)
  override def available(): Int =
    math.min(raf.length() - raf.getFilePointer, Int.MaxValue.toLong).toInt
  override def close(): Unit = raf.close()
}
