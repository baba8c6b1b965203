package graft.hadoop

import java.io.{File, FileOutputStream, OutputStream}

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the fork-per-file tax.
  *
  * Hadoop's `RawLocalFileSystem` shells out (`fork`+`exec` of `chmod` /
  * `ls` / `stat`) whenever libhadoop's native IO is not on the
  * classpath — which it never is here — to apply or read POSIX
  * permissions: every `FileSystem.create(path)` call chmods the new
  * file through a subprocess, every `mkdirs` with a mode forks once
  * per created level. On a bare metal box that is ~10 ms of noise; in
  * a sandboxed container (gVisor-style syscall interception, large
  * JVM heaps) each fork costs hundreds of milliseconds, and a
  * streaming micro-batch or a multi-file parquet commit pays it
  * dozens of times. None of those permission bits matter for an
  * ephemeral single-user benchmark filesystem, so this subclass
  * replaces the forking paths with their no-permission equivalents
  * (plain `File`/`FileOutputStream` calls — exactly what the base
  * class runs when handed a null permission).
  *
  * Wired in via `spark.hadoop.fs.file.impl`. Skipping the
  * `LocalFileSystem` checksum wrapper is also deliberate: `.crc`
  * sidecar files double the file-creation count, and parquet carries
  * its own page-level checksums.
  */
class BareLocalFileSystem extends RawLocalFileSystem {

  /** chmod fork → no-op (single-user temp data; umask already applies) */
  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  /** mkdir-with-mode (fork) → plain mkdir */
  override protected def mkOneDirWithMode(p: Path, p2f: File,
      permission: FsPermission): Boolean =
    p2f.mkdir()

  /** create-with-mode (create + chmod fork) → plain create; matches the
    * base class's permission == null fast path
    */
  override protected def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: FsPermission): OutputStream =
    new FileOutputStream(pathToFile(f), append)
}
