package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer mutual exclusion for one index store.
  *
  * The reference engine is single-process by construction
  * (`MapReduce/Program.cs:13-45`); on a shared store the same contract
  * must be enforced externally, or two concurrent maintenance batches
  * would interleave staging renames and corrupt state. This trait is the
  * seam for environment-specific claims:
  *
  *   - [[AtomicCreateLeaseProvider]] (default): atomic
  *     create-if-absent of a lease file — correct on HDFS and local
  *     filesystems, where `FileSystem.create(overwrite = false)` is an
  *     atomic test-and-set.
  *   - S3-family object stores: create is NOT atomic there (two
  *     concurrent creates both succeed), so a production deployment
  *     supplies a conditional-put implementation instead — e.g. an S3
  *     `If-None-Match: *` PUT (atomic since 2024), a DynamoDB
  *     conditional write, or a ZooKeeper/etcd ephemeral node. Any
  *     implementation only has to make [[acquire]] an atomic
  *     claim-if-unheld.
  */
trait LeaseProvider {

  /** Atomically claim the lease, recording `info` (diagnostics: who
    * holds it). MUST throw [[IllegalStateException]] if the lease is
    * already held; on success the caller is the single writer until
    * [[release]]. */
  def acquire(info: String): Unit

  /** Release the lease. Idempotent, and callable by a DIFFERENT party
    * than the holder — force-releasing a crashed writer's lease (after
    * running recovery) is an operator action. */
  def release(): Unit
}

/** Default provider: atomic create-if-absent of the lease file. On HDFS
  * `create(overwrite = false)` is the namenode-side atomic claim; on
  * the LOCAL filesystem Hadoop's create does a non-atomic exists check
  * first, so the claim goes through NIO `CREATE_NEW` instead — POSIX
  * O_CREAT|O_EXCL, the real test-and-set. Not safe on S3-family stores
  * (see [[LeaseProvider]]); `fs` is passed as a thunk because Hadoop
  * `FileSystem` handles are cache-managed and must be resolved at call
  * time. */
final class AtomicCreateLeaseProvider(fs: () => FileSystem, leasePath: String)
    extends LeaseProvider {

  private def held(): Nothing = throw new IllegalStateException(
    s"another writer holds $leasePath — concurrent maintenance on one " +
      "store is not supported (single-writer contract). If the " +
      "previous writer crashed, run breakLease() then recover().")

  override def acquire(info: String): Unit = {
    val f = fs()
    val p = new Path(leasePath)
    f.mkdirs(p.getParent)
    val uri = f.makeQualified(p).toUri
    if (uri.getScheme == "file") {
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(uri.getPath),
        info.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      catch { case _: java.nio.file.FileAlreadyExistsException => held() }
    } else {
      try {
        val out = f.create(p, false)
        out.writeUTF(info)
        out.close()
      } catch { case _: java.io.IOException => held() }
    }
  }

  override def release(): Unit =
    fs().delete(new Path(leasePath), false)
}
