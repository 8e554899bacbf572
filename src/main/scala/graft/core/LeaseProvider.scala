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

/** The minimal conditional-write surface an object-store lease needs:
  * atomic create-if-absent returning a generation tag, tag-conditional
  * delete, and read. S3 (`If-None-Match: *` PUT + `If-Match` DELETE),
  * GCS (`ifGenerationMatch=0`), and Azure Blob (ETag preconditions) all
  * provide exactly these primitives; [[InMemoryEtagStore]] emulates the
  * same strong semantics locally so the protocol is raceable in tests
  * without a cloud endpoint. */
trait EtagStore {

  /** Atomic create-if-absent: `Some(etag)` when this call created the
    * object, `None` when an object already existed. */
  def putIfAbsent(key: String, value: Array[Byte]): Option[String]

  /** Delete the object. With `Some(etag)` the delete only happens if the
    * CURRENT object still carries that tag (compare-and-delete); with
    * `None` it is unconditional (operator force-release). Returns true
    * iff an object was deleted by this call. */
  def deleteIf(key: String, etag: Option[String]): Boolean

  def get(key: String): Option[(Array[Byte], String)]
}

/** Local emulation of the conditional-put object store: a concurrent map
  * whose `putIfAbsent`/`remove(key, value)` give exactly the atomicity
  * the cloud APIs promise. Tests race providers against this; production
  * swaps in an S3/GCS/ABS-backed [[EtagStore]] with no provider change. */
final class InMemoryEtagStore extends EtagStore {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], String)]()
  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)

  override def putIfAbsent(key: String, value: Array[Byte]): Option[String] = {
    val tag = s"g${gen.incrementAndGet()}"
    if (m.putIfAbsent(key, (value, tag)) == null) Some(tag) else None
  }

  override def deleteIf(key: String, etag: Option[String]): Boolean =
    etag match {
      case None => m.remove(key) != null
      case Some(t) =>
        val cur = m.get(key)
        cur != null && cur._2 == t && m.remove(key, cur)
    }

  override def get(key: String): Option[(Array[Byte], String)] = Option(m.get(key))
}

/** Conditional-put lease for S3-family object stores, where plain file
  * create is NOT atomic (see [[LeaseProvider]]): acquire is a
  * create-if-absent PUT, and the holder's own release is an etag
  * compare-and-delete — so a STALE holder (its lease force-broken by an
  * operator, the store since re-leased to a new writer) cannot delete
  * the new writer's lease. A provider that never acquired (fresh
  * instance, `heldTag` empty) releases unconditionally: that is the
  * operator force-release path the [[LeaseProvider]] contract requires. */
final class ConditionalPutLeaseProvider(store: EtagStore, key: String)
    extends LeaseProvider {

  @volatile private var heldTag: Option[String] = None

  override def acquire(info: String): Unit =
    store.putIfAbsent(key, info.getBytes(java.nio.charset.StandardCharsets.UTF_8)) match {
      case Some(tag) => heldTag = Some(tag)
      case None => throw new IllegalStateException(
        s"another writer holds $key — concurrent maintenance on one " +
          "store is not supported (single-writer contract). If the " +
          "previous writer crashed, run breakLease() then recover().")
    }

  override def release(): Unit = heldTag match {
    case Some(t) => store.deleteIf(key, Some(t)); heldTag = None
    case None => store.deleteIf(key, None)
  }
}
