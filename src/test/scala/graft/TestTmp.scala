package graft

import java.nio.file.{Files, Path, Paths}

/** Test-side scratch dirs, recursively deleted at JVM exit — the spec
  * suites were stranding hundreds of store directories per `sbt test`
  * run (same leak class as VERDICT r5 #3 flagged in ops/). */
object TestTmp {
  /** The engine's length-prefixed raw-UTF-8 string spelling for local
    * binary records (WAL, tombstones, changed-keys) — specs that plant
    * crash-state files by hand must write the same format
    * (`Executer.writeStr`; writeUTF was dropped per ADVICE r8: it
    * throws past 65535 modified-UTF-8 bytes). */
  def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    created.add(d)
    d
  }

  private def deleteRec(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { d =>
      try deleteRec(d) catch { case _: Throwable => () }
    }
  }, "graft-testtmp-cleanup"))
}
